"""Hybrid dp x sp sharded training step on the virtual 8-device CPU mesh
(SURVEY.md §5.7: batch data-parallel over `dp`, dense BEV conv pyramid
spatially partitioned over `sp` with GSPMD halo exchange)."""

import jax
import numpy as np
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from btcdet_tpu.datasets import make_synthetic_batch
from btcdet_tpu.datasets.mini_config import (
    mini_data_cfg, mini_model_cfg, mini_opt_cfg,
)
from btcdet_tpu.models import build_network
from btcdet_tpu.train import trainer

pytestmark = pytest.mark.slow  # model-scale XLA compiles; smoke suite skips


def test_dp_sp_train_step():
    n = 8
    devices = np.array(jax.devices()[:n]).reshape(n // 2, 2)
    mesh = Mesh(devices, ("dp", "sp"))
    data_cfg = mini_data_cfg(with_occ=False)
    model_cfg = mini_model_cfg(with_occ=False)
    net = build_network(
        model_cfg, data_cfg, ["Car"],
        bev_sharding=NamedSharding(mesh, P("dp", "sp")),
    )
    batch = {k: jax.numpy.asarray(v) for k, v in make_synthetic_batch(
        data_cfg, batch_size=4, num_points=512, num_gt=2).items()}
    state, tx = trainer.create_train_state(
        net, batch, jax.random.PRNGKey(0),
        det_opt_cfg=mini_opt_cfg(0.01), occ_opt_cfg=None, total_steps=4,
    )
    step = trainer.make_data_parallel_train_step(net, tx, mesh)
    batch = trainer.shard_batch(batch, mesh)
    state, metrics = step(state, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["loss"]))
    assert int(state.step) == 1


def test_dp_sharded_eval_matches_unsharded():
    """Data-parallel eval (reference DDP eval, eval_utils.py:77-83):
    dp-sharded inference must produce bitwise-identical predictions --
    eval has no cross-frame coupling (per-frame NMS, running-average BN)."""
    import jax.numpy as jnp

    n = 8
    mesh = Mesh(np.array(jax.devices()[:n]), ("dp",))
    data_cfg = mini_data_cfg(with_occ=False)
    model_cfg = mini_model_cfg(with_occ=False)
    net = build_network(model_cfg, data_cfg, ["Car"])
    batch = {k: jnp.asarray(v) for k, v in make_synthetic_batch(
        data_cfg, batch_size=n, num_points=512, num_gt=2).items()}
    rngs = {"params": jax.random.PRNGKey(0), "sampling": jax.random.PRNGKey(1),
            "dropout": jax.random.PRNGKey(2)}
    variables = net.init(rngs, batch, train=False)

    @jax.jit
    def infer(v, b):
        return net.apply(v, b, train=False)["batch_box_preds"]

    ref = np.asarray(infer(variables, batch))
    sharded = trainer.shard_batch(batch, mesh)
    out = np.asarray(infer(variables, sharded))
    assert out.shape == ref.shape
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)
