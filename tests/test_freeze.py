"""LR == 0 staged-training freeze: the frozen partition's params must be
stop-gradient'd inside the train step (reference `btcnet.py:42-48` runs
the occ modules under no_grad when OCC_OPTIMIZATION.LR is 0), so the occ
backward is dead code, not a computed-then-zeroed gradient (VERDICT r1
next #9).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from btcdet_tpu.datasets import make_synthetic_batch
from btcdet_tpu.datasets.mini_config import (
    micro_data_cfg, micro_model_cfg, mini_opt_cfg,
)
from btcdet_tpu.models import build_network
from btcdet_tpu.train import optim, trainer

pytestmark = pytest.mark.slow  # model-scale XLA compiles; smoke suite skips


def test_frozen_partitions_helper():
    det = mini_opt_cfg(0.01)
    occ0 = mini_opt_cfg(0.0)
    occ = mini_opt_cfg(0.003)
    assert trainer.frozen_partitions(det, occ0) == ("occ",)
    assert trainer.frozen_partitions(det, occ) == ()
    assert trainer.frozen_partitions(mini_opt_cfg(0.0), occ) == ("det",)
    assert trainer.frozen_partitions(det, None) == ()


def test_occ_freeze_updates_det_only():
    data_cfg = micro_data_cfg(with_occ=True)
    model_cfg = micro_model_cfg(with_occ=True)
    net = build_network(model_cfg, data_cfg, ["Car"])
    batch = {k: jnp.asarray(v) for k, v in make_synthetic_batch(
        data_cfg, batch_size=1, num_points=256, num_gt=2).items()}

    occ_cfg = mini_opt_cfg(0.0)  # frozen
    state, tx = trainer.create_train_state(
        net, batch, jax.random.PRNGKey(0),
        det_opt_cfg=mini_opt_cfg(0.01), occ_opt_cfg=occ_cfg, total_steps=4,
    )
    step = jax.jit(trainer.make_train_step(net, tx, frozen=("occ",)))
    new_state, metrics = step(state, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["loss"]))

    labels = optim.occ_det_partition(state.params)
    moved_det = moved_occ = 0
    for old, new, lab in zip(
        jax.tree_util.tree_leaves(state.params),
        jax.tree_util.tree_leaves(new_state.params),
        jax.tree_util.tree_leaves(labels),
    ):
        changed = bool(np.any(np.asarray(old) != np.asarray(new)))
        if lab == "occ":
            moved_occ += changed
        else:
            moved_det += changed
    assert moved_occ == 0, "frozen occ params must not move"
    assert moved_det > 0, "det params must update"
