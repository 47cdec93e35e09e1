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


def test_dp_train_step_matches_single_device():
    """Reference DDP semantics (tools/train.py:166-168): dp training ==
    single-device training at the same global batch. Under GSPMD the dp
    step is the SAME jitted program partitioned over devices, so the
    updated params/loss must match a single-device run numerically
    (tolerance = float reassociation across partitions; BN batch_stats
    are global-batch means either way, i.e. SyncBN semantics)."""
    import jax.numpy as jnp

    n = 8
    mesh = Mesh(np.array(jax.devices()[:n]), ("dp",))
    data_cfg = mini_data_cfg(with_occ=False)
    model_cfg = mini_model_cfg(with_occ=False)
    net = build_network(model_cfg, data_cfg, ["Car"])
    batch = {k: jnp.asarray(v) for k, v in make_synthetic_batch(
        data_cfg, batch_size=n, num_points=512, num_gt=2).items()}
    state, tx = trainer.create_train_state(
        net, batch, jax.random.PRNGKey(0),
        det_opt_cfg=mini_opt_cfg(0.01), occ_opt_cfg=None, total_steps=4,
    )

    single_step = jax.jit(trainer.make_train_step(net, tx))
    rng = jax.random.PRNGKey(1)
    ref_state, ref_metrics = single_step(state, batch, rng)

    dp_step = trainer.make_data_parallel_train_step(net, tx, mesh)
    dp_state, dp_metrics = dp_step(state, trainer.shard_batch(batch, mesh), rng)

    np.testing.assert_allclose(
        float(dp_metrics["loss"]), float(ref_metrics["loss"]),
        rtol=1e-4, atol=1e-6)
    flat_ref = jax.tree_util.tree_leaves_with_path(ref_state.params)
    flat_dp = {jax.tree_util.keystr(k): v
               for k, v in jax.tree_util.tree_leaves_with_path(dp_state.params)}
    # tolerance note: GSPMD partitions the SAME program, but reduction
    # reassociation perturbs near-zero grads, and Adam's m/(sqrt(v)+eps)
    # normalizes every grad to an O(lr)=1e-2 step -- so a handful of
    # elements legitimately move by a few 1e-3 (measured: 7/4096 at
    # 2e-3 on one kernel). A semantic dp bug (wrong mean/psum scale)
    # would shift ~every element by O(lr); atol=3e-3 still catches that.
    for k, v in flat_ref:
        ks = jax.tree_util.keystr(k)
        np.testing.assert_allclose(
            np.asarray(flat_dp[ks], np.float32), np.asarray(v, np.float32),
            rtol=0, atol=3e-3, err_msg=ks)
    for k, v in jax.tree_util.tree_leaves_with_path(ref_state.batch_stats):
        ks = jax.tree_util.keystr(k)
        dpv = dict((jax.tree_util.keystr(kk), vv) for kk, vv in
                   jax.tree_util.tree_leaves_with_path(dp_state.batch_stats))[ks]
        # running means are near-zero sums of O(1) values: sqrt(N)*eps
        # reassociation noise (~2e-4 at N~1e5) dominates them, so the
        # check is absolute; variances are positive sums and stay tight.
        # ROI-head one-step means sit downstream of DISCRETE selections
        # (proposal NMS ordering, ball-query membership) that amplify
        # ulp-level partitioning differences into a different
        # proposal/point set — measured 1.6e-3 on 1/32 channels even
        # under plain dp (same program, no spatial repartition), same
        # phenomenon the dp x sp test documents at 2e-3..2.4e-2. A
        # widened absolute band still catches a semantic dp bug (wrong
        # psum scale shifts every channel by O(stat)).
        atol = 5e-2 if "det_roi_head" in ks else 1e-3
        np.testing.assert_allclose(
            np.asarray(dpv, np.float32), np.asarray(v, np.float32),
            rtol=2e-2, atol=atol, err_msg="batch_stats " + ks)


def test_dp_sp_train_step_matches_single_device():
    """sp-axis numeric equivalence (VERDICT r3 next #7): a dp=4 x sp=2
    sharded train step (BEV pyramid spatially partitioned over `sp`,
    GSPMD halo exchange for the 3x3 convs) must match a single-device
    step at the same global batch. The dp-only equivalence test cannot
    see a halo-exchange bug; this one fails loudly on one (a wrong halo
    corrupts boundary columns of every BEV conv -> O(1) shifts in loss
    and many params, far above the 3e-3 reassociation tolerance)."""
    import jax.numpy as jnp

    n = 8
    devices = np.array(jax.devices()[:n]).reshape(n // 2, 2)
    mesh = Mesh(devices, ("dp", "sp"))
    data_cfg = mini_data_cfg(with_occ=False)
    model_cfg = mini_model_cfg(with_occ=False)
    # same param tree either way: bev_sharding only adds
    # with_sharding_constraint on activations, not parameters
    net_plain = build_network(model_cfg, data_cfg, ["Car"])
    net_sp = build_network(
        model_cfg, data_cfg, ["Car"],
        bev_sharding=NamedSharding(mesh, P("dp", "sp")),
    )
    batch = {k: jnp.asarray(v) for k, v in make_synthetic_batch(
        data_cfg, batch_size=4, num_points=512, num_gt=2).items()}
    state, tx = trainer.create_train_state(
        net_plain, batch, jax.random.PRNGKey(0),
        det_opt_cfg=mini_opt_cfg(0.01), occ_opt_cfg=None, total_steps=4,
    )

    rng = jax.random.PRNGKey(1)
    ref_state, ref_metrics = jax.jit(trainer.make_train_step(net_plain, tx))(
        state, batch, rng)
    sp_step = trainer.make_data_parallel_train_step(net_sp, tx, mesh)
    sp_state, sp_metrics = sp_step(state, trainer.shard_batch(batch, mesh), rng)

    np.testing.assert_allclose(
        float(sp_metrics["loss"]), float(ref_metrics["loss"]),
        rtol=1e-4, atol=1e-6)
    flat_sp = {jax.tree_util.keystr(k): v
               for k, v in jax.tree_util.tree_leaves_with_path(sp_state.params)}
    for k, v in jax.tree_util.tree_leaves_with_path(ref_state.params):
        ks = jax.tree_util.keystr(k)
        np.testing.assert_allclose(
            np.asarray(flat_sp[ks], np.float32), np.asarray(v, np.float32),
            rtol=0, atol=3e-3, err_msg=ks)
    flat_sp_bs = {jax.tree_util.keystr(k): v for k, v in
                  jax.tree_util.tree_leaves_with_path(sp_state.batch_stats)}
    for k, v in jax.tree_util.tree_leaves_with_path(ref_state.batch_stats):
        ks = jax.tree_util.keystr(k)
        # The ROI head sits downstream of DISCRETE selections (proposal
        # NMS ordering, the ball query's hard dist2<=r^2 test) that
        # amplify ulp-level GSPMD codegen differences into wholesale
        # different proposal/point sets -- its one-step BN batch means
        # moved by 2e-3..2.4e-2 across partitionings at these mini
        # shapes (measured; identical with exact top_k, so not
        # approx_max_k ordering). Those stats are NOT evidence about
        # the sharding; skip them here. They are asserted at a widened
        # 5e-2 band in the dp test (selection flips show up even there),
        # and the roi-head PARAMS stay under the strict 3e-3 check
        # above. The sharded thing under test is the BEV pyramid:
        # its and the backbone's stats must match tightly -- a
        # halo/psum bug fails these and the loss/param asserts.
        if "det_roi_head" in ks:
            continue
        np.testing.assert_allclose(
            np.asarray(flat_sp_bs[ks], np.float32), np.asarray(v, np.float32),
            rtol=2e-2, atol=1e-3, err_msg="batch_stats " + ks)


def test_dp_sp_train_step_mini_with_occ():
    """Realistic-shape multichip check, upgraded to NUMERIC EQUIVALENCE
    (VERDICT r4 next #9): the FULL dual-subnet (occ + det) train step,
    mini config (160x160 det grid, real module topology), dp=4 x sp=2
    GSPMD mesh vs a single-device step at the same global batch. Loss
    and every parameter match under the established reassociation
    tolerances; batch_stats match with the measured carve-outs (the ROI
    head sits downstream of discrete selections — see
    test_dp_sp_train_step_matches_single_device — and with the occ
    subnet in the loop the det-side sparse stages sit downstream of the
    top-512 occ-point prob cutoff, where ulp-level partitioning
    differences can swap borderline points; a swapped point changes the
    merged voxel set and shifts one-step BN means by O(1/rows))."""
    import jax.numpy as jnp

    n = 8
    devices = np.array(jax.devices()[:n]).reshape(n // 2, 2)
    mesh = Mesh(devices, ("dp", "sp"))
    data_cfg = mini_data_cfg(with_occ=True)
    model_cfg = mini_model_cfg(with_occ=True)
    net_plain = build_network(model_cfg, data_cfg, ["Car"])
    net_sp = build_network(
        model_cfg, data_cfg, ["Car"],
        bev_sharding=NamedSharding(mesh, P("dp", "sp")),
    )
    batch = {k: jnp.asarray(v) for k, v in make_synthetic_batch(
        data_cfg, batch_size=4, num_points=1024, num_gt=2).items()}
    state, tx = trainer.create_train_state(
        net_plain, batch, jax.random.PRNGKey(0),
        det_opt_cfg=mini_opt_cfg(0.01), occ_opt_cfg=mini_opt_cfg(0.003),
        total_steps=4,
    )

    rng = jax.random.PRNGKey(1)
    ref_state, ref_metrics = jax.jit(trainer.make_train_step(net_plain, tx))(
        state, batch, rng)
    sp_step = trainer.make_data_parallel_train_step(net_sp, tx, mesh)
    sp_state, sp_metrics = sp_step(state, trainer.shard_batch(batch, mesh), rng)

    np.testing.assert_allclose(
        float(sp_metrics["loss"]), float(ref_metrics["loss"]),
        rtol=1e-4, atol=1e-6)
    flat_sp = {jax.tree_util.keystr(k): v
               for k, v in jax.tree_util.tree_leaves_with_path(sp_state.params)}
    for k, v in jax.tree_util.tree_leaves_with_path(ref_state.params):
        ks = jax.tree_util.keystr(k)
        np.testing.assert_allclose(
            np.asarray(flat_sp[ks], np.float32), np.asarray(v, np.float32),
            rtol=0, atol=3e-3, err_msg=ks)
    flat_sp_bs = {jax.tree_util.keystr(k): v for k, v in
                  jax.tree_util.tree_leaves_with_path(sp_state.batch_stats)}
    for k, v in jax.tree_util.tree_leaves_with_path(ref_state.batch_stats):
        ks = jax.tree_util.keystr(k)
        if "det_roi_head" in ks:
            continue  # discrete-selection carve-out (see docstring)
        np.testing.assert_allclose(
            np.asarray(flat_sp_bs[ks], np.float32), np.asarray(v, np.float32),
            rtol=2e-2, atol=1e-3, err_msg="batch_stats " + ks)

    # one more sharded step keeps the original multi-step liveness check
    sp_state, metrics2 = sp_step(sp_state, trainer.shard_batch(batch, mesh),
                                 jax.random.PRNGKey(2))
    assert np.isfinite(float(metrics2["loss"]))
    assert int(sp_state.step) == 2
