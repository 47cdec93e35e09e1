import jax
import jax.numpy as jnp
import numpy as np
import optax

from btcdet_tpu.config import EasyDict
from btcdet_tpu.train import optim


def opt_cfg(lr=0.01, name="adam_onecycle"):
    return EasyDict({
        "OPTIMIZER": name, "LR": lr, "WEIGHT_DECAY": 0.01, "MOMENTUM": 0.9,
        "MOMS": [0.95, 0.85], "PCT_START": 0.4, "DIV_FACTOR": 10,
        "DECAY_STEP_LIST": [35, 45], "LR_DECAY": 0.1, "LR_CLIP": 1e-7,
        "NUM_EPOCHS": 2, "GRAD_NORM_CLIP": 10,
    })


def test_onecycle_lr_shape():
    sched = optim.onecycle_lr(0.01, 100, 0.4, 10)
    lr0 = float(sched(0))
    lr_peak = float(sched(40))
    lr_end = float(sched(100))
    assert abs(lr0 - 0.001) < 1e-6          # max_lr / div
    assert abs(lr_peak - 0.01) < 1e-6       # max at pct_start
    assert lr_end < 1e-5                    # anneal to max/1e4
    # monotone up then down
    ups = [float(sched(s)) for s in range(0, 41, 5)]
    downs = [float(sched(s)) for s in range(40, 101, 10)]
    assert all(b >= a - 1e-9 for a, b in zip(ups, ups[1:]))
    assert all(b <= a + 1e-9 for a, b in zip(downs, downs[1:]))


def test_onecycle_momentum_shape():
    ms = optim.onecycle_momentum([0.95, 0.85], 100, 0.4)
    assert abs(float(ms(0)) - 0.95) < 1e-6
    assert abs(float(ms(40)) - 0.85) < 1e-6
    assert abs(float(ms(100)) - 0.95) < 1e-6


def test_dual_optimizer_partition_and_freeze():
    params = {
        "occ_subnet": {"conv": {"kernel": jnp.ones((2, 2))}},
        "det_backbone_3d": {"conv": {"kernel": jnp.ones((2, 2))}},
    }
    labels = optim.occ_det_partition(params)
    assert labels["occ_subnet"]["conv"]["kernel"] == "occ"
    assert labels["det_backbone_3d"]["conv"]["kernel"] == "det"

    # occ LR == 0 freezes the occ partition
    tx = optim.build_dual_optimizer(opt_cfg(0.01), opt_cfg(0.0), total_steps=10)
    state = tx.init(params)
    grads = jax.tree_util.tree_map(jnp.ones_like, params)
    updates, _ = tx.update(grads, state, params)
    assert float(jnp.abs(updates["occ_subnet"]["conv"]["kernel"]).max()) == 0.0
    assert float(jnp.abs(updates["det_backbone_3d"]["conv"]["kernel"]).max()) > 0.0


def test_weight_decay_mask():
    params = {"dense": {"kernel": jnp.ones((2, 2)), "bias": jnp.ones((2,))}}
    mask = optim._kernel_mask(params)
    assert mask["dense"]["kernel"] is True
    assert mask["dense"]["bias"] is False


def test_cosine_warmup_wrap():
    """CosineWarmupLR semantics (reference
    `learning_schedules_fastai.py:84-93`): lr ramps LR/DIV -> LR on a
    cosine over WARMUP_EPOCH epochs, then the main schedule applies."""
    cfg = opt_cfg(name="adam_cosine")
    cfg["LR_WARMUP"] = True
    cfg["WARMUP_EPOCH"] = 1
    total = 100  # NUM_EPOCHS=2 -> spe=50, warmup=50 steps
    main = lambda s: jnp.full_like(jnp.asarray(s, jnp.float32), 0.02)
    sched = optim.with_cosine_warmup(main, cfg, total)
    assert abs(float(sched(0)) - 0.001) < 1e-6          # LR/DIV at step 0
    assert abs(float(sched(49)) - 0.01) < 3e-4          # ~LR at warmup end
    assert abs(float(sched(50)) - 0.02) < 1e-6          # main after warmup
    ramp = [float(sched(s)) for s in range(0, 50, 7)]
    assert all(b >= a for a, b in zip(ramp, ramp[1:]))
    # no LR_WARMUP -> passthrough
    cfg2 = opt_cfg(name="adam_cosine")
    assert optim.with_cosine_warmup(main, cfg2, total) is main


def test_adam_decay_schedule_with_warmup_builds():
    cfg = opt_cfg(name="adam")
    cfg["LR_WARMUP"] = True
    cfg["WARMUP_EPOCH"] = 1
    tx = optim.build_optimizer(cfg, 100)
    params = {"kernel": jnp.ones((3,)), "bias": jnp.zeros((2,))}
    state = tx.init(params)
    g = jax.tree_util.tree_map(jnp.ones_like, params)
    upd, _ = tx.update(g, state, params)
    assert np.isfinite(np.asarray(upd["kernel"])).all()
