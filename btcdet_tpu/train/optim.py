"""Optimizers and LR schedules (reference `tools/train_utils/optimization/`).

Reproduces:
  - adam_onecycle: fastai OneCycle (cos-anneal lr/div -> lr -> lr/1e4,
    momentum 0.95 -> 0.85 -> 0.95; `learning_schedules_fastai.py:64-81`)
  - adam / sgd / adam_cosine variants
  - true weight decay applied only to conv/dense kernels (the fastai
    OptimWrapper's bn/bias split, `fastai_optim.py:13-25`)
  - the dual-optimizer split: parameters under the `occ_subnet` scope get
    the OCC_OPTIMIZATION block, everything else the OPTIMIZATION block
    (reference `optimization/__init__.py:11-16`), each with its own
    grad-norm clip (`train_utils.py:122-126`).
"""

from __future__ import annotations

import flax
import jax
import jax.numpy as jnp
import numpy as np
import optax


def onecycle_lr(max_lr: float, total_steps: int, pct_start: float, div_factor: float):
    """fastai OneCycle LR: cos from max_lr/div to max_lr over pct_start,
    then cos from max_lr to max_lr/1e4."""
    up = max(int(total_steps * pct_start), 1)
    down = max(total_steps - up, 1)

    def sched(step):
        step = jnp.minimum(step, total_steps)
        phase1 = 0.5 * (max_lr / div_factor + max_lr) - 0.5 * (
            max_lr - max_lr / div_factor
        ) * jnp.cos(jnp.pi * jnp.minimum(step, up) / up)
        t2 = jnp.clip((step - up) / down, 0.0, 1.0)
        phase2 = 0.5 * (max_lr / 1e4 + max_lr) + 0.5 * (
            max_lr - max_lr / 1e4
        ) * jnp.cos(jnp.pi * t2)
        return jnp.where(step < up, phase1, phase2)

    return sched


def onecycle_momentum(moms, total_steps: int, pct_start: float):
    m_hi, m_lo = float(moms[0]), float(moms[1])
    up = max(int(total_steps * pct_start), 1)
    down = max(total_steps - up, 1)

    def sched(step):
        step = jnp.minimum(step, total_steps)
        t1 = jnp.minimum(step, up) / up
        phase1 = m_hi + (m_lo - m_hi) * 0.5 * (1 - jnp.cos(jnp.pi * t1))
        t2 = jnp.clip((step - up) / down, 0.0, 1.0)
        phase2 = m_lo + (m_hi - m_lo) * 0.5 * (1 - jnp.cos(jnp.pi * t2))
        return jnp.where(step < up, phase1, phase2)

    return sched


def with_cosine_warmup(sched, opt_cfg, total_steps: int):
    """Wrap `sched` with the reference's CosineWarmupLR
    (`learning_schedules_fastai.py:84-93` + `optimization/__init__.py:68-72`):
    for the first WARMUP_EPOCH epochs the lr ramps LR/DIV_FACTOR -> LR on a
    cosine, then the main schedule takes over. Applies only when
    `LR_WARMUP: True` (non-onecycle optimizers)."""
    if not bool(opt_cfg.get("LR_WARMUP", False)):
        return sched
    lr = float(opt_cfg.LR)
    eta_min = lr / float(opt_cfg.get("DIV_FACTOR", 10.0))
    epochs = max(int(opt_cfg.get("NUM_EPOCHS", 1)), 1)
    spe = max(total_steps // epochs, 1)
    warm = max(int(opt_cfg.get("WARMUP_EPOCH", 1)) * spe, 1)

    def wrapped(step):
        t = jnp.clip(step / warm, 0.0, 1.0)
        w = eta_min + (lr - eta_min) * 0.5 * (1.0 - jnp.cos(jnp.pi * t))
        return jnp.where(step < warm, w, sched(step))

    return wrapped


def _kernel_mask(params):
    """True for conv/dense kernels (weight decay applies); False for
    biases / norm scales (the fastai bn-bias split)."""
    def label(path, _):
        return path[-1].key == "kernel"
    return jax.tree_util.tree_map_with_path(label, params)


def build_optimizer(opt_cfg, total_steps: int):
    """One optimizer chain from an OPTIMIZATION config block."""
    name = opt_cfg.OPTIMIZER
    lr = float(opt_cfg.LR)
    wd = float(opt_cfg.get("WEIGHT_DECAY", 0.0))
    clip = float(opt_cfg.get("GRAD_NORM_CLIP", 0.0))
    chain = []
    if clip > 0:
        chain.append(optax.clip_by_global_norm(clip))
    if name == "adam_onecycle":
        lr_sched = onecycle_lr(lr, total_steps, float(opt_cfg.PCT_START), float(opt_cfg.DIV_FACTOR))
        mom_sched = onecycle_momentum(opt_cfg.MOMS, total_steps, float(opt_cfg.PCT_START))

        @optax.inject_hyperparams
        def make(b1):
            return optax.scale_by_adam(b1=b1, b2=0.99)

        chain.append(make(b1=mom_sched))
        if wd > 0:
            chain.append(optax.add_decayed_weights(wd, mask=_kernel_mask))
        chain.append(optax.scale_by_schedule(lambda s: -lr_sched(s)))
    elif name == "adam_cosine":
        sched = with_cosine_warmup(
            optax.cosine_decay_schedule(lr, total_steps, alpha=1e-4),
            opt_cfg, total_steps)
        chain.append(optax.scale_by_adam())
        if wd > 0:
            chain.append(optax.add_decayed_weights(wd, mask=_kernel_mask))
        chain.append(optax.scale_by_schedule(lambda s: -sched(s)))
    elif name == "adam":
        decay_steps = [int(x) for x in opt_cfg.get("DECAY_STEP_LIST", [])]
        decay = float(opt_cfg.get("LR_DECAY", 0.1))
        spe = max(total_steps // max(int(opt_cfg.get("NUM_EPOCHS", 1)), 1), 1)
        bounds = {s * spe: decay for s in decay_steps}
        step_sched = optax.piecewise_constant_schedule(lr, bounds)
        sched = with_cosine_warmup(
            lambda s: jnp.maximum(step_sched(s), float(opt_cfg.get("LR_CLIP", 0.0))),
            opt_cfg, total_steps)
        chain.append(optax.scale_by_adam())
        chain.append(optax.scale_by_schedule(lambda s: -sched(s)))
    elif name == "sgd":
        chain.append(optax.trace(decay=float(opt_cfg.get("MOMENTUM", 0.9))))
        chain.append(optax.scale(-lr))
    else:
        raise NotImplementedError(name)
    return optax.chain(*chain)


OCC_SCOPE = "occ_subnet"


def occ_det_partition(params):
    """Label tree: 'occ' for parameters under the occ subnet scope, 'det'
    otherwise (mirrors the reference's `model.occ_modules` /
    `model.det_modules` optimizer split)."""
    def label(path, _):
        return "occ" if any(
            getattr(p, "key", None) == OCC_SCOPE for p in path
        ) else "det"
    return jax.tree_util.tree_map_with_path(label, params)


def build_dual_optimizer(det_cfg, occ_cfg, total_steps: int):
    """optax.multi_transform over the occ/det split; LR == 0 freezes that
    partition (reference `btcnet.py:11-12` no-grad semantics)."""
    det_tx = (
        build_optimizer(det_cfg, total_steps)
        if float(det_cfg.LR) > 0 else optax.set_to_zero()
    )
    if occ_cfg is None:
        occ_tx = det_tx
    elif float(occ_cfg.LR) > 0:
        occ_tx = build_optimizer(occ_cfg, total_steps)
    else:
        occ_tx = optax.set_to_zero()
    return optax.multi_transform({"det": det_tx, "occ": occ_tx}, occ_det_partition)
