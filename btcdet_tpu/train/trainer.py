"""Training step + loop (reference `tools/train_utils/train_utils.py`).

TPU design: one jitted `train_step` over a `jax.sharding.Mesh` -- batch
arrays are sharded on their leading axis over the `dp` mesh axis, params
replicated; XLA GSPMD inserts the gradient all-reduce (the reference's
DDP/NCCL allreduce, SURVEY.md §2.7). One loss, one backward, the
occ/det dual optimizer applies per-partition clipping and schedules.
"""

from __future__ import annotations

import functools
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from . import optim


class TrainState(NamedTuple):
    step: jax.Array
    params: Any
    batch_stats: Any
    opt_state: Any


def create_train_state(net, batch, rng, det_opt_cfg, occ_opt_cfg, total_steps: int):
    rngs = {"params": rng, "sampling": jax.random.fold_in(rng, 1),
            "dropout": jax.random.fold_in(rng, 2)}
    # jit the init: eager init dispatches thousands of individual ops
    # (catastrophic over the tunneled-TPU transport)
    variables = jax.jit(lambda r, b: net.init(r, b, train=True))(rngs, batch)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    tx = optim.build_dual_optimizer(det_opt_cfg, occ_opt_cfg, total_steps)
    opt_state = tx.init(params)
    return TrainState(jnp.zeros((), jnp.int32), params, batch_stats, opt_state), tx


def make_train_step(net, tx, frozen: tuple = ()):
    """`frozen` names partitions ('occ'/'det') whose LR is 0: their
    params are stop-gradient'd inside the loss so XLA dead-code
    eliminates that subnet's entire backward pass (the reference's
    `LR==0 -> no_grad` staged-training semantics, btcnet.py:42-48) --
    instead of computing gradients and multiplying them by zero."""
    def train_step(state: TrainState, batch: dict, rng):
        r1, r2 = jax.random.split(jax.random.fold_in(rng, state.step))

        def loss_fn(params):
            if frozen:
                labels = optim.occ_det_partition(params)
                params = jax.tree_util.tree_map(
                    lambda p, l: jax.lax.stop_gradient(p) if l in frozen else p,
                    params, labels,
                )
            out, mut = net.apply(
                {"params": params, "batch_stats": state.batch_stats},
                batch, train=True,
                rngs={"sampling": r1, "dropout": r2},
                mutable=["batch_stats"],
            )
            return out["loss"], (out, mut)

        (loss, (out, mut)), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = jax.tree_util.tree_map(
            lambda p, u: p + u, state.params, updates
        )
        new_state = TrainState(
            state.step + 1, new_params, mut.get("batch_stats", state.batch_stats), new_opt
        )
        metrics = {"loss": loss}
        metrics.update({k: v for k, v in out.get("loss_dict", {}).items()})
        return new_state, metrics

    return train_step


def frozen_partitions(det_opt_cfg, occ_opt_cfg) -> tuple:
    """Partitions with LR == 0 (reference staged training: `--pre_occ`
    then OCC_OPTIMIZATION.LR: 0.0 freezes the occ subnet)."""
    out = []
    if det_opt_cfg is not None and float(det_opt_cfg.LR) == 0.0:
        out.append("det")
    if occ_opt_cfg is not None and float(occ_opt_cfg.LR) == 0.0:
        out.append("occ")
    return tuple(out)


def make_data_parallel_train_step(net, tx, mesh: Mesh, frozen: tuple = ()):
    """jit the train step with batch leading-axis sharding over `dp`;
    GSPMD handles the rest (gradient psum, replicated params)."""
    step_fn = make_train_step(net, tx, frozen=frozen)
    repl = NamedSharding(mesh, P())
    shard0 = NamedSharding(mesh, P("dp"))
    cache = {}

    def run(state, batch, rng):
        key = tuple(sorted(batch.keys()))
        if key not in cache:
            cache[key] = jax.jit(
                step_fn,
                in_shardings=(
                    jax.tree_util.tree_map(lambda _: repl, state),
                    {k: shard0 for k in batch},
                    repl,
                ),
            )
        return cache[key](state, batch, rng)

    return run


def shard_batch(batch, mesh: Mesh):
    """Device-put host batch with leading-axis dp sharding."""
    s = NamedSharding(mesh, P("dp"))
    return {k: jax.device_put(v, s) for k, v in batch.items()}
