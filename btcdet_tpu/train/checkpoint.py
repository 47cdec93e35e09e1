"""Checkpoint I/O (reference `train_utils.py:272-317`,
`detector3d_template.py:594-678`) on orbax.

Keeps the reference's semantics:
  - save {step, params, batch_stats, opt_state} with rotation keeping
    `max_ckpt_save_num`
  - full resume (params + both optimizer partitions)
  - prefix-filtered partial load (--pre_occ / --pre_det): only params
    under / not under the occ subnet scope, shapes must match
"""

from __future__ import annotations

from pathlib import Path

import jax
import numpy as np
import orbax.checkpoint as ocp

from .optim import OCC_SCOPE


class CheckpointManager:
    def __init__(self, ckpt_dir, max_to_keep: int = 30):
        self.ckpt_dir = Path(ckpt_dir).resolve()
        self.ckpt_dir.mkdir(parents=True, exist_ok=True)
        self.mgr = ocp.CheckpointManager(
            self.ckpt_dir,
            options=ocp.CheckpointManagerOptions(max_to_keep=max_to_keep, create=True),
        )

    def save(self, step: int, state):
        self.mgr.save(step, args=ocp.args.StandardSave(state._asdict()))
        self.mgr.wait_until_finished()

    def latest_step(self):
        return self.mgr.latest_step()

    def restore(self, state_template, step=None):
        step = step if step is not None else self.mgr.latest_step()
        if step is None:
            return None, None
        restored = self.mgr.restore(
            step, args=ocp.args.StandardRestore(state_template._asdict())
        )
        return type(state_template)(**restored), step


def _filter_by_prefix(saved_params, target_params, want_occ: bool):
    """Partial load: copy leaves whose path is (not) under the occ scope
    and whose shapes match (reference `load_params_from_file:594-618`)."""
    flat_saved = dict(jax.tree_util.tree_flatten_with_path(saved_params)[0])
    out = []
    n_loaded = 0
    flat_target = jax.tree_util.tree_flatten_with_path(target_params)
    for path, leaf in flat_target[0]:
        in_occ = any(getattr(p, "key", None) == OCC_SCOPE for p in path)
        src = flat_saved.get(path)
        if (
            src is not None
            and in_occ == want_occ
            and np.shape(src) == np.shape(leaf)
        ):
            out.append(src)
            n_loaded += 1
        else:
            out.append(leaf)
    tree = jax.tree_util.tree_unflatten(flat_target[1], out)
    return tree, n_loaded


def load_partial(ckpt_dir, state, want_occ: bool, step=None):
    """Load only the occ (or det) parameter partition from a checkpoint
    into `state` (staged-training support, reference `--pre_occ/--pre_det`)."""
    mgr = CheckpointManager(ckpt_dir)
    restored, step = mgr.restore(state, step)
    if restored is None:
        return state, 0
    params, n = _filter_by_prefix(restored.params, state.params, want_occ)
    bs, _ = _filter_by_prefix(restored.batch_stats, state.batch_stats, want_occ)
    return state._replace(params=params, batch_stats=bs), n
