"""Device-mesh + multi-host utilities.

TPU-native replacement for the reference's NCCL/torch.distributed layer
(`btcdet/utils/common_utils.py:114-195`):

  init_dist_pytorch/init_dist_slurm -> jax.distributed.initialize (the
      JAX runtime handles rendezvous; on a pod slice each host sees its
      local chips and the global mesh spans ICI)
  DDP gradient allreduce            -> GSPMD inserts psum when the train
      step is jitted with dp-sharded batches (see train/trainer.py)
  merge_results_dist (filesystem pickle gather) ->
      multihost per-process gather via process_allgather when available,
      with the reference's shared-filesystem pickle fallback
"""

from __future__ import annotations

import pickle
import time
from pathlib import Path

import jax
import numpy as np
from jax.sharding import Mesh


def init_distributed(coordinator_address=None, num_processes=None, process_id=None):
    """Initialize the JAX distributed runtime (multi-host). Single-host
    callers may skip this entirely."""
    if num_processes is None or num_processes <= 1:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def get_dist_info():
    """(rank, world_size) in processes (reference `get_dist_info`)."""
    return jax.process_index(), jax.process_count()


def make_mesh(axis_names=("dp",), devices=None) -> Mesh:
    """1-D data-parallel mesh over all devices by default. For hybrid
    ICI/DCN topologies pass a reshaped device array and more axis names."""
    devices = np.asarray(devices if devices is not None else jax.devices())
    if len(axis_names) == 1:
        return Mesh(devices, axis_names)
    return Mesh(devices.reshape([-1] + [1] * (len(axis_names) - 1)), axis_names)


def merge_results_dist(result_part, size: int, tmpdir):
    """Gather per-process python results to process 0 (reference
    `common_utils.merge_results_dist:174-195`: barrier -> per-rank pickle
    on a shared filesystem -> rank-0 gather). Kept filesystem-based since
    eval results are arbitrary python objects."""
    rank, world = get_dist_info()
    if world == 1:
        return result_part[:size]
    tmpdir = Path(tmpdir)
    tmpdir.mkdir(parents=True, exist_ok=True)
    with open(tmpdir / f"result_part_{rank}.pkl", "wb") as f:
        pickle.dump(result_part, f)
    # barrier via the jax runtime
    from jax.experimental import multihost_utils

    multihost_utils.sync_global_devices("merge_results_dist")
    if rank != 0:
        return None
    parts = []
    for i in range(world):
        path = tmpdir / f"result_part_{i}.pkl"
        for _ in range(600):
            if path.exists():
                break
            time.sleep(0.1)
        with open(path, "rb") as f:
            parts.append(pickle.load(f))
    # round-robin interleave (matches the distributed sampler's striding)
    ordered = []
    for chunk in zip(*parts):
        ordered.extend(chunk)
    return ordered[:size]
