"""btcdet_tpu: a TPU-native (JAX/XLA/Pallas) rebuild of the BtcDet LiDAR 3D
object detector ("Behind the Curtain", AAAI-2022).

This is a from-scratch framework, not a port: the compute path is pure
JAX/XLA with Pallas kernels for the hot ops, sparse convolution is a
gather-GEMM engine over static-capacity voxel tables, and multi-chip
scaling uses `jax.sharding.Mesh` + `shard_map` data parallelism over ICI.

Layer map mirrors the reference's public surface (see SURVEY.md §1):
  config        YAML + _BASE_CONFIG_ inheritance + dotted CLI overrides
  datasets      KITTI reader, augmentor, processor, offline info/bm tools
  ops           voxelizer, sparse conv engine, rotated IoU/NMS, grouping
  models        occ subnet + detection subnet, name-registry assembly
  train         optax dual-optimizer trainer, OneCycle, orbax checkpoints
  eval          official KITTI AP metric (numpy/numba)
  parallel      device-mesh utilities (DP over ICI)
"""

__version__ = "0.1.0"

# Make JAX_PLATFORMS effective even when a site plugin force-registers
# its own platform during backend init (the env var alone is overridden
# in that case; jax.config is not). No-op when the var is unset.
import os as _os

if _os.environ.get("JAX_PLATFORMS"):
    import jax as _jax

    try:
        _jax.config.update("jax_platforms", _os.environ["JAX_PLATFORMS"])
    except Exception:
        pass
