"""Occ-subnet byte audit (VERDICT r4 next #7): trace the occ-only eval
prefix at flagship shapes on CPU (no compile) and rank jaxpr equations
by output bytes. XLA fuses much of this away, but the ranking shows
which logical tensors are big enough to matter and which dtypes they
carry — the starting list for the byte diet.

    JAX_PLATFORMS=cpu python tools/occ_bytes_audit.py [--batch_size 8]
"""

import argparse
import os
import sys
from collections import defaultdict
from pathlib import Path

os.chdir(Path(__file__).resolve().parent.parent)
sys.path.insert(0, os.getcwd())

import jax
import jax.numpy as jnp
import numpy as np


def nbytes(aval):
    try:
        return int(np.prod(aval.shape)) * aval.dtype.itemsize
    except Exception:
        return 0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch_size", type=int, default=8)
    ap.add_argument("--top", type=int, default=40)
    args = ap.parse_args()

    jax.config.update("jax_platforms", "cpu")

    from btcdet_tpu.config import cfg_from_yaml_file
    from btcdet_tpu.datasets import make_synthetic_batch
    from btcdet_tpu.models import build_network

    cfg = cfg_from_yaml_file("tools/cfgs/model_configs/btcdet_kitti_car.yaml")
    net = build_network(cfg.MODEL, cfg.DATA_CONFIG, cfg.CLASS_NAMES)
    batch = {
        k: jnp.asarray(v)
        for k, v in make_synthetic_batch(
            cfg.DATA_CONFIG, args.batch_size, 16384, 10, mode="test"
        ).items()
    }
    variables = jax.eval_shape(
        lambda: jax.jit(net.init)(jax.random.PRNGKey(0), batch)
    )
    variables = jax.tree_util.tree_map(
        lambda a: jnp.zeros(a.shape, a.dtype), variables)

    def occ_only(v, b):
        out = net.apply(v, b, train=False,
                        method=lambda m, bb, train: m.occ(bb, train=train))
        return out.get("det_voxel_features", out.get("det_voxels"))

    jaxpr = jax.make_jaxpr(occ_only)(variables, batch)

    rows = []          # (bytes, prim, shape/dtype, src)
    by_prim = defaultdict(int)

    def walk(jx, depth=0):
        for eqn in jx.eqns:
            for sub in (v for v in eqn.params.values()
                        if hasattr(v, "jaxpr")):
                walk(sub.jaxpr, depth + 1)
            if eqn.primitive.name in ("pjit", "custom_vjp_call_jaxpr",
                                      "custom_jvp_call", "remat"):
                continue
            b = sum(nbytes(ov.aval) for ov in eqn.outvars)
            by_prim[eqn.primitive.name] += b
            if b > 16 << 20:  # only track outputs > 16 MB
                shp = ", ".join(
                    f"{tuple(ov.aval.shape)}:{ov.aval.dtype}"
                    for ov in eqn.outvars)
                src = ""
                try:
                    frame = jax.core.JaxprEqnContext
                    src = str(eqn.source_info.traceback.frames[0])
                except Exception:
                    pass
                rows.append((b, eqn.primitive.name, shp, src))

    walk(jaxpr.jaxpr)

    print(f"== top {args.top} eqn outputs by bytes (B={args.batch_size}) ==")
    for b, prim, shp, src in sorted(rows, reverse=True)[: args.top]:
        print(f"{b / 1e6:9.1f} MB  {prim:28s} {shp}")

    print("\n== bytes by primitive (logical outputs, pre-fusion) ==")
    tot = 0
    for prim, b in sorted(by_prim.items(), key=lambda kv: -kv[1])[:25]:
        print(f"{b / 1e9:8.2f} GB  {prim}")
        tot += b
    print(f"{tot / 1e9:8.2f} GB  total (top-25)")


if __name__ == "__main__":
    main()
