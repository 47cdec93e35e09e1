"""Focused B=8 stage profile: five prefix probes bracket the per-frame
cost of each major stage at the bench batch size (the full
profile_stages.py sweep runs B=1 and takes ~1h; this answers "where do
the 64 ms/frame go at B=8" in ~15 min)."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.chdir(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from btcdet_tpu.config import cfg_from_yaml_file
from btcdet_tpu.datasets import make_synthetic_batch
from btcdet_tpu.models import build_network
from btcdet_tpu.models.detectors.btcnet import post_processing


def timeit(name, fn, *args, iters=6):
    @jax.jit
    def red(*a):
        leaves = jax.tree_util.tree_leaves(fn(*a))
        return sum(l.sum().astype(jnp.float32) for l in leaves if hasattr(l, "dtype"))

    _ = jax.device_get(red(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = red(*args)
    _ = jax.device_get(out)
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:30s} {dt*1000:9.1f} ms", flush=True)
    return dt


def main(B=8):
    cfg = cfg_from_yaml_file("tools/cfgs/model_configs/btcdet_kitti_car.yaml")
    net = build_network(cfg.MODEL, cfg.DATA_CONFIG, cfg.CLASS_NAMES)
    batch = {k: jnp.asarray(v) for k, v in make_synthetic_batch(
        cfg.DATA_CONFIG, B, 16384, 10, mode="test").items()}
    rngs = {"params": jax.random.PRNGKey(0), "sampling": jax.random.PRNGKey(1),
            "dropout": jax.random.PRNGKey(2)}
    variables = jax.jit(lambda r, b: net.init(r, b, train=False))(rngs, batch)
    print("params ready", flush=True)

    def prefix(key):
        @jax.jit
        def f(v, b):
            return net.apply(v, b, train=False)[key]
        return f

    @jax.jit
    def full(v, b):
        out = net.apply(v, b, train=False)
        return post_processing(out, cfg.MODEL.POST_PROCESSING, 1)["pred_scores"]

    ts = {}
    ts["full"] = timeit("FULL eval forward", full, variables, batch)
    for key, label in [
        ("occ_points", "occ + topk"),
        ("encoded_features", "+ merge + det 3D bb"),
        ("rois", "+ BEV/RPN + proposal NMS"),
        ("batch_box_preds", "+ ConvHead"),
    ]:
        ts[key] = timeit(f"prefix: {label}", prefix(key), variables, batch)

    print("\nper-frame deltas (ms):")
    print(f"  occ+topk            {ts['occ_points']/B*1000:7.2f}")
    print(f"  merge+det3Dbb       {(ts['encoded_features']-ts['occ_points'])/B*1000:7.2f}")
    print(f"  BEV/RPN+propNMS     {(ts['rois']-ts['encoded_features'])/B*1000:7.2f}")
    print(f"  ConvHead            {(ts['batch_box_preds']-ts['rois'])/B*1000:7.2f}")
    print(f"  finalNMS+post       {(ts['full']-ts['batch_box_preds'])/B*1000:7.2f}")
    print(f"  TOTAL/frame         {ts['full']/B*1000:7.2f}")


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 8)
