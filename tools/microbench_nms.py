"""Microbench: proposal-NMS stage at eval/train shapes — rounds vs
chunked greedy, plus the top_k pre-selection alone (to see where the
4.1 ms/frame at B=8 actually lives; profile_40k_b8.log line
"+ proposal NMS").

    python tools/microbench_nms.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.chdir(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from btcdet_tpu.ops import iou3d


def timeit(name, fn, *args, iters=10):
    @jax.jit
    def red(*a):
        leaves = jax.tree_util.tree_leaves(fn(*a))
        return sum(l.sum().astype(jnp.float32) for l in leaves)

    _ = jax.device_get(red(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = red(*args)
    _ = jax.device_get(out)
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:46s} {dt*1000:8.2f} ms", flush=True)
    return dt


def main():
    B, A = 8, 70400
    rng = np.random.RandomState(0)
    boxes = np.stack([
        rng.uniform(0, 70, (B, A)), rng.uniform(-40, 40, (B, A)),
        np.zeros((B, A)),
        rng.uniform(2, 5, (B, A)), rng.uniform(1, 3, (B, A)),
        np.ones((B, A)),
        rng.uniform(-np.pi, np.pi, (B, A)),
    ], axis=-1).astype(np.float32)
    scores = rng.rand(B, A).astype(np.float32)
    valid = np.ones((B, A), bool)
    jb, js, jv = jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray(valid)

    def topk_only(s):
        return jax.vmap(lambda x: jax.lax.top_k(x, 1024)[0])(s)

    timeit("top_k 70400->1024 x8 (vmap)", topk_only, js)

    def nms_loop(impl, pre, post, thresh, pre_select="sort"):
        def f(b, s, v):
            outs = []
            for i in range(B):
                idx, keep = iou3d.nms_rotated(
                    b[i], s[i], v[i], thresh=thresh,
                    pre_max_size=pre, post_max_size=post, impl=impl,
                    pre_select=pre_select)
                outs.append((idx, keep))
            return outs
        return f

    for impl, ps in (("rounds", "sort"), ("rounds", "radix"),
                     ("chunked", "sort")):
        timeit(f"eval proposal NMS x8 [{impl}/{ps}] (pre1024 post100)",
               nms_loop(impl, 1024, 100, 0.7, ps), jb, js, jv, iters=5)
    for impl, ps in (("rounds", "sort"), ("rounds", "radix"),
                     ("chunked", "sort")):
        timeit(f"train proposal NMS x8 [{impl}/{ps}] (pre9000 post256)",
               nms_loop(impl, 9000, 256, 0.8, ps), jb, js, jv, iters=3)

    def nms_vmap(pre, post, thresh):
        def f(b, s, v):
            return jax.vmap(lambda bb, ss, vv: iou3d.nms_rotated(
                bb, ss, vv, thresh=thresh, pre_max_size=pre,
                post_max_size=post, impl="rounds"))(b, s, v)
        return f

    timeit("eval proposal NMS vmap-rounds (pre1024 post100)",
           nms_vmap(1024, 100, 0.7), jb, js, jv, iters=5)
    timeit("train proposal NMS vmap-rounds (pre9000 post256)",
           nms_vmap(9000, 256, 0.8), jb, js, jv, iters=3)

    # sanity: same survivors on frame 0
    a = iou3d.nms_rotated(jb[0], js[0], jv[0], thresh=0.7,
                          pre_max_size=1024, post_max_size=100, impl="rounds")
    b = iou3d.nms_rotated(jb[0], js[0], jv[0], thresh=0.7,
                          pre_max_size=1024, post_max_size=100, impl="chunked")
    ai = np.asarray(a[0])[np.asarray(a[1])]
    bi = np.asarray(b[0])[np.asarray(b[1])]
    assert np.array_equal(ai, bi), (ai[:20], bi[:20])
    print("survivor sets match", flush=True)


if __name__ == "__main__":
    main()
