"""Rotated IoU / NMS vs brute-force rasterized reference
(SURVEY.md §4 implication (a))."""

import numpy as np

from btcdet_tpu.ops import iou3d
from btcdet_tpu.utils import box_utils


def raster_iou_bev(box_a, box_b, res=0.02):
    """Monte-Carlo-free brute force: rasterize both rotated rects."""
    corners = np.concatenate([
        np.asarray(box_utils.boxes_to_corners_bev(box_a[None])[0]),
        np.asarray(box_utils.boxes_to_corners_bev(box_b[None])[0]),
    ])
    lo = corners.min(0) - res
    hi = corners.max(0) + res
    xs = np.arange(lo[0], hi[0], res)
    ys = np.arange(lo[1], hi[1], res)
    gx, gy = np.meshgrid(xs, ys)
    pts = np.stack([gx.ravel(), gy.ravel()], -1)

    def inside(box):
        d = pts - box[:2]
        c, s = np.cos(-box[6]), np.sin(-box[6])
        lx = d[:, 0] * c - d[:, 1] * s
        ly = d[:, 0] * s + d[:, 1] * c
        return (np.abs(lx) <= box[3] / 2) & (np.abs(ly) <= box[4] / 2)

    ia, ib = inside(box_a), inside(box_b)
    cell = res * res
    inter = (ia & ib).sum() * cell
    union = (ia | ib).sum() * cell
    return inter / max(union, 1e-9)


def random_boxes(rng, n):
    return np.stack([
        rng.uniform(-2, 2, n), rng.uniform(-2, 2, n), rng.uniform(-1, 1, n),
        rng.uniform(0.5, 3, n), rng.uniform(0.5, 2, n), rng.uniform(0.5, 2, n),
        rng.uniform(-np.pi, np.pi, n),
    ], axis=1).astype(np.float32)


def test_rotated_bev_iou_matches_raster():
    rng = np.random.RandomState(0)
    boxes_a = random_boxes(rng, 12)
    boxes_b = random_boxes(rng, 12)
    got = np.asarray(iou3d.boxes_iou_bev(boxes_a, boxes_b))
    for i in range(12):
        for j in range(12):
            ref = raster_iou_bev(boxes_a[i], boxes_b[j])
            assert abs(got[i, j] - ref) < 0.02, (i, j, got[i, j], ref)


def test_identical_boxes_iou_one():
    rng = np.random.RandomState(1)
    boxes = random_boxes(rng, 8)
    got = np.asarray(iou3d.boxes_iou_bev(boxes, boxes))
    np.testing.assert_allclose(np.diag(got), 1.0, atol=1e-3)
    got3d = np.asarray(iou3d.boxes_iou3d(boxes, boxes))
    np.testing.assert_allclose(np.diag(got3d), 1.0, atol=1e-3)


def test_disjoint_boxes_iou_zero():
    a = np.array([[0, 0, 0, 1, 1, 1, 0.3]], np.float32)
    b = np.array([[10, 10, 0, 1, 1, 1, -0.7]], np.float32)
    assert float(iou3d.boxes_iou_bev(a, b)[0, 0]) == 0.0


def test_axis_aligned_case_exact():
    # unrotated boxes: compare against simple rectangle intersection
    a = np.array([[0, 0, 0, 2, 2, 2, 0.0]], np.float32)
    b = np.array([[1, 1, 0, 2, 2, 2, 0.0]], np.float32)
    # overlap = 1x1 = 1; union = 4 + 4 - 1 = 7
    got = float(iou3d.boxes_iou_bev(a, b)[0, 0])
    assert abs(got - 1.0 / 7.0) < 1e-4


def test_nms_rotated():
    import jax.numpy as jnp

    boxes = np.array([
        [0, 0, 0, 4, 2, 1.5, 0.0],     # score .9 keep
        [0.1, 0.05, 0, 4, 2, 1.5, 0.02],  # heavy overlap w/ 0 -> suppressed
        [10, 10, 0, 4, 2, 1.5, 1.0],   # keep
        [0.2, 0, 0, 4, 2, 1.5, 1.57],  # cross overlap ~ low -> keep at .7
        [20, 0, 0, 4, 2, 1.5, 0.5],    # keep
    ], np.float32)
    scores = np.array([0.9, 0.8, 0.7, 0.6, 0.5], np.float32)
    valid = np.ones(5, bool)
    idx, vmask = iou3d.nms_rotated(
        jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray(valid),
        thresh=0.7, pre_max_size=8, post_max_size=4,
    )
    kept = set(np.asarray(idx)[np.asarray(vmask)].tolist())
    assert 0 in kept and 1 not in kept
    assert 2 in kept and 4 in kept

    # invalid rows never selected
    valid2 = valid.copy()
    valid2[0] = False
    idx2, v2 = iou3d.nms_rotated(
        jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray(valid2),
        thresh=0.7, pre_max_size=8, post_max_size=4,
    )
    kept2 = set(np.asarray(idx2)[np.asarray(v2)].tolist())
    assert 0 not in kept2 and 1 in kept2


def test_chunked_nms_matches_direct():
    import jax.numpy as jnp

    rng = np.random.RandomState(7)
    n = 300
    boxes = np.stack([
        rng.uniform(0, 30, n), rng.uniform(0, 30, n), np.zeros(n),
        rng.uniform(2, 5, n), rng.uniform(1, 3, n), np.ones(n),
        rng.uniform(-np.pi, np.pi, n),
    ], axis=1).astype(np.float32)
    scores = rng.rand(n).astype(np.float32)
    valid = rng.rand(n) > 0.1

    direct = iou3d.nms_rotated(
        jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray(valid),
        thresh=0.3, pre_max_size=300, post_max_size=64, chunk_size=4096,
        impl="chunked",
    )
    chunked = iou3d.nms_rotated(
        jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray(valid),
        thresh=0.3, pre_max_size=300, post_max_size=64, chunk_size=64,
        impl="chunked",
    )
    rounds = iou3d.nms_rotated(
        jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray(valid),
        thresh=0.3, pre_max_size=300, post_max_size=64,
    )
    d_idx = np.asarray(direct[0])[np.asarray(direct[1])]
    c_idx = np.asarray(chunked[0])[np.asarray(chunked[1])]
    r_idx = np.asarray(rounds[0])[np.asarray(rounds[1])]
    np.testing.assert_array_equal(d_idx, c_idx)
    np.testing.assert_array_equal(d_idx, r_idx)


def test_rounds_nms_matches_chunked_random():
    """The survivor-paced rounds NMS must reproduce the chunked greedy
    result exactly, including pre-cap truncation and many-survivor
    cases (post cap binding)."""
    import jax.numpy as jnp

    rng = np.random.RandomState(11)
    for n, pre, post, thr in ((500, 256, 32, 0.1), (400, 400, 200, 0.7)):
        boxes = np.stack([
            rng.uniform(0, 60, n), rng.uniform(0, 60, n), np.zeros(n),
            rng.uniform(2, 5, n), rng.uniform(1, 3, n), np.ones(n),
            rng.uniform(-np.pi, np.pi, n),
        ], axis=1).astype(np.float32)
        scores = rng.rand(n).astype(np.float32)
        valid = rng.rand(n) > 0.1
        a = iou3d.nms_rotated(
            jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray(valid),
            thresh=thr, pre_max_size=pre, post_max_size=post, impl="chunked")
        b = iou3d.nms_rotated(
            jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray(valid),
            thresh=thr, pre_max_size=pre, post_max_size=post)
        a_idx = np.asarray(a[0])[np.asarray(a[1])]
        b_idx = np.asarray(b[0])[np.asarray(b[1])]
        np.testing.assert_array_equal(a_idx, b_idx)
        c = iou3d.nms_rotated(
            jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray(valid),
            thresh=thr, pre_max_size=pre, post_max_size=post,
            pre_select="radix")
        c_idx = np.asarray(c[0])[np.asarray(c[1])]
        np.testing.assert_array_equal(a_idx, c_idx)
