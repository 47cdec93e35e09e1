"""Geometry golden tests: coder round-trips, coordinate inverse
consistency (SURVEY §4 implication (a))."""

import jax.numpy as jnp
import numpy as np

from btcdet_tpu.utils import box_coder, box_utils, common, coords


def random_boxes(rng, n):
    return np.stack([
        rng.uniform(0, 60, n), rng.uniform(-30, 30, n), rng.uniform(-2, 0, n),
        rng.uniform(1, 5, n), rng.uniform(1, 3, n), rng.uniform(1, 2, n),
        rng.uniform(-np.pi, np.pi, n),
    ], axis=1).astype(np.float32)


def test_residual_coder_roundtrip():
    rng = np.random.RandomState(0)
    boxes = jnp.asarray(random_boxes(rng, 64))
    anchors = jnp.asarray(random_boxes(rng, 64))
    for coder in (box_coder.ResidualCoder(),
                  box_coder.ResidualCoder(encode_angle_by_sincos=True)):
        enc = coder.encode(boxes, anchors)
        dec = coder.decode(enc, anchors)
        np.testing.assert_allclose(np.asarray(dec[:, :6]), np.asarray(boxes[:, :6]),
                                   rtol=1e-4, atol=1e-4)
        dr = common.limit_period(np.asarray(dec[:, 6] - boxes[:, 6]), 0.5, 2 * np.pi)
        np.testing.assert_allclose(dr, 0.0, atol=1e-4)


def test_point_residual_coder_roundtrip():
    rng = np.random.RandomState(1)
    boxes = jnp.asarray(random_boxes(rng, 32))
    pts = boxes[:, :3] + jnp.asarray(rng.uniform(-1, 1, (32, 3)).astype(np.float32))
    coder = box_coder.PointResidualCoder()
    dec = coder.decode(coder.encode(boxes, pts), pts)
    np.testing.assert_allclose(np.asarray(dec[:, :6]), np.asarray(boxes[:, :6]),
                               rtol=1e-4, atol=1e-4)


def test_cylinder_inverse():
    rng = np.random.RandomState(2)
    pts = rng.uniform([1, -30, -3], [60, 30, 1], (128, 3)).astype(np.float32)
    cyl = np.asarray(coords.absxyz_to_cylinder(pts))
    back = np.asarray(coords.cylinder_to_absxyz(cyl[:, 0], cyl[:, 1], cyl[:, 2]))
    np.testing.assert_allclose(back, pts, rtol=1e-4, atol=1e-4)


def test_sphere_inverse():
    rng = np.random.RandomState(3)
    pts = rng.uniform([1, -30, -3], [60, 30, 1], (128, 3)).astype(np.float32)
    sph = np.asarray(coords.absxyz_to_sphere(pts))
    back = np.asarray(coords.sphere_to_absxyz(sph[:, 0], sph[:, 1], sph[:, 2]))
    np.testing.assert_allclose(back, pts, rtol=1e-3, atol=1e-3)


def test_rotate_points_inverse():
    rng = np.random.RandomState(4)
    pts = rng.randn(4, 32, 3).astype(np.float32)
    ang = rng.uniform(-np.pi, np.pi, 4).astype(np.float32)
    rot = common.rotate_points_along_z(jnp.asarray(pts), jnp.asarray(ang))
    back = common.rotate_points_along_z(rot, jnp.asarray(-ang))
    np.testing.assert_allclose(np.asarray(back), pts, rtol=1e-4, atol=1e-4)


def test_corners_consistent_with_points_in_boxes():
    rng = np.random.RandomState(5)
    boxes = random_boxes(rng, 8)
    corners = np.asarray(box_utils.boxes_to_corners_3d(jnp.asarray(boxes)))
    # shrunken corners lie inside the box; expanded lie outside
    ctr = boxes[:, None, :3]
    inner = ctr + (corners - ctr) * 0.99
    outer = ctr + (corners - ctr) * 1.01
    for i in range(8):
        m_in = np.asarray(box_utils.points_in_boxes_mask(
            jnp.asarray(inner[i]), jnp.asarray(boxes[i: i + 1])))
        m_out = np.asarray(box_utils.points_in_boxes_mask(
            jnp.asarray(outer[i]), jnp.asarray(boxes[i: i + 1])))
        assert m_in.all() and not m_out.any()


def test_camera_lidar_box_roundtrip():
    class FakeCalib:
        def lidar_to_rect(self, p):
            return np.stack([-p[:, 1], -p[:, 2], p[:, 0]], axis=1)

        def rect_to_lidar(self, p):
            return np.stack([p[:, 2], -p[:, 0], -p[:, 1]], axis=1)

    rng = np.random.RandomState(6)
    boxes = random_boxes(rng, 16)
    calib = FakeCalib()
    cam = box_utils.boxes3d_lidar_to_kitti_camera(boxes, calib)
    back = box_utils.boxes3d_kitti_camera_to_lidar(cam, calib)
    np.testing.assert_allclose(back[:, :6], boxes[:, :6], rtol=1e-4, atol=1e-4)
    dr = common.limit_period_np(back[:, 6] - boxes[:, 6], 0.5, 2 * np.pi)
    np.testing.assert_allclose(dr, 0.0, atol=1e-4)
