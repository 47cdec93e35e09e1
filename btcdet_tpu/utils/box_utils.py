"""3D box utilities (lidar frame, OpenPCDet box convention).

Box format everywhere: (x, y, z, dx, dy, dz, heading[, ...]) with (x, y, z)
the geometric center and heading the rotation about +z (radians).

Mirrors the behavioral surface of the reference `btcdet/utils/box_utils.py`
and `point_box_utils.py`: corner expansion, nearest-BEV axis-aligned IoU
(used by the RPN target assigner, reference `box_utils.py:299-325`),
point-in-rotated-box tests, camera<->lidar conversions for KITTI.
Functions are jnp-first; `_np` twins exist where the CPU data pipeline
needs them.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from . import common


# ---------------------------------------------------------------- corners

_CORNER_TEMPLATE = np.array(
    [
        [1, 1, -1], [1, -1, -1], [-1, -1, -1], [-1, 1, -1],
        [1, 1, 1], [1, -1, 1], [-1, -1, 1], [-1, 1, 1],
    ],
    dtype=np.float32,
) / 2.0


def boxes_to_corners_3d(boxes3d):
    """(N, 7) -> (N, 8, 3). Corner order matches the reference
    (`box_utils.boxes_to_corners_3d`): 4 bottom corners then 4 top."""
    xp = jnp if isinstance(boxes3d, jnp.ndarray) else np
    template = xp.asarray(_CORNER_TEMPLATE)
    corners = boxes3d[:, None, 3:6] * template[None, :, :]  # (N, 8, 3)
    corners = common.rotate_points_along_z(corners, boxes3d[:, 6])
    return corners + boxes3d[:, None, 0:3]


def boxes_to_corners_bev(boxes):
    """(N, 7) -> (N, 4, 2) BEV corners (counter-clockwise in lidar frame)."""
    xp = jnp if isinstance(boxes, jnp.ndarray) else np
    half_dx = boxes[:, 3] / 2.0
    half_dy = boxes[:, 4] / 2.0
    # local corners (x, y): (+,+), (+,-), (-,-), (-,+)
    lx = xp.stack([half_dx, half_dx, -half_dx, -half_dx], axis=1)
    ly = xp.stack([half_dy, -half_dy, -half_dy, half_dy], axis=1)
    c, s = xp.cos(boxes[:, 6])[:, None], xp.sin(boxes[:, 6])[:, None]
    gx = lx * c - ly * s + boxes[:, 0:1]
    gy = lx * s + ly * c + boxes[:, 1:2]
    return xp.stack([gx, gy], axis=-1)


# ---------------------------------------------------- axis-aligned BEV IoU

def boxes3d_lidar_to_aligned_bev_boxes(boxes3d):
    """Snap rotated boxes to axis-aligned BEV rectangles by rotation
    quadrant (reference `box_utils.py:299-310`)."""
    xp = jnp if isinstance(boxes3d, jnp.ndarray) else np
    rot_angle = xp.abs(common.limit_period(boxes3d[:, 6], offset=0.5, period=np.pi))
    swap = rot_angle[:, None] >= (np.pi / 4)
    dims = xp.where(swap, boxes3d[:, [4, 3]], boxes3d[:, [3, 4]])
    return xp.concatenate(
        [boxes3d[:, 0:2] - dims / 2, boxes3d[:, 0:2] + dims / 2], axis=1
    )


def boxes_iou_normal(boxes_a, boxes_b):
    """Axis-aligned IoU. boxes: (N, 4)/(M, 4) [x1, y1, x2, y2] -> (N, M)."""
    xp = jnp if isinstance(boxes_a, jnp.ndarray) else np
    x_min = xp.maximum(boxes_a[:, 0, None], boxes_b[None, :, 0])
    x_max = xp.minimum(boxes_a[:, 2, None], boxes_b[None, :, 2])
    y_min = xp.maximum(boxes_a[:, 1, None], boxes_b[None, :, 1])
    y_max = xp.minimum(boxes_a[:, 3, None], boxes_b[None, :, 3])
    x_len = xp.clip(x_max - x_min, 0, None)
    y_len = xp.clip(y_max - y_min, 0, None)
    area_a = (boxes_a[:, 2] - boxes_a[:, 0]) * (boxes_a[:, 3] - boxes_a[:, 1])
    area_b = (boxes_b[:, 2] - boxes_b[:, 0]) * (boxes_b[:, 3] - boxes_b[:, 1])
    inter = x_len * y_len
    return inter / xp.clip(area_a[:, None] + area_b[None, :] - inter, 1e-6, None)


def boxes3d_nearest_bev_iou(boxes_a, boxes_b):
    """RPN matching IoU with MATCH_HEIGHT=False (reference
    `box_utils.py:313-325`)."""
    return boxes_iou_normal(
        boxes3d_lidar_to_aligned_bev_boxes(boxes_a),
        boxes3d_lidar_to_aligned_bev_boxes(boxes_b),
    )


# ------------------------------------------------------- points in boxes

def points_in_boxes_mask(points, boxes):
    """points: (N, 3), boxes: (M, 7) -> bool (N, M).

    A point is inside if its box-frame coordinates are within the half
    dims (z measured from box center, like the reference's GPU
    `points_in_boxes` kernel).
    """
    xp = jnp if isinstance(points, jnp.ndarray) else np
    shift = points[:, None, :3] - boxes[None, :, 0:3]  # (N, M, 3)
    c, s = xp.cos(-boxes[:, 6]), xp.sin(-boxes[:, 6])
    local_x = shift[..., 0] * c[None, :] - shift[..., 1] * s[None, :]
    local_y = shift[..., 0] * s[None, :] + shift[..., 1] * c[None, :]
    local_z = shift[..., 2]
    return (
        (xp.abs(local_x) <= boxes[None, :, 3] / 2)
        & (xp.abs(local_y) <= boxes[None, :, 4] / 2)
        & (xp.abs(local_z) <= boxes[None, :, 5] / 2)
    )


def points_in_boxes_id(points, boxes):
    """-> (N,) int32 index of the first containing box, -1 if none."""
    xp = jnp if isinstance(points, jnp.ndarray) else np
    mask = points_in_boxes_mask(points, boxes)
    any_in = xp.any(mask, axis=1)
    first = xp.argmax(mask, axis=1).astype(xp.int32)
    return xp.where(any_in, first, -1)


def enlarge_box3d(boxes3d, extra_width=(0, 0, 0)):
    xp = jnp if isinstance(boxes3d, jnp.ndarray) else np
    out_dims = boxes3d[:, 3:6] + xp.asarray(extra_width, dtype=boxes3d.dtype)[None, :]
    return xp.concatenate([boxes3d[:, 0:3], out_dims, boxes3d[:, 6:]], axis=1)


def mask_boxes_outside_range(boxes, limit_range, min_num_corners: int = 1):
    """Keep boxes with >= min_num_corners BEV corners inside range
    (reference `box_utils.mask_boxes_outside_range_numpy`)."""
    corners = boxes_to_corners_3d(boxes)  # (N, 8, 3)
    xp = jnp if isinstance(boxes, jnp.ndarray) else np
    lr = xp.asarray(limit_range)
    inside = xp.all(
        (corners[:, :, 0:2] >= lr[None, None, 0:2])
        & (corners[:, :, 0:2] <= lr[None, None, 3:5]),
        axis=2,
    )
    return inside.sum(axis=1) >= min_num_corners


# ------------------------------------------------ KITTI camera <-> lidar

def boxes3d_lidar_to_kitti_camera(boxes3d_lidar, calib):
    """(N, 7) lidar [x,y,z,dx,dy,dz,heading] -> camera [x,y,z,l,h,w,ry].

    Matches reference `box_utils.boxes3d_lidar_to_kitti_camera`: camera box
    origin is the bottom center; ry = -heading - pi/2.
    """
    boxes3d_lidar = np.asarray(boxes3d_lidar).copy()
    xyz_lidar = boxes3d_lidar[:, 0:3].copy()
    dx, dy, dz = boxes3d_lidar[:, 3:4], boxes3d_lidar[:, 4:5], boxes3d_lidar[:, 5:6]
    heading = boxes3d_lidar[:, 6:7]
    xyz_lidar[:, 2] -= dz.reshape(-1) / 2
    xyz_cam = calib.lidar_to_rect(xyz_lidar)
    ry = -heading - np.pi / 2
    return np.concatenate([xyz_cam, dx, dz, dy, ry], axis=1)


def boxes3d_kitti_camera_to_lidar(boxes3d_camera, calib):
    """(N, 7) camera [x,y,z,l,h,w,ry] -> lidar [x,y,z,dx,dy,dz,heading]."""
    boxes3d_camera = np.asarray(boxes3d_camera).copy()
    xyz_camera = boxes3d_camera[:, 0:3]
    l, h, w = boxes3d_camera[:, 3:4], boxes3d_camera[:, 4:5], boxes3d_camera[:, 5:6]
    r = boxes3d_camera[:, 6:7]
    xyz_lidar = calib.rect_to_lidar(xyz_camera)
    xyz_lidar[:, 2] += h.reshape(-1) / 2
    heading = -(r + np.pi / 2)
    return np.concatenate([xyz_lidar, l, w, h, heading], axis=1)


def boxes3d_kitti_camera_to_imageboxes(boxes3d, calib, image_shape=None):
    """camera boxes -> 2D image boxes [x1, y1, x2, y2] by projecting the 8
    corners (reference `box_utils.boxes3d_kitti_camera_to_imageboxes`)."""
    boxes3d = np.asarray(boxes3d)
    corners3d = _camera_box_corners(boxes3d)  # (N, 8, 3)
    pts_img, _ = calib.rect_to_img(corners3d.reshape(-1, 3))
    corners_img = pts_img.reshape(-1, 8, 2)
    min_uv = corners_img.min(axis=1)
    max_uv = corners_img.max(axis=1)
    boxes2d = np.concatenate([min_uv, max_uv], axis=1)
    if image_shape is not None:
        boxes2d[:, 0] = np.clip(boxes2d[:, 0], 0, image_shape[1] - 1)
        boxes2d[:, 1] = np.clip(boxes2d[:, 1], 0, image_shape[0] - 1)
        boxes2d[:, 2] = np.clip(boxes2d[:, 2], 0, image_shape[1] - 1)
        boxes2d[:, 3] = np.clip(boxes2d[:, 3], 0, image_shape[0] - 1)
    return boxes2d


def _camera_box_corners(boxes3d):
    """KITTI camera-frame boxes (x,y,z,l,h,w,ry), origin bottom-center."""
    l, h, w = boxes3d[:, 3], boxes3d[:, 4], boxes3d[:, 5]
    x_c = np.array([1, 1, -1, -1, 1, 1, -1, -1], dtype=np.float32)
    y_c = np.array([0, 0, 0, 0, -1, -1, -1, -1], dtype=np.float32)
    z_c = np.array([1, -1, -1, 1, 1, -1, -1, 1], dtype=np.float32)
    corners = np.stack(
        [
            l[:, None] / 2 * x_c[None],
            h[:, None] * y_c[None],
            w[:, None] / 2 * z_c[None],
        ],
        axis=-1,
    )  # (N, 8, 3)
    ry = boxes3d[:, 6]
    c, s = np.cos(ry), np.sin(ry)
    rot = np.stack(
        [c, np.zeros_like(c), s, np.zeros_like(c), np.ones_like(c), np.zeros_like(c), -s, np.zeros_like(c), c],
        axis=-1,
    ).reshape(-1, 3, 3)
    corners = np.matmul(corners, rot.transpose(0, 2, 1))
    return corners + boxes3d[:, None, 0:3]
