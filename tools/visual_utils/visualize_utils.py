"""Headless scene-drawing helpers (numpy + matplotlib).

TPU-native rebuild of the reference's mayavi helpers
(`/root/reference/tools/visual_utils/visualize_utils.py:13-254`):
`rotate_points_along_z`, `boxes_to_corners_3d`, `draw_scenes`,
`draw_scenes_multi`, `draw_corners3d`. mayavi is an interactive GL
viewer; here every drawer renders to a matplotlib figure (BEV and/or
3D projection) and returns it, so scenes can be saved as PNG from a
headless job or streamed to tensorboard.
"""

import numpy as np

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402
from mpl_toolkits.mplot3d.art3d import Line3DCollection  # noqa: E402

box_colormap = [
    (1.0, 1.0, 1.0),
    (0.0, 1.0, 0.0),
    (0.0, 1.0, 1.0),
    (1.0, 1.0, 0.0),
]


def check_numpy(x):
    """reference `visualize_utils.py:13` (torch->numpy shim; here all
    inputs are numpy/JAX arrays so we just materialise)."""
    return np.asarray(x)


def rotate_points_along_z(points, angle):
    """points: (B, N, 3+C), angle: (B,) radians.
    reference `visualize_utils.py:19`."""
    points = check_numpy(points)
    angle = check_numpy(angle)
    cosa, sina = np.cos(angle), np.sin(angle)
    zeros, ones = np.zeros_like(cosa), np.ones_like(cosa)
    rot = np.stack(
        [cosa, sina, zeros, -sina, cosa, zeros, zeros, zeros, ones], axis=1
    ).reshape(-1, 3, 3)
    out = np.matmul(points[:, :, :3], rot)
    return np.concatenate([out, points[:, :, 3:]], axis=-1)


def boxes_to_corners_3d(boxes3d):
    """(N, 7) [x,y,z,dx,dy,dz,yaw] -> (N, 8, 3).
    reference `visualize_utils.py:44`."""
    boxes3d = check_numpy(boxes3d)
    template = (
        np.array(
            [
                [1, 1, -1], [1, -1, -1], [-1, -1, -1], [-1, 1, -1],
                [1, 1, 1], [1, -1, 1], [-1, -1, 1], [-1, 1, 1],
            ],
            dtype=np.float32,
        )
        / 2.0
    )
    corners = boxes3d[:, None, 3:6] * template[None]
    corners = rotate_points_along_z(corners, boxes3d[:, 6])
    return corners + boxes3d[:, None, 0:3]


def _corner_segments(corners):
    """(8,3) box corners -> list of 12 edge segments."""
    edges = [
        (0, 1), (1, 2), (2, 3), (3, 0),
        (4, 5), (5, 6), (6, 7), (7, 4),
        (0, 4), (1, 5), (2, 6), (3, 7),
    ]
    return [(corners[a], corners[b]) for a, b in edges]


def draw_corners3d(ax, corners3d, color=(1, 1, 1), label="", scores=None):
    """Draw (N, 8, 3) wireframe boxes on a 3D axis.
    reference `visualize_utils.py:243`."""
    segs = []
    for k in range(corners3d.shape[0]):
        segs.extend(_corner_segments(corners3d[k]))
    if segs:
        ax.add_collection3d(Line3DCollection(segs, colors=[color], linewidths=1.0))
    if scores is not None:
        for k in range(corners3d.shape[0]):
            c = corners3d[k].mean(axis=0)
            ax.text(c[0], c[1], c[2], f"{float(scores[k]):.2f}", color=color, fontsize=6)
    return ax


def _draw_boxes_bev(ax, boxes, color, scores=None):
    corners = boxes_to_corners_3d(boxes)[:, :4, :2]  # bottom face
    for k in range(corners.shape[0]):
        poly = np.concatenate([corners[k], corners[k][:1]], axis=0)
        ax.plot(poly[:, 0], poly[:, 1], color=color, linewidth=0.8)
        if scores is not None:
            ax.text(
                corners[k, :, 0].mean(), corners[k, :, 1].mean(),
                f"{float(scores[k]):.2f}", color=color, fontsize=6,
            )


def draw_multi_grid_range(ax, grid_size=20, bv_range=(-60, -60, 60, 60)):
    """BEV grid lines. reference `visualize_utils.py:135`."""
    x0, y0, x1, y1 = bv_range
    for x in range(int(x0), int(x1) + 1, grid_size):
        ax.plot([x, x], [y0, y1], color="0.35", linewidth=0.3, zorder=0)
    for y in range(int(y0), int(y1) + 1, grid_size):
        ax.plot([x0, x1], [y, y], color="0.35", linewidth=0.3, zorder=0)


def draw_scenes(
    points, gt_boxes=None, ref_boxes=None, ref_scores=None, ref_labels=None,
    bev=True, point_size=0.3, bgcolor="black",
):
    """One scene -> matplotlib Figure (BEV by default, 3D otherwise).
    reference `visualize_utils.py:143` (mayavi window -> Agg figure).
    gt boxes blue, ref (predicted) boxes green, colored per label when
    `ref_labels` given."""
    points = check_numpy(points)
    fig = plt.figure(figsize=(10, 10), facecolor=bgcolor)
    if bev:
        ax = fig.add_subplot(111, facecolor=bgcolor)
        ax.scatter(points[:, 0], points[:, 1], s=point_size, c="white", linewidths=0)
        draw_multi_grid_range(ax)
        if gt_boxes is not None and len(gt_boxes):
            _draw_boxes_bev(ax, check_numpy(gt_boxes)[:, :7], color=(0.0, 0.4, 1.0))
        if ref_boxes is not None and len(ref_boxes):
            ref_boxes = check_numpy(ref_boxes)[:, :7]
            if ref_labels is None:
                _draw_boxes_bev(ax, ref_boxes, color=(0.0, 1.0, 0.0), scores=ref_scores)
            else:
                for k in range(ref_boxes.shape[0]):
                    color = box_colormap[int(ref_labels[k]) % len(box_colormap)]
                    _draw_boxes_bev(
                        ax, ref_boxes[k : k + 1], color=color,
                        scores=None if ref_scores is None else ref_scores[k : k + 1],
                    )
        ax.set_aspect("equal")
        ax.set_xlim(-10, 75)
        ax.set_ylim(-45, 45)
    else:
        ax = fig.add_subplot(111, projection="3d", facecolor=bgcolor)
        ax.scatter(points[:, 0], points[:, 1], points[:, 2], s=point_size, c="white")
        if gt_boxes is not None and len(gt_boxes):
            draw_corners3d(ax, boxes_to_corners_3d(check_numpy(gt_boxes)[:, :7]),
                           color=(0.0, 0.4, 1.0))
        if ref_boxes is not None and len(ref_boxes):
            draw_corners3d(ax, boxes_to_corners_3d(check_numpy(ref_boxes)[:, :7]),
                           color=(0.0, 1.0, 0.0), scores=ref_scores)
    ax.set_axis_off()
    fig.tight_layout()
    return fig


def draw_scenes_multi(
    points_lst, colors_lst, scales_lst=None, gt_boxes=None, aug_boxes=None,
    ref_boxes=None, ref_scores=None, bev=True, bgcolor="black",
):
    """Multiple named point sets in one scene (gt points / occ additions /
    dropped voxels ...). reference `visualize_utils.py:173`."""
    fig = plt.figure(figsize=(10, 10), facecolor=bgcolor)
    ax = fig.add_subplot(111, facecolor=bgcolor) if bev else fig.add_subplot(
        111, projection="3d", facecolor=bgcolor)
    for i, pts in enumerate(points_lst):
        pts = check_numpy(pts)
        if pts.size == 0:
            continue
        size = 0.3 if scales_lst is None else 30.0 * scales_lst[i]
        if bev:
            ax.scatter(pts[:, 0], pts[:, 1], s=size, c=[colors_lst[i]], linewidths=0)
        else:
            ax.scatter(pts[:, 0], pts[:, 1], pts[:, 2], s=size, c=[colors_lst[i]])
    for boxes, color in ((gt_boxes, (0.0, 0.4, 1.0)), (aug_boxes, (1.0, 0.0, 1.0)),
                         (ref_boxes, (0.0, 1.0, 0.0))):
        if boxes is None or len(boxes) == 0:
            continue
        boxes = check_numpy(boxes)[:, :7]
        if bev:
            _draw_boxes_bev(ax, boxes, color=color,
                            scores=ref_scores if boxes is ref_boxes else None)
        else:
            draw_corners3d(ax, boxes_to_corners_3d(boxes), color=color)
    if bev:
        draw_multi_grid_range(ax)
        ax.set_aspect("equal")
    ax.set_axis_off()
    fig.tight_layout()
    return fig


def absxyz_2_spherexyz_np(points):
    """Cartesian -> (r, azimuth deg, elevation deg) + passthrough feats.
    reference `visualize_utils.py:295`."""
    points = check_numpy(points)
    x, y, z = points[:, 0], points[:, 1], points[:, 2]
    r = np.sqrt(x * x + y * y + z * z)
    azi = np.degrees(np.arctan2(y, x))
    ele = np.degrees(np.arcsin(np.clip(z / np.maximum(r, 1e-8), -1, 1)))
    return np.concatenate(
        [np.stack([r, azi, ele], axis=1), points[:, 3:]], axis=1
    )


def save_fig(fig, path):
    fig.savefig(path, dpi=150, facecolor=fig.get_facecolor())
    plt.close(fig)
