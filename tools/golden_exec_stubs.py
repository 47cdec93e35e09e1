"""EXECUTABLE CPU stand-ins for the reference's native extensions, used
by tools/gen_golden_full.py to run the reference BtcNet full forward on
CPU (VERDICT r4 next #1).

- spconv v1.2.1: SparseConvTensor carries (features, indices) and convs
  execute as dense torch conv3d/conv_transpose3d restricted to the
  sparse site sets. Site rules follow spconv's semantics (the same
  semantic spec `btcdet_tpu.ops.sparse` implements — torch is an
  independent implementation of the conv math, so chained-math and
  import-mapping errors are caught; only the site-rule *spec* itself is
  shared between the two sides):
    SubMConv3d        out sites = in sites (order preserved)
    SparseConv3d      out sites = occupancy-conv(in sites) > 0, sorted
    SparseConvTranspose3d  out sites = occupancy-deconv(in sites) > 0
    SparseInverseConv3d    out sites = the keyed conv's INPUT sites
    SparseMaxPool3d   max over active inputs per window
  `indice_key` reuse returns the RECORDED output site list (set AND
  order), which is what makes the reference's `sparse_cat` /
  `res_combine` row-concatenations line up (spconv shares rulebooks the
  same way, `spconv_backbone.py:869,905`).
- pointnet2_stack CUDA wrappers: exact "first nsample in scan order
  with d2 < r^2" ball/shell query (`src/ball_query_gpu.cu:49-64`,
  `src/shell_query_gpu.cu:49-67`) and grouping.
- iou3d_nms CUDA: exact rotated-BEV polygon-clip IoU + sequential NMS
  (`src/iou3d_nms_kernel.cu` semantics) in numpy/torch.

Weight layout matches the manifest extractor stub: (kz, ky, kx, ci, co).
"""

from __future__ import annotations

import types

import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as F


def _triple(k):
    return tuple(int(x) for x in k) if isinstance(k, (tuple, list)) else (int(k),) * 3


# --------------------------------------------------------------- spconv


def make_exec_spconv():
    spconv = types.ModuleType("spconv")

    class SparseModule(nn.Module):
        pass

    class SparseConvTensor:
        def __init__(self, features=None, indices=None, spatial_shape=None,
                     batch_size=None, indice_dict=None):
            self.features = features
            self.indices = indices  # (N, 4) int [b, z, y, x]
            self.spatial_shape = list(int(s) for s in spatial_shape)
            self.batch_size = int(batch_size)
            self.indice_dict = {} if indice_dict is None else indice_dict

        def dense(self):
            N, C = self.features.shape
            Z, Y, X = self.spatial_shape
            out = torch.zeros(self.batch_size, C, Z, Y, X,
                              dtype=self.features.dtype)
            ii = self.indices.long()
            out[ii[:, 0], :, ii[:, 1], ii[:, 2], ii[:, 3]] = self.features
            return out

    def _dense_of(x):
        return x.dense()

    def _occupancy(x):
        Z, Y, X = x.spatial_shape
        occ = torch.zeros(x.batch_size, 1, Z, Y, X)
        ii = x.indices.long()
        occ[ii[:, 0], 0, ii[:, 1], ii[:, 2], ii[:, 3]] = 1.0
        return occ

    def _sites_of(dense_occ):
        """(B,1,Z,Y,X) occupancy > 0 -> sorted (b,z,y,x) int32 indices
        (torch.nonzero of a contiguous tensor is row-major sorted)."""
        nz = torch.nonzero(dense_occ[:, 0] > 0)
        return nz.int()

    def _gather(dense, idx):
        ii = idx.long()
        return dense[ii[:, 0], :, ii[:, 1], ii[:, 2], ii[:, 3]]

    class _ConvBase(SparseModule):
        def __init__(self, in_channels, out_channels, kernel_size, stride=1,
                     padding=0, dilation=1, groups=1, bias=True,
                     indice_key=None, **kw):
            super().__init__()
            k = _triple(kernel_size)
            self.kernel_size = k
            self.stride = _triple(stride)
            self.padding = _triple(padding)
            self.in_channels = in_channels
            self.out_channels = out_channels
            self.weight = nn.Parameter(torch.zeros(*k, in_channels, out_channels))
            if bias:
                self.bias = nn.Parameter(torch.zeros(out_channels))
            else:
                self.bias = None
            self.indice_key = indice_key

        def _w_conv(self):
            # (kz,ky,kx,ci,co) -> torch conv3d (co,ci,kz,ky,kx)
            return self.weight.permute(4, 3, 0, 1, 2).contiguous()

        def _w_deconv(self):
            # (kz,ky,kx,ci,co) -> torch conv_transpose3d (ci,co,kz,ky,kx)
            return self.weight.permute(3, 4, 0, 1, 2).contiguous()

    class SubMConv3d(_ConvBase):
        def forward(self, x):
            d = _dense_of(x)
            # subm convs CENTER the kernel regardless of the padding arg
            # (post_act_block('subm') passes none, spconv_backbone.py:12)
            out = F.conv3d(d, self._w_conv(), self.bias, stride=1,
                           padding=tuple((k - 1) // 2 for k in self.kernel_size))
            feats = _gather(out, x.indices)
            y = SparseConvTensor(feats, x.indices, x.spatial_shape,
                                 x.batch_size, x.indice_dict)
            return y

    class SparseConv3d(_ConvBase):
        def forward(self, x):
            d = _dense_of(x)
            out = F.conv3d(d, self._w_conv(), self.bias, stride=self.stride,
                           padding=self.padding)
            key = self.indice_key
            if key is not None and key in x.indice_dict:
                in_idx, out_idx, out_shape = x.indice_dict[key]
                assert list(out.shape[2:]) == out_shape, (out.shape, out_shape)
            else:
                occ = F.conv3d(_occupancy(x), torch.ones(
                    1, 1, *self.kernel_size), None, stride=self.stride,
                    padding=self.padding)
                out_idx = _sites_of(occ)
                out_shape = list(out.shape[2:])
                if key is not None:
                    x.indice_dict[key] = (x.indices, out_idx, out_shape)
            feats = _gather(out, out_idx)
            return SparseConvTensor(feats, out_idx, out_shape, x.batch_size,
                                    x.indice_dict)

    class SparseConvTranspose3d(_ConvBase):
        def forward(self, x):
            d = _dense_of(x)
            out = F.conv_transpose3d(d, self._w_deconv(), self.bias,
                                     stride=self.stride, padding=self.padding)
            key = self.indice_key
            if key is not None and key in x.indice_dict:
                in_idx, out_idx, out_shape = x.indice_dict[key]
                assert list(out.shape[2:]) == out_shape
            else:
                occ = F.conv_transpose3d(_occupancy(x), torch.ones(
                    1, 1, *self.kernel_size), None, stride=self.stride,
                    padding=self.padding)
                out_idx = _sites_of(occ)
                out_shape = list(out.shape[2:])
                if key is not None:
                    x.indice_dict[key] = (x.indices, out_idx, out_shape)
            feats = _gather(out, out_idx)
            return SparseConvTensor(feats, out_idx, out_shape, x.batch_size,
                                    x.indice_dict)

    class SparseInverseConv3d(_ConvBase):
        def __init__(self, in_channels, out_channels, kernel_size,
                     indice_key=None, bias=True, **kw):
            super().__init__(in_channels, out_channels, kernel_size,
                             bias=bias, indice_key=indice_key, **kw)

        def forward(self, x):
            rec = x.indice_dict[self.indice_key]
            in_idx, out_idx, out_shape = rec
            # the keyed conv mapped in_idx(shape S_in) -> out_idx; inverse
            # maps back: conv_transpose with the keyed conv's geometry.
            # The keyed geometry must be recovered from the shapes: spconv
            # requires the inverse conv's kernel to match; stride/pad are
            # implied by the recorded pair. We store them on first use
            # instead (see SparseConv3d): rec may carry 5 fields.
            raise NotImplementedError(
                "inverse conv is unused by the flagship config")

    class SubMConv2d(SparseModule):
        def __init__(self, in_channels, out_channels, kernel_size, stride=1,
                     padding=0, bias=True, indice_key=None, **kw):
            super().__init__()
            k = kernel_size if isinstance(kernel_size, (tuple, list)) else (kernel_size,) * 2
            self.kernel_size = tuple(int(v) for v in k)
            self.padding = tuple((v - 1) // 2 for v in self.kernel_size)
            self.weight = nn.Parameter(torch.zeros(*self.kernel_size, in_channels, out_channels))
            self.bias = nn.Parameter(torch.zeros(out_channels)) if bias else None

        def forward(self, x):
            N, C = x.features.shape
            Y, X = x.spatial_shape
            d = torch.zeros(x.batch_size, C, Y, X)
            ii = x.indices.long()
            d[ii[:, 0], :, ii[:, 1], ii[:, 2]] = x.features
            w = self.weight.permute(3, 2, 0, 1).contiguous()
            out = F.conv2d(d, w, self.bias, stride=1, padding=self.padding)
            feats = out[ii[:, 0], :, ii[:, 1], ii[:, 2]]
            y = SparseConvTensor.__new__(SparseConvTensor)
            y.features, y.indices = feats, x.indices
            y.spatial_shape, y.batch_size = x.spatial_shape, x.batch_size
            y.indice_dict = x.indice_dict
            return y

    class SparseMaxPool3d(SparseModule):
        def __init__(self, kernel_size, stride=1, padding=0, **kw):
            super().__init__()
            self.kernel_size = _triple(kernel_size)
            self.stride = _triple(stride)
            self.padding = _triple(padding)

        def forward(self, x):
            d = _dense_of(x)
            occ = _occupancy(x)
            NEG = torch.finfo(d.dtype).min / 4
            dm = torch.where(occ > 0, d, torch.full_like(d, NEG))
            out = F.max_pool3d(dm, self.kernel_size, stride=self.stride,
                               padding=self.padding)
            occ_out = F.conv3d(occ, torch.ones(1, 1, *self.kernel_size), None,
                               stride=self.stride, padding=self.padding)
            out_idx = _sites_of(occ_out)
            feats = _gather(out, out_idx)
            return SparseConvTensor(feats, out_idx, list(out.shape[2:]),
                                    x.batch_size, x.indice_dict)

    class SparseSequential(nn.Sequential):
        def forward(self, x):
            for module in self:
                if isinstance(module, (SparseModule, SparseSequential)):
                    x = module(x)
                else:
                    x = SparseConvTensor(module(x.features), x.indices,
                                         x.spatial_shape, x.batch_size,
                                         x.indice_dict)
            return x

    spconv.SparseModule = SparseModule
    spconv.SparseConvTensor = SparseConvTensor
    spconv.SubMConv3d = SubMConv3d
    spconv.SparseConv3d = SparseConv3d
    spconv.SparseConvTranspose3d = SparseConvTranspose3d
    spconv.SparseInverseConv3d = SparseInverseConv3d
    spconv.SubMConv2d = SubMConv2d
    spconv.SparseConv2d = SubMConv2d
    spconv.SparseMaxPool3d = SparseMaxPool3d
    spconv.SparseSequential = SparseSequential

    utils = types.ModuleType("spconv.utils")

    class VoxelGenerator:
        def __init__(self, **kw):
            pass

    utils.VoxelGenerator = VoxelGenerator
    utils.VoxelGeneratorV2 = VoxelGenerator
    spconv.utils = utils
    return spconv, utils


# ------------------------------------------------------ pointnet2_stack


def make_exec_pointnet2_stack():
    """Executable pointnet2_stack_cuda: the wrappers call with
    out-parameter style (pointnet2_utils.py:37,84)."""
    mod = types.ModuleType("btcdet.ops.pointnet2.pointnet2_stack.pointnet2_stack_cuda")

    def _query(B, M, r_in2, r_out2, nsample, new_xyz, new_xyz_batch_cnt,
               xyz, xyz_batch_cnt, idx):
        nb = new_xyz_batch_cnt.tolist()
        xb = xyz_batch_cnt.tolist()
        m0 = 0
        x0 = 0
        nx = new_xyz.numpy()
        xx = xyz.numpy()
        out = np.zeros((M, nsample), np.int32)
        for b in range(B):
            for mi in range(m0, m0 + nb[b]):
                c = nx[mi]
                d2 = ((xx[x0:x0 + xb[b]] - c[None]) ** 2).sum(-1)
                # CUDA: d2 >= inner2 and d2 < outer2, first nsample in order
                hits = np.nonzero((d2 >= r_in2) & (d2 < r_out2))[0][:nsample]
                if len(hits) == 0:
                    out[mi, 0] = -1
                else:
                    out[mi, :] = hits[0]
                    out[mi, :len(hits)] = hits
            m0 += nb[b]
            x0 += xb[b]
        idx.copy_(torch.from_numpy(out))

    def ball_query_wrapper(B, M, radius, nsample, new_xyz, new_xyz_batch_cnt,
                           xyz, xyz_batch_cnt, idx):
        _query(B, M, 0.0, radius * radius, nsample, new_xyz,
               new_xyz_batch_cnt, xyz, xyz_batch_cnt, idx)

    def shell_query_wrapper(B, M, r_in, r_out, nsample, new_xyz,
                            new_xyz_batch_cnt, xyz, xyz_batch_cnt, idx):
        _query(B, M, r_in * r_in, r_out * r_out, nsample, new_xyz,
               new_xyz_batch_cnt, xyz, xyz_batch_cnt, idx)

    def group_points_wrapper(B, M, C, nsample, features, features_batch_cnt,
                             idx, idx_batch_cnt, out):
        fb = features_batch_cnt.tolist()
        ib = idx_batch_cnt.tolist()
        f0 = 0
        m0 = 0
        res = torch.zeros(M, C, nsample)
        for b in range(B):
            sl = idx[m0:m0 + ib[b]].long()          # (Mb, nsample) local
            fs = features[f0:f0 + fb[b]]            # (Nb, C)
            res[m0:m0 + ib[b]] = fs[sl].permute(0, 2, 1)
            f0 += fb[b]
            m0 += ib[b]
        out.copy_(res)

    mod.ball_query_wrapper = ball_query_wrapper
    mod.shell_query_wrapper = shell_query_wrapper
    mod.group_points_wrapper = group_points_wrapper
    return mod


# --------------------------------------------------------------- iou3d


def _box_corners_bev(boxes):
    """(N, 7) [x,y,z,dx,dy,dz,ry] -> (N, 4, 2) BEV corners."""
    x, y = boxes[:, 0], boxes[:, 1]
    dx, dy = boxes[:, 3] / 2, boxes[:, 4] / 2
    c, s = np.cos(boxes[:, 6]), np.sin(boxes[:, 6])
    cx = np.stack([dx, dx, -dx, -dx], 1)
    cy = np.stack([-dy, dy, dy, -dy], 1)
    rx = cx * c[:, None] - cy * s[:, None] + x[:, None]
    ry = cx * s[:, None] + cy * c[:, None] + y[:, None]
    return np.stack([rx, ry], -1)


def _poly_clip(subject, clip):
    """Sutherland-Hodgman: clip polygon (list of xy) by convex clip."""
    out = list(subject)
    n = len(clip)
    for i in range(n):
        a, b = clip[i], clip[(i + 1) % n]
        inp = out
        out = []
        if not inp:
            break
        ex, ey = b[0] - a[0], b[1] - a[1]

        def inside(p):
            return ex * (p[1] - a[1]) - ey * (p[0] - a[0]) >= 0

        s = inp[-1]
        for e in inp:
            if inside(e):
                if not inside(s):
                    out.append(_isect(s, e, a, b))
                out.append(e)
            elif inside(s):
                out.append(_isect(s, e, a, b))
            s = e
    return out


def _isect(p, q, a, b):
    x1, y1, x2, y2 = p[0], p[1], q[0], q[1]
    x3, y3, x4, y4 = a[0], a[1], b[0], b[1]
    den = (x1 - x2) * (y3 - y4) - (y1 - y2) * (x3 - x4)
    if abs(den) < 1e-12:
        return q
    t = ((x1 - x3) * (y3 - y4) - (y1 - y3) * (x3 - x4)) / den
    return (x1 + t * (x2 - x1), y1 + t * (y2 - y1))


def _poly_area(pts):
    if len(pts) < 3:
        return 0.0
    a = 0.0
    for i in range(len(pts)):
        x1, y1 = pts[i]
        x2, y2 = pts[(i + 1) % len(pts)]
        a += x1 * y2 - x2 * y1
    return abs(a) / 2


def boxes_overlap_bev_np(a, b):
    ca, cb = _box_corners_bev(a), _box_corners_bev(b)
    out = np.zeros((len(a), len(b)), np.float32)
    for i in range(len(a)):
        for j in range(len(b)):
            out[i, j] = _poly_area(_poly_clip(list(ca[i]), list(cb[j])))
    return out


def boxes_iou_bev_np(a, b):
    ov = boxes_overlap_bev_np(a, b)
    ar_a = (a[:, 3] * a[:, 4])[:, None]
    ar_b = (b[:, 3] * b[:, 4])[None, :]
    return ov / np.clip(ar_a + ar_b - ov, 1e-6, None)


def make_exec_iou3d():
    mod = types.ModuleType("btcdet.ops.iou3d_nms.iou3d_nms_cuda")

    def boxes_overlap_bev_gpu(boxes_a, boxes_b, ans):
        ans.copy_(torch.from_numpy(boxes_overlap_bev_np(
            boxes_a.numpy(), boxes_b.numpy())))

    def boxes_iou_bev_gpu(boxes_a, boxes_b, ans):
        ans.copy_(torch.from_numpy(boxes_iou_bev_np(
            boxes_a.numpy(), boxes_b.numpy())))

    def _nms(boxes, keep, thresh, normal=False):
        b = boxes.numpy()
        n = len(b)
        if n == 0:
            return 0
        iou = boxes_iou_bev_np(b, b)
        alive = np.ones(n, bool)
        out = []
        for i in range(n):
            if not alive[i]:
                continue
            out.append(i)
            alive &= iou[i] <= thresh
            alive[i] = False
        keep[:len(out)] = torch.as_tensor(out, dtype=keep.dtype)
        return len(out)

    mod.boxes_overlap_bev_gpu = boxes_overlap_bev_gpu
    mod.boxes_iou_bev_gpu = boxes_iou_bev_gpu
    mod.nms_gpu = lambda boxes, keep, thresh: _nms(boxes, keep, thresh)
    mod.nms_normal_gpu = lambda boxes, keep, thresh: _nms(boxes, keep, thresh)
    return mod
