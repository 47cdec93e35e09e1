"""Extract the reference BtcDet checkpoint manifest (parameter names +
shapes) by instantiating the reference torch model with stubbed native
extensions (spconv / CUDA ops), CPU-redirected device placement, and a
fake dataset handle.

The manifest (tests/fixtures/reference_state_dict_manifest.json) is the
ground truth that `tools/import_reference_ckpt.py`'s name mapping is
tested against: every reference parameter must map onto the flax tree
with the right (transposed) shape, and every flax parameter must be
covered (VERDICT r1 next #2).

Reads /root/reference (read-only); run once per flagship-config change:
    python tools/extract_reference_manifest.py \
        [--cfg btcdet_kitti_car.yaml] [--out tests/fixtures/...]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import types
from pathlib import Path

import numpy as np
import torch
import torch.nn as nn
from torch.overrides import TorchFunctionMode

REFERENCE = Path(os.environ.get("BTCDET_REFERENCE", "/root/reference"))
REPO = Path(__file__).resolve().parent.parent


class _CpuOnly(TorchFunctionMode):
    """Redirect every device='cuda' / .cuda() to CPU during model build
    (the reference constructs buffers on cuda in __init__,
    detector3d_template.py:59)."""

    def __torch_function__(self, func, _types, args=(), kwargs=None):
        kwargs = dict(kwargs or {})
        dev = kwargs.get("device")
        if dev is not None and "cuda" in str(dev):
            kwargs["device"] = "cpu"
        name = getattr(func, "__name__", "")
        if name == "cuda":
            return args[0]
        return func(*args, **kwargs)


def _triple(k):
    return tuple(k) if isinstance(k, (tuple, list)) else (int(k),) * 3


def _make_spconv_stub():
    """Parameter-faithful spconv v1.2.1 stand-in: weight layout
    (*kernel_size, in_channels, out_channels), bias (out,)."""
    spconv = types.ModuleType("spconv")

    class SparseModule(nn.Module):
        pass

    class _Conv(SparseModule):
        def __init__(self, in_channels, out_channels, kernel_size, stride=1,
                     padding=0, dilation=1, groups=1, bias=True,
                     indice_key=None, **kw):
            super().__init__()
            k = _triple(kernel_size)
            self.weight = nn.Parameter(torch.zeros(*k, in_channels, out_channels))
            if bias:
                self.bias = nn.Parameter(torch.zeros(out_channels))
            self.indice_key = indice_key

        def forward(self, x):  # never called during extraction
            return x

    class _Conv2d(_Conv):
        def __init__(self, in_channels, out_channels, kernel_size, **kw):
            k = kernel_size if isinstance(kernel_size, (tuple, list)) \
                else (kernel_size,) * 2
            super().__init__(in_channels, out_channels, tuple(k), **kw)

    class SparseMaxPool3d(SparseModule):
        def __init__(self, *a, **kw):
            super().__init__()

    class SparseSequential(nn.Sequential):
        pass

    class SparseConvTensor:
        def __init__(self, features=None, indices=None, spatial_shape=None,
                     batch_size=None):
            self.features = features
            self.indices = indices
            self.spatial_shape = spatial_shape
            self.batch_size = batch_size

    spconv.SparseModule = SparseModule
    spconv.SubMConv3d = _Conv
    spconv.SparseConv3d = _Conv
    spconv.SparseConvTranspose3d = _Conv
    spconv.SparseInverseConv3d = _Conv
    spconv.SubMConv2d = _Conv2d
    spconv.SparseConv2d = _Conv2d
    spconv.SparseMaxPool3d = SparseMaxPool3d
    spconv.SparseSequential = SparseSequential
    spconv.SparseConvTensor = SparseConvTensor

    utils = types.ModuleType("spconv.utils")

    class VoxelGenerator:
        def __init__(self, **kw):
            pass

    utils.VoxelGenerator = VoxelGenerator
    utils.VoxelGeneratorV2 = VoxelGenerator
    spconv.utils = utils
    return spconv, utils


def _make_easydict_stub():
    mod = types.ModuleType("easydict")

    class EasyDict(dict):
        def __init__(self, d=None, **kw):
            super().__init__()
            for k, v in dict(d or {}, **kw).items():
                self[k] = v

        def __setitem__(self, k, v):
            if isinstance(v, dict) and not isinstance(v, EasyDict):
                v = EasyDict(v)
            elif isinstance(v, (list, tuple)):
                v = type(v)(EasyDict(x) if isinstance(x, dict) else x for x in v)
            super().__setitem__(k, v)
            super().__setattr__(k, v)

        __setattr__ = __setitem__

        def __getattr__(self, k):
            try:
                return self[k]
            except KeyError as e:
                raise AttributeError(k) from e

        def pop(self, k, *default):
            try:
                object.__delattr__(self, k)
            except AttributeError:
                pass
            return super().pop(k, *default)

    mod.EasyDict = EasyDict
    return mod


def install_stubs():
    # the 2021-era reference uses long-removed numpy aliases
    for alias, repl in [("int", int), ("float", float), ("bool", bool),
                        ("long", int), ("object", object)]:
        if not hasattr(np, alias):
            setattr(np, alias, repl)
    sys.modules.setdefault("easydict", _make_easydict_stub())
    spconv, utils = _make_spconv_stub()
    sys.modules.setdefault("spconv", spconv)
    sys.modules.setdefault("spconv.utils", utils)
    # compiled CUDA extension modules the python wrappers import
    for name in [
        "btcdet.ops.iou3d_nms.iou3d_nms_cuda",
        "btcdet.ops.pointnet2.pointnet2_stack.pointnet2_stack_cuda",
        "btcdet.ops.pointnet2.pointnet2_batch.pointnet2_batch_cuda",
        "btcdet.ops.roiaware_pool3d.roiaware_pool3d_cuda",
        "btcdet.ops.roipoint_pool3d.roipoint_pool3d_cuda",
    ]:
        sys.modules.setdefault(name, types.ModuleType(name))
    class _Permissive(types.ModuleType):
        """Any attribute access returns a no-op callable (vis helpers,
        numba decorators -- none execute during model construction)."""

        def __getattr__(self, item):
            if item.startswith("__"):
                raise AttributeError(item)
            return lambda *a, **kw: (a[0] if a and callable(a[0]) else None)

    for name in ["mayavi", "mayavi.mlab", "numba", "numba.cuda",
                 "skimage", "skimage.draw", "matplotlib", "matplotlib.pyplot"]:
        sys.modules.setdefault(name, _Permissive(name))


class _FakePFE:
    num_point_features = 4


class _FakeDataset:
    """Just the attributes Detector3DTemplate reads (`:25-85`)."""

    def __init__(self, cfg, class_names):
        self.dataset_cfg = cfg.DATA_CONFIG
        self.class_names = class_names
        self.mode = "train"
        self.training = True
        self.point_feature_encoder = _FakePFE()
        self.occ_dim = None
        pcr = np.array(self.dataset_cfg.POINT_CLOUD_RANGE, np.float32)
        self.point_cloud_range = pcr
        occ = self.dataset_cfg.get("OCC", None)
        self.occ_point_cloud_range = (
            np.array(occ.POINT_CLOUD_RANGE, np.float32) if occ else pcr
        )
        self.det_grid_size = self.det_voxel_size = None
        self.occ_grid_size = self.occ_voxel_size = None
        for proc in self.dataset_cfg.DATA_PROCESSOR:
            if proc.NAME == "transform_points_to_sphere_voxels":
                vs = np.array(proc.VOXEL_SIZE)
                g = (self.occ_point_cloud_range[3:6]
                     - self.occ_point_cloud_range[0:3]) / vs
                self.occ_grid_size = np.round(g).astype(np.int64)
                self.occ_voxel_size = proc.VOXEL_SIZE
            if proc.NAME in ("det_transform_points_to_voxels",
                             "transform_points_to_voxels"):
                vs = np.array(proc.VOXEL_SIZE)
                g = (pcr[3:6] - pcr[0:3]) / vs
                self.det_grid_size = np.round(g).astype(np.int64)
                self.det_voxel_size = proc.VOXEL_SIZE
        self.grid_size = self.det_grid_size
        self.voxel_size = self.det_voxel_size
        self.depth_downsample_factor = None


def extract(cfg_name: str):
    install_stubs()
    sys.path.insert(0, str(REFERENCE))
    tools_dir = REFERENCE / "tools"
    cwd = os.getcwd()
    os.chdir(tools_dir)  # _BASE_CONFIG_ paths resolve relative to tools/
    try:
        from btcdet.config import cfg, cfg_from_yaml_file

        cfg_from_yaml_file(str(tools_dir / "cfgs" / "model_configs" / cfg_name), cfg)
        from btcdet.models import build_network

        ds = _FakeDataset(cfg, cfg.CLASS_NAMES)
        with _CpuOnly():
            model = build_network(
                model_cfg=cfg.MODEL, num_class=len(cfg.CLASS_NAMES), dataset=ds
            )
    finally:
        os.chdir(cwd)
    manifest = {
        name: list(t.shape)
        for name, t in model.state_dict().items()
    }
    return manifest


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cfg", default="btcdet_kitti_car.yaml")
    ap.add_argument(
        "--out", default=str(REPO / "tests" / "fixtures"
                             / "reference_state_dict_manifest.json"))
    args = ap.parse_args()
    manifest = extract(args.cfg)
    out = Path(args.out)
    out.parent.mkdir(parents=True, exist_ok=True)
    with open(out, "w") as f:
        json.dump(manifest, f, indent=1, sort_keys=True)
    n_params = sum(int(np.prod(s)) for s in manifest.values())
    print(f"wrote {len(manifest)} tensors ({n_params/1e6:.2f}M params) -> {out}")


if __name__ == "__main__":
    main()
