"""Reference (torch BtcDet) checkpoint import.

Maps a reference `.pth` state dict (`checkpoint_state_mult_opt`
`tools/train_utils/train_utils.py:272-288`; module names per
`detector3d_template.build_networks:73-98`) onto the flax variable tree
of `btcdet_tpu.models.build_network`, making the north-star AP-parity
measurement possible (VERDICT r1 next #2).

Layout conventions (numerically pinned by tests/test_ckpt_import.py
against torch CPU ops):
  - spconv v1.2.1 weights are (kz, ky, kx, ci, co); our sparse engine
    takes (K, ci, co) with K enumerating (dz, dy, dx) row-major -- a
    plain reshape.
  - dense 3D convs on the occ grid keep (kz, ky, kx, ci, co) verbatim;
    flax `Conv` is cross-correlation exactly like torch/spconv.
  - transposed convs (occ deconv, BEV deblock) need a SPATIAL FLIP:
    torch ConvTranspose computes the conv adjoint, flax `ConvTranspose`
    does fractionally-strided correlation with the kernel as-is.
  - torch Conv2d (co, ci, kh, kw) -> flax (kh, kw, ci, co);
    torch Conv1d-as-FC (co, ci, 1) -> flax Dense (ci, co).
  - BatchNorm: weight->scale, bias->bias, running_mean/var ->
    batch_stats mean/var; num_batches_tracked dropped.

Deliberately unmapped reference tensors (see DROPPED):
  - occ_modules.occ_targets.fix_conv_2dzy.weight: a constant dilation
    kernel (requires_grad=False, `occ_targets_template.py`); our occ
    targets do the dilation with mask algebra, no parameter.
"""

from __future__ import annotations

import re
from typing import Any

import jax
import numpy as np

DROPPED = (
    "occ_modules.occ_targets.fix_conv_2dzy.weight",
)

# ---------------------------------------------------------------- transforms


def t_sparse3d(w):
    """spconv (kz,ky,kx,ci,co) -> engine (K,ci,co), K row-major (dz,dy,dx)."""
    w = np.asarray(w)
    return w.reshape(-1, w.shape[-2], w.shape[-1])


def t_dense3d(w):
    """spconv (kz,ky,kx,ci,co) -> flax Conv (kz,ky,kx,ci,co): verbatim."""
    return np.asarray(w)


def t_deconv3d(w):
    """spconv deconv (kz,ky,kx,ci,co) -> flax ConvTranspose: spatial flip."""
    return np.asarray(w)[::-1, ::-1, ::-1].copy()


def t_conv2d(w):
    """torch Conv2d (co,ci,kh,kw) -> flax (kh,kw,ci,co)."""
    return np.asarray(w).transpose(2, 3, 1, 0)


def t_convT2d(w):
    """torch ConvTranspose2d (ci,co,kh,kw) -> flax (kh,kw,ci,co) + flip."""
    return np.asarray(w).transpose(2, 3, 0, 1)[::-1, ::-1].copy()


def t_fc(w):
    """torch Conv1d (co,ci,1) or Conv2d-1x1 (co,ci,1,1) -> Dense (ci,co)."""
    w = np.asarray(w)
    return w.reshape(w.shape[0], w.shape[1]).T


def t_copy(w):
    return np.asarray(w)


# ConvHead pooled-grid size (3x3x3, MODEL.ROI_HEAD.CONV_GRID_POOL
# GRID_SIZE in the flagship yaml). Needed by t_fc_pooled; override via
# map_reference_state(roi_grid_num=...) for non-flagship grids.
ROI_GRID_NUM = 27


def t_fc_pooled(grid_num: int):
    """First rcnn FC layer: the reference consumes the pooled roi grid
    flattened C-MAJOR ((BN, G, C) -> permute -> (BN, C*G, 1) view,
    reference conv_head.py:372-379), while our ConvHead flattens
    GRID-MAJOR ((B*N, G*C), models/roi_heads/conv_head.py). The two
    layouts have identical shapes, so the manifest test cannot see the
    difference — importing with plain t_fc silently permutes the input
    axis of a (6480, 256) matrix. Reorder torch (co, C*G) so row
    j = g*C + c of the Dense kernel reads torch column c*G + g.
    Golden-pinned by tests/test_golden_chain.py (executed reference)."""

    def t(w):
        w = np.asarray(w)
        co, cin = w.shape[0], w.shape[1]
        assert cin % grid_num == 0, (cin, grid_num)
        C = cin // grid_num
        w = w.reshape(co, C, grid_num).transpose(0, 2, 1).reshape(co, cin)
        return w.T

    return t


# ---------------------------------------------------------------- name rules

# det 3D backbone: reference attribute -> (ours, number of sub-blocks)
# single-Sequential entries have keys `name.{j}.*`; multi-block entries
# `name.{i}.{j}.*` (i = block, j = 0 conv / 1 BN)
_DET3D_PLAIN = {"conv1": "conv1", "conv_out": "conv_out"}
_DET3D_BLOCKS = {
    "conv1_combine": ("conv1_combine",),
    "conv2": ("conv2",),
    "conv2_combine": ("conv2_combine_0", "conv2_combine_1"),
    "conv3": ("conv3",),
    "conv3_combine": ("conv3_combine_0", "conv3_combine_1"),
    "conv4": ("conv4",),
    "conv4_combine": ("conv4_combine_0", "conv4_combine_1"),
    "conv5": ("conv5",),
    "conv5_combine": ("conv5_combine_0", "conv5_combine_1"),
    "down2": ("down2_0", "down2_1"),
    "down3": ("down3",),
    "down_combine": ("down_combine_0", "down_combine_1", "down_combine_2"),
    "squeezeBev": ("squeezeBev",),
    "occ_conv2": ("occ_conv2",),
    "occ_conv3": ("occ_conv3",),
    "occ_conv4": ("occ_conv4",),
    "att_conv1": ("att_conv1",),
    "att_conv2": ("att_conv2",),
}

# occ backbone: deconv blocks' first sub-block is a ConvTranspose
_OCC3D_BLOCKS = {
    "conv1": ("conv1",),
    "conv2": ("conv2_0", "conv2_1"),
    "conv3": ("conv3_0", "conv3_1"),
    "deconv4": ("deconv4_0", "deconv4_1"),
    "deconv5": ("deconv5_0", "deconv5_1"),
}

_BN_PARTS = {
    "weight": ("params", "scale", t_copy),
    "bias": ("params", "bias", t_copy),
    "running_mean": ("batch_stats", "mean", t_copy),
    "running_var": ("batch_stats", "var", t_copy),
}


class MappingError(KeyError):
    pass


def _conv_child(flat_params, base):
    """Find the conv child module name under `base` in the target tree."""
    for child in ("SubMConv3d_0", "SparseConv3d_0", "Conv_0",
                  "ConvTranspose_0", "kernel"):
        if child == "kernel":
            if base + ("kernel",) in flat_params:
                return ()
        elif base + (child, "kernel") in flat_params:
            return (child,)
    raise MappingError(f"no conv child under {'/'.join(base)}")


def _bn_child(flat_all, base):
    """Find the BN child module under `base` (params collection)."""
    for child in (("MaskedBatchNorm_0",), ("_DenseBN_0", "MaskedBatchNorm_0"),
                  ("BatchNorm_0",), ()):
        if ("params",) + base + child + ("scale",) in flat_all:
            return child
    raise MappingError(f"no BN child under {'/'.join(base)}")


def _rule_block(flat_all, flat_params, base, part, leaf, transform):
    """Map one reference sub-block entry (conv idx 0 / BN idx 1)."""
    if part == "0":  # conv
        child = _conv_child(flat_params, base)
        if transform is t_deconv3d and not (
            base + ("ConvTranspose_0", "kernel") in flat_params
        ):
            transform = t_dense3d  # second deconv sub-block is a plain conv
        if leaf == "weight":
            return ("params", base + child + ("kernel",), transform)
        if leaf == "bias":
            return ("params", base + child + ("bias",), t_copy)
    if part == "1":  # BN
        if leaf == "num_batches_tracked":
            return None
        coll, name, tr = _BN_PARTS[leaf]
        child = _bn_child(flat_all, base)
        return (coll, base + child + (name,), tr)
    raise MappingError(f"unhandled block part {part}.{leaf} at {'/'.join(base)}")


def _map_det3d(flat_all, flat_params, rest):
    parts = rest.split(".")
    name = parts[0]
    if name in _DET3D_PLAIN:
        base = ("det_backbone_3d", _DET3D_PLAIN[name])
        return _rule_block(flat_all, flat_params, base, parts[1],
                           parts[-1], t_sparse3d)
    if name in _DET3D_BLOCKS:
        ours = _DET3D_BLOCKS[name][int(parts[1])]
        base = ("det_backbone_3d", ours)
        return _rule_block(flat_all, flat_params, base, parts[2],
                           parts[-1], t_sparse3d)
    raise MappingError(f"det backbone_3d: {rest}")


def _map_occ3d(flat_all, flat_params, rest):
    parts = rest.split(".")
    name = parts[0]
    if name not in _OCC3D_BLOCKS:
        raise MappingError(f"occ backbone_3d: {rest}")
    ours = _OCC3D_BLOCKS[name][int(parts[1])]
    base = ("occ_subnet", "backbone_3d", ours)
    tr = t_deconv3d if (name.startswith("deconv") and parts[1] == "0") else t_dense3d
    return _rule_block(flat_all, flat_params, base, parts[2], parts[-1], tr)


def _map_bev2d(flat_all, flat_params, rest, n_per_block):
    """blocks.{b}.{idx}.* / deblocks.{b}.{idx}.* -> Conv_k / _BN_k.

    Our flax numbering (backbones_2d.py): per block i the strided conv +
    n_layers convs then the upsample head, all sharing one auto-counter;
    stride-1 upsample is a 1x1 Conv, stride>1 a ConvTranspose."""
    parts = rest.split(".")
    kind, b, idx, leaf = parts[0], int(parts[1]), int(parts[2]), parts[-1]
    convs_per_block = n_per_block[b] + 1  # strided conv + n layers
    # flax counters: each block contributes convs_per_block convs + 1
    # upsample (Conv if stride==1 else ConvTranspose) and same number of BNs
    conv_base = sum(n + 1 for n in n_per_block[:b])
    up_before = b  # one upsample head per previous block
    if kind == "blocks":
        k = (idx - 1) // 3
        is_bn = (idx - 1) % 3 == 1
        conv_idx = conv_base + up_before + k  # Conv_<n> counter incl. 1x1 ups
        bn_idx = conv_base + up_before + k
        if not is_bn:
            tr = t_conv2d
            if b == 0 and k == 0:
                # VERY FIRST conv consumes the height-compressed BEV map,
                # whose channel interleave differs: reference
                # `.dense().view(B, C*D, H, W)` is C-major (c*D + d,
                # height_compression.py:21-24); our HC folds z-major
                # (d*C + c, map_to_bev.py). Reorder the input axis —
                # same class of silent scramble t_fc_pooled fixes for the
                # rcnn FC (caught by tests/test_golden_full.py, stage
                # spatial_features_2d).
                def tr(w, _t=t_conv2d):
                    w = np.asarray(w)
                    co, cd, kh, kw = w.shape
                    C = 128  # det conv_out channels (manifest-fixed)
                    D = cd // C
                    if D > 1 and C * D == cd:
                        w = w.reshape(co, C, D, kh, kw).transpose(
                            0, 2, 1, 3, 4).reshape(co, cd, kh, kw)
                    return _t(w)
            return ("params", ("det_backbone_2d", f"Conv_{conv_idx}", "kernel"),
                    tr) if leaf == "weight" else None
        if leaf == "num_batches_tracked":
            return None
        coll, name, tr = _BN_PARTS[leaf]
        return (coll, ("det_backbone_2d", f"_BN_{bn_idx}", "BatchNorm_0", name), tr)
    if kind == "deblocks":
        bn_idx = conv_base + up_before + convs_per_block
        if idx == 0:  # the conv / deconv
            if leaf != "weight":
                raise MappingError(rest)
            # stride >= 1 deblocks are ConvTranspose2d in the reference
            # (base_bev_backbone.py:49-56) -- INCLUDING stride 1, whose
            # 1x1 ConvTranspose equals our plain 1x1 Conv only after the
            # (ci,co,kh,kw) -> (kh,kw,ci,co) transpose; mapping it with
            # the Conv2d (co,ci,...) transform silently transposed the
            # channel matrix (caught by tests/test_golden_chain.py)
            tgt_conv = ("det_backbone_2d",
                        f"Conv_{conv_base + up_before + convs_per_block}", "kernel")
            if ("params",) + tgt_conv in flat_all:
                return ("params", tgt_conv, t_convT2d)
            # otherwise it's the ConvTranspose (numbered by its own counter)
            n_trans_before = sum(
                1 for _ in range(b))  # assume every earlier deblock was stride 1
            return ("params",
                    ("det_backbone_2d", f"ConvTranspose_{0}", "kernel"), t_convT2d)
        if leaf == "num_batches_tracked":
            return None
        coll, name, tr = _BN_PARTS[leaf]
        return (coll, ("det_backbone_2d", f"_BN_{bn_idx}", "BatchNorm_0", name), tr)
    raise MappingError(f"backbone_2d: {rest}")


def _map_roi(flat_all, flat_params, rest):
    parts = rest.split(".")
    name = parts[0]
    if name in ("SA_rawpoints", "SA_occpoints"):
        # mlps.{i}.{3k}=conv1x1, {3k+1}=BN
        i, idx, leaf = int(parts[2]), int(parts[3]), parts[-1]
        k, r = divmod(idx, 3)
        base = ("det_roi_head", name, f"mlp_{i}")
        if r == 0:
            return ("params", base + (f"Dense_{k}", "kernel"), t_fc)
        if r == 1:
            if leaf == "num_batches_tracked":
                return None
            coll, nm, tr = _BN_PARTS[leaf]
            return (coll, base + (f"MaskedBatchNorm_{k}", nm), tr)
        raise MappingError(rest)
    if name == "conv_layers":
        # conv_layers.0.{j}.{0=conv,1=BN}
        j, part, leaf = int(parts[2]), parts[3], parts[-1]
        if part == "0":
            return ("params", ("det_roi_head", f"xc_conv_{j}", "kernel"), t_dense3d)
        if leaf == "num_batches_tracked":
            return None
        coll, nm, tr = _BN_PARTS[leaf]
        return (coll, ("det_roi_head", f"xc_bn_{j}", "MaskedBatchNorm_0", nm), tr)
    fc_maps = {"shared_fc_layer": ("shared_fc", "shared_bn", None),
               "cls_layers": ("cls", "cls_bn", "cls_out"),
               "reg_layers": ("reg", "reg_bn", "reg_out")}
    if name in fc_maps:
        fc, bn, out = fc_maps[name]
        idx, leaf = int(parts[1]), parts[-1]
        # sequential layout: Conv1d@0, BN@1, ReLU@2[, Dropout@3], Conv1d@4,
        # BN@5, ReLU@6, final Conv1d@7 (heads only)
        stage = {0: 0, 4: 1}.get(idx)
        if stage is not None and leaf == "weight":
            # shared_fc_layer.0 consumes the pooled grid: fix the
            # C-major -> grid-major input-axis interleave (t_fc_pooled
            # docstring). Later stages see plain channel vectors.
            tr = (t_fc_pooled(ROI_GRID_NUM)
                  if name == "shared_fc_layer" and idx == 0 else t_fc)
            return ("params", ("det_roi_head", f"{fc}_{stage}", "kernel"), tr)
        bn_stage = {1: 0, 5: 1}.get(idx)
        if bn_stage is not None:
            if leaf == "num_batches_tracked":
                return None
            coll, nm, tr = _BN_PARTS[leaf]
            return (coll, ("det_roi_head", f"{bn}_{bn_stage}",
                           "MaskedBatchNorm_0", nm), tr)
        if out is not None and idx == 7:
            if leaf == "weight":
                return ("params", ("det_roi_head", out, "kernel"), t_fc)
            return ("params", ("det_roi_head", out, "bias"), t_copy)
    raise MappingError(f"roi_head: {rest}")


def _map_key(key: str, flat_all, flat_params, n_per_block):
    """One reference state-dict key -> (collection, flax path, transform)
    or None (deliberately dropped)."""
    if key in DROPPED or key.endswith("num_batches_tracked"):
        return None
    if key == "global_step":
        return None  # restored onto TrainState.step by the CLI
    scope, rest = key.split(".", 1)
    if scope == "occ_modules":
        mod, rest = rest.split(".", 1)
        if mod == "backbone_3d":
            return _map_occ3d(flat_all, flat_params, rest)
        if mod == "occ_dense_head":
            # conv_cls.0.{weight,bias} / conv_res.0.weight
            parts = rest.split(".")
            tgt = ("occ_subnet", parts[0])
            leaf = "kernel" if parts[-1] == "weight" else "bias"
            return ("params", tgt + (leaf,),
                    t_dense3d if leaf == "kernel" else t_copy)
        raise MappingError(key)
    if scope != "det_modules":
        raise MappingError(key)
    mod, rest = rest.split(".", 1)
    if mod == "backbone_3d":
        return _map_det3d(flat_all, flat_params, rest)
    if mod == "backbone_2d":
        return _map_bev2d(flat_all, flat_params, rest, n_per_block)
    if mod == "dense_head":
        head = {"conv_cls": "Conv_0", "conv_box": "Conv_1",
                "conv_dir_cls": "Conv_2"}[rest.split(".")[0]]
        leaf = rest.split(".")[-1]
        if leaf == "weight":
            return ("params", ("det_dense_head", head, "kernel"), t_conv2d)
        return ("params", ("det_dense_head", head, "bias"), t_copy)
    if mod == "roi_head":
        return _map_roi(flat_all, flat_params, rest)
    if mod == "vfe":
        return None  # MeanVFE/OccVFE have no parameters
    raise MappingError(key)


def _flatten(variables):
    flat = {}
    for coll, tree in variables.items():
        for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
            flat[(coll,) + tuple(str(getattr(p, "key", p)) for p in path)] = leaf
    return flat


def map_reference_state(state_dict: dict, variables: dict,
                        n_per_block=(5, 5)) -> tuple[dict, dict]:
    """Map a reference state dict onto flax `variables`
    ({'params':..., 'batch_stats':...}).

    Returns (new_variables, report). report['unmapped_ref'] /
    ['uncovered_flax'] / ['shape_mismatch'] must all be empty for a
    faithful import."""
    flat_all = _flatten(variables)
    flat_params = {k[1:]: v for k, v in flat_all.items() if k[0] == "params"}
    new_flat = dict(flat_all)
    report = {"mapped": 0, "dropped": [], "unmapped_ref": [],
              "uncovered_flax": [], "shape_mismatch": []}
    covered = set()
    for key, val in state_dict.items():
        try:
            rule = _map_key(key, flat_all, flat_params, n_per_block)
        except MappingError:
            report["unmapped_ref"].append(key)
            continue
        if rule is None:
            report["dropped"].append(key)
            continue
        coll, path, tr = rule
        tgt = (coll,) + path
        if tgt not in flat_all:
            report["unmapped_ref"].append(f"{key} -> missing {'/'.join(tgt)}")
            continue
        arr = tr(np.asarray(val.numpy() if hasattr(val, "numpy") else val))
        want = tuple(flat_all[tgt].shape)
        if tuple(arr.shape) != want:
            report["shape_mismatch"].append(f"{key}: {arr.shape} != {want}")
            continue
        new_flat[tgt] = arr.astype(np.asarray(flat_all[tgt]).dtype
                                   if hasattr(flat_all[tgt], "dtype") else np.float32)
        covered.add(tgt)
        report["mapped"] += 1
    for tgt in flat_all:
        if tgt not in covered:
            report["uncovered_flax"].append("/".join(tgt))
    return _unflatten(new_flat, variables), report


def _unflatten(flat: dict, template: dict):
    out = {}
    for key, val in flat.items():
        node = out
        for part in key[:-1]:
            node = node.setdefault(part, {})
        node[key[-1]] = val
    return out
