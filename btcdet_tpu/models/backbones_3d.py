"""3D backbones.

`VoxelBackBone8xOcc` -- the detection backbone (reference
`btcdet/models/backbones_3d/spconv_backbone.py:630-1020`): SECOND-style
8x sparse encoder (channels 16/32/64/64/128) with the BtcDet occ-code
side branch (identity/maxpool/fixconv/weighted downsamplers concatenated
into the trunk per `OCC_CONV_EXECUTE`), optional attention, and the
`x_combine` multi-scale fusion (down2(x_conv2) + down3(x_conv3) +
x_conv4 [+ squeezed BEV for `big_bev_combine`] -> down_combine) consumed
by the ROI head. Runs on the gather-GEMM sparse engine; strided convs
share rulebooks through `indice_key` exactly like spconv.

`VoxelBackBoneDeconv` -- the occupancy backbone (reference
`spconv_backbone.py:91-224`). TPU redesign: the cylinder occ grid is
tiny (~9 x 157 x 209), so instead of sparse conv we run *dense* conv3d
(channels-last, MXU-native) while reproducing the sparse semantics
exactly: an active-site mask is dilated alongside each regular
conv / transpose conv, batch-norm statistics are computed over active
sites only, and inactive sites are re-zeroed after every block. The
azimuth wraparound shift (`add_shift`/`remove_shift`, reference
`:205-224`) becomes a cyclic pad/crop of the dense y (azimuth) axis.
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..utils import common
import numpy as np

from ..ops import sparse


class SparseConvBlock(nn.Module):
    """conv + masked BN + activation on a SparseTensor (reference
    `post_act_block`)."""

    out_channels: int
    kernel_size: Any = 3
    stride: Any = 1
    padding: Any = 0
    conv_type: str = "subm"  # subm | spconv | spdeconv | inverseconv | maxpool | fixspconv
    indice_key: str | None = None
    use_norm: bool = True
    activation: str = "relu"
    default_value: float = 1.0 / 27
    out_capacity: int | None = None
    axis_name: str | None = None

    @nn.compact
    def __call__(self, st: sparse.SparseTensor, cache: dict, train: bool = False):
        kw = dict(indice_key=self.indice_key)
        if self.conv_type == "subm":
            st = sparse.SubMConv3d(self.out_channels, self.kernel_size, **kw)(st, cache)
        elif self.conv_type == "spconv":
            st = sparse.SparseConv3d(
                self.out_channels, self.kernel_size, self.stride, self.padding,
                out_capacity=self.out_capacity, **kw,
            )(st, cache)
        elif self.conv_type == "spdeconv":
            st = sparse.SparseConvTranspose3d(
                self.out_channels, self.kernel_size, self.stride, self.padding,
                out_capacity=self.out_capacity, **kw,
            )(st, cache)
        elif self.conv_type == "inverseconv":
            st = sparse.SparseInverseConv3d(
                self.out_channels, self.kernel_size, indice_key=self.indice_key,
                stride=self.stride, padding=self.padding,
            )(st, cache)
        elif self.conv_type == "maxpool":
            st = sparse.SparseMaxPool3d(
                self.kernel_size, self.stride, self.padding,
                out_capacity=self.out_capacity, **kw,
            )(st, cache)
        elif self.conv_type == "fixspconv":
            st = sparse.FixedSparseConv3d(
                self.kernel_size, self.stride, self.padding,
                default_value=self.default_value,
                out_capacity=self.out_capacity, **kw,
            )(st, cache)
        else:
            raise NotImplementedError(self.conv_type)
        if self.use_norm:
            f = sparse.MaskedBatchNorm(axis_name=self.axis_name)(
                st.features, st.valid, use_running_average=not train
            )
            if self.activation == "relu":
                f = nn.relu(f)
            elif self.activation == "leaky_relu":
                f = nn.leaky_relu(f, negative_slope=0.01)
            st = st.replace(features=jnp.where(st.valid[:, None], f, 0.0))
        return st


# Eval-time per-level width tiering (VERDICT r4 next #6): the strided
# convs emit key-sorted valid-first tables padded to the static
# LEVEL_CAPACITIES (sized for worst-case dilation), while live occupancy
# runs ~40-60% of cap on KITTI-like scans — the subm pairs at L2/L3 pay
# the padding in rulebook lookups, gathers and BN rows. A level's subm
# tail is width-preserving, so running it on the smallest static prefix
# covering nnz and zero-padding back to cap is bitwise exact. Tiering is
# per-LEVEL-SEGMENT (pad back to cap before the next strided conv), so
# branch count grows additively per level, not multiplicatively.
# Skipped below this PER-FRAME capacity (tiny test configs) and at train
# (smaller caps; BN batch stats mutate inside branches). Tests
# monkeypatch it.
LEVEL_TIER_MIN_CAPACITY = 6_000


class VoxelBackBone8xOcc(nn.Module):
    """Detection 3D backbone; see module docstring. Returns a dict with
    `encoded` (stride-8, z-squeezed), `x_combine`, and the per-level
    sparse tensors."""

    input_channels: int
    occ_code_num: int = 2
    occ_conv_type: Sequence[str] = ("identity", "maxpool")
    occ_conv_exec: Sequence[bool] = (False, True)
    out_feat_type: Sequence[str] = ("None", "None", "None", "None", "big_bev_combine")
    out_att: Sequence[bool] = (False, False, False, False)
    channels: Sequence[int] = (16, 32, 64, 64, 128)
    axis_name: str | None = None
    # Static per-level output-site capacities for the strided convs
    # (spconv2, spconv3, spconv4, conv_out[, spconv5]). None = inherit the
    # input capacity. Strided sparse convs *dilate* the active set (a
    # stride-2 3^3 conv can emit ~1.5-2.5x the input sites on LiDAR
    # data, tools/voxel_stats.py), so too-small caps silently truncate
    # the highest-key (largest-y, i.e. left-edge) sites, while every rulebook build /
    # gather / BN scales linearly with capacity -- measure, then size
    # with headroom. `level_caps_eval` overrides at eval time (train and
    # eval run different voxel budgets).
    level_caps: Sequence[int] | None = None
    level_caps_eval: Sequence[int] | None = None

    def _block(self, c, k=3, s=1, p=0, t="subm", key=None, name=None, act="relu", cap=None):
        return SparseConvBlock(
            out_channels=c, kernel_size=k, stride=s, padding=p, conv_type=t,
            indice_key=key, activation=act, out_capacity=cap, name=name,
            axis_name=self.axis_name,
        )

    def _width_tiered(self, st, occ_st, seg, train: bool):
        """Run `seg(mdl, st_w, occ_w)` (a width-preserving subm tail;
        occ_w row-aligned with st_w or None) at the smallest static
        prefix width covering st.nnz, padding the result back to st's
        capacity. Bitwise exact at eval: the table is key-sorted
        valid-first, the tail is width-preserving, and BN runs on
        running stats (see LEVEL_TIER_MIN_CAPACITY note)."""
        cap = st.keys.shape[0]
        # is_initializing: params are width-independent, and creating the
        # tail's compact children for the FIRST time inside a lifted
        # nn.cond branch leaks their init tracers when the whole init is
        # itself jitted (jax.jit(net.init) -> UnexpectedTracerError);
        # setup-registered submodules (btcnet._tiered_backbone's target)
        # don't hit this. Init runs the plain full-width path instead.
        if (train or self.is_initializing()
                or cap // max(int(st.batch_size), 1)
                < LEVEL_TIER_MIN_CAPACITY):
            return seg(self, st, occ_st, {})

        def rup(w):  # Pallas tile alignment
            return -(-w // 256) * 256

        tiers = [w for w in (rup(cap // 4), rup(cap // 2)) if w < cap]
        if not tiers:
            return seg(self, st, occ_st, {})

        def at(width):
            def f(mdl, s, o):
                sw = sparse.prefix(s, width) if width < cap else s
                ow = (sparse.prefix(o, width)
                      if (o is not None and width < cap) else o)
                # fresh rulebook cache per branch: subm rulebooks are
                # keyed by indice_key, and a rulebook built at one tier
                # width must not leak into another branch's width
                out = seg(mdl, sw, ow, {})
                return sparse.pad_capacity(out, cap)
            return f

        def chain(i):
            if i == len(tiers):
                return at(cap)

            def f(mdl, s, o):
                return nn.cond(s.nnz <= tiers[i], at(tiers[i]),
                               chain(i + 1), mdl, s, o)
            return f

        return chain(0)(self, st, occ_st)

    def _cap(self, level: int, train: bool = False, batch_size: int = 1) -> int | None:
        """Per-frame config capacities scale with the batch (one table
        holds all frames)."""
        caps = self.level_caps if (train or self.level_caps_eval is None) else self.level_caps_eval
        if caps is None or level >= len(caps):
            return None
        c = caps[level]
        return int(c) * int(batch_size) if c else None

    @nn.compact
    def __call__(
        self,
        st: sparse.SparseTensor,
        occ_code_features: jax.Array | None,
        train: bool = False,
        cache: dict | None = None,
        stop_after: str | None = None,
    ):
        """`stop_after` in {conv1, conv2, conv3, conv4, out} returns the
        partial level dict early (profiling probes: per-level prefix
        deltas are trustworthy stage costs because XLA DCEs the tail)."""
        if cache is None:
            cache = {}
        ch = list(self.channels)
        exec_ = list(self.occ_conv_exec)
        add = [self.occ_code_num if (i < len(exec_) and exec_[i]) else 0 for i in range(4)]

        occ_st = st.replace(features=occ_code_features) if occ_code_features is not None else None

        x = self._block(ch[0], 3, p=1, key="subm1", name="conv1")(st, cache, train)
        if occ_st is not None and len(exec_) > 0 and exec_[0]:
            x = x.replace(features=jnp.concatenate([x.features, occ_st.features], axis=-1))
            if self.out_att[0]:
                att = self._block(ch[0] + add[0], 3, p=1, key="subm1", name="att_conv1", act="leaky_relu")(x, cache, train)
                x = x.replace(features=x.features * att.features + x.features)
        x_conv1 = self._block(ch[0], 3, p=1, key="subm1", name="conv1_combine")(x, cache, train)
        if stop_after == "conv1":
            return {"x_conv1": x_conv1}

        x_conv2 = self._block(ch[1], 3, s=2, p=1, t="spconv", key="spconv2", name="conv2", cap=self._cap(0, train, st.batch_size))(x_conv1, cache, train)
        if stop_after == "conv2s":
            return {"x_conv2": x_conv2}
        x_occ = occ_st
        if occ_st is not None and len(exec_) > 1:
            x_occ = self._occ_down(1)(occ_st, cache, train) if self.occ_conv_type[1] != "identity" else occ_st
        # L2 subm tail (occ concat + att + combine pair), width-tiered:
        # x_occ shares the spconv2 rulebook, so it is row-aligned with
        # x_conv2 and prefixes identically inside the tier
        cat2 = occ_st is not None and len(exec_) > 1 and exec_[1]
        att2 = (self._block(ch[1] + add[1], 3, p=1, key="subm2",
                            name="att_conv2", act="leaky_relu")
                if (cat2 and self.out_att[1]) else None)
        c2_0 = self._block(ch[1], 3, p=1, key="subm2", name="conv2_combine_0")
        c2_1 = self._block(ch[1], 3, p=1, key="subm2", name="conv2_combine_1")

        def seg2(mdl, s, o, bcache):
            if cat2:
                s = s.replace(features=jnp.concatenate(
                    [s.features, o.features], axis=-1))
                if att2 is not None:
                    a = att2(s, bcache, train)
                    s = s.replace(features=s.features * a.features + s.features)
            s = c2_0(s, bcache, train)
            return c2_1(s, bcache, train)

        x_conv2 = self._width_tiered(x_conv2, x_occ if cat2 else None, seg2, train)
        if stop_after == "conv2":
            return {"x_conv2": x_conv2}

        x_conv3 = self._block(ch[2], 3, s=2, p=1, t="spconv", key="spconv3", name="conv3", cap=self._cap(1, train, st.batch_size))(x_conv2, cache, train)
        if stop_after == "conv3s":
            return {"x_conv3": x_conv3}
        if occ_st is not None and len(exec_) > 2:
            x_occ = self._occ_down(2)(x_occ, cache, train)
        cat3 = occ_st is not None and len(exec_) > 2 and exec_[2]
        c3_0 = self._block(ch[2], 3, p=1, key="subm3", name="conv3_combine_0")
        c3_1 = self._block(ch[2], 3, p=1, key="subm3", name="conv3_combine_1")

        def seg3(mdl, s, o, bcache):
            if cat3:
                s = s.replace(features=jnp.concatenate(
                    [s.features, o.features], axis=-1))
            s = c3_0(s, bcache, train)
            return c3_1(s, bcache, train)

        x_conv3 = self._width_tiered(x_conv3, x_occ if cat3 else None, seg3, train)
        if stop_after == "conv3":
            return {"x_conv3": x_conv3}

        x_conv4 = self._block(ch[3], 3, s=2, p=(0, 1, 1), t="spconv", key="spconv4", name="conv4", cap=self._cap(2, train, st.batch_size))(x_conv3, cache, train)
        if occ_st is not None and len(exec_) > 3:
            x_occ = self._occ_down(3)(x_occ, cache, train)
            if exec_[3]:
                x_conv4 = x_conv4.replace(
                    features=jnp.concatenate([x_conv4.features, x_occ.features], axis=-1)
                )
        x_conv4 = self._block(ch[3], 3, p=1, key="subm4", name="conv4_combine_0")(x_conv4, cache, train)
        x_conv4 = self._block(ch[3], 3, p=1, key="subm4", name="conv4_combine_1")(x_conv4, cache, train)
        if stop_after == "conv4":
            return {"x_conv4": x_conv4}

        # [5, 200, 176] -> [2, 200, 176], stride 8 output for the BEV head
        out = self._block(ch[4], (3, 1, 1), s=(2, 1, 1), p=0, t="spconv", key="spconv_down2", name="conv_out", cap=self._cap(3, train, st.batch_size))(x_conv4, cache, train)
        if stop_after == "out":
            return {"encoded": out}

        x_combine = self._res_combine(x_conv2, x_conv3, x_conv4, out, cache, train)

        # NOTE: the tiered eval path (btcnet._tiered_backbone) only
        # threads `encoded` and `x_combine` through its nn.cond branches;
        # a new key added here must also be padded + returned there or it
        # will KeyError only at full-cap eval.
        return {
            "encoded": out,
            "encoded_stride": 8,
            "x_conv1": x_conv1,
            "x_conv2": x_conv2,
            "x_conv3": x_conv3,
            "x_conv4": x_conv4,
            "x_combine": x_combine,
        }

    def _occ_down(self, level: int):
        """occ-code downsampler for trunk level `level` (reference
        `build_occ_{maxpool,fix,weight,avgpool}_net:793-866`). All four
        reference builders pass `norm_fn=None` -- bare conv/pool, no BN,
        no activation -- so the occ code stays an un-normalized
        probability signal."""
        t = self.occ_conv_type[level] if level < len(self.occ_conv_type) else "maxpool"
        key = f"spconv{level + 1}"
        pad = 1 if level < 3 else (1, 1, 1)
        kw = dict(indice_key=key, use_norm=False, name=f"occ_conv{level+1}",
                  axis_name=self.axis_name)
        if t == "maxpool":
            return SparseConvBlock(out_channels=self.occ_code_num, kernel_size=3,
                                   stride=2, padding=pad, conv_type="maxpool", **kw)
        if t == "fix":
            return SparseConvBlock(out_channels=self.occ_code_num, kernel_size=3,
                                   stride=2, padding=pad, conv_type="fixspconv",
                                   default_value=1.0 / 27, **kw)
        if t == "avgpool":
            return SparseConvBlock(out_channels=self.occ_code_num, kernel_size=2,
                                   stride=2, padding=pad, conv_type="fixspconv",
                                   default_value=1.0, **kw)
        if t == "weight":
            return SparseConvBlock(out_channels=self.occ_code_num, kernel_size=3,
                                   stride=2, padding=pad, conv_type="spconv", **kw)
        raise NotImplementedError(t)

    def _res_combine(self, x_conv2, x_conv3, x_conv4, bev_out, cache, train):
        """reference `res_combine` (`spconv_backbone.py:905-918`)."""
        comb = self.out_feat_type[4]
        if comb == "None":
            return None
        ch = list(self.channels)
        # down2: conv2 grid -> conv4 grid, sharing spconv3/spconv4 rulebooks
        d2 = self._block(ch[1], 3, s=2, p=1, t="spconv", key="spconv3", name="down2_0")(x_conv2, cache, train)
        d2 = self._block(ch[2], 3, s=2, p=(0, 1, 1), t="spconv", key="spconv4", name="down2_1")(d2, cache, train)
        d3 = self._block(ch[2], 3, s=2, p=(0, 1, 1), t="spconv", key="spconv4", name="down3")(x_conv3, cache, train)
        feats = jnp.concatenate([d2.features, d3.features, x_conv4.features], axis=-1)
        x = x_conv4.replace(features=feats)
        if comb == "big_bev_combine":
            sq = self._block(ch[3], (2, 1, 1), s=(2, 1, 1), p=0, t="spconv", key="subm_down2", name="squeezeBev")(bev_out, cache, train)
            dense_bev = sq.dense()  # (B, 1, ny, nx, C)
            B, nz, ny, nx, C = dense_bev.shape
            bev2d = dense_bev.transpose(0, 2, 3, 1, 4).reshape(B, ny, nx, nz * C)
            c = x.coords
            gathered = bev2d[
                jnp.clip(c[:, 0], 0, B - 1), jnp.clip(c[:, 2], 0, ny - 1), jnp.clip(c[:, 3], 0, nx - 1)
            ]
            gathered = jnp.where(x.valid[:, None], gathered, 0.0)
            x = x.replace(features=jnp.concatenate([x.features, gathered], axis=-1))
            x = self._block(ch[3] * 2, 3, p=1, key="subm4", name="down_combine_0")(x, cache, train)
            x = self._block(ch[3] * 2, 3, p=1, key="subm4", name="down_combine_1")(x, cache, train)
            return x
        if comb == "big_combine":
            x = self._block(ch[3] * 2, 3, p=1, key="subm4", name="down_combine_0")(x, cache, train)
            x = self._block(ch[3] * 2, 3, p=1, key="subm4", name="down_combine_1")(x, cache, train)
            return x
        if comb == "combine":
            x = self._block(ch[3] * 2, 3, p=1, key="subm4", name="down_combine_0")(x, cache, train)
            x = self._block(ch[3] * 2, 3, s=(1, 2, 2), p=1, t="spconv", key="spconv5", name="down_combine_1", cap=self._cap(4, train, x.batch_size))(x, cache, train)
            x = self._block(ch[3] * 2, 3, p=1, key="subm5", name="down_combine_2")(x, cache, train)
            return x
        raise NotImplementedError(comb)


class VoxelResBackBone8x(nn.Module):
    """Plain residual 8x backbone (reference `spconv_backbone.py:531-627`;
    unused by the shipped config, kept for registry parity)."""

    input_channels: int
    channels: Sequence[int] = (16, 32, 64, 128, 128)
    axis_name: str | None = None

    def _block(self, c, k=3, s=1, p=0, t="subm", key=None, name=None):
        return SparseConvBlock(
            out_channels=c, kernel_size=k, stride=s, padding=p, conv_type=t,
            indice_key=key, name=name, axis_name=self.axis_name,
        )

    def _res(self, c, key, name, st, cache, train):
        h = self._block(c, 3, p=1, key=key, name=name + "_0")(st, cache, train)
        h = self._block(c, 3, p=1, key=key, name=name + "_1")(h, cache, train)
        return h.replace(features=h.features + st.features)

    @nn.compact
    def __call__(self, st: sparse.SparseTensor, train: bool = False):
        cache: dict = {}
        ch = list(self.channels)
        x = self._block(ch[0], 3, p=1, key="subm1", name="conv_input")(st, cache, train)
        x1 = self._res(ch[0], "res1", "conv1", x, cache, train)
        x = self._block(ch[1], 3, s=2, p=1, t="spconv", key="spconv2", name="conv2")(x1, cache, train)
        x2 = self._res(ch[1], "res2", "conv2b", x, cache, train)
        x = self._block(ch[2], 3, s=2, p=1, t="spconv", key="spconv3", name="conv3")(x2, cache, train)
        x3 = self._res(ch[2], "res3", "conv3b", x, cache, train)
        x = self._block(ch[3], 3, s=2, p=(0, 1, 1), t="spconv", key="spconv4", name="conv4")(x3, cache, train)
        x4 = self._res(ch[3], "res4", "conv4b", x, cache, train)
        out = self._block(ch[4], (3, 1, 1), s=(2, 1, 1), p=0, t="spconv", key="down2", name="conv_out")(x4, cache, train)
        return {"encoded": out, "encoded_stride": 8, "x_conv1": x1, "x_conv2": x2,
                "x_conv3": x3, "x_conv4": x4, "x_combine": None}


# ------------------------------------------------------- occ backbone


class _DenseBN(nn.Module):
    """Masked BN over active cells of a dense (B, D, H, W, C) volume."""

    axis_name: str | None = None

    @nn.compact
    def __call__(self, x, mask, train: bool):
        B, D, H, W, C = x.shape
        y = sparse.MaskedBatchNorm(axis_name=self.axis_name)(
            x.reshape(-1, C), mask.reshape(-1), use_running_average=not train
        )
        return y.reshape(B, D, H, W, C)


def _dilate_mask(mask, kernel, stride, padding):
    """Active-site propagation of a regular sparse conv: out site active
    iff any input in its receptive field is active."""
    # ones-kernel conv + threshold rather than reduce_window(max): same
    # any-in-receptive-field semantics, but avoids a TPU windowing-emitter
    # crash (windowing_util.cc CHECK) when a Pallas call elsewhere in the
    # program perturbs layout assignment around the fused reduce_window
    m = mask[..., None].astype(jnp.float32)
    out = jax.lax.conv_general_dilated(
        m,
        jnp.ones((*kernel, 1, 1), jnp.float32),
        window_strides=stride,
        padding=[(p, p) for p in padding],
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
    )
    return out[..., 0] > 0.5


def _dilate_mask_transpose(mask, kernel, stride, padding):
    m = mask[..., None].astype(jnp.float32)
    out = jax.lax.conv_transpose(
        m,
        jnp.ones((*kernel, 1, 1), jnp.float32),
        strides=stride,
        padding=[(p, p) for p in padding],
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
    )
    return out[..., 0] > 0.5


class _DenseSparseBlock(nn.Module):
    """Dense conv3d that reproduces regular-sparse-conv semantics on the
    small occ grid: conv -> masked BN -> relu -> re-zero inactive."""

    out_channels: int
    kernel: tuple = (3, 3, 3)
    stride: tuple = (1, 1, 1)
    padding: tuple = (1, 1, 1)
    transpose: bool = False
    submanifold: bool = False
    axis_name: str | None = None

    @nn.compact
    def __call__(self, x, mask, train: bool):
        if self.transpose:
            y = nn.ConvTranspose(
                self.out_channels, self.kernel, strides=self.stride,
                padding=[(p, p) for p in self.padding], use_bias=False,
                dtype=common.activation_dtype(),
            )(x)
            new_mask = _dilate_mask_transpose(mask, self.kernel, self.stride, self.padding)
        else:
            y = nn.Conv(
                self.out_channels, self.kernel, strides=self.stride,
                padding=[(p, p) for p in self.padding], use_bias=False,
                dtype=common.activation_dtype(),
            )(x)
            if self.submanifold:
                new_mask = mask
            else:
                new_mask = _dilate_mask(mask, self.kernel, self.stride, self.padding)
        y = _DenseBN(axis_name=self.axis_name)(y, new_mask, train)
        y = nn.relu(y)
        y = jnp.where(new_mask[..., None], y, 0.0)
        return y, new_mask


class VoxelBackBoneDeconv(nn.Module):
    """Occupancy backbone, dense TPU formulation (see module docstring).
    Input: dense (B, nz, ny, nx, C) + active mask. Output at stride 1
    with `channels[1]` features, plus the final active mask.

    y_shift > 0 enables the azimuth wraparound (reference SHIFT): the y
    axis is cyclically padded before the convs and cropped after.
    """

    input_channels: int
    channels: Sequence[int] = (16, 32, 64)
    y_shift: int = 0
    axis_name: str | None = None

    @nn.compact
    def __call__(self, x, mask, train: bool = False):
        ch = list(self.channels)
        if self.y_shift > 0:
            s = self.y_shift
            x = jnp.concatenate([x[:, :, -s:], x, x[:, :, :s]], axis=2)
            mask = jnp.concatenate([mask[:, :, -s:], mask, mask[:, :, :s]], axis=2)
        x, m = _DenseSparseBlock(ch[0], axis_name=self.axis_name, name="conv1")(x, mask, train)
        x, m = _DenseSparseBlock(ch[1], stride=(2, 2, 2), axis_name=self.axis_name, name="conv2_0")(x, m, train)
        x, m = _DenseSparseBlock(ch[1], submanifold=True, axis_name=self.axis_name, name="conv2_1")(x, m, train)
        x, m = _DenseSparseBlock(ch[2], stride=(2, 2, 2), axis_name=self.axis_name, name="conv3_0")(x, m, train)
        x, m = _DenseSparseBlock(ch[2], submanifold=True, axis_name=self.axis_name, name="conv3_1")(x, m, train)
        x, m = _DenseSparseBlock(ch[1], stride=(2, 2, 2), transpose=True, axis_name=self.axis_name, name="deconv4_0")(x, m, train)
        x, m = _DenseSparseBlock(ch[1], submanifold=True, axis_name=self.axis_name, name="deconv4_1")(x, m, train)
        x, m = _DenseSparseBlock(ch[1], stride=(2, 2, 2), transpose=True, axis_name=self.axis_name, name="deconv5_0")(x, m, train)
        x, m = _DenseSparseBlock(ch[1], submanifold=True, axis_name=self.axis_name, name="deconv5_1")(x, m, train)
        if self.y_shift > 0:
            s = self.y_shift
            x, m = x[:, :, s:-s], m[:, :, s:-s]
        # stride-2 down/up does not exactly invert even dims: transpose
        # output is (d-1)//2*2+... ; pad with zeros / crop back to the
        # input grid so heads and loss maps stay aligned
        tgt = mask.shape[1:4]
        if self.y_shift > 0:
            tgt = (tgt[0], tgt[1] - 2 * self.y_shift, tgt[2])
        x = x[:, : tgt[0], : tgt[1], : tgt[2]]
        m = m[:, : tgt[0], : tgt[1], : tgt[2]]
        pads = [(0, 0)] + [(0, tgt[i] - x.shape[1 + i]) for i in range(3)]
        x = jnp.pad(x, pads + [(0, 0)])
        m = jnp.pad(m, pads)
        return x, m


def _crop_pad_to(x, m, tgt):
    """Crop/zero-pad (B, D, H, W, C) + mask to spatial shape `tgt`."""
    x = x[:, : tgt[0], : tgt[1], : tgt[2]]
    m = m[:, : tgt[0], : tgt[1], : tgt[2]]
    pads = [(0, 0)] + [(0, tgt[i] - x.shape[1 + i]) for i in range(3)]
    return jnp.pad(x, pads + [(0, 0)]), jnp.pad(m, pads)


class _DenseResBlock(nn.Module):
    """Two submanifold convs + identity skip (reference
    `SparseBasicBlock`, `spconv_backbone.py:25-88`, dense formulation)."""

    channels: int
    axis_name: str | None = None

    @nn.compact
    def __call__(self, x, mask, train: bool):
        h, _ = _DenseSparseBlock(
            self.channels, submanifold=True, axis_name=self.axis_name,
            name="conv1")(x, mask, train)
        h, _ = _DenseSparseBlock(
            self.channels, submanifold=True, axis_name=self.axis_name,
            name="conv2")(h, mask, train)
        return jnp.where(mask[..., None], h + x, 0.0), mask


class VoxelBackBoneDeconvRes(nn.Module):
    """Residual occ backbone (reference `VoxelBackBoneDeconvRes`,
    `spconv_backbone.py:226-381`): residual blocks per level and lateral
    `combine` skips on the decoder path. The reference combines sparse
    tensors by coordinate union (`combine:306`); densely that is a
    feature add (channel-matched via 1x1 conv) + mask OR."""

    input_channels: int
    channels: Sequence[int] = (16, 32, 64)
    y_shift: int = 0
    axis_name: str | None = None

    @nn.compact
    def __call__(self, x, mask, train: bool = False):
        ch = list(self.channels)
        if self.y_shift > 0:
            s = self.y_shift
            x = jnp.concatenate([x[:, :, -s:], x, x[:, :, :s]], axis=2)
            mask = jnp.concatenate([mask[:, :, -s:], mask, mask[:, :, :s]], axis=2)
        x1, m1 = _DenseSparseBlock(ch[0], axis_name=self.axis_name, name="conv1")(x, mask, train)
        x1, m1 = _DenseResBlock(ch[0], axis_name=self.axis_name, name="res1")(x1, m1, train)
        x2, m2 = _DenseSparseBlock(ch[1], stride=(2, 2, 2), axis_name=self.axis_name, name="conv2_0")(x1, m1, train)
        x2, m2 = _DenseResBlock(ch[1], axis_name=self.axis_name, name="res2")(x2, m2, train)
        x3, m3 = _DenseSparseBlock(ch[2], stride=(2, 2, 2), axis_name=self.axis_name, name="conv3_0")(x2, m2, train)
        x3, m3 = _DenseResBlock(ch[2], axis_name=self.axis_name, name="res3")(x3, m3, train)
        u2, mu2 = _DenseSparseBlock(ch[1], stride=(2, 2, 2), transpose=True, axis_name=self.axis_name, name="deconv4_0")(x3, m3, train)
        u2, mu2 = _crop_pad_to(u2, mu2, x2.shape[1:4])
        u2 = jnp.where((mu2 | m2)[..., None], u2 + x2, 0.0)   # lateral combine
        mu2 = mu2 | m2
        u2, mu2 = _DenseResBlock(ch[1], axis_name=self.axis_name, name="res4")(u2, mu2, train)
        u1, mu1 = _DenseSparseBlock(ch[1], stride=(2, 2, 2), transpose=True, axis_name=self.axis_name, name="deconv5_0")(u2, mu2, train)
        u1, mu1 = _crop_pad_to(u1, mu1, x1.shape[1:4])
        lat1 = nn.Conv(ch[1], (1, 1, 1), use_bias=False, dtype=common.activation_dtype(),
                       name="lat1")(x1)
        u1 = jnp.where((mu1 | m1)[..., None], u1 + lat1, 0.0)
        mu1 = mu1 | m1
        u1, mu1 = _DenseResBlock(ch[1], axis_name=self.axis_name, name="res5")(u1, mu1, train)
        if self.y_shift > 0:
            s = self.y_shift
            u1, mu1 = u1[:, :, s:-s], mu1[:, :, s:-s]
        tgt = mask.shape[1:4]
        if self.y_shift > 0:
            tgt = (tgt[0], tgt[1] - 2 * self.y_shift, tgt[2])
        return _crop_pad_to(u1, mu1, tgt)


class VoxelBackBoneInverseRes(nn.Module):
    """Inverse-conv occ backbone variant (reference
    `VoxelBackBoneInverseRes`, `spconv_backbone.py:385-527`): the decoder
    restores each encoder level's coordinate set (SparseInverseConv3d
    semantics). Densely, inverting a stride-2 conv level = transpose conv
    followed by masking to the ENCODER level's active set (exact
    coordinate restoration, not dilation)."""

    input_channels: int
    channels: Sequence[int] = (16, 32, 64)
    y_shift: int = 0
    axis_name: str | None = None

    @nn.compact
    def __call__(self, x, mask, train: bool = False):
        ch = list(self.channels)
        if self.y_shift > 0:
            s = self.y_shift
            x = jnp.concatenate([x[:, :, -s:], x, x[:, :, :s]], axis=2)
            mask = jnp.concatenate([mask[:, :, -s:], mask, mask[:, :, :s]], axis=2)
        x1, m1 = _DenseSparseBlock(ch[0], axis_name=self.axis_name, name="conv1")(x, mask, train)
        x1, m1 = _DenseResBlock(ch[0], axis_name=self.axis_name, name="res1")(x1, m1, train)
        x2, m2 = _DenseSparseBlock(ch[1], stride=(2, 2, 2), axis_name=self.axis_name, name="conv2_0")(x1, m1, train)
        x2, m2 = _DenseResBlock(ch[1], axis_name=self.axis_name, name="res2")(x2, m2, train)
        x3, m3 = _DenseSparseBlock(ch[2], stride=(2, 2, 2), axis_name=self.axis_name, name="conv3_0")(x2, m2, train)
        x3, m3 = _DenseResBlock(ch[2], axis_name=self.axis_name, name="res3")(x3, m3, train)
        # inverse conv back to level 2's exact active set
        u2, _ = _DenseSparseBlock(ch[1], stride=(2, 2, 2), transpose=True, axis_name=self.axis_name, name="inv4")(x3, m3, train)
        u2, _ = _crop_pad_to(u2, m2, x2.shape[1:4])
        u2 = jnp.where(m2[..., None], u2 + x2, 0.0)
        u2, _ = _DenseResBlock(ch[1], axis_name=self.axis_name, name="res4")(u2, m2, train)
        # inverse conv back to level 1's exact active set
        u1, _ = _DenseSparseBlock(ch[1], stride=(2, 2, 2), transpose=True, axis_name=self.axis_name, name="inv5")(u2, m2, train)
        u1, _ = _crop_pad_to(u1, m1, x1.shape[1:4])
        lat1 = nn.Conv(ch[1], (1, 1, 1), use_bias=False, dtype=common.activation_dtype(),
                       name="lat1")(x1)
        u1 = jnp.where(m1[..., None], u1 + lat1, 0.0)
        u1, _ = _DenseResBlock(ch[1], axis_name=self.axis_name, name="res5")(u1, m1, train)
        m_out = m1
        if self.y_shift > 0:
            s = self.y_shift
            u1, m_out = u1[:, :, s:-s], m_out[:, :, s:-s]
        tgt = mask.shape[1:4]
        if self.y_shift > 0:
            tgt = (tgt[0], tgt[1] - 2 * self.y_shift, tgt[2])
        return _crop_pad_to(u1, m_out, tgt)
