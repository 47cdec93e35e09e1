"""Box coders (reference `btcdet/utils/box_coder_utils.py`).

`ResidualCoder` is the SECOND encoding used by both the RPN head and the
ROI head in the shipped config: diagonal-normalized center residuals, log
dims, heading residual (`box_coder_utils.py:78-140`). `AbsResidualCoder`
drops the dim residuals (fixed template dims, `box_coder_utils.py:4-76`).
Pure jnp; safe under jit.
"""

from __future__ import annotations

import jax.numpy as jnp


class ResidualCoder:
    def __init__(self, code_size: int = 7, encode_angle_by_sincos: bool = False, **kwargs):
        self.code_size = code_size + (1 if encode_angle_by_sincos else 0)
        self.encode_angle_by_sincos = encode_angle_by_sincos

    def encode(self, boxes, anchors):
        """boxes, anchors: (..., 7 + C) -> (..., code_size)."""
        anchors = jnp.concatenate(
            [anchors[..., 0:3], jnp.clip(anchors[..., 3:6], 1e-5, None), anchors[..., 6:]], axis=-1
        )
        boxes = jnp.concatenate(
            [boxes[..., 0:3], jnp.clip(boxes[..., 3:6], 1e-5, None), boxes[..., 6:]], axis=-1
        )
        xa, ya, za, dxa, dya, dza, ra = [anchors[..., i] for i in range(7)]
        xg, yg, zg, dxg, dyg, dzg, rg = [boxes[..., i] for i in range(7)]

        diagonal = jnp.sqrt(dxa**2 + dya**2)
        xt = (xg - xa) / diagonal
        yt = (yg - ya) / diagonal
        zt = (zg - za) / dza
        dxt = jnp.log(dxg / dxa)
        dyt = jnp.log(dyg / dya)
        dzt = jnp.log(dzg / dza)
        if self.encode_angle_by_sincos:
            rts = [jnp.cos(rg) - jnp.cos(ra), jnp.sin(rg) - jnp.sin(ra)]
        else:
            rts = [rg - ra]
        extras = [boxes[..., 7 + i] - anchors[..., 7 + i] for i in range(boxes.shape[-1] - 7)]
        return jnp.stack([xt, yt, zt, dxt, dyt, dzt, *rts, *extras], axis=-1)

    def decode(self, box_encodings, anchors):
        """box_encodings: (..., code_size), anchors: (..., 7 + C)."""
        xa, ya, za, dxa, dya, dza, ra = [anchors[..., i] for i in range(7)]
        if self.encode_angle_by_sincos:
            xt, yt, zt, dxt, dyt, dzt, cost, sint = [box_encodings[..., i] for i in range(8)]
            n_extra = box_encodings.shape[-1] - 8
            extra0 = 8
        else:
            xt, yt, zt, dxt, dyt, dzt, rt = [box_encodings[..., i] for i in range(7)]
            n_extra = box_encodings.shape[-1] - 7
            extra0 = 7

        diagonal = jnp.sqrt(dxa**2 + dya**2)
        xg = xt * diagonal + xa
        yg = yt * diagonal + ya
        zg = zt * dza + za
        dxg = jnp.exp(dxt) * dxa
        dyg = jnp.exp(dyt) * dya
        dzg = jnp.exp(dzt) * dza
        if self.encode_angle_by_sincos:
            rg = jnp.arctan2(sint + jnp.sin(ra), cost + jnp.cos(ra))
        else:
            rg = rt + ra
        extras = [box_encodings[..., extra0 + i] + anchors[..., 7 + i] for i in range(n_extra)]
        return jnp.stack([xg, yg, zg, dxg, dyg, dzg, rg, *extras], axis=-1)


class AbsResidualCoder:
    """Absolute-difference coder (reference
    `box_coder_utils.AbsResidualCoder:4-76`): every component is a plain
    difference vs the anchor (no diagonal normalization, no log dims);
    heading optionally as (cos g - cos a, sin g - sin a)."""

    def __init__(self, code_size: int = 7, encode_angle_by_sincos: bool = False, **kwargs):
        self.code_size = code_size + (1 if encode_angle_by_sincos else 0)
        self.encode_angle_by_sincos = encode_angle_by_sincos

    def encode(self, boxes, anchors):
        da = jnp.clip(anchors[..., 3:6], 1e-5, None)
        dg = jnp.clip(boxes[..., 3:6], 1e-5, None)
        ctr = boxes[..., 0:3] - anchors[..., 0:3]
        dim = dg - da
        ra, rg = anchors[..., 6:7], boxes[..., 6:7]
        if self.encode_angle_by_sincos:
            rot = jnp.concatenate(
                [jnp.cos(rg) - jnp.cos(ra), jnp.sin(rg) - jnp.sin(ra)], axis=-1)
        else:
            rot = rg - ra
        extra = boxes[..., 7:] - anchors[..., 7:]
        return jnp.concatenate([ctr, dim, rot, extra], axis=-1)

    def decode(self, box_encodings, anchors):
        ctr = box_encodings[..., 0:3] + anchors[..., 0:3]
        dim = box_encodings[..., 3:6] + anchors[..., 3:6]
        ra = anchors[..., 6:7]
        if self.encode_angle_by_sincos:
            rg = jnp.arctan2(
                box_encodings[..., 7:8] + jnp.sin(ra),
                box_encodings[..., 6:7] + jnp.cos(ra))
            extra = box_encodings[..., 8:] + anchors[..., 7:]
        else:
            rg = box_encodings[..., 6:7] + ra
            extra = box_encodings[..., 7:] + anchors[..., 7:]
        return jnp.concatenate([ctr, dim, rg, extra], axis=-1)


class DeltaXYZWLHRBBoxCoder(ResidualCoder):
    """Plain delta coder: center deltas normalized by diagonal, dim log
    ratios, rot residual -- same math as ResidualCoder here (the
    reference keeps both names; `box_coder_utils.DeltaXYZWLHRBBoxCoder`)."""


class PreviousResidualDecoder:
    """Decode-only legacy coder (reference
    `box_coder_utils.PreviousResidualDecoder`)."""

    code_size = 7

    @staticmethod
    def decode(box_encodings, anchors):
        xa, ya, za, dxa, dya, dza, ra = [anchors[..., i] for i in range(7)]
        xt, yt, zt, wt, lt, ht, rt = [box_encodings[..., i] for i in range(7)]
        diagonal = jnp.sqrt(dxa**2 + dya**2)
        xg = xt * diagonal + xa
        yg = yt * diagonal + ya
        zg = zt * dza + za
        dxg = jnp.exp(lt) * dxa
        dyg = jnp.exp(wt) * dya
        dzg = jnp.exp(ht) * dza
        out = jnp.stack([xg, yg, zg, dxg, dyg, dzg, rt + ra], axis=-1)
        # extras (code_size > 7) decode additively like the reference's
        # `*cts` tail (box_coder_utils.PreviousResidualDecoder)
        extra = box_encodings[..., 7:] + anchors[..., 7:]
        return jnp.concatenate([out, extra], axis=-1)


class PreviousResidualRoIDecoder(PreviousResidualDecoder):
    """Decode-only legacy RoI coder (reference
    `box_coder_utils.PreviousResidualRoIDecoder:185-216`): identical to
    PreviousResidualDecoder except the heading decodes as ra - rt."""

    @staticmethod
    def decode(box_encodings, anchors):
        out = PreviousResidualDecoder.decode(box_encodings, anchors)
        rg = anchors[..., 6] - box_encodings[..., 6]
        return jnp.concatenate(
            [out[..., :6], rg[..., None], out[..., 7:]], axis=-1)


class PointResidualCoder:
    """Point-anchored coder (CenterPoint-style; reference
    `box_coder_utils.PointResidualCoder`): boxes encoded against bare
    points with per-class mean sizes."""

    def __init__(self, code_size: int = 8, use_mean_size: bool = True, mean_size=None, **kwargs):
        self.code_size = code_size
        self.use_mean_size = use_mean_size
        self.mean_size = (
            jnp.asarray(mean_size, jnp.float32)
            if mean_size is not None
            else jnp.asarray([[3.9, 1.6, 1.56]], jnp.float32)
        )

    def encode(self, boxes, points, gt_classes=None):
        xg, yg, zg, dxg, dyg, dzg, rg = [boxes[..., i] for i in range(7)]
        xa, ya, za = points[..., 0], points[..., 1], points[..., 2]
        if self.use_mean_size:
            cls_idx = (gt_classes - 1) if gt_classes is not None else 0
            mean = self.mean_size[cls_idx]
            dxa, dya, dza = mean[..., 0], mean[..., 1], mean[..., 2]
            diag = jnp.sqrt(dxa**2 + dya**2)
            xt, yt, zt = (xg - xa) / diag, (yg - ya) / diag, (zg - za) / dza
            dxt, dyt, dzt = jnp.log(dxg / dxa), jnp.log(dyg / dya), jnp.log(dzg / dza)
        else:
            xt, yt, zt = xg - xa, yg - ya, zg - za
            dxt, dyt, dzt = jnp.log(dxg), jnp.log(dyg), jnp.log(dzg)
        return jnp.stack([xt, yt, zt, dxt, dyt, dzt, jnp.cos(rg), jnp.sin(rg)], axis=-1)

    def decode(self, box_encodings, points, pred_classes=None):
        xt, yt, zt, dxt, dyt, dzt, cost, sint = [box_encodings[..., i] for i in range(8)]
        xa, ya, za = points[..., 0], points[..., 1], points[..., 2]
        if self.use_mean_size:
            cls_idx = (pred_classes - 1) if pred_classes is not None else 0
            mean = self.mean_size[cls_idx]
            dxa, dya, dza = mean[..., 0], mean[..., 1], mean[..., 2]
            diag = jnp.sqrt(dxa**2 + dya**2)
            xg, yg, zg = xt * diag + xa, yt * diag + ya, zt * dza + za
            dxg, dyg, dzg = jnp.exp(dxt) * dxa, jnp.exp(dyt) * dya, jnp.exp(dzt) * dza
        else:
            xg, yg, zg = xt + xa, yt + ya, zt + za
            dxg, dyg, dzg = jnp.exp(dxt), jnp.exp(dyt), jnp.exp(dzt)
        rg = jnp.arctan2(sint, cost)
        return jnp.stack([xg, yg, zg, dxg, dyg, dzg, rg], axis=-1)


_CODERS = {
    "ResidualCoder": ResidualCoder,
    "AbsResidualCoder": AbsResidualCoder,
    "DeltaXYZWLHRBBoxCoder": DeltaXYZWLHRBBoxCoder,
    "PreviousResidualDecoder": PreviousResidualDecoder,
    "PreviousResidualRoIDecoder": PreviousResidualRoIDecoder,
    "PointResidualCoder": PointResidualCoder,
}


def build_box_coder(name: str, **kwargs):
    return _CODERS[name](**kwargs)
