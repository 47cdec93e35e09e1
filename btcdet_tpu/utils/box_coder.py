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


class AbsResidualCoder(ResidualCoder):
    """Variant with absolute dims against a fixed template (reference
    `box_coder_utils.AbsResidualCoder`). Dims are encoded as log(d / mean)
    of the per-class mean size passed at construction."""

    def __init__(self, code_size: int = 7, mean_size=(3.9, 1.6, 1.56), **kwargs):
        super().__init__(code_size=code_size, **kwargs)
        self.mean_size = jnp.asarray(mean_size, dtype=jnp.float32)

    def encode(self, boxes, anchors):
        fake_anchors = jnp.concatenate(
            [
                anchors[..., 0:3],
                jnp.broadcast_to(self.mean_size, anchors[..., 3:6].shape),
                anchors[..., 6:],
            ],
            axis=-1,
        )
        return super().encode(boxes, fake_anchors)

    def decode(self, box_encodings, anchors):
        fake_anchors = jnp.concatenate(
            [
                anchors[..., 0:3],
                jnp.broadcast_to(self.mean_size, anchors[..., 3:6].shape),
                anchors[..., 6:],
            ],
            axis=-1,
        )
        return super().decode(box_encodings, fake_anchors)


_CODERS = {
    "ResidualCoder": ResidualCoder,
    "AbsResidualCoder": AbsResidualCoder,
}


def build_box_coder(name: str, **kwargs):
    return _CODERS[name](**kwargs)
