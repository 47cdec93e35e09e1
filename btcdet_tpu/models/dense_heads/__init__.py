from .anchor_head import AnchorHeadSingle, generate_anchors  # noqa: F401
