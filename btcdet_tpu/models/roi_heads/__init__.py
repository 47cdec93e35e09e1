from .conv_head import ConvHead  # noqa: F401
