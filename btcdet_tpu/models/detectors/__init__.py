from .btcnet import BtcNet, build_network  # noqa: F401
