from .occ_subnet import OccSubnet  # noqa: F401
