from .mesh import (  # noqa: F401
    get_dist_info,
    init_distributed,
    make_mesh,
    merge_results_dist,
)
