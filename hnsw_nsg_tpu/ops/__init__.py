from .distance import (  # noqa: F401
    PAD_DIST,
    PAD_ID,
    VALID_METRICS,
    gathered_dists,
    normalize,
    pairwise_dists,
    point_dists,
    squared_norms,
)
from .bruteforce import (  # noqa: F401
    brute_force_topk,
    brute_force_topk_approx,
    knn_graph_exact,
    recall,
)
from .topk import (  # noqa: F401
    empty_retset,
    init_retset,
    mask_internal_dups,
    merge_into_retset,
    topk_smallest,
)
