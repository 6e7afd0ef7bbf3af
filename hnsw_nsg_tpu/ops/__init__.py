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
from .bruteforce import brute_force_topk, recall  # noqa: F401
from .topk import (  # noqa: F401
    empty_retset,
    init_retset,
    mask_internal_dups,
    merge_into_retset,
    topk_smallest,
)
