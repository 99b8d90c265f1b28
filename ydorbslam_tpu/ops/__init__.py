from .pyramid import (  # noqa: F401
    build_pyramid,
    gaussian_blur,
    pyramid_shapes,
    scale_factors,
    level_sigma2,
)
from .fast import fast_score_map, nms_and_border, two_threshold_mask  # noqa: F401
from .select import select_topk_cells, level_budgets  # noqa: F401
from .descriptors import (  # noqa: F401
    brief_pattern,
    extract_patches,
    orientation_from_patches,
    brief_from_patches,
)
from .extractor import FrameFeatures, empty_features, extract_orb  # noqa: F401
from .stereo import fill_depth_from_rgbd, stereo_match  # noqa: F401
from .hamming import (  # noqa: F401
    hamming_distance,
    distance_matrix,
    masked_distance_matrix,
    best_and_second,
    ratio_test_matches,
    filter_matches_by_rotation,
    INVALID_DIST,
)
