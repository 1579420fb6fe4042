from .quality import missing_census, normalize_sentinels  # noqa: F401
from .impute import (  # noqa: F401
    impute_with_group_median,
    proximity_mean_impute,
    run_impute_strategy,
    seasonal_median_impute,
    zero_impute,
)
from .windows import lead_labels, sliding_frame_avg  # noqa: F401
from .relational import mode_top1, top_k  # noqa: F401
from .profile import profile_categorical, profile_numeric  # noqa: F401
