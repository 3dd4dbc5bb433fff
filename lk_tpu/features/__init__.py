"""Feature selection: Shi–Tomasi corners (goodFeaturesToTrack equivalent)."""

from lk_tpu.features.shi_tomasi import (  # noqa: F401
    good_features_from_response,
    good_features_to_track,
    min_eig_response,
)
