"""The LK flow core: sparse point tracking and dense pyramidal flow fields."""

from lk_tpu.flow.sparse import track_points, build_tracking_pyramid  # noqa: F401
from lk_tpu.flow.dense import (  # noqa: F401
    dense_lk_level,
    dense_pyramidal_lk,
    dense_pyramidal_lk_batched,
    dense_pyramidal_lk_multistream,
    dense_pyramidal_lk_video,
)
