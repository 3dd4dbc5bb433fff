"""Flow-line geometry and the vanishing-point state machine."""

from lk_tpu.geometry.flowlines import flow_line_stats, flow_line_filter  # noqa: F401
from lk_tpu.geometry.crosspoints import cross_point_pairs, PAIR_INDICES  # noqa: F401
from lk_tpu.geometry.vanishing import (  # noqa: F401
    VPState,
    init_vp_state,
    process_frame_pairs,
    vp_show_step,
    vanishing_lines,
)
from lk_tpu.geometry.hough import (  # noqa: F401
    HoughResult,
    hough_peaks,
    hough_road_lines,
    hough_vote,
    segment_line_params,
)
