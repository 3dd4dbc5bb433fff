"""Golden-trajectory regression: the full pipeline's VP CSV on a fixed
synthetic clip must not drift across refactors (the framework's analogue of
the reference's committed vps/*.csv artifacts, SURVEY.md §4)."""

import csv
import os

import numpy as np

from lk_tpu.config import PipelineConfig
from lk_tpu.io.video import SyntheticRoadStream
from lk_tpu.pipeline.runner import VideoPipeline

GOLDEN = os.path.join(os.path.dirname(__file__), "golden",
                      "vps_synthetic_seed42.csv")


def test_vp_trajectory_matches_golden():
    scene = SyntheticRoadStream(width=860, height=484, zoom=1.03, seed=42,
                                n_frames=36)
    pipe = VideoPipeline(PipelineConfig(), src_size=(860, 484), chunk=8)
    pipe.run(iter(scene))
    got = np.array(pipe.csv_rows, np.float64)

    with open(GOLDEN) as f:
        rows = list(csv.reader(f))[1:]
    want = np.array([[float(a), float(b)] for a, b in rows], np.float64)

    assert len(got) == len(want), (len(got), len(want))
    # float drift tolerance; row count and trajectory shape must be identical
    np.testing.assert_allclose(got, want, atol=0.05)
