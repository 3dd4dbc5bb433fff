"""File-based video path: encode an AVI, read it back, run the pipeline.

Covers the reference's VideoCapture/VideoWriter surface end-to-end
(LK_Final.py:79,432-434) without shipping binary fixtures.
"""

import os

import numpy as np
import pytest

from lk_tpu.config import PipelineConfig
from lk_tpu.io.video import SyntheticRoadStream, VideoReader
from lk_tpu.pipeline.runner import VideoPipeline


@pytest.fixture
def avi_path(tmp_path):
    import cv2 as cv

    scene = SyntheticRoadStream(width=640, height=360, zoom=1.03, seed=5,
                                n_frames=24)
    path = str(tmp_path / "clip.avi")
    out = cv.VideoWriter(path, cv.VideoWriter_fourcc(*"MJPG"), 30, (640, 360))
    assert out.isOpened()
    for f in scene:
        out.write(f)
    out.release()
    return path


def test_reader_props_and_frames(avi_path):
    r = VideoReader(avi_path)
    assert (r.width, r.height) == (640, 360)
    frames = list(r)
    r.close()
    assert len(frames) == 24
    assert frames[0].shape == (360, 640, 3)


def test_pipeline_on_file_video(avi_path):
    r = VideoReader(avi_path)
    pipe = VideoPipeline(PipelineConfig(), src_size=(r.width, r.height),
                         chunk=8)
    pipe.run(iter(r))
    r.close()
    assert pipe.frames_done == 23
    # MJPG compression noise shouldn't stop the VP from appearing
    assert len(pipe.csv_rows) > 0


def test_missing_file_raises():
    with pytest.raises(RuntimeError):
        VideoReader("/nonexistent/clip.avi")
