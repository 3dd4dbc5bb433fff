"""Host runtime: video ingest, synthetic streams, CSV/pickle/video sinks."""

from lk_tpu.io.video import SyntheticRoadStream, VideoReader, open_stream  # noqa: F401
from lk_tpu.io.sink import (  # noqa: F401
    save_vp_csv, read_vp_csv, save_segments_pickle, save_object, read_object,
)
from lk_tpu.io.raw import RawFrameReader, write_lkraw  # noqa: F401
