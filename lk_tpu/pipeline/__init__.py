"""The per-frame pipeline: step function, frame-chunk scan, stream batching."""

from lk_tpu.pipeline.state import PipelineState, FrameOutputs, init_pipeline_state  # noqa: F401
from lk_tpu.pipeline.step import make_step, preprocess_frame  # noqa: F401
from lk_tpu.pipeline.runner import make_chunk_runner, VideoPipeline  # noqa: F401
