"""Frame-chunk scanning and the host-facing video pipeline driver.

The reference processes one frame per Python-loop iteration with ~10
Python<->C++ crossings (SURVEY.md §3.1); here a chunk of T frames is one
``lax.scan`` inside one jit — the host only feeds raw frame batches and
drains per-chunk outputs.  Batching over independent streams is a leading
vmap axis (SURVEY.md §2.5: streams are the natural data-parallel axis).
"""

from __future__ import annotations

from typing import Iterable, List, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from lk_tpu.config import PipelineConfig
from lk_tpu.ops.rasterize import build_roi_masks
from lk_tpu.pipeline.state import (
    FrameOutputs,
    PipelineState,
    init_pipeline_state,
)
from lk_tpu.pipeline.step import make_step, preprocess_frame


import functools


@functools.lru_cache(maxsize=32)
def _cached_runner(cfg: PipelineConfig, frame_size: Tuple[int, int]):
    """One compiled runner per (config, geometry) — N same-shape streams
    (the serving case) share a single executable instead of re-jitting
    per VideoPipeline instance."""
    run_chunk, init_fn, masks = make_chunk_runner(cfg, frame_size)
    import jax as _jax

    return _jax.jit(run_chunk), _jax.jit(init_fn), masks


@functools.lru_cache(maxsize=32)
def _cached_preprocess(cfg: PipelineConfig, out_h: int, out_w: int):
    import jax as _jax

    return _jax.jit(lambda f: preprocess_frame(f, cfg, out_h, out_w))


@functools.lru_cache(maxsize=32)
def _cached_finish(cfg: PipelineConfig):
    import jax as _jax

    from lk_tpu.ops.blur import gaussian_blur3
    from lk_tpu.ops.tone import contrast_brightness

    def _finish(g):
        g = g.astype(jnp.float32)
        if cfg.contrast_enhance:
            g = contrast_brightness(g)
        return gaussian_blur3(g)

    return _jax.jit(_jax.vmap(_finish))


def make_chunk_runner(cfg: PipelineConfig, frame_size: Tuple[int, int]):
    """Returns (run_chunk, init_fn, masks) for processed-gray frame chunks.

    run_chunk(state, frames (T, H, W)) -> (state, FrameOutputs stacked on T).
    init_fn(first_gray) -> PipelineState with the initial detection applied
    (reference LK_Final.py:481-492 detects on the first frame before looping).
    """
    width, height = frame_size
    roi_mask, sub_masks = build_roi_masks(width, height, cfg.roi)
    step, detect = make_step(cfg, frame_size, roi_mask, sub_masks)

    def run_chunk(state: PipelineState, frames: jnp.ndarray):
        return jax.lax.scan(step, state, frames)

    def init_fn(first_gray: jnp.ndarray) -> PipelineState:
        st = init_pipeline_state(first_gray, cfg)
        pts, valid = detect(first_gray.astype(jnp.float32))
        return st._replace(pts=pts, valid=valid)

    return run_chunk, init_fn, (roi_mask, sub_masks)


class VideoPipeline:
    """Host driver: feeds frames, drains CSV rows — the ``Run()`` equivalent.

    Mirrors the reference's observable outputs: ``csv_rows`` reproduces
    vps_<video>.csv (row per VP update + row per shown frame,
    LK_Final.py:612-614,637-638,722), ``segments`` collects accepted flow
    lines (the line_segments.pkl content, LK_Final.py:375-377,559).
    """

    def __init__(
        self,
        cfg: PipelineConfig,
        src_size: Tuple[int, int],          # (W, H) of raw frames
        chunk: int = 8,
        host_preprocess: bool = False,
    ):
        self.cfg = cfg
        self.src_w, self.src_h = src_size
        self.height = cfg.derived_height(self.src_h, self.src_w)
        self.width = cfg.width
        self.chunk = chunk
        # host_preprocess: convert+resize on the host and upload small u8
        # grays instead of raw BGR — 6.7x less host->device traffic (the
        # axon tunnel measures ~36 MB/s) and u8-rounded resize exactly like
        # the reference's cv2 path.
        self.host_preprocess = host_preprocess
        self._run_jit, self.init_fn, self.masks = _cached_runner(
            cfg, (self.width, self.height)
        )
        self._pre_jit = _cached_preprocess(cfg, self.height, self.width)
        self._finish_jit = _cached_finish(cfg)
        self.state: Optional[PipelineState] = None
        self.csv_rows: List[Tuple[float, float]] = []
        self.segments: List[dict] = []
        self.cross_points: List[Tuple[float, float]] = []
        self.motion_rows: List[Tuple[float, ...]] = []
        self.vp_per_frame: List[Optional[Tuple[float, float]]] = []
        self.frames_done = 0
        # True once the first fed frame was used for initialization (fresh
        # runs); resumed runs process every fed frame (overlay alignment).
        self.consumed_init_frame = False
        self._pending_resume: Optional[str] = None
        self._pending_outs: List[FrameOutputs] = []
        self.drain_every = 4  # chunks buffered before a host readback

    def drain(self) -> None:
        """Flush buffered per-chunk outputs to the host sinks."""
        for outs in self._pending_outs:
            self._drain(outs)
        self._pending_outs.clear()

    def resume_from(self, path: str) -> None:
        """Restore pipeline state from a checkpoint on the next feed()."""
        self._pending_resume = path

    def _ckpt_meta(self) -> str:
        """Identity string tying a checkpoint to this pipeline's config."""
        return f"{self.width}x{self.height}|{self.cfg!r}"

    def save_checkpoint(self, path: str) -> str:
        from lk_tpu.utils.checkpoint import save_state

        if self.state is None:
            raise RuntimeError("no state to checkpoint yet")
        return save_state(self.state, path, meta=self._ckpt_meta())

    def _ingest(self, frames_u8: np.ndarray) -> jnp.ndarray:
        if self.host_preprocess:
            import cv2 as cv

            grays = np.empty(
                (len(frames_u8), self.height, self.width), np.uint8
            )
            for k, f in enumerate(frames_u8):
                g = cv.cvtColor(np.asarray(f), cv.COLOR_BGR2GRAY)
                grays[k] = cv.resize(g, (self.width, self.height),
                                     interpolation=cv.INTER_AREA)
            return self._finish_jit(jnp.asarray(grays))
        x = jnp.asarray(frames_u8)
        return jax.vmap(self._pre_jit)(x) if x.ndim == 4 else self._pre_jit(x)

    def feed(self, frames_u8: np.ndarray) -> FrameOutputs:
        """Process (T, Hs, Ws, 3) u8 BGR frames; returns stacked outputs."""
        grays = self._ingest(frames_u8)
        if self.state is None:
            if self._pending_resume is not None:
                # Restore the full state (incl. prev_gray): every fed frame
                # is then processed — none is consumed for initialization.
                # init_pipeline_state is shape-only (no detection dispatch);
                # load_state overwrites all leaves anyway.
                from lk_tpu.utils.checkpoint import load_state

                template = init_pipeline_state(grays[0], self.cfg)
                self.state = load_state(
                    template, self._pending_resume, meta=self._ckpt_meta()
                )
                self._pending_resume = None
            else:
                self.state = self.init_fn(grays[0])
                self.consumed_init_frame = True
                grays = grays[1:]
                if grays.shape[0] == 0:
                    return None
        self.state, outs = self._run_jit(self.state, grays)
        # Defer the device->host fetch: dispatch is async, so stashing the
        # handles lets the next chunk's compute overlap this chunk's readback
        # (the axon tunnel costs ~33 ms per synchronous round trip).
        self._pending_outs.append(outs)
        if len(self._pending_outs) >= self.drain_every:
            self.drain()
        return outs

    def _drain(self, outs: FrameOutputs) -> None:
        # One device->host transfer for the whole pytree: per-array fetches
        # each pay the full tunnel round trip (~33 ms measured) and dominated
        # the host loop.
        outs = jax.device_get(outs)
        t = outs.show_mask.shape[0]
        upd_rows = np.asarray(outs.update_rows)
        upd_mask = np.asarray(outs.update_mask)
        show_rows = np.asarray(outs.show_row)
        show_mask = np.asarray(outs.show_mask)
        seg_s = np.asarray(outs.line_start)
        seg_e = np.asarray(outs.line_stop)
        seg_m = np.asarray(outs.line_mask)
        cp_xy = np.asarray(outs.cp_xy)
        cp_m = np.asarray(outs.cp_mask)
        fracs = np.asarray(outs.motion_fracs)
        for k in range(t):
            self.motion_rows.append(tuple(np.round(fracs[k], 4)))
            for c in cp_xy[k][cp_m[k]]:
                self.cross_points.append((float(c[0]), float(c[1])))
            if self.cfg.csv_rows_on_update:
                for r in upd_rows[k][upd_mask[k]]:
                    self.csv_rows.append((float(r[0]), float(r[1])))
            if show_mask[k]:
                self.csv_rows.append(
                    (float(show_rows[k][0]), float(show_rows[k][1]))
                )
                self.vp_per_frame.append(
                    (float(show_rows[k][0]), float(show_rows[k][1]))
                )
            else:
                self.vp_per_frame.append(None)
            for a, b in zip(seg_s[k][seg_m[k]], seg_e[k][seg_m[k]]):
                self.segments.append(
                    dict(start=a.copy(), stop=b.copy())
                )
            self.frames_done += 1

    def run(self, frames: Iterable[np.ndarray]) -> None:
        """Consume an iterable of single (Hs, Ws, 3) u8 frames in chunks."""
        buf: List[np.ndarray] = []
        for f in frames:
            buf.append(f)
            if len(buf) == self.chunk + (1 if self.state is None else 0):
                self.feed(np.stack(buf))
                buf.clear()
        if buf:
            self.feed(np.stack(buf))
        self.drain()
