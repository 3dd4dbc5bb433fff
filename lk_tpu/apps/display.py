"""Interactive viewer: the reference's live window + key loop, optional.

Reproduces the reference UI semantics (LK_Final.py:655-678,
VP_detection_using_optical_flow.py:668-695): the frame shown is the raw
resized frame plus an accumulating track overlay (``cv.add``), an FPS
counter drawn twice (dark outline + bright fill), and the key protocol —
ESC (27) quits, SPACE (32) pauses until the next SPACE, BACKSPACE (8)
clears the accumulated overlay (VP_det behavior).

The pipeline itself stays chunked and jitted; the viewer drains after every
chunk and replays that chunk's frames with their per-frame VP.  Track
segments join the overlay at chunk granularity (the device computes a chunk
at a time — a documented presentation-only deviation from the reference's
per-frame accumulation).

The UI backend is injectable: ``Cv2UI`` drives a real window (requires a
display — gated by ``Cv2UI.available()``); tests script key sequences
through a stub.
"""

from __future__ import annotations

import os
from typing import List, Optional

import numpy as np

from lk_tpu.utils.profiling import FrameRateMeter

ESC, BACKSPACE, SPACE = 27, 8, 32


class Cv2UI:
    """Real cv2 window backend (``imshow`` + ``waitKey``)."""

    def __init__(self, window: str = "frame", wait_ms: int = 10):
        # waitKey(10) caps the loop at <=100 fps exactly like the
        # reference (LK_Final.py:672)
        self.window = window
        self.wait_ms = wait_ms

    @staticmethod
    def available() -> bool:
        if os.name != "nt" and not os.environ.get("DISPLAY"):
            return False
        try:
            import cv2  # noqa: F401

            return True
        except ImportError:
            return False

    def show(self, frame: np.ndarray) -> int:
        import cv2 as cv

        cv.imshow(self.window, frame)
        return cv.waitKey(self.wait_ms) & 0xFF

    def wait_key(self) -> int:
        import cv2 as cv

        return cv.waitKey(30) & 0xFF

    def close(self):
        import cv2 as cv

        cv.destroyWindow(self.window)


def _render(raw, poly, vp_xy, draw_mask, fps):
    import cv2 as cv

    h, w = draw_mask.shape[:2]
    frame = cv.resize(np.asarray(raw), (w, h), interpolation=cv.INTER_AREA)
    frame = cv.polylines(frame, [poly], True, (0, 0, 100), 2)
    frame = cv.circle(frame, (w // 2, h // 2), 6, (0, 0, 255), -1)
    if vp_xy is not None and np.isfinite(vp_xy).all():
        frame = cv.circle(frame, (int(vp_xy[0]), int(vp_xy[1])), 6,
                          (0, 255, 100), -1)
    # FPS drawn twice — dark outline then bright fill (LK_Final.py:655-660)
    txt = f"fps: {int(fps)}"
    frame = cv.putText(frame, txt, (20, 40), cv.FONT_HERSHEY_SIMPLEX,
                       1.0, (0, 0, 0), 4, cv.LINE_AA)
    frame = cv.putText(frame, txt, (20, 40), cv.FONT_HERSHEY_SIMPLEX,
                       1.0, (200, 255, 200), 1, cv.LINE_AA)
    return cv.add(frame, draw_mask)


def interactive_loop(pipe, cfg, frames, ui,
                     draw_mask: Optional[np.ndarray] = None) -> bool:
    """Feed ``frames`` through ``pipe`` chunk-wise, displaying each frame.

    Returns True if the stream completed, False on ESC quit.  ``ui`` must
    provide ``show(frame) -> keycode``, ``wait_key() -> keycode``, and
    ``close()``.  ``draw_mask`` is the accumulating track overlay (created
    fresh when None; injectable so tests can observe the BACKSPACE clear).
    """
    import cv2 as cv

    from lk_tpu.ops.rasterize import roi_mask_points

    w, h = pipe.width, pipe.height
    poly = roi_mask_points(w, h, cfg.roi)[[1, 3, 5, 7]]
    if draw_mask is None:
        draw_mask = np.zeros((h, w, 3), np.uint8)
    meter = FrameRateMeter()
    rng = np.random.default_rng(0)  # per-track colors like the reference
    seg_seen = vp_seen = 0
    buf: List[np.ndarray] = []
    completed = True

    def show_chunk(chunk_frames) -> bool:
        nonlocal seg_seen, vp_seen
        pipe.drain()
        for seg in pipe.segments[seg_seen:]:
            a, b = seg["start"], seg["stop"]
            color = tuple(int(c) for c in rng.integers(0, 255, 3))
            cv.line(draw_mask, (int(a[0]), int(a[1])),
                    (int(b[0]), int(b[1])), color, 2)
        seg_seen = len(pipe.segments)
        for raw in chunk_frames:
            vp = (pipe.vp_per_frame[vp_seen]
                  if vp_seen < len(pipe.vp_per_frame) else None)
            vp_seen += 1
            key = ui.show(_render(raw, poly, vp, draw_mask, meter.tick()))
            if key == ESC:
                return False
            if key == BACKSPACE:  # clear overlay (VP_det.py:694-695)
                draw_mask[:] = 0
            if key == SPACE:  # pause until the next SPACE (or quit on ESC)
                while True:
                    k2 = ui.wait_key()
                    if k2 == SPACE:
                        break
                    if k2 == ESC:
                        return False
        return True

    pipe.drain_every = 1
    try:
        for f in frames:
            buf.append(f)
            if len(buf) < pipe.chunk + (1 if pipe.state is None else 0):
                continue
            fresh = pipe.state is None
            chunk = np.stack(buf)
            buf.clear()
            pipe.feed(chunk)
            # a fresh run consumes the first frame for initialization; only
            # processed frames have a vp_per_frame entry
            if not show_chunk(chunk[1:] if fresh else chunk):
                completed = False
                break
        if completed and buf:
            fresh = pipe.state is None
            chunk = np.stack(buf)
            pipe.feed(chunk)
            completed = show_chunk(chunk[1:] if fresh else chunk)
    finally:
        pipe.drain()
        ui.close()
    return completed
