"""Interactive viewer key protocol (ESC/SPACE/BACKSPACE) via a scripted UI.

The real backend (Cv2UI) needs a display; these tests drive
apps.display.interactive_loop with a stub that records shown frames and
replays a key script — verifying the reference's semantics
(LK_Final.py:666-678, VP_detection_using_optical_flow.py:694-695) without
a GUI.
"""

import numpy as np

from lk_tpu.apps.display import BACKSPACE, ESC, SPACE, interactive_loop
from lk_tpu.config import PipelineConfig
from lk_tpu.io.video import SyntheticRoadStream
from lk_tpu.pipeline.runner import VideoPipeline

W, H, F = 430, 242, 9


class ScriptedUI:
    def __init__(self, keys=(), pause_keys=()):
        self.keys = list(keys)          # returned by show(), in order
        self.pause_keys = list(pause_keys)  # returned by wait_key()
        self.shown = []
        self.waits = 0
        self.closed = False

    def show(self, frame):
        self.shown.append(frame.copy())
        return self.keys.pop(0) if self.keys else 255

    def wait_key(self):
        self.waits += 1
        return self.pause_keys.pop(0) if self.pause_keys else SPACE

    def close(self):
        self.closed = True


def _run(ui, frames=F):
    cfg = PipelineConfig(width=W)
    pipe = VideoPipeline(cfg, src_size=(W, H), chunk=4)
    scene = SyntheticRoadStream(width=W, height=H, n_frames=frames, zoom=1.03)
    done = interactive_loop(pipe, cfg, iter(scene), ui)
    return done, pipe, ui


def test_full_run_shows_every_processed_frame():
    done, pipe, ui = _run(ScriptedUI())
    assert done
    assert ui.closed
    # first frame initializes; the other F-1 are processed and shown
    assert len(ui.shown) == F - 1 == pipe.frames_done
    assert ui.shown[0].shape == (pipe.height, pipe.width, 3)


def test_esc_quits_early():
    # ESC on the second shown frame: the first chunk (3 processed frames)
    # may already be computed, but no later chunk is fed
    done, pipe, ui = _run(ScriptedUI(keys=[255, ESC]))
    assert not done
    assert len(ui.shown) == 2
    assert pipe.frames_done <= 4


def test_space_pauses_until_space():
    ui = ScriptedUI(keys=[SPACE], pause_keys=[255, 255, SPACE])
    done, _, ui = _run(ui)
    assert done
    assert ui.waits == 3  # polled until the scripted SPACE arrived
    assert len(ui.shown) == F - 1


def test_space_then_esc_quits():
    ui = ScriptedUI(keys=[SPACE], pause_keys=[ESC])
    done, _, ui = _run(ui)
    assert not done
    assert len(ui.shown) == 1


def test_backspace_clears_track_overlay():
    """BACKSPACE zeroes the accumulated overlay (VP_det.py:694-695).

    A static scene (zoom=1.0) produces no new segments, so a prefilled
    overlay stays untouched without the key and is exactly zero after it.
    """
    cfg = PipelineConfig(width=W)
    scene = SyntheticRoadStream(width=W, height=H, n_frames=F, zoom=1.0)
    frames = [scene.frame(0)] * F  # fully static

    def run(keys):
        pipe = VideoPipeline(cfg, src_size=(W, H), chunk=4)
        mask = np.full((pipe.height, pipe.width, 3), 40, np.uint8)
        ui = ScriptedUI(keys=keys)
        done = interactive_loop(pipe, cfg, iter(frames), ui, draw_mask=mask)
        assert done and len(pipe.segments) == 0
        return mask, ui

    mask_ctl, ui_ctl = run([255, 255])
    assert (mask_ctl == 40).all()  # no key: overlay persists
    mask_clr, ui_clr = run([255, BACKSPACE])
    assert (mask_clr == 0).all()  # cleared from frame 3 onward
    # and the shown frames reflect it: pre-clear identical, post-clear darker
    # (rows 60+ exclude the wall-clock-dependent FPS text)
    np.testing.assert_array_equal(ui_ctl.shown[1][60:], ui_clr.shown[1][60:])
    assert (ui_clr.shown[2][60:].astype(int).sum()
            < ui_ctl.shown[2][60:].astype(int).sum())


def test_roi_schematic_plays_then_frames():
    """schematic=True shows the full ROI mask + 4 quadrant sub-masks first
    (LK_Final.py:461-477), then the processed frames as usual."""
    cfg = PipelineConfig(width=W)
    pipe = VideoPipeline(cfg, src_size=(W, H), chunk=4)
    scene = SyntheticRoadStream(width=W, height=H, n_frames=F, zoom=1.03)
    ui = ScriptedUI()
    done = interactive_loop(pipe, cfg, iter(scene), ui, schematic=True)
    assert done
    assert len(ui.shown) == 5 + F - 1
    # the schematic frames are binary masks at the pipeline geometry
    for img in ui.shown[:5]:
        assert img.shape == (pipe.height, pipe.width)
        assert set(np.unique(img)) <= {0, 255}
    # full trapezoid covers all four quadrant sub-masks
    full = ui.shown[0].astype(bool)
    quads = np.stack([s.astype(bool) for s in ui.shown[1:5]])
    assert (quads.any(0) <= full).all()
    assert ui.shown[5].ndim == 3  # then the video frames


def test_esc_during_schematic_quits():
    cfg = PipelineConfig(width=W)
    pipe = VideoPipeline(cfg, src_size=(W, H), chunk=4)
    scene = SyntheticRoadStream(width=W, height=H, n_frames=F, zoom=1.03)
    ui = ScriptedUI(keys=[255, ESC])
    done = interactive_loop(pipe, cfg, iter(scene), ui, schematic=True)
    assert not done
    assert len(ui.shown) == 2      # quit inside the animation
    assert ui.closed
    assert pipe.frames_done == 0   # nothing was fed


def test_live_plot_updates_per_chunk():
    """LivePlot (reference SHOW_DNMC_PLOT) refreshes once per drained
    chunk and renders on the headless Agg backend."""
    from lk_tpu.apps.display import LivePlot

    cfg = PipelineConfig(width=W)
    pipe = VideoPipeline(cfg, src_size=(W, H), chunk=4)
    scene = SyntheticRoadStream(width=W, height=H, n_frames=F, zoom=1.03)
    lp = LivePlot(W, H, window=cfg.vp_ref)
    try:
        done = interactive_loop(pipe, cfg, iter(scene), ScriptedUI(),
                                live_plot=lp)
        assert done
        # 9 frames / chunk 4: one init+4 chunk, then one 4-frame chunk
        assert lp.updates == 2
        rgba = np.asarray(lp.fig.canvas.buffer_rgba())
        assert rgba.shape[0] > 0 and (rgba[..., :3] < 250).any()
    finally:
        lp.close()
