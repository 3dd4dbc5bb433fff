"""Aux subsystems: checkpoint/resume, homography, viz, profiling."""

import numpy as np
import pytest

import jax.numpy as jnp

from lk_tpu.config import PipelineConfig
from lk_tpu.ops.homography import get_perspective_transform, warp_perspective
from lk_tpu.pipeline.state import init_pipeline_state
from lk_tpu.utils.checkpoint import load_state, save_state
from lk_tpu.utils.profiling import FrameRateMeter, Spans


class TestCheckpoint:
    def test_roundtrip_pipeline_state(self, tmp_path, rng):
        cfg = PipelineConfig()
        gray = jnp.asarray(rng.random((48, 64)).astype(np.float32))
        st = init_pipeline_state(gray, cfg)
        st = st._replace(tp_ult=jnp.int32(7))
        p = str(tmp_path / "ck.npz")
        save_state(st, p)
        st2 = load_state(init_pipeline_state(gray * 0, cfg), p)
        assert int(st2.tp_ult) == 7
        np.testing.assert_allclose(np.asarray(st2.prev_gray),
                                   np.asarray(st.prev_gray))

    def test_shape_mismatch_rejected(self, tmp_path, rng):
        cfg = PipelineConfig()
        gray = jnp.asarray(rng.random((48, 64)).astype(np.float32))
        st = init_pipeline_state(gray, cfg)
        p = str(tmp_path / "ck.npz")
        save_state(st, p)
        other = init_pipeline_state(
            jnp.zeros((24, 32), jnp.float32), cfg
        )
        with pytest.raises(ValueError):
            load_state(other, p)


class TestHomography:
    def test_matches_cv(self, rng):
        import cv2 as cv

        src = np.float32([[10, 10], [90, 12], [88, 70], [12, 72]])
        dst = np.float32([[0, 0], [100, 0], [100, 80], [0, 80]])
        ours = np.asarray(get_perspective_transform(src, dst))
        ref = cv.getPerspectiveTransform(src, dst)
        np.testing.assert_allclose(ours / ours[2, 2], ref / ref[2, 2],
                                   rtol=1e-3, atol=1e-3)

    def test_warp_matches_cv(self, rng):
        import cv2 as cv

        img = (rng.random((80, 100)) * 255).astype(np.float32)
        src = np.float32([[10, 10], [90, 12], [88, 70], [12, 72]])
        dst = np.float32([[0, 0], [100, 0], [100, 80], [0, 80]])
        h = cv.getPerspectiveTransform(src, dst)
        ref = cv.warpPerspective(img, h, (100, 80))
        ours = np.asarray(warp_perspective(jnp.asarray(img), jnp.asarray(h),
                                           80, 100))
        # compare interior (border handling differs: clamp vs zero-fill)
        np.testing.assert_allclose(ours[5:-5, 5:-5], ref[5:-5, 5:-5], atol=1.0)


class TestViz:
    def test_figures_render(self, tmp_path, rng):
        from lk_tpu import viz

        hist = rng.random((50, 2)) * 100 + 300
        cps = rng.random((80, 2)) * 100 + 300
        p1 = viz.plot_vp_figure(hist, cps, (430, 240), 860, 483,
                                out_path=str(tmp_path / "a.png"))
        p2 = viz.vp_distribution_figure(hist[:, 0], hist[:, 1], 860, 483,
                                        out_path=str(tmp_path / "b.png"))
        segs = [dict(start=np.array([10.0, 10.0]), stop=np.array([20.0, 30.0]))]
        p3 = viz.all_lines_image(segs, 860, 483, (430, 240),
                                 out_path=str(tmp_path / "c.png"))
        import os

        assert all(os.path.getsize(p) > 1000 for p in (p1, p2, p3))


class TestProfiling:
    def test_fps_meter(self, monkeypatch):
        # Synthetic clock: wall-clock independent (sleep-based timing made
        # this flake under load — advisor round 1).
        import lk_tpu.utils.profiling as prof

        t = iter(0.01 * k for k in range(100))
        monkeypatch.setattr(prof.time, "perf_counter", lambda: next(t))
        m = FrameRateMeter(window=5)
        for _ in range(5):
            m.tick()
        # 5 ticks at exactly 10 ms apart -> 100 fps
        assert abs(m.fps - 100.0) < 1e-6

    def test_spans(self):
        s = Spans()
        with s("a"):
            pass
        with s("a"):
            pass
        assert s.count["a"] == 2
        assert "a" in s.summary()


class TestResumeExactness:
    def test_split_run_matches_continuous(self, tmp_path):
        """checkpoint at frame k + resume == one uninterrupted run."""
        from lk_tpu.config import PipelineConfig
        from lk_tpu.io.video import SyntheticRoadStream
        from lk_tpu.pipeline.runner import VideoPipeline

        scene = SyntheticRoadStream(width=430, height=242, zoom=1.03,
                                    seed=11, n_frames=24)
        frames = [scene.frame(t) for t in range(24)]
        cfg = PipelineConfig(width=430)

        full = VideoPipeline(cfg, src_size=(430, 242), chunk=4)
        full.run(iter(frames))

        first = VideoPipeline(cfg, src_size=(430, 242), chunk=4)
        first.run(iter(frames[:12]))
        ck = str(tmp_path / "ck.npz")
        first.save_checkpoint(ck)

        second = VideoPipeline(cfg, src_size=(430, 242), chunk=4)
        second.resume_from(ck)
        second.run(iter(frames[12:]))

        joined = first.csv_rows + second.csv_rows
        assert len(joined) == len(full.csv_rows)
        np.testing.assert_allclose(
            np.array(joined), np.array(full.csv_rows), atol=1e-4
        )

    def test_resume_across_presets_fails_loudly(self, tmp_path):
        """A checkpoint saved under one preset must not silently resume a
        pipeline with a different config (same shapes, different semantics)."""
        import dataclasses
        import pytest
        from lk_tpu.io.video import SyntheticRoadStream
        from lk_tpu.models import FINAL, VP_DETECT
        from lk_tpu.pipeline.runner import VideoPipeline

        w = FINAL.width
        scene = SyntheticRoadStream(width=w, height=242, zoom=1.03,
                                    seed=11, n_frames=8)
        frames = [scene.frame(t) for t in range(8)]
        pipe = VideoPipeline(FINAL, src_size=(w, 242), chunk=4)
        pipe.run(iter(frames))
        ck = str(tmp_path / "ck.npz")
        pipe.save_checkpoint(ck)

        other = VideoPipeline(
            dataclasses.replace(VP_DETECT, width=w),
            src_size=(w, 242), chunk=4,
        )
        other.resume_from(ck)
        with pytest.raises(ValueError, match="identity mismatch"):
            other.run(iter(frames))

    def test_load_state_rejects_dtype_mismatch(self, tmp_path):
        from lk_tpu.utils.checkpoint import load_state, save_state

        state = {"a": np.zeros((3,), np.float32), "b": np.ones((2,), np.int32)}
        p = str(tmp_path / "s.npz")
        save_state(state, p)
        bad = {"a": np.zeros((3,), np.float32), "b": np.ones((2,), np.float32)}
        import pytest

        with pytest.raises(ValueError, match="dtype"):
            load_state(bad, p)

    def test_load_state_rejects_structure_mismatch(self, tmp_path):
        from lk_tpu.utils.checkpoint import load_state, save_state

        state = {"a": np.zeros((3,), np.float32)}
        p = str(tmp_path / "s.npz")
        save_state(state, p)
        import pytest

        with pytest.raises(ValueError, match="structure"):
            load_state({"z": np.zeros((3,), np.float32)}, p)


def test_batched_dense_odd_height(rng):
    """Odd frame heights must not hang the guard computation (regression)."""
    from lk_tpu.config import LKConfig
    from lk_tpu.flow.dense import dense_pyramidal_lk_batched

    prev = jnp.asarray((rng.random((2, 97, 128)) * 255).astype(np.float32))
    nxt = jnp.asarray((rng.random((2, 97, 128)) * 255).astype(np.float32))
    flow = dense_pyramidal_lk_batched(prev, nxt, LKConfig())
    assert flow.shape == (2, 97, 128, 2)
