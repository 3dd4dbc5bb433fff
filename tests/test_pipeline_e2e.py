"""End-to-end VP pipeline on a synthetic driving scene.

The ground-truth vanishing point is known by construction; we also run a
pure-OpenCV oracle pipeline (cv.goodFeaturesToTrack + cv.calcOpticalFlowPyrLK
feeding the NumPy VP oracle) to bound divergence the way the reference would
behave (SURVEY.md §4: corner-set differences make bitwise trajectory parity
unachievable; we assert tolerance bands instead).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from lk_tpu.config import PipelineConfig
from lk_tpu.io.video import SyntheticRoadStream
from lk_tpu.pipeline.runner import VideoPipeline

from oracle_vp import OracleVP, oracle_line


@pytest.fixture(scope="module")
def scene():
    return SyntheticRoadStream(width=860, height=484, zoom=1.03, seed=3,
                               n_frames=40)


def test_pipeline_vp_converges(scene):
    cfg = PipelineConfig()
    pipe = VideoPipeline(cfg, src_size=(scene.width, scene.height), chunk=8)
    pipe.run(iter(scene))
    assert pipe.frames_done == scene.n_frames - 1
    rows = np.array(pipe.csv_rows)
    assert len(rows) > 10, "VP never initialized"
    # ground truth VP (src == processed size here)
    gt = np.array(scene.vp)
    tail = rows[len(rows) // 2:]
    err = np.linalg.norm(tail.mean(axis=0) - gt)
    assert err < 25.0, (tail.mean(axis=0), gt)
    # duplicate-row semantics: shown frames without updates repeat the value
    dup = (np.diff(rows, axis=0) == 0).all(axis=1).mean()
    assert dup > 0.05


def test_pipeline_segments_collected(scene):
    cfg = PipelineConfig()
    pipe = VideoPipeline(cfg, src_size=(scene.width, scene.height), chunk=8)
    pipe.run(iter(scene))
    assert len(pipe.segments) > 50
    seg = pipe.segments[0]
    assert seg["start"].shape == (2,) and seg["stop"].shape == (2,)


def test_pipeline_matches_cv_oracle_band(scene):
    """Our trajectory and a full-OpenCV pipeline's trajectory agree on where
    the VP is (band comparison, not bitwise)."""
    import cv2 as cv

    cfg = PipelineConfig()
    pipe = VideoPipeline(cfg, src_size=(scene.width, scene.height), chunk=8)
    pipe.run(iter(scene))
    ours = np.array(pipe.csv_rows)

    # --- OpenCV oracle pipeline -----------------------------------------
    from lk_tpu.ops.rasterize import build_roi_masks, roi_mask_points

    W = cfg.width
    H = cfg.derived_height(scene.height, scene.width)
    p = roi_mask_points(W, H, cfg.roi)
    sub_quads = [p[[0, 8, 1, 2]], p[[0, 2, 3, 4]], p[[0, 4, 5, 6]],
                 p[[0, 6, 7, 8]]]
    sub_masks = []
    full = np.zeros((H, W), np.uint8)
    full = cv.fillPoly(full, [p[[1, 3, 5, 7]]], 255)
    for q in sub_quads:
        m = np.zeros((H, W), np.uint8)
        sub_masks.append(cv.fillPoly(m, [q], 255))

    def proc(f):
        g = cv.cvtColor(f, cv.COLOR_BGR2GRAY)
        g = cv.resize(g, (W, H), interpolation=cv.INTER_AREA)
        return cv.GaussianBlur(g, (3, 3), 0)

    fp = dict(maxCorners=5, qualityLevel=0.3, minDistance=7, blockSize=7)
    lk = dict(winSize=(15, 15), maxLevel=2,
              criteria=(cv.TERM_CRITERIA_EPS | cv.TERM_CRITERIA_COUNT, 10, 0.03))

    frames = [proc(f) for f in scene]
    oracle = OracleVP(cfg, W, H)
    groups = []
    for j in range(2):
        pts = []
        for i in range(2):
            r = cv.goodFeaturesToTrack(frames[0], mask=sub_masks[j * 2 + i], **fp)
            if r is not None:
                pts.extend(r.reshape(-1, 2))
        groups.append(np.array(pts, np.float32))
    avg_len = [cfg.min_fl_len, cfg.min_fl_len]
    tp_ult = 0
    for t in range(1, len(frames)):
        lines = []
        for n in range(2):
            if len(groups[n]) == 0:
                continue
            p1, st, _ = cv.calcOpticalFlowPyrLK(
                frames[t - 1], frames[t],
                groups[n].reshape(-1, 1, 2), None, **lk)
            p1 = p1.reshape(-1, 2)
            st = st.reshape(-1).astype(bool)
            for k in range(len(st)):
                if st[k]:
                    x, y = int(np.floor(p1[k][0])), int(np.floor(p1[k][1]))
                    if not (0 <= x < W and 0 <= y < H and full[y, x] > 0):
                        st[k] = False
            good_new, good_old = p1[st], groups[n][st]
            groups[n] = good_new
            for old, new in zip(good_old, good_new):
                if (old == new).all():
                    continue
                ol = oracle_line(old, new)
                if ol["angle"] > 180 and ol["length"] > cfg.min_fl_len:
                    avg_len[n] = (avg_len[n] + ol["length"] * cfg.fl_update_rate) \
                        / (1 + cfg.fl_update_rate)
                    if ol["length"] > avg_len[n]:
                        lines.append(ol)
        oracle.process_frame(lines)
        total = sum(len(g) for g in groups)
        if total < cfg.tp_num * cfg.tp_update_rate or tp_ult == cfg.tp_update_time:
            tp_ult = 0
            new_groups = []
            for j in range(2):
                pts = []
                for i in range(2):
                    r = cv.goodFeaturesToTrack(
                        frames[t], mask=sub_masks[j * 2 + i], **fp)
                    if r is not None:
                        pts.extend(r.reshape(-1, 2))
                new_groups.append(np.array(pts, np.float32))
            if len(new_groups[0]) and len(new_groups[1]):
                groups = new_groups
        tp_ult += 1

    ref = np.array(oracle.csv_rows)
    assert len(ref) > 10
    # band comparison on the settled half of each trajectory
    ours_tail = ours[len(ours) // 2:].mean(axis=0)
    ref_tail = ref[len(ref) // 2:].mean(axis=0)
    assert np.linalg.norm(ours_tail - ref_tail) < 20.0, (ours_tail, ref_tail)


def test_vp_hide_and_reinit_on_scene_change():
    """A VP jump mid-stream must hide the stale VP (HIDE_VP_THOLD frames
    without a valid CP) and re-initialize at the new one (LK_Final.py:629-633
    semantics, end-to-end).  Uses the VP_det preset: its avg_len reset on
    hide (VP_det:644-648) exists precisely because LK_Final's inflated EMA
    after a scene jump delays re-initialization."""
    import dataclasses

    from lk_tpu.models import VP_DETECT

    s1 = SyntheticRoadStream(width=430, height=242, zoom=1.05, seed=3,
                             n_frames=50, vp=(160, 100))
    s2 = SyntheticRoadStream(width=430, height=242, zoom=1.05, seed=9,
                             n_frames=50, vp=(270, 120))
    frames = [s1.frame(t) for t in range(50)] + [s2.frame(t) for t in range(50)]
    cfg = dataclasses.replace(VP_DETECT, width=430, hide_vp_thold=10)
    pipe = VideoPipeline(cfg, src_size=(430, 242), chunk=10)
    pipe.run(iter(frames))
    vpf = pipe.vp_per_frame
    hidden = [i for i, v in enumerate(vpf) if v is None and i > 40]
    assert hidden, "VP never hid after the scene change"
    second = np.array([v for v in vpf[max(hidden) + 1:] if v is not None])
    assert len(second) > 5, "VP never re-initialized"
    err = np.linalg.norm(second[len(second) // 2:].mean(0) - (270, 120))
    assert err < 30, err


def test_compact_outputs_match_uncapped(scene):
    """out_cap compaction transports the identical row streams.

    The capped runner compacts update/CP rows on device (runner.
    _compact_chunk_outputs) and the drain reconstructs them from counts —
    every host-visible sink must match the uncapped run exactly."""
    import dataclasses

    base = PipelineConfig()
    ref = VideoPipeline(base, src_size=(scene.width, scene.height), chunk=8)
    ref.run(iter(scene))
    capped = VideoPipeline(dataclasses.replace(base, out_cap=48),
                           src_size=(scene.width, scene.height), chunk=8)
    capped.run(iter(scene))
    assert capped.csv_rows == ref.csv_rows
    assert capped.cross_points == ref.cross_points
    assert capped.vp_per_frame == ref.vp_per_frame
    assert len(capped.segments) == len(ref.segments)
    for a, b in zip(capped.segments, ref.segments):
        np.testing.assert_array_equal(a["start"], b["start"])
        np.testing.assert_array_equal(a["stop"], b["stop"])


def test_compact_outputs_overflow_raises(scene):
    """A chunk emitting more rows than the budget fails loudly, not silently."""
    import dataclasses

    pipe = VideoPipeline(dataclasses.replace(PipelineConfig(), out_cap=1),
                         src_size=(scene.width, scene.height), chunk=8)
    with pytest.raises(RuntimeError, match="compaction overflow"):
        pipe.run(iter(scene))


def test_compact_outputs_match_uncapped_batched(scene):
    """Batched (MultiStreamPipeline) capped transport == uncapped transport.

    Same batched compute path both ways (the batched tracker's fp noise vs
    the single-stream path is covered elsewhere); only the output transport
    differs, and it must be lossless."""
    import dataclasses

    from lk_tpu.pipeline.runner import MultiStreamPipeline

    frames = [scene.frame(t) for t in range(24)]
    base = PipelineConfig()

    def run_ms(cfg):
        ms = MultiStreamPipeline(cfg, src_size=(scene.width, scene.height),
                                 n_streams=2, chunk=8)
        batch = np.stack([np.stack(frames)] * 2)
        t = 0
        while t < len(frames):
            n = min(8 + (1 if ms.states is None else 0), len(frames) - t)
            ms.feed(batch[:, t:t + n])
            t += n
        ms.drain()
        return ms

    ref = run_ms(base)
    capped = run_ms(dataclasses.replace(base, out_cap=48))
    for p, q in zip(capped.pipes, ref.pipes):
        assert p.csv_rows == q.csv_rows
        assert p.cross_points == q.cross_points
        assert p.vp_per_frame == q.vp_per_frame


def test_ragged_stream_lifecycles():
    """Streams of different lengths share one batch: mid-chunk ends keep an
    exact output prefix (n_valid), finished slots are recycled on device
    (assign_stream), and every logical stream's sink matches its own
    isolated batched run (SURVEY.md §7 hard part 5)."""
    import dataclasses

    from lk_tpu.pipeline.runner import MultiStreamPipeline

    cfg = dataclasses.replace(PipelineConfig(), width=430, out_cap=48)
    w, h = 430, 242
    sa = SyntheticRoadStream(width=w, height=h, zoom=1.03, seed=3,
                             n_frames=25)
    sb = SyntheticRoadStream(width=w, height=h, zoom=1.04, seed=5,
                             n_frames=17, vp=(150, 110))
    sc = SyntheticRoadStream(width=w, height=h, zoom=1.03, seed=7,
                             n_frames=21, vp=(250, 120))
    sd = SyntheticRoadStream(width=w, height=h, zoom=1.05, seed=9,
                             n_frames=9, vp=(200, 130))
    A = [sa.frame(t) for t in range(25)]
    B = [sb.frame(t) for t in range(17)]
    C = [sc.frame(t) for t in range(21)]
    D = [sd.frame(t) for t in range(9)]

    ms = MultiStreamPipeline(cfg, src_size=(w, h), n_streams=3, chunk=8)
    # feed 1 (init + 8): frames 0..8 of A/B/C
    ms.feed(np.stack([np.stack(A[:9]), np.stack(B[:9]), np.stack(C[:9])]))
    # feed 2: frames 9..16 — B ends exactly at this chunk boundary
    ms.feed(np.stack([np.stack(A[9:17]), np.stack(B[9:17]),
                      np.stack(C[9:17])]))
    ms.finish_stream(1)
    sink_b = ms.pipes[1]
    # recycle slot 1 for D (frame 0 consumed by on-device init)
    d0 = ms.pipes[0]._ingest(np.stack(D[:1]))[0]
    sink_d = ms.assign_stream(1, d0)
    # feed 3: A frames 17..24, D frames 1..8, C frames 17..20 + 4 padding
    pad_c = np.stack(C[17:21] + [C[20]] * 4)
    ms.feed(np.stack([np.stack(A[17:25]), np.stack(D[1:9]), pad_c]),
            n_valid=np.array([8, 8, 4]))
    ms.drain()

    sinks = {"A": ms.pipes[0], "B": sink_b, "C": ms.pipes[2], "D": sink_d}
    assert sink_b in ms.retired
    for name, frames in [("A", A), ("B", B), ("C", C), ("D", D)]:
        ref = MultiStreamPipeline(cfg, src_size=(w, h), n_streams=1, chunk=8)
        t = 0
        while t < len(frames):
            n = min(8 + (1 if ref.states is None else 0), len(frames) - t)
            ref.feed(np.stack(frames[t:t + n])[None])
            t += n
        ref.drain()
        got, want = sinks[name], ref.pipes[0]
        assert got.frames_done == want.frames_done == len(frames) - 1, name
        assert len(got.csv_rows) == len(want.csv_rows), name
        if got.csv_rows:
            np.testing.assert_allclose(
                np.array(got.csv_rows, np.float64),
                np.array(want.csv_rows, np.float64), atol=1e-4,
                err_msg=name)
        assert len(got.vp_per_frame) == len(want.vp_per_frame), name
        for u, v in zip(got.vp_per_frame, want.vp_per_frame):
            if v is None:
                assert u is None, name
            else:
                assert u == pytest.approx(v, abs=1e-4), name
        assert len(got.cross_points) == len(want.cross_points), name


def test_staged_feed_matches_processed_feed(scene):
    """feed_staged (ONE fused slice+finish+scan dispatch over a time-major
    u8 staging array — the serving prestage hot path) == feed_processed
    with the same per-chunk finish applied separately."""
    import dataclasses

    import cv2 as cv

    from lk_tpu.pipeline.runner import MultiStreamPipeline

    cfg = dataclasses.replace(PipelineConfig(), out_cap=48)
    b, f, chunk = 2, 24, 8
    ms_kw = dict(src_size=(scene.width, scene.height), n_streams=b,
                 chunk=chunk)
    ref = MultiStreamPipeline(cfg, **ms_kw)
    staged = MultiStreamPipeline(cfg, **ms_kw)
    h, w = ref.height, ref.width

    u8 = np.empty((f, b, h, w), np.uint8)
    for t in range(f):
        g = cv.cvtColor(scene.frame(t), cv.COLOR_BGR2GRAY)
        g = cv.resize(g, (w, h), interpolation=cv.INTER_AREA)
        u8[t] = g[None]
    grays_fb = jnp.asarray(u8)

    finish = ref.pipes[0]._finish_jit
    t = 0
    while t < f:
        n = min(chunk + (1 if ref.states is None else 0), f - t)
        chunk_f32 = finish(
            jnp.swapaxes(grays_fb[t:t + n], 0, 1).reshape(b * n, h, w)
        ).reshape(b, n, h, w)
        ref.feed_processed(chunk_f32)
        staged.feed_staged(grays_fb, t, n)
        t += n
    ref.drain()
    staged.drain()

    for p, q in zip(staged.pipes, ref.pipes):
        assert p.frames_done == q.frames_done
        np.testing.assert_allclose(
            np.array(p.csv_rows, np.float64).reshape(-1, 2),
            np.array(q.csv_rows, np.float64).reshape(-1, 2), atol=1e-4)
        assert len(p.cross_points) == len(q.cross_points)


def test_staged_feed_src_resolution_matches_processed():
    """feed_staged with SOURCE-resolution u8 staging (the on-device
    INTER_AREA resize runs inside the fused dispatch — BASELINE config #5's
    end-to-end serving form) == feed_processed given the same resize+finish
    applied via the identical ops."""
    import dataclasses

    import cv2 as cv

    from lk_tpu.ops.resize import resize_area
    from lk_tpu.pipeline.runner import MultiStreamPipeline

    cfg = dataclasses.replace(PipelineConfig(), out_cap=48)
    b, f, chunk = 2, 16, 8
    src = SyntheticRoadStream(width=1280, height=720, zoom=1.03, seed=3,
                              n_frames=f)
    hs, ws = src.height, src.width
    ms_kw = dict(src_size=(ws, hs), n_streams=b, chunk=chunk)
    ref = MultiStreamPipeline(cfg, **ms_kw)
    staged = MultiStreamPipeline(cfg, **ms_kw)
    h, w = ref.height, ref.width
    assert (h, w) != (hs, ws)   # the resize must be real

    u8 = np.empty((f, b, hs, ws), np.uint8)
    for t in range(f):
        u8[t] = cv.cvtColor(src.frame(t), cv.COLOR_BGR2GRAY)[None]
    src_fb = jnp.asarray(u8)

    finish = ref.pipes[0]._finish_jit
    t = 0
    while t < f:
        n = min(chunk + (1 if ref.states is None else 0), f - t)
        flat = src_fb[t:t + n].reshape(n * b, hs, ws)
        chunk_f32 = finish(resize_area(flat, h, w)).reshape(n, b, h, w)
        ref.feed_processed(jnp.swapaxes(chunk_f32, 0, 1))
        staged.feed_staged(src_fb, t, n)
        t += n
    ref.drain()
    staged.drain()

    for p, q in zip(staged.pipes, ref.pipes):
        assert p.frames_done == q.frames_done
        np.testing.assert_allclose(
            np.array(p.csv_rows, np.float64).reshape(-1, 2),
            np.array(q.csv_rows, np.float64).reshape(-1, 2), atol=1e-4)
        assert len(p.cross_points) == len(q.cross_points)
