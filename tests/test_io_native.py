"""Native framestore (C++ ring-buffer prefetch) + LKRAW container."""

import numpy as np
import pytest

from lk_tpu.io.raw import RawFrameReader, write_lkraw
from lk_tpu.io.native import get_lib


@pytest.fixture
def raw_file(tmp_path, rng):
    frames = rng.integers(0, 256, (20, 32, 48, 3), dtype=np.uint8)
    path = str(tmp_path / "clip.lkraw")
    write_lkraw(path, frames)
    return path, frames


def test_native_lib_builds():
    assert get_lib() is not None, "g++ build of framestore failed"


def test_roundtrip_native(raw_file):
    path, frames = raw_file
    r = RawFrameReader(path, ring=4)
    assert r.native
    assert (r.width, r.height, r.channels, r.nframes) == (48, 32, 3, 20)
    got = []
    while True:
        b = r.next_batch(6)
        if b is None:
            break
        got.append(b)
    r.close()
    out = np.concatenate(got)
    np.testing.assert_array_equal(out, frames)


def test_downscale2(raw_file):
    path, frames = raw_file
    r = RawFrameReader(path, ring=4, downscale=2)
    parts = []
    while True:
        p = r.next_batch(20)
        if p is None:
            break
        parts.append(p)
    b = np.concatenate(parts)
    r.close()
    assert b.shape == (20, 16, 24, 3)
    ref = frames.astype(np.uint16)
    ref = (ref[:, ::2, ::2] + ref[:, 1::2, ::2] + ref[:, ::2, 1::2]
           + ref[:, 1::2, 1::2] + 2) >> 2
    np.testing.assert_array_equal(b, ref.astype(np.uint8))


def test_iterator(raw_file):
    path, frames = raw_file
    r = RawFrameReader(path)
    seen = sum(1 for _ in r)
    r.close()
    assert seen == 20


def test_truncated_file_clamps_nframes(raw_file, tmp_path):
    """A truncated LKRAW must not read past the mapping (native) or the
    memmap (fallback): nframes clamps to the full frames present."""
    path, frames = raw_file
    data = open(path, "rb").read()
    hdr = 20  # _HDR.size
    frame_bytes = 32 * 48 * 3
    cut = str(tmp_path / "cut.lkraw")
    # keep 7 full frames plus half of the 8th; header still claims 20
    with open(cut, "wb") as fh:
        fh.write(data[: hdr + 7 * frame_bytes + frame_bytes // 2])
    readers = [RawFrameReader(cut, ring=4), _fallback_reader(cut)]
    for r in readers:
        assert r.nframes == 7
        got = []
        while True:
            b = r.next_batch(4)
            if b is None:
                break
            got.append(b)
        r.close()
        out = np.concatenate(got)
        np.testing.assert_array_equal(out, frames[:7])


def test_corrupt_header_rejected(tmp_path):
    bad = str(tmp_path / "bad.lkraw")
    with open(bad, "wb") as fh:
        fh.write(b"NOPE" + b"\x00" * 16)
    lib = get_lib()
    if lib is not None:
        assert lib.fs_open(bad.encode(), 4, 1) is None
    with pytest.raises(ValueError):
        _fallback_reader(bad)
    tiny = str(tmp_path / "tiny.lkraw")
    with open(tiny, "wb") as fh:
        fh.write(b"LKRW\x01")  # shorter than the header
    if lib is not None:
        assert lib.fs_open(tiny.encode(), 4, 1) is None
    with pytest.raises(ValueError):
        _fallback_reader(tiny)


def test_bad_downscale_rejected(raw_file):
    path, _ = raw_file
    with pytest.raises(ValueError):
        RawFrameReader(path, downscale=3)
    lib = get_lib()
    if lib is not None:
        assert lib.fs_open(path.encode(), 4, 4) is None


def _fallback_reader(path):
    """Build a RawFrameReader forced onto the NumPy fallback path."""
    import lk_tpu.io.raw as raw_mod

    orig = raw_mod.get_lib
    raw_mod.get_lib = lambda: None
    try:
        return RawFrameReader(path)
    finally:
        raw_mod.get_lib = orig
