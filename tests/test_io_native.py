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
