"""Native framepack library tests (builds with g++ on first use)."""

import os
import threading

import numpy as np
import pytest

from vr_video_generator_tpu import native

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="no C++ toolchain")


def test_bgr_to_rgb_roundtrip(rng):
    img = rng.integers(0, 256, (32, 48, 3), dtype=np.uint8)
    out = native.bgr_to_rgb(img)
    np.testing.assert_array_equal(out, img[:, :, ::-1])
    np.testing.assert_array_equal(native.bgr_to_rgb(out), img)


def test_pack_batch(rng):
    frames = [rng.integers(0, 256, (8, 6, 3), dtype=np.uint8) for _ in range(4)]
    batch = native.pack_batch(frames)
    np.testing.assert_array_equal(batch, np.stack(frames))


def test_pipe_read_write(rng):
    r, w = os.pipe()
    data = rng.integers(0, 256, (1 << 16,), dtype=np.uint8)
    t = threading.Thread(target=lambda: (native.write_full(w, data), os.close(w)))
    t.start()
    buf = np.empty_like(data)
    got = native.read_full(r, buf)
    t.join()
    os.close(r)
    assert got == data.nbytes
    np.testing.assert_array_equal(buf, data)


def test_frame_ring(rng):
    ring = native.FrameRing(4, (4, 4, 3))
    frames = [rng.integers(0, 256, (4, 4, 3), dtype=np.uint8) for _ in range(6)]
    assert ring.try_get() is None
    for f in frames[:4]:
        assert ring.try_put(f)
    assert not ring.try_put(frames[4])  # full
    assert len(ring) == 4
    for f in frames[:4]:
        np.testing.assert_array_equal(ring.try_get(), f)
    assert ring.try_get() is None
    # producer/consumer across threads
    def produce():
        for f in frames:
            while not ring.try_put(f):
                pass
    t = threading.Thread(target=produce)
    t.start()
    seen = []
    while len(seen) < 6:
        out = ring.try_get()
        if out is not None:
            seen.append(out)
    t.join()
    for a, b in zip(seen, frames):
        np.testing.assert_array_equal(a, b)
    ring.close()
