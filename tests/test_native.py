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


def test_reader_native_vs_numpy_decode(tmp_path, monkeypatch, rng):
    """read_into through the native swizzle must equal the numpy fallback."""
    import cv2

    from vr_video_generator_tpu.video import reader as reader_mod
    from vr_video_generator_tpu.video.reader import VideoReader

    path = str(tmp_path / "in.mp4")
    wr = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), 10, (64, 48))
    for i in range(8):
        wr.write(rng.integers(0, 256, (48, 64, 3), dtype=np.uint8))
    wr.release()

    with VideoReader(path, backend="cv2") as r:
        native_frames = [f.copy() for f in r.frames(0, 8)]
    monkeypatch.setattr(reader_mod, "_native_ok", False)
    with VideoReader(path, backend="cv2") as r:
        numpy_frames = [f.copy() for f in r.frames(0, 8)]
    for a, b in zip(native_frames, numpy_frames):
        np.testing.assert_array_equal(a, b)


def test_writer_native_pipe_path(tmp_path, rng):
    """SubclipWriter's ffmpeg branch writes raw frames through the native
    write_full fd path; substitute `cat` for the encoder and check bytes."""
    from vr_video_generator_tpu.video.writer import SubclipWriter

    out = str(tmp_path / "sub") + os.sep
    frames = [rng.integers(0, 256, (12, 16, 3), dtype=np.uint8) for _ in range(5)]
    w = SubclipWriter(out, 10.0, 16, 12, backend="ffmpeg",
                      ffmpeg_config=["sh", "-c", 'cat > "$0"'])
    path = w.write_clip(0, frames)
    w.close()
    assert path.endswith("0_4.mp4")
    with open(path, "rb") as f:
        raw = f.read()
    np.testing.assert_array_equal(
        np.frombuffer(raw, np.uint8), np.stack(frames).reshape(-1))


def test_decode_batches_native_staging(tmp_path, rng):
    """The segment decode thread fills contiguous staging buffers equal to
    the per-frame reader output (native read_into path end-to-end)."""
    import cv2
    import queue

    from vr_video_generator_tpu.runtime.segment import _decode_batches
    from vr_video_generator_tpu.video.reader import VideoReader

    path = str(tmp_path / "in.mp4")
    wr = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), 10, (64, 48))
    for i in range(10):
        wr.write(rng.integers(0, 256, (48, 64, 3), dtype=np.uint8))
    wr.release()

    with VideoReader(path, backend="cv2") as r:
        want = np.stack([f for f in r.frames(0, 10)])
    q = queue.Queue()
    with VideoReader(path, backend="cv2") as r:
        _decode_batches(r, 0, 10, 4, q)
    got = []
    while True:
        b = q.get()
        if b is None:
            break
        assert b.flags.c_contiguous
        got.append(b)
    assert [b.shape[0] for b in got] == [4, 4, 2]
    np.testing.assert_array_equal(np.concatenate(got), want)


def test_native_unpack_sbs_matches_np():
    import numpy as np
    import pytest
    from vr_video_generator_tpu import native

    if not native.available():
        pytest.skip("native toolchain unavailable")
    rng = np.random.default_rng(5)
    packed = rng.integers(0, 1 << 24, (17, 130), dtype=np.uint32)
    got = native.unpack_sbs(packed)
    np.testing.assert_array_equal(got, native.unpack_sbs_np(packed))


def test_native_kernels_random_shape_sweep(rng):
    """Seeded fuzz of the C++ byte kernels vs numpy at random (odd) shapes:
    BGR->RGB swizzle and packed-u32 SBS unpack, including strides that are
    not multiples of the 16-byte vector width."""
    sweep = np.random.default_rng(55)
    for trial in range(10):
        h = int(sweep.integers(1, 130))
        w = int(sweep.integers(1, 257))
        bgr = sweep.integers(0, 256, (h, w, 3), dtype=np.uint8)
        got = native.bgr_to_rgb(bgr)
        np.testing.assert_array_equal(got, bgr[:, :, ::-1],
                                      err_msg=f"trial {trial} h={h} w={w}")
        packed = sweep.integers(0, 2 ** 24, (h, w), dtype=np.uint32)
        np.testing.assert_array_equal(native.unpack_sbs(packed),
                                      native.unpack_sbs_np(packed),
                                      err_msg=f"trial {trial} h={h} w={w}")
