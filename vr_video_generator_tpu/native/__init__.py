"""Native host-I/O tier (C++ via ctypes): frame packing, swizzles, SPSC ring.

Python-facing wrappers around native/framepack.cpp. Degrades gracefully:
``available()`` is False when no C++ toolchain exists, and callers fall back
to numpy paths.
"""

from __future__ import annotations

import ctypes
import sys
from typing import Optional

import numpy as np


def available() -> bool:
    try:
        from vr_video_generator_tpu.native.build import load

        load()
        return True
    except Exception:
        return False


def _as_u8p(arr: np.ndarray):
    return arr.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))


def bgr_to_rgb(src: np.ndarray, out: Optional[np.ndarray] = None) -> np.ndarray:
    """Channel swizzle of a (..., 3) uint8 array (native, GIL-free)."""
    from vr_video_generator_tpu.native.build import load

    lib = load()
    src = np.ascontiguousarray(src, np.uint8)
    if out is None:
        out = np.empty_like(src)
    lib.bgr_to_rgb(_as_u8p(src), _as_u8p(out), src.size // 3)
    return out


def unpack_sbs(src: np.ndarray, out: Optional[np.ndarray] = None) -> np.ndarray:
    """Packed-uint32 SBS (..., W) (r|g<<8|b<<16) -> rgb24 uint8 (..., W, 3).

    Host half of the device's packed SBS output (ops/warp_pallas
    blur_select_sbs_pallas); auto-vectorized byte strip, GIL-free.
    """
    from vr_video_generator_tpu.native.build import load

    assert sys.byteorder == "little", "packed-SBS unpack requires little-endian"
    lib = load()
    src = np.ascontiguousarray(src, np.uint32)
    if out is None:
        out = np.empty((*src.shape, 3), np.uint8)
    lib.u32_to_rgb24(src.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
                     _as_u8p(out), src.size)
    return out


def unpack_sbs_np(src: np.ndarray) -> np.ndarray:
    """Numpy fallback of unpack_sbs (no native library needed)."""
    # The r|g<<8|b<<16 word -> [r,g,b,x] byte map (here and in the C++
    # u32_to_rgb24 strip) assumes a little-endian host.
    assert sys.byteorder == "little", "packed-SBS unpack requires little-endian"
    src = np.ascontiguousarray(src, np.uint32)
    return src.view(np.uint8).reshape(*src.shape, 4)[..., :3]


def pack_batch(frames, out: Optional[np.ndarray] = None) -> np.ndarray:
    """Gather a list of equal-shape uint8 frames into one contiguous batch."""
    from vr_video_generator_tpu.native.build import load

    lib = load()
    frames = [np.ascontiguousarray(f, np.uint8) for f in frames]
    n = len(frames)
    frame_bytes = frames[0].nbytes
    if out is None:
        out = np.empty((n, *frames[0].shape), np.uint8)
    ptrs = (ctypes.POINTER(ctypes.c_uint8) * n)(*[_as_u8p(f) for f in frames])
    lib.pack_batch(ptrs, _as_u8p(out), n, frame_bytes)
    return out


def read_full(fd: int, buf: np.ndarray) -> int:
    """Blocking full read into a preallocated uint8 buffer; returns bytes."""
    from vr_video_generator_tpu.native.build import load

    return load().read_full(fd, _as_u8p(buf), buf.nbytes)


def write_full(fd: int, buf: np.ndarray) -> int:
    from vr_video_generator_tpu.native.build import load

    buf = np.ascontiguousarray(buf, np.uint8)
    return load().write_full(fd, _as_u8p(buf), buf.nbytes)


class FrameRing:
    """Single-producer single-consumer ring of reusable frame slots."""

    def __init__(self, capacity: int, frame_shape) -> None:
        from vr_video_generator_tpu.native.build import load

        self._lib = load()
        self.frame_shape = tuple(frame_shape)
        self.frame_bytes = int(np.prod(self.frame_shape))
        self._ring = self._lib.ring_create(capacity, self.frame_bytes)

    def try_put(self, frame: np.ndarray) -> bool:
        slot = self._lib.ring_acquire_write(self._ring)
        if not slot:
            return False
        ctypes.memmove(slot, np.ascontiguousarray(frame, np.uint8).ctypes.data,
                       self.frame_bytes)
        self._lib.ring_commit_write(self._ring)
        return True

    def try_get(self, out: Optional[np.ndarray] = None) -> Optional[np.ndarray]:
        slot = self._lib.ring_acquire_read(self._ring)
        if not slot:
            return None
        if out is None:
            out = np.empty(self.frame_shape, np.uint8)
        ctypes.memmove(out.ctypes.data, slot, self.frame_bytes)
        self._lib.ring_commit_read(self._ring)
        return out

    def __len__(self) -> int:
        return int(self._lib.ring_size(self._ring))

    def close(self) -> None:
        if self._ring:
            self._lib.ring_destroy(self._ring)
            self._ring = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
