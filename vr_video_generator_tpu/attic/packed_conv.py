"""Pixel-pair packed 3x3 convs for 64-channel NHWC tensors.

Root cause (docs/BENCHLOG.md, NOTES.md): bf16 tiles are (16, 128), so a
C=64 minor dim stores and moves 2x the logical bytes, and XLA's conv pads
N=64 -> 128 output lanes, burning 2x the MXU work anyway. Packing two
adjacent pixels' channels into one 128-lane vector — a FREE row-major
reshape (B, H, W, 64) -> (B, H, W/2, 128) — spends the same 2x MXU work on
a block-structured kernel while halving the physical traffic of every
intermediate.

The packed kernel is built at trace time: out pixel 2j+q reads in pixel
2(j+dwp-1)+p at spatial offset d = 2*dwp - 2 + p - q, so packed tap block
[(p, c), (q, o)] of tap dwp equals the original K[dh, d+1][c, o] when
d in {-1, 0, 1} and zero otherwise (6 of 12 blocks filled). Same math,
different association — outputs match the plain conv to f32-accumulation
rounding.

Used by the DPT head's refinenet1 RCU chain at vits widths (features=64,
reference util/blocks.py:29-80); vitb/vitl have C >= 128 and don't need it.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["pack_pairs", "unpack_pairs", "packed_kernel", "packed_conv3x3",
           "packable"]


def packable(x: jnp.ndarray) -> bool:
    return x.shape[-1] == 64 and x.shape[-2] % 2 == 0


def pack_pairs(x: jnp.ndarray) -> jnp.ndarray:
    """(B, H, W, 64) -> (B, H, W/2, 128); free in row-major layout."""
    b, h, w, c = x.shape
    return x.reshape(b, h, w // 2, 2 * c)


def unpack_pairs(x: jnp.ndarray) -> jnp.ndarray:
    b, h, wp, c2 = x.shape
    return x.reshape(b, h, wp * 2, c2 // 2)


def packed_kernel(k: jnp.ndarray) -> jnp.ndarray:
    """(3, 3, C, O) -> (3, 3, 2C, 2O) block kernel for pair-packed inputs."""
    kh, kw, c, o = k.shape
    assert kh == 3 and kw == 3
    kp = jnp.zeros((3, 3, 2 * c, 2 * o), k.dtype)
    for dwp in range(3):
        for p in range(2):
            for q in range(2):
                d = 2 * dwp - 2 + p - q
                if -1 <= d <= 1:
                    kp = kp.at[:, dwp, p * c:(p + 1) * c,
                               q * o:(q + 1) * o].set(k[:, d + 1])
    return kp


def packed_conv3x3(xp: jnp.ndarray, k: jnp.ndarray, b: jnp.ndarray,
                   dtype=None) -> jnp.ndarray:
    """SAME-padded 3x3 conv on a pair-packed (B, H, W/2, 2C) tensor with the
    ORIGINAL (3, 3, C, O) kernel/bias; returns pair-packed (B, H, W/2, 2O).

    Zero padding of one packed column on each side supplies exactly the two
    zero pixels nn.Conv's padding=1 would; edge taps that reach only one
    pixel into the pad read zeros through the block structure.
    """
    dt = dtype or xp.dtype
    kp = packed_kernel(k.astype(jnp.float32)).astype(dt)
    bp = jnp.tile(b.astype(dt), 2)
    dn = ("NHWC", "HWIO", "NHWC")
    y = jax.lax.conv_general_dilated(xp.astype(dt), kp, (1, 1), "SAME",
                                     dimension_numbers=dn)
    return y + bp
