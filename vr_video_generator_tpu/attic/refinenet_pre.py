"""Fused refinenet1 RCU-pair Pallas kernel — ATTIC (measured net loss).

rcu2(path2 + rcu1(rn0)) in one kernel, emitting the channel-major halo'd
layout head_tail_ext_pallas(channel_major_halo=True) consumes with no XLA
transpose between. Parity-exact (tests/test_attic.py), but slower than
XLA's RCU convs on the attached chip: 0.43 vs 0.26 ms/frame net at
1080p/vits — the 4-conv halo recomputes 12 rows per block and in-kernel
banded GEMMs run at ~50 TF/s vs XLA's ~85 (NOTES.md round-2 calibration).
A revolving-buffer grid (carrying boundary rows across sequential row
blocks) would remove the recompute but not the GEMM-rate gap, so the
projected best case is still a loss; revisit only if Mosaic GEMM rates
improve.

Reference semantics: util/blocks.py:29-80 (ResidualConvUnit) wired per
util/blocks.py:129-141 + dpt.py:141-144 (refinenet1's two inputs).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vr_video_generator_tpu.ops.head_tail_pallas import (
    _banded_conv_mats,
    _roll_lanes,
)


def rcu_pick_block_rows(c: int, w0: int, dtype) -> int | None:
    """Largest refinenet_pre_pallas block_rows fitting VMEM (None: keep the
    XLA RCU path — e.g. vitl's 256-channel rows)."""
    w0p = w0 + 8 + (-(w0 + 8)) % 128
    isz = jnp.dtype(dtype).itemsize
    for r in (24, 16, 8):
        need = ((4 * (r + 12) + 2 * r) * c * w0p      # scratches + out x2
                + 4 * 3 * (4 * c) * (6 * c)) * isz    # banded mats
        if need <= 10 * 2 ** 20:
            return r
    return None


def _rcu_pair_kernel(rn0_hbm, pa_hbm,             # HBM (B, H0+12, C, W0P)
                     bm1a_ref, bm2a_ref, bm1b_ref, bm2b_ref,
                     b1a_ref, b2a_ref, b1b_ref, b2b_ref,
                     cmask_ref,                   # (1, W0P) image-col mask
                     out_ref,                     # VMEM block (1, R, C, W0P)
                     xa_s, pa_s, rb_s, t_s, sem_a, sem_b,
                     *, C: int, H0: int, W0P: int, W0: int, R: int):
    """refinenet1 prologue: rcu2(path2 + rcu1(rn0)) in channel-major rows.

    RCU (reference util/blocks.py:29-80): out = conv2(relu(conv1(relu(x)))) + x.
    Every conv zero-pads its OWN input, so each intermediate is re-masked to
    zero outside the image (rows/cols) before the next banded GEMM — a
    conv's bias would otherwise leak into the padding ring.

    Inputs are pre-padded: 6 zero rows top/bottom (the 4-conv halo plus
    group-alignment slack), 4 zero cols each side inside the lane padding.
    Scratch row l corresponds to padded row bd + l; image rows live at
    padded [6, 6 + H0). Buffer reuse: rd overwrites rb (dead after t),
    the rcu2 output overwrites xa (dead after t).
    """
    acc_t = jnp.float32
    rows = R + 12
    # the input is bottom-padded past the grid overshoot, so the window
    # never needs clamping and the output copy is the static rows [6, 6+R)
    bd = pl.program_id(1) * R

    b = pl.program_id(0)
    cp_a = pltpu.make_async_copy(rn0_hbm.at[b, pl.ds(bd, rows)], xa_s, sem_a)
    cp_b = pltpu.make_async_copy(pa_hbm.at[b, pl.ds(bd, rows)], pa_s, sem_b)
    cp_a.start()
    cp_b.start()
    cp_a.wait()
    cp_b.wait()

    rb_s[:, :, :] = jnp.zeros(rb_s.shape, rb_s.dtype)
    t_s[:, :, :] = jnp.zeros(t_s.shape, t_s.dtype)

    def row_mask(dst_row):
        # (4*C, 1) f32: 1 where the group's padded row holds an image row.
        rid = jax.lax.broadcasted_iota(jnp.int32, (4 * C, 1), 0) // C
        grow = bd + dst_row + rid
        return ((grow >= 6) & (grow < 6 + H0)).astype(acc_t)

    cmask = cmask_ref[:, :]

    def conv_store(src_s, dst_s, bm_ref, bias_ref, relu_in, relu_out,
                   residuals=()):
        # conv output rows [4g+1, 4g+5) from input rows [4g, 4g+6). Results
        # stay full-width in padded coordinates: each width-tap's GEMM
        # output is lane-rolled into place (Mosaic has no value-level
        # dynamic_update_slice) and the col mask kills the halo + wraps.
        for g in range((rows - 6) // 4 + 1):
            xg = src_s[4 * g:4 * g + 6].reshape(6 * C, W0P)
            if relu_in:
                xg = jnp.maximum(xg.astype(acc_t), 0.0).astype(src_s.dtype)
            acc = bias_ref[:, :] * jnp.ones((4 * C, W0P), acc_t)
            for dw in range(3):
                y = jnp.dot(bm_ref[dw], xg, preferred_element_type=acc_t)
                # padded col c sums taps y[c - 1 + dw]: roll right by 1 - dw
                acc = acc + _roll_lanes(y, 1 - dw)
            if relu_out:
                acc = jnp.maximum(acc, 0.0)
            for res_s in residuals:
                rg = res_s[4 * g + 1:4 * g + 5].reshape(4 * C, W0P)
                acc = acc + rg.astype(acc_t)
            v = acc * row_mask(4 * g + 1) * cmask
            dst_s[4 * g + 1:4 * g + 5] = v.reshape(4, C, W0P).astype(dst_s.dtype)

    # rcu1: rb = relu(conv1a(relu(rn0))); t = conv2a(rb) + rn0 + path2
    conv_store(xa_s, rb_s, bm1a_ref, b1a_ref, True, True)
    conv_store(rb_s, t_s, bm2a_ref, b2a_ref, False, False,
               residuals=(xa_s, pa_s))
    # rcu2: rd = relu(conv1b(relu(t))); out = conv2b(rd) + t  (xe reuses xa)
    conv_store(t_s, rb_s, bm1b_ref, b1b_ref, True, True)
    conv_store(rb_s, xa_s, bm2b_ref, b2b_ref, False, False, residuals=(t_s,))

    out_ref[0] = xa_s[6:6 + R]


def refinenet_pre_pallas(rn0: jnp.ndarray, path2: jnp.ndarray,
                         k1a, b1a, k2a, b2a, k1b, b1b, k2b, b2b,
                         block_rows: int = 32,
                         interpret: bool = False) -> jnp.ndarray:
    """rcu2(path2 + rcu1(rn0)) -> channel-major (B, H0, C, W0P) with the 4-col
    W halo head_tail_ext_pallas consumes directly (no XLA transpose between).

    rn0/path2: (B, H0, W0, C) NHWC (refinenet1's two inputs at 148-space,
    reference util/blocks.py:129-141 with dpt.py:141-144 wiring).
    """
    b, h0, w0, c = rn0.shape
    r = min(block_rows, h0 - h0 % 4)  # the (r+12)-row window needs r <= H0
    assert r % 4 == 0 and r > 0

    dt = rn0.dtype
    w0p = w0 + 8 + (-(w0 + 8)) % 128
    nblocks = pl.cdiv(h0, r)
    over = nblocks * r - h0  # grid overshoot: extra bottom pad, see kernel

    def prep(x):
        x = jnp.transpose(x, (0, 1, 3, 2))
        return jnp.pad(x, ((0, 0), (6, 6 + over), (0, 0), (4, w0p - w0 - 4)))

    rn0_t, pa_t = prep(rn0), prep(path2)

    mats = [_banded_conv_mats(k.astype(dt)) for k in (k1a, k2a, k1b, k2b)]
    tiles = [jnp.tile(bb.astype(jnp.float32), 4)[:, None]
             for bb in (b1a, b2a, b1b, b2b)]
    cmask = jnp.asarray(
        (np.arange(w0p) >= 4) & (np.arange(w0p) < 4 + w0),
        jnp.float32)[None, :]

    kernel = functools.partial(_rcu_pair_kernel, C=c, H0=h0, W0P=w0p,
                               W0=w0, R=r)
    out = pl.pallas_call(
        kernel,
        grid=(b, nblocks),
        in_specs=[pl.BlockSpec(memory_space=pltpu.HBM)] * 2
                 + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 9,
        out_specs=pl.BlockSpec((1, r, c, w0p), lambda bi, i: (bi, i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, nblocks * r, c, w0p), dt),
        scratch_shapes=[pltpu.VMEM((r + 12, c, w0p), dt)] * 4
                       + [pltpu.SemaphoreType.DMA(())] * 2,
        interpret=interpret,
    )(rn0_t, pa_t, mats[0], mats[1], mats[2], mats[3],
      tiles[0], tiles[1], tiles[2], tiles[3], cmask)
    return out[:, :h0]
