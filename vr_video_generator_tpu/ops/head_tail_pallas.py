"""Fused Pallas kernel for the DPT head tail (reference dpt.py:146-150).

The tail — output_conv1 (3x3), bilinear x1.75 upsample (align_corners=True),
output_conv2_0 (3x3) + ReLU, output_conv2_2 (1x1) + ReLU — is the head's
bandwidth sink on TPU: every intermediate is a (B, H, W, 32/64)-channel bf16
tensor whose minor dim pads to 128 lanes, so the XLA version moves ~4x the
logical bytes through HBM per op (measured 1.86 ms/frame of the head's 2.58
at 1080p/vits). This kernel reads ``path1`` once, keeps every intermediate in
VMEM, and writes only the (B, H1, W1) f32 depth rows.

Layout: channel-major. All row tiles live as (C sublanes, W lanes), so
  * a 3x3 conv is, per width-tap dw, ONE banded GEMM per 4-row group:
    lhs (4*Cout, 6*Cin) holds K[dh, dw].T blocks on the (row, row+dh) band,
    rhs is 6 consecutive input rows flattened to (6*Cin, W) — full MXU
    lanes, no per-row loops over dh;
  * the width-tap shift is applied to the f32 GEMM *output* (lane slices of
    32-bit data, same trick as ops/warp_pallas blur) — Mosaic has no cheap
    bf16 lane shift;
  * the W-resize is (4*C2, W2) x (W2, W1) — a full (128, K, N) GEMM;
  * the H-resize uses exact integer tap math (r*(H2-1) // (H1-1)), bit-equal
    to the host f64 weight builder in ops/resize.py;
  * the 1x1 conv + ReLU is a lane-broadcast multiply + sublane reduction.

Accumulation is f32 (the MXU accumulates XLA's bf16 dots in f32 too), row
scratches are stored in the input dtype, so parity with the XLA tail is
within bf16 rounding. tests/test_head_tail.py checks interpreter-mode parity.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vr_video_generator_tpu.ops.resize import linear_weights

__all__ = ["head_tail_pallas", "head_tail_ext_pallas", "head_tail_big_pallas",
           "big_pick_plan"]


def _pad4(n: int) -> int:
    return -(-n // 4) * 4


def _roll_lanes(x: jnp.ndarray, shift: int) -> jnp.ndarray:
    """Static circular shift along the last (lane) axis — 32-bit data only."""
    if shift % x.shape[-1] == 0:
        return x
    return pltpu.roll(x, shift=shift % x.shape[-1], axis=x.ndim - 1)


def _lerp_taps(r, n_in: int, n_out: int, base, acc_t=jnp.float32):
    """Exact integer bilinear taps of align_corners resize n_in -> n_out.

    Returns (i0, i1, t): scratch-local tap rows (offset ``base``) and the
    fractional weight — bit-equal to ops/resize.linear_weights' host f64
    floor because num/(n_out-1) is an exact integer ratio.
    """
    num = r * (n_in - 1)
    h0 = num // (n_out - 1)
    t = (num - h0 * (n_out - 1)).astype(acc_t) / np.float32(n_out - 1)
    i0 = h0 - base
    i1 = jnp.minimum(h0 + 1, n_in - 1) - base
    return i0, i1, t


def _banded_conv_mats(k: jnp.ndarray, groups: int = 4) -> jnp.ndarray:
    """(3, 3, Cin, Cout) HWIO kernel -> (3, groups*Cout, (groups+2)*Cin).

    Per width-tap dw, a block-banded lhs so that
    out rows [g, g+groups) = lhs @ (input rows [g-1, g+groups+1) flattened):
    block (g, g+dh) holds K[dh, dw].T.
    """
    kh, kw, cin, cout = k.shape
    mats = []
    for dw in range(kw):
        m = jnp.zeros((groups * cout, (groups + 2) * cin), k.dtype)
        for g in range(groups):
            for dh in range(kh):
                m = m.at[g * cout:(g + 1) * cout,
                         (g + dh) * cin:(g + dh + 1) * cin].set(k[dh, dw].T)
        mats.append(m)
    return jnp.stack(mats)


def _tail_kernel(b3_ref,                       # SMEM (1, 1)
                 x_hbm,                        # ANY (B, H2+2, C, W2P)
                 bm1_ref, bm2_ref, wt_ref,     # VMEM banded mats + resize mat
                 b1_ref, b2_ref, w3_ref,       # VMEM (4*C?, 1) column tiles
                 out_ref,                      # VMEM block (1, R, W1)
                 x_s, c1_s, rzw_s, rz_s, sem,
                 *, C: int, C2: int, C3: int, H1: int, H2: int,
                 W1: int, W2: int, W2P: int, R: int, A: int):
    r0 = pl.program_id(1) * R
    acc_t = jnp.float32

    # conv1-out rows [a0, a0+A) cover every bilinear tap of resized rows
    # [r0-1, r0+R]; clamp so the DMA window [a0, a0+A+2) stays inside the
    # H-padded input.
    r_first = jnp.maximum(r0 - 1, 0)
    h0f = (r_first * (H2 - 1)) // (H1 - 1)
    a0 = jnp.minimum(h0f, H2 - A)

    cp = pltpu.make_async_copy(
        x_hbm.at[pl.program_id(0), pl.ds(a0, A + 2)], x_s, sem)
    cp.start()
    cp.wait()

    # --- output_conv1: (A, C, W2P) -> c1_s (A, C2, W2), banded 4-row GEMMs.
    for g in range(A // 4):
        xg = x_s[4 * g:4 * g + 6].reshape(6 * C, W2P)
        acc = jnp.zeros((4 * C2, W2), acc_t)
        for dw in range(3):
            y = jnp.dot(bm1_ref[dw], xg, preferred_element_type=acc_t)
            acc = acc + y[:, dw:dw + W2]
        acc = acc + b1_ref[:, :]
        c1_s[4 * g:4 * g + 4] = acc.reshape(4, C2, W2).astype(c1_s.dtype)

    # --- W-resize: (4*C2, W2) x (W2, W1) full-lane GEMMs.
    for g in range(A // 4):
        cg = c1_s[4 * g:4 * g + 4].reshape(4 * C2, W2)
        y = jnp.dot(cg, wt_ref[:, :], preferred_element_type=acc_t)
        rzw_s[4 * g:4 * g + 4] = y.reshape(4, C2, W1).astype(rzw_s.dtype)

    # --- H-resize (exact integer taps) into the W-halo'd conv2 input.
    rz_s[:, :, :] = jnp.zeros(rz_s.shape, rz_s.dtype)
    for j in range(R + 2):
        r = r0 - 1 + j
        valid = (r >= 0) & (r < H1)
        rc = jnp.clip(r, 0, H1 - 1)
        i0, i1, t = _lerp_taps(rc, H2, H1, a0)
        row0 = rzw_s[pl.ds(i0, 1)][0].astype(acc_t)
        row1 = rzw_s[pl.ds(i1, 1)][0].astype(acc_t)
        v = (1.0 - t) * row0 + t * row1
        v = v * valid.astype(acc_t)
        rz_s[j, :, 1:1 + W1] = v.astype(rz_s.dtype)

    # --- output_conv2_0 + ReLU + output_conv2_2 (1x1) + ReLU.
    b3 = b3_ref[0, 0]
    for g in range(R // 4):
        rg = rz_s[4 * g:4 * g + 6].reshape(6 * C2, W1 + 2)
        acc = jnp.zeros((4 * C3, W1), acc_t)
        for dw in range(3):
            y = jnp.dot(bm2_ref[dw], rg, preferred_element_type=acc_t)
            acc = acc + y[:, dw:dw + W1]
        y = jnp.maximum(acc + b2_ref[:, :], 0.0)
        yw = (y * w3_ref[:, :]).reshape(4, C3, W1)
        res = jnp.sum(yw, axis=1) + b3
        out_ref[0, 4 * g:4 * g + 4, :] = jnp.maximum(res, 0.0)


def head_tail_pallas(path1: jnp.ndarray,
                     k1: jnp.ndarray, b1: jnp.ndarray,
                     k2: jnp.ndarray, b2: jnp.ndarray,
                     k3: jnp.ndarray, b3: jnp.ndarray,
                     out_hw: tuple[int, int],
                     block_rows: int = 32,
                     interpret: bool = False) -> jnp.ndarray:
    """path1 (B, H2, W2, C) -> depth rows (B, H1, W1) f32.

    k1 (3,3,C,C2)+b1: output_conv1; k2 (3,3,C2,C3)+b2: output_conv2_0;
    k3 (1,1,C3,1)+b3: output_conv2_2 (reference dpt.py:146-150 minus the
    final ReLU'd squeeze, which is included here).
    """
    b, h2, w2, c = path1.shape
    h1, w1 = out_hw
    c2 = k1.shape[-1]
    c3 = k2.shape[-1]
    r = block_rows
    assert r % 4 == 0 and c2 % 8 == 0 and c3 % 8 == 0

    # conv1-out rows needed per block: the taps of R+2 resized rows span
    # (R+1)*(H2-1)/(H1-1) + 2 rows; +1 slack, rounded to the 4-row group.
    span = int(np.ceil((r + 1) * (h2 - 1) / (h1 - 1))) + 3
    a = min(-(-span // 4) * 4, h2 - (-h2) % 4)
    if a < span:
        raise ValueError(f"input rows {h2} too few for block_rows {r}")

    # H/W halo pad (zero — nn.Conv padding=1 semantics), channel-major
    # transpose, lane-align the DMA'd minor dim.
    x = jnp.pad(path1, ((0, 0), (1, 1), (1, 1), (0, 0)))
    x = jnp.transpose(x, (0, 1, 3, 2))
    w2p_raw = w2 + 2
    w2p = w2p_raw + (-w2p_raw) % 128
    x = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, w2p - w2p_raw)))

    dt = path1.dtype
    wt = jnp.asarray(linear_weights(w2, w1, align_corners=True).T, dt)
    bm1 = _banded_conv_mats(k1.astype(dt))
    bm2 = _banded_conv_mats(k2.astype(dt))
    b1t = jnp.tile(b1.astype(jnp.float32), 4)[:, None]
    b2t = jnp.tile(b2.astype(jnp.float32), 4)[:, None]
    w3t = jnp.tile(k3[0, 0, :, 0].astype(jnp.float32), 4)[:, None]
    b3s = jnp.reshape(b3.astype(jnp.float32), (1, 1))

    nblocks = pl.cdiv(h1, r)
    kernel = functools.partial(
        _tail_kernel, C=c, C2=c2, C3=c3, H1=h1, H2=h2, W1=w1, W2=w2,
        W2P=w2p, R=r, A=a)
    out = pl.pallas_call(
        kernel,
        grid=(b, nblocks),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)]
                 + [pl.BlockSpec(memory_space=pltpu.HBM)]
                 + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 6,
        out_specs=pl.BlockSpec((1, r, w1), lambda bi, i: (bi, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, nblocks * r, w1), jnp.float32),
        scratch_shapes=[pltpu.VMEM((a + 2, c, w2p), dt),
                        pltpu.VMEM((a, c2, w2), dt),
                        pltpu.VMEM((a, c2, w1), dt),
                        pltpu.VMEM((r + 2, c2, w1 + 2), dt),
                        pltpu.SemaphoreType.DMA(())],
        interpret=interpret,
    )(b3s, x, bm1, bm2, wt, b1t, b2t, w3t)
    return out[:, :h1, :]


def _ext_plan(r, h0, hm, h1, w0, w2, w1, c, c2, dtype):
    """Row-window sizes (a0, a1) and padded scratch-byte estimate for one
    ext-kernel block, or None if the input is too small for this block."""
    span1 = int(np.ceil((r + 1) * (hm - 1) / (h1 - 1))) + 3
    a1 = min(_pad4(span1), hm - hm % 4)
    span0 = int(np.ceil((a1 + 1) * (h0 - 1) / (hm - 1))) + 3
    a0 = min(_pad4(span0), h0 - h0 % 4)
    if a1 < span1 or a0 < span0:
        return None
    lane = lambda n: n + (-n) % 128
    isz = jnp.dtype(dtype).itemsize
    est = isz * (a0 * c * lane(w0 + (-w0) % 128) + a0 * c * lane(w2)
                 + (a1 + 2) * c * lane(w2 + 2) + a1 * c2 * lane(w2)
                 + a1 * c2 * lane(w1) + (r + 2) * c2 * lane(w1 + 2))
    est += 2 * 4 * r * lane(w1)  # double-buffered f32 out block
    return (a0, a1, est)


def ext_pick_block_rows(x_shape, c2: int, dtype, out_hw) -> int | None:
    """Largest block_rows whose scratch estimate leaves the unrolled GEMM
    stack + weight mats headroom under the 16M VMEM limit, else None (the
    caller should fall back to the XLA tail — e.g. vitl's C=256 rows)."""
    _, h0, w0, c = x_shape
    h1, w1 = out_hw
    for cand in (32, 24, 16, 8):
        p = _ext_plan(cand, h0, h0 * 2, h1, w0, w0 * 2, w1, c, c2, dtype)
        if p and p[2] <= 10.5 * 2 ** 20:
            return cand
    return None


def _tail_ext_kernel(b3_ref,                     # SMEM (1, 1)
                     x_hbm,                      # HBM (B, H0, C, W0P)
                     ocm_ref, boc_ref,           # out_conv channel mix + bias
                     wta_ref, bm1_ref, wtb_ref, bm2_ref,
                     b1_ref, b2_ref, w3_ref,
                     out_ref,                    # VMEM block (1, R, W1)
                     x_s, rw_s, rz2_s, c1_s, rzw_s, rz_s, sem,
                     *, C: int, C2: int, C3: int,
                     H0: int, W0P: int, HM: int, H1: int,
                     W2: int, W1: int, R: int, A0: int, A1: int):
    """Extended tail: x2 bilinear (H0,W0 -> HM,W2) + [out_conv folded into]
    conv1 + bilinear (HM,W2 -> H1,W1) + conv2 + ReLU + 1x1 + ReLU."""
    r0 = pl.program_id(1) * R
    acc_t = jnp.float32

    # conv1-out (HM-space) rows [a1, a1+A1) cover the taps of final rows
    # [r0-1, r0+R]; 148-space rows [b0, b0+A0) cover the taps of HM-space
    # rows [a1-1, a1+A1].
    h0f = (jnp.maximum(r0 - 1, 0) * (HM - 1)) // (H1 - 1)
    a1 = jnp.minimum(h0f, HM - A1)
    b0f = (jnp.maximum(a1 - 1, 0) * (H0 - 1)) // (HM - 1)
    b0 = jnp.minimum(b0f, H0 - A0)

    cp = pltpu.make_async_copy(
        x_hbm.at[pl.program_id(0), pl.ds(b0, A0)], x_s, sem)
    cp.start()
    cp.wait()

    # Every stage loop is python-unrolled: lax.fori_loop costs ~0.2 ms/frame
    # of scalar-loop overhead at 1080p, and with 4-row groups the unrolled
    # stack stays inside the 16M scoped-vmem limit (the wrapper sizes
    # block_rows so scratch + stack fit).

    # --- out_conv channel mix (block-diag 1x1, exact commute with the
    # resizes) + W-resize A (W0 -> W2) on every fetched 148-space row. The
    # resize matrix is zero-row-extended to the lane-padded W0P so no lane
    # slicing of the bf16 input is needed.
    for g in range(A0 // 4):
        xg = x_s[4 * g:4 * g + 4].reshape(4 * C, W0P)
        xg = jnp.dot(ocm_ref[:, :], xg,
                     preferred_element_type=acc_t).astype(rw_s.dtype)
        y = jnp.dot(xg, wta_ref[:, :], preferred_element_type=acc_t)
        rw_s[4 * g:4 * g + 4] = y.reshape(4, C, W2).astype(rw_s.dtype)

    # --- H-resize A + out_conv bias into the W-halo'd conv1 input (zero
    # rows/cols outside the image reproduce nn.Conv's padding=1 AFTER the
    # out_conv — the bias must not leak into the pad).
    rz2_s[:, :, :] = jnp.zeros(rz2_s.shape, rz2_s.dtype)

    for j in range(A1 + 2):
        g296 = a1 - 1 + j
        valid = (g296 >= 0) & (g296 < HM)
        gc = jnp.clip(g296, 0, HM - 1)
        i0, i1, t = _lerp_taps(gc, H0, HM, b0)
        row0 = rw_s[pl.ds(i0, 1)][0].astype(acc_t)
        row1 = rw_s[pl.ds(i1, 1)][0].astype(acc_t)
        v = ((1.0 - t) * row0 + t * row1 + boc_ref[:, :]) * valid.astype(acc_t)
        rz2_s[j, :, 1:1 + W2] = v.astype(rz2_s.dtype)

    # --- conv1 (with refinenet out_conv folded in), banded 4-row GEMMs.
    for g in range(A1 // 4):
        xg = rz2_s[4 * g:4 * g + 6].reshape(6 * C, W2 + 2)
        acc = b1_ref[:, :] * jnp.ones((4 * C2, W2), acc_t)
        for dw in range(3):
            y = jnp.dot(bm1_ref[dw], xg, preferred_element_type=acc_t)
            acc = acc + y[:, dw:dw + W2]
        c1_s[4 * g:4 * g + 4] = acc.reshape(4, C2, W2).astype(c1_s.dtype)

    # --- W-resize B (W2 -> W1).
    for g in range(A1 // 4):
        cg = c1_s[4 * g:4 * g + 4].reshape(4 * C2, W2)
        y = jnp.dot(cg, wtb_ref[:, :], preferred_element_type=acc_t)
        rzw_s[4 * g:4 * g + 4] = y.reshape(4, C2, W1).astype(rzw_s.dtype)

    # --- H-resize B into the W-halo'd conv2 input.
    rz_s[:, :, :] = jnp.zeros(rz_s.shape, rz_s.dtype)

    for j in range(R + 2):
        r = r0 - 1 + j
        valid = (r >= 0) & (r < H1)
        rc = jnp.clip(r, 0, H1 - 1)
        i0, i1, t = _lerp_taps(rc, HM, H1, a1)
        row0 = rzw_s[pl.ds(i0, 1)][0].astype(acc_t)
        row1 = rzw_s[pl.ds(i1, 1)][0].astype(acc_t)
        v = ((1.0 - t) * row0 + t * row1) * valid.astype(acc_t)
        rz_s[j, :, 1:1 + W1] = v.astype(rz_s.dtype)

    # --- conv2 + ReLU + 1x1 + ReLU. 4-row groups: the banded lhs wastes
    # K-dim zeros quadratically in group size, and static starts don't need
    # Mosaic's mod-8 dynamic-store alignment.
    b3 = b3_ref[0, 0]
    for g in range(R // 4):
        rg = rz_s[4 * g:4 * g + 6].reshape(6 * C2, W1 + 2)
        acc = b2_ref[:, :] * jnp.ones((4 * C3, W1), acc_t)
        for dw in range(3):
            y = jnp.dot(bm2_ref[dw], rg, preferred_element_type=acc_t)
            acc = acc + y[:, dw:dw + W1]
        y = jnp.maximum(acc, 0.0)
        yw = (y * w3_ref[:, :]).reshape(4, C3, W1)
        res = jnp.sum(yw, axis=1) + b3
        out_ref[0, 4 * g:4 * g + 4, :] = jnp.maximum(res, 0.0)


def head_tail_ext_pallas(x: jnp.ndarray,
                         k_oc: jnp.ndarray, b_oc: jnp.ndarray,
                         k1: jnp.ndarray, b1: jnp.ndarray,
                         k2: jnp.ndarray, b2: jnp.ndarray,
                         k3: jnp.ndarray, b3: jnp.ndarray,
                         out_hw: tuple[int, int],
                         block_rows: int | None = None,
                         channel_major_halo: bool = False,
                         interpret: bool = False) -> jnp.ndarray:
    """Fused refinenet1-upsample + out_conv + head tail.

    x (B, H0, W0, C): refinenet1's rcu2 output (pre-upsample). Chain
    (reference util/blocks.py:144-147 + dpt.py:146-150):
    bilinear x2 (align_corners) -> out_conv 1x1 (k_oc, b_oc) -> conv1 3x3 ->
    bilinear to out_hw -> conv2 3x3 -> ReLU -> 1x1 -> ReLU -> (B, H1, W1) f32.

    The 1x1 out_conv commutes with the spatially-pointwise upsample and is
    folded into conv1's weights at trace time (exact contraction), so the
    kernel input is the 4x-smaller pre-upsample tensor.

    With ``channel_major_halo``, x is attic/refinenet_pre.py's output
    (B, H0, C, W0P) — already channel-major with the image at cols
    [4, 4+W0) — and W0 is recovered from W0P (the unique width whose
    halo+lane padding gives W0P is not needed: the resize matrix just
    maps the halo'd columns, so only H0/C/W0P matter plus ``out_hw``).
    """
    if channel_major_halo:
        b, h0, c, w0p_in = x.shape
        w1 = out_hw[1]
        w2 = (w1 * 8) // 14  # pw*8 from pw*14
        w0 = w2 // 2
    else:
        b, h0, w0, c = x.shape
        w2 = w0 * 2
    h1, w1 = out_hw
    hm = h0 * 2
    c2 = k1.shape[-1]
    c3 = k2.shape[-1]
    assert c2 % 8 == 0 and c3 % 8 == 0

    if block_rows is None:
        block_rows = ext_pick_block_rows((b, h0, w0, c), c2, x.dtype, out_hw)
        if block_rows is None:
            raise ValueError("no block_rows candidate fits VMEM")
    r = block_rows
    assert r % 4 == 0
    planned = _ext_plan(r, h0, hm, h1, w0, w2, w1, c, c2, x.dtype)
    if planned is None:
        raise ValueError(f"input rows {h0} too few for block_rows {r}")
    a0, a1, _ = planned

    if channel_major_halo:
        # attic refinenet_pre output: (B, H0, C, W0P) with the image cols
        # at [4, 4+W0) inside the lane padding — no transpose needed.
        xt = x
        w0p = x.shape[-1]
        col0 = 4
    else:
        xt = jnp.transpose(x, (0, 1, 3, 2))
        w0p = w0 + (-w0) % 128
        xt = jnp.pad(xt, ((0, 0), (0, 0), (0, 0), (0, w0p - w0)))
        col0 = 0

    dt = xt.dtype
    wta = np.zeros((w0p, w2), np.float64)
    wta[col0:col0 + w0] = linear_weights(w0, w2, align_corners=True).T
    wta = jnp.asarray(wta, dt)
    wtb = jnp.asarray(linear_weights(w2, w1, align_corners=True).T, dt)
    ocm = jnp.kron(jnp.eye(4, dtype=dt), k_oc[0, 0].T.astype(dt))
    boc = b_oc.astype(jnp.float32)[:, None]
    bm1 = _banded_conv_mats(k1.astype(dt))
    bm2 = _banded_conv_mats(k2.astype(dt))
    b1t = jnp.tile(b1.astype(jnp.float32), 4)[:, None]
    b2t = jnp.tile(b2.astype(jnp.float32), 4)[:, None]
    w3t = jnp.tile(k3[0, 0, :, 0].astype(jnp.float32), 4)[:, None]
    b3s = jnp.reshape(b3.astype(jnp.float32), (1, 1))

    nblocks = pl.cdiv(h1, r)
    kernel = functools.partial(
        _tail_ext_kernel, C=c, C2=c2, C3=c3, H0=h0, W0P=w0p, HM=hm,
        H1=h1, W2=w2, W1=w1, R=r, A0=a0, A1=a1)
    out = pl.pallas_call(
        kernel,
        grid=(b, nblocks),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)]
                 + [pl.BlockSpec(memory_space=pltpu.HBM)]
                 + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 9,
        out_specs=pl.BlockSpec((1, r, w1), lambda bi, i: (bi, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, nblocks * r, w1), jnp.float32),
        scratch_shapes=[pltpu.VMEM((a0, c, w0p), dt),
                        pltpu.VMEM((a0, c, w2), dt),
                        pltpu.VMEM((a1 + 2, c, w2 + 2), dt),
                        pltpu.VMEM((a1, c2, w2), dt),
                        pltpu.VMEM((a1, c2, w1), dt),
                        pltpu.VMEM((r + 2, c2, w1 + 2), dt),
                        pltpu.SemaphoreType.DMA(())],
        interpret=interpret,
    )(b3s, xt, ocm, boc, wta, bm1, wtb, bm2, b1t, b2t, w3t)
    return out[:, :h1, :]


# ---------------------------------------------------------------------------
# Big-C (vitl) fused tail: two kernels with an HM-space HBM intermediate.
#
# The single-kernel ext path cannot hold vitl's C=256 row windows in VMEM
# (ext_pick_block_rows returns None), so the chain splits where the channel
# count halves:
#   front:  W-upsample x2 + H-upsample x2 (+ refinenet out_conv FOLDED into
#           conv1's weights — a 1x1 commutes exactly with the bilinear
#           resizes) + conv1 3x3 (C -> C2) + W-resize to the output width,
#           per HM-space row — all C=256 traffic stays at the 4x-smaller
#           pre-upsample resolution;
#   back:   H-resize (HM -> H1) + conv2 3x3 + ReLU + 1x1 + ReLU, identical
#           to the tail of _tail_kernel.
# The intermediate is (B, HM, C2, W1P) channel-major bf16 in HBM with the
# image at lanes [1, 1+W1) (the back kernel's conv W-halo pre-shifted in by
# the front's resize matrix). conv1 runs as per-output-row (C2, C) GEMMs —
# at C2=128 the MXU M-dim is already full, so no 4-row banding (whose lhs
# K-dim zeros scale quadratically with C) is needed.
# ---------------------------------------------------------------------------


def _big_front_kernel(x_hbm,                      # HBM (B, H0, C, W0P)
                      wta_ref, k1m_ref, wtb_ref,  # resize mats + folded conv1
                      cw_ref,                     # (3, C2, W1P) f32 bias/corr
                      out_ref,                    # VMEM block (1, RM, C2, W1P)
                      x_s, rw_s, rz2_s, acc_s, sem,
                      *, C: int, C2: int, H0: int, W0P: int, HM: int,
                      W2: int, W2P2: int, W1P: int, RM: int, A0: int):
    """The refinenet out_conv's 1x1 MIX is folded into conv1's weights at
    trace time (exact — a channel map commutes with the spatial resizes and
    distributes over the conv); its BIAS rides ``cw_ref``: per row-case
    (interior / top edge / bottom edge) the exact conv1(out_conv-bias-
    with-zero-padding) + conv1-bias response, pre-multiplied through the
    W-resize. So the per-row inner loop is pure GEMM + roll."""
    m0 = pl.program_id(1) * RM
    acc_t = jnp.float32
    cpr = C if C <= 128 else 128               # channel chunk rows
    nck = C // cpr

    # H0-space rows [a0, a0+A0) cover every x2-upsample tap of HM rows
    # [m0-1, m0+RM].
    h0f = (jnp.maximum(m0 - 1, 0) * (H0 - 1)) // (HM - 1)
    a0 = jnp.minimum(h0f, H0 - A0)

    # Per channel chunk: DMA -> W-upsample -> H-upsample into the chunk's
    # channel rows of the (full-C) conv input. Chunking keeps the staging
    # scratches half-size; only rz2_s must hold all channels (conv1
    # contracts over C).
    rz2_s[:, :, :] = jnp.zeros(rz2_s.shape, rz2_s.dtype)
    for ck in range(nck):
        cp = pltpu.make_async_copy(
            x_hbm.at[pl.program_id(0), pl.ds(a0, A0),
                     pl.ds(ck * cpr, cpr)], x_s, sem)
        cp.start()
        cp.wait()

        # W-upsample (W0 -> W2); wta's rows are zero-extended over the lane
        # padding so no input slicing is needed. The GEMM's N dim is split
        # into 128-aligned <=256-col segments to bound the f32 product
        # temporary on the kernel stack.
        segs = [(s, min(s + 256, W2)) for s in range(0, W2, 256)]
        for g in range(A0 // 4):
            xg = x_s[4 * g:4 * g + 4].reshape(4 * cpr, W0P)
            for s0, s1 in segs:
                y = jnp.dot(xg, wta_ref[:, s0:s1],
                            preferred_element_type=acc_t)
                rw_s[4 * g:4 * g + 4, :, s0:s1] = \
                    y.reshape(4, cpr, s1 - s0).astype(rw_s.dtype)

        # H-upsample into the W-halo'd conv1 input (image cols [1, 1+W2);
        # zeros outside reproduce nn.Conv padding=1). fori_loop body, not
        # unrolled: at C=256 unrolled iterations' lerp temporaries stay
        # live on the kernel stack at once and blow the 16M scoped limit.
        def lerp_body(j, _, ck=ck):
            m = m0 - 1 + j
            valid = (m >= 0) & (m < HM)
            mc = jnp.clip(m, 0, HM - 1)
            i0, i1, t = _lerp_taps(mc, H0, HM, a0)
            row0 = rw_s[pl.ds(i0, 1)][0].astype(acc_t)
            row1 = rw_s[pl.ds(i1, 1)][0].astype(acc_t)
            v = ((1.0 - t) * row0 + t * row1) * valid.astype(acc_t)
            rz2_s[j, ck * cpr:(ck + 1) * cpr, 1:1 + W2] = v.astype(rz2_s.dtype)
            return 0

        jax.lax.fori_loop(0, RM + 2, lerp_body, 0)

    # --- conv1 (mix-folded) per output row + W-resize (W2 -> W1) + bias
    # response. The dh taps ride one banded GEMM per width tap (lhs
    # (C2, 3C) against 3 stacked input rows); accumulation goes through the
    # acc_s ref so Mosaic frees each tap GEMM's temporary before the next.
    def row_body(i, _):
        src = rz2_s[pl.ds(i, 3)].reshape(3 * C, W2P2)
        acc_s[:, :] = jnp.zeros((C2, W2P2), acc_t)
        for dw in range(3):
            y = jnp.dot(k1m_ref[dw], src, preferred_element_type=acc_t)
            # padded out col p sums taps y[p - 1 + dw]: roll right 1-dw;
            # wrap/halo garbage lands on wtb's zero rows.
            acc_s[:, :] = acc_s[:, :] + _roll_lanes(y, 1 - dw)
        z = jnp.dot(acc_s[:, :].astype(x_s.dtype), wtb_ref[:, :],
                    preferred_element_type=acc_t)
        m = m0 + i
        top = (m == 0).astype(acc_t)
        bot = (m == HM - 1).astype(acc_t)
        z = (z + cw_ref[0] + top * (cw_ref[1] - cw_ref[0])
             + bot * (cw_ref[2] - cw_ref[0]))
        out_ref[0, i] = z.astype(out_ref.dtype)
        return 0

    jax.lax.fori_loop(0, RM, row_body, 0)


def _big_back_kernel(b3_ref,                      # SMEM (1, 1)
                     y_hbm,                       # HBM (B, >=HM, C2, W1P)
                     bm2_ref, b2_ref, w3_ref,
                     out_ref,                     # VMEM block (1, R, W1)
                     y_s, rz_s, sem,
                     *, C2: int, C3: int, HM: int, H1: int, W1: int,
                     W1P: int, R: int, A: int):
    r0 = pl.program_id(1) * R
    acc_t = jnp.float32

    hf = (jnp.maximum(r0 - 1, 0) * (HM - 1)) // (H1 - 1)
    a0 = jnp.minimum(hf, HM - A)
    cp = pltpu.make_async_copy(
        y_hbm.at[pl.program_id(0), pl.ds(a0, A)], y_s, sem)
    cp.start()
    cp.wait()

    # --- H-resize (HM -> H1, exact integer taps) into the conv2 input; the
    # W halo is already in the rows' lane layout (image at [1, 1+W1)).
    for j in range(R + 2):
        r = r0 - 1 + j
        valid = (r >= 0) & (r < H1)
        rc = jnp.clip(r, 0, H1 - 1)
        i0, i1, t = _lerp_taps(rc, HM, H1, a0)
        row0 = y_s[pl.ds(i0, 1)][0].astype(acc_t)
        row1 = y_s[pl.ds(i1, 1)][0].astype(acc_t)
        v = ((1.0 - t) * row0 + t * row1) * valid.astype(acc_t)
        rz_s[j] = v.astype(rz_s.dtype)

    # --- conv2 + ReLU + 1x1 + ReLU (banded 4-row groups, C3-major).
    b3 = b3_ref[0, 0]
    for g in range(R // 4):
        rg = rz_s[4 * g:4 * g + 6].reshape(6 * C2, W1P)
        acc = b2_ref[:, :] * jnp.ones((4 * C3, W1), acc_t)
        for dw in range(3):
            y = jnp.dot(bm2_ref[dw], rg, preferred_element_type=acc_t)
            acc = acc + y[:, dw:dw + W1]
        y = jnp.maximum(acc, 0.0)
        yw = (y * w3_ref[:, :]).reshape(4, C3, W1)
        res = jnp.sum(yw, axis=1) + b3
        out_ref[0, 4 * g:4 * g + 4, :] = jnp.maximum(res, 0.0)


def _lane(n: int) -> int:
    return n + (-n) % 128


def big_pick_plan(x_shape, c2: int, dtype, out_hw):
    """(RM, A0, R, A) row-block plan for the big-C two-kernel tail, or None
    when no candidate fits the VMEM budget (the caller falls back to XLA)."""
    _, h0, w0, c = x_shape
    hm, w2 = 2 * h0, 2 * w0
    h1, w1 = out_hw
    isz = jnp.dtype(dtype).itemsize
    w0p, w2p2, w1p = _lane(w0), _lane(w2 + 2), _lane(w1 + 2)

    front = None
    cpr = c if c <= 128 else 128
    for rm in (16, 8, 4):
        a0 = _pad4(int(np.ceil((rm + 1) * (h0 - 1) / (hm - 1))) + 3)
        if a0 > h0 - h0 % 4:
            continue
        est = isz * (a0 * cpr * (w0p + w2) + (rm + 2) * c * w2p2
                     + 2 * rm * c2 * w1p               # double-buffered out
                     + w0p * w2 + 9 * c2 * c + w2p2 * w1p)  # weight mats
        est += 4 * c2 * w2p2 + 4 * 3 * c2 * w1p        # f32 acc + bias rows
        if est <= 14 * 2 ** 20:
            front = (rm, a0)
            break
    if front is None:
        return None

    back = None
    for r in (32, 24, 16, 8):
        a = _pad4(int(np.ceil((r + 1) * (hm - 1) / (h1 - 1))) + 3)
        if a > hm - hm % 4:
            continue
        est = isz * (a * c2 * w1p + (r + 2) * c2 * w1p
                     + 3 * 4 * c3_est(c2) * 6 * c2)
        est += 2 * 4 * r * w1p                         # f32 out double-buffer
        if est <= 12.5 * 2 ** 20:
            back = (r, a)
            break
    if back is None:
        return None
    return (*front, *back)


def c3_est(c2: int) -> int:
    """conv2 output width used for planning (reference head: always 32)."""
    return min(32, c2)


def head_tail_big_pallas(x: jnp.ndarray,
                         k_oc: jnp.ndarray, b_oc: jnp.ndarray,
                         k1: jnp.ndarray, b1: jnp.ndarray,
                         k2: jnp.ndarray, b2: jnp.ndarray,
                         k3: jnp.ndarray, b3: jnp.ndarray,
                         out_hw: tuple[int, int],
                         plan: tuple[int, int, int, int] | None = None,
                         interpret: bool = False) -> jnp.ndarray:
    """Fused refinenet1-upsample + out_conv + head tail for big C (vitl).

    Same contract as head_tail_ext_pallas (x = refinenet1's rcu2 output at
    pre-upsample resolution, reference util/blocks.py:144-147 + dpt.py:146-150)
    but split into front/back kernels around a (B, HM, C2, W1P) channel-major
    HBM intermediate so C=256 rows never need a full-resolution VMEM window.
    """
    b, h0, w0, c = x.shape
    hm, w2 = 2 * h0, 2 * w0
    h1, w1 = out_hw
    c2 = k1.shape[-1]
    c3 = k2.shape[-1]
    cpr = c if c <= 128 else 128
    assert c2 % 8 == 0 and c3 % 8 == 0 and c % cpr == 0
    if plan is None:
        plan = big_pick_plan((b, h0, w0, c), c2, x.dtype, out_hw)
        if plan is None:
            raise ValueError("no big-tail plan fits VMEM")
    rm, a0, r, a = plan
    assert rm % 4 == 0 and r % 4 == 0 and a0 % 4 == 0

    dt = x.dtype
    xt = jnp.transpose(x, (0, 1, 3, 2))
    w0p = _lane(w0)
    xt = jnp.pad(xt, ((0, 0), (0, 0), (0, 0), (0, w0p - w0)))
    w2p2, w1p = _lane(w2 + 2), _lane(w1 + 2)

    # out_conv's channel MIX folded into conv1's weights (exact):
    # K1'[dh,dw,i,o] = sum_j OC[i,j] K1[dh,dw,j,o]; per-width-tap GEMM lhs
    # (C2, 3C) with the dh taps stacked along K so one GEMM consumes 3
    # contiguous input rows.
    k1f = jnp.einsum("ij,hwjo->hwio", k_oc[0, 0].astype(jnp.float32),
                     k1.astype(jnp.float32))
    k1m = jnp.stack([
        jnp.concatenate([k1f[dh, dw].T for dh in range(3)], axis=1).astype(dt)
        for dw in range(3)])

    wta = np.zeros((w0p, w2), np.float64)
    wta[:w0] = linear_weights(w0, w2, align_corners=True).T
    wta = jnp.asarray(wta, dt)
    # W2 -> W1 resize consuming padded cols [1, 1+W2), emitting [1, 1+W1)
    wtb64 = np.zeros((w2p2, w1p), np.float64)
    wtb64[1:1 + w2, 1:1 + w1] = linear_weights(w2, w1, align_corners=True).T
    wtb = jnp.asarray(wtb64, dt)

    # out_conv BIAS response through conv1 (+ conv1 bias), W-resized: for
    # each row case (interior/top/bottom) the exact per-column value of
    # conv1(b_oc-filled image with zero padding) + b1, times wtb. The taps a
    # conv output column keeps inside the image give three column patterns.
    base = jnp.einsum("hwjo,j->hwo", k1.astype(jnp.float32),
                      b_oc.astype(jnp.float32))       # (3, 3, C2)
    cm = np.zeros((3, w2p2), np.float32)
    cm[0, 2:1 + w2] = 1.0                             # dw=0 tap present
    cm[1, 1:1 + w2] = 1.0                             # dw=1
    cm[2, 1:w2] = 1.0                                 # dw=2
    cmj = jnp.asarray(cm)
    b1pat = b1.astype(jnp.float32)[:, None] * cmj[1][None, :]
    wtb32 = jnp.asarray(wtb64, jnp.float32)

    def cw_case(dhs):
        corr = sum(base[dh, dw][:, None] * cmj[dw][None, :]
                   for dh in dhs for dw in range(3))
        return (corr + b1pat) @ wtb32

    cw = jnp.stack([cw_case((0, 1, 2)), cw_case((1, 2)), cw_case((0, 1))])

    bm2 = _banded_conv_mats(k2.astype(dt))
    b2t = jnp.tile(b2.astype(jnp.float32), 4)[:, None]
    w3t = jnp.tile(k3[0, 0, :, 0].astype(jnp.float32), 4)[:, None]
    b3s = jnp.reshape(b3.astype(jnp.float32), (1, 1))

    nbf = pl.cdiv(hm, rm)
    front = functools.partial(
        _big_front_kernel, C=c, C2=c2, H0=h0, W0P=w0p, HM=hm, W2=w2,
        W2P2=w2p2, W1P=w1p, RM=rm, A0=a0)
    mid = pl.pallas_call(
        front,
        grid=(b, nbf),
        in_specs=[pl.BlockSpec(memory_space=pltpu.HBM)]
                 + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 4,
        out_specs=pl.BlockSpec((1, rm, c2, w1p), lambda bi, i: (bi, i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, nbf * rm, c2, w1p), dt),
        scratch_shapes=[pltpu.VMEM((a0, cpr, w0p), dt),
                        pltpu.VMEM((a0, cpr, w2), dt),
                        pltpu.VMEM((rm + 2, c, w2p2), dt),
                        pltpu.VMEM((c2, w2p2), jnp.float32),
                        pltpu.SemaphoreType.DMA(())],
        interpret=interpret,
    )(xt, wta, k1m, wtb, cw)

    nbb = pl.cdiv(h1, r)
    back = functools.partial(
        _big_back_kernel, C2=c2, C3=c3, HM=hm, H1=h1, W1=w1, W1P=w1p,
        R=r, A=a)
    out = pl.pallas_call(
        back,
        grid=(b, nbb),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)]
                 + [pl.BlockSpec(memory_space=pltpu.HBM)]
                 + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
        out_specs=pl.BlockSpec((1, r, w1), lambda bi, i: (bi, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, nbb * r, w1), jnp.float32),
        scratch_shapes=[pltpu.VMEM((a, c2, w1p), dt),
                        pltpu.VMEM((r + 2, c2, w1p), dt),
                        pltpu.SemaphoreType.DMA(())],
        interpret=interpret,
    )(b3s, mid, bm2, b2t, w3t)
    return out[:, :h1, :]
