"""Fused Pallas TPU kernel for the stereo forward warp.

Replaces the unrolled-XLA compositing loop (ops/warp.py
``warp_composite_static``) with a single kernel that keeps each row-block of
depth + image in VMEM across ALL shifts. The XLA version streams the depth
map from HBM once per shift (~S x H x W x 4B of traffic per frame); here the
traffic is exactly one read of depth + image and one write of the composite
— the warp becomes VPU-bound instead of HBM-bound.

Layout notes:
  * the image is processed channel-planar ((3, H, W)) so every roll is a
    lane-axis rotation of a (BH, W) tile — the HWC interleave would put the
    3-channel axis in the minor-most (lane) dimension;
  * all shifts are STATIC (unrolled python loop over [-s_neg, s_pos]), each
    shift's depth band (lo, hi, valid) is read from SMEM at a static index;
  * the hole-fill image (roll by the per-frame dynamic fill_offset,
    reference PredictAndGenerate.py:190) is captured in the same loop by
    matching s == fill_offset — no dynamic roll needed.

Semantics match ops/warp.py (and therefore the reference, see ShiftTables
docstring) bit-for-bit; tests/test_warp_pallas.py checks against the XLA
path in interpreter mode.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vr_video_generator_tpu.ops.warp import PlaneTables, ShiftTables, build_shift_tables


def _roll_lanes(x: jnp.ndarray, shift: int) -> jnp.ndarray:
    """Static circular shift along the last (lane) axis."""
    if shift % x.shape[-1] == 0:
        return x
    return pltpu.roll(x, shift=shift % x.shape[-1], axis=x.ndim - 1)


def _warp_kernel(lo_ref, hi_ref, valid_ref, fill_ref,  # SMEM scalars/tables
                 depth_ref, rgb_ref,                   # VMEM blocks
                 out_ref, cov_ref,
                 *, s_neg: int, s_pos: int):
    """rgb_ref holds the image packed r | g<<8 | b<<16 as uint32 — Mosaic's
    lane rotate only supports 32-bit data, and one packed roll per shift
    beats three channel rolls anyway.

    Per-shift work is predicated on the shift's validity (``pl.when``): the
    padded static shift range covers the worst-case depth ceiling
    (StereoConfig.limit_step_cap), so at typical depth ranges a third or
    more of the shifts are dead and skip their rolls entirely.
    """
    depth = depth_ref[:, :]
    rgb = rgb_ref[:, :]
    fill_offset = fill_ref[0, 0]

    cov_ref[:, :] = jnp.zeros(depth.shape, jnp.bool_)
    out_ref[:, :] = jnp.zeros(depth.shape, jnp.uint32)

    def body(fill_scratch):
        for j, s in enumerate(range(-s_neg, s_pos + 1)):
            is_fill = s == fill_offset
            live = (valid_ref[0, j] != 0) | is_fill

            @pl.when(live)
            def _(j=j, s=s, is_fill=is_fill):
                d_s = _roll_lanes(depth, s)
                m = ((valid_ref[0, j] != 0)
                     & (lo_ref[0, j] <= d_s) & (d_s < hi_ref[0, j]))
                rolled = _roll_lanes(rgb, s)
                out_ref[:, :] = jnp.where(m, rolled, out_ref[:, :])
                cov_ref[:, :] = cov_ref[:, :] | m

                @pl.when(is_fill)
                def _():
                    fill_scratch[:, :] = rolled

        covered = cov_ref[:, :]
        out_ref[:, :] = jnp.where(covered, out_ref[:, :], fill_scratch[:, :])

    pl.run_scoped(body, pltpu.VMEM(depth.shape, jnp.uint32))


def _warp_kernel_banded(lo_ref, hi_ref, valid_ref, bid_ref, fill_ref,
                        depth_ref, rgb_ref,
                        out_ref, cov_ref,
                        *, s_neg: int, s_pos: int):
    """One-rotate-per-shift compositor (vs _warp_kernel's two).

    Band membership is precomputed per SOURCE pixel into the packed word's
    spare byte, so each shift rotates a single uint32 and tests the index
    byte — the depth map is never rotated. Byte 3 encoding: bits 0-6 = rank
    (among valid shifts, ``bid_ref``) of the pixel's lowest matching depth
    band (127 = matches none); bit 7 = the depth also lies in the NEXT
    valid band (the deliberate 5% band overlap, reference :173). A depth
    matches at most two bands and they are rank-adjacent (plane bands
    overlap only pairwise; planes sharing a shift merge — see ShiftTables),
    so one rank + one bit is complete. Requires <= 126 valid shifts; the
    wrappers fall back to _warp_kernel otherwise (4K's cap-sized table).

    Bit-exactness: the precompute applies the identical f32 lo/hi compares
    to the same (unrotated) depth values the classic kernel compares after
    rotation, and the ascending-shift winner selection is unchanged.
    """
    depth = depth_ref[:, :]
    fill_offset = fill_ref[0, 0]
    shape = depth.shape

    cov_ref[:, :] = jnp.zeros(shape, jnp.bool_)
    out_ref[:, :] = jnp.zeros(shape, jnp.uint32)

    def body(word_s, code_s, fill_s):
        # code = first-match rank, +128 on a second (adjacent) match,
        # 254 = unmatched — one scratch round-trip per live shift. The
        # sentinel must avoid every compare set below: ranks occupy [0, 125]
        # and bj+127 / bj+128 occupy [127, 253], so 254 is the first value a
        # no-band pixel can hold without being claimed by the bj == 0 shift
        # (127 would collide with its bj + 127 dual-band compare).
        code_s[:, :] = jnp.full(shape, 254, jnp.int32)
        for j in range(s_neg + s_pos + 1):
            @pl.when(valid_ref[0, j] != 0)
            def _(j=j):
                m = (lo_ref[0, j] <= depth) & (depth < hi_ref[0, j])
                c = code_s[:, :]
                code_s[:, :] = jnp.where(
                    m, jnp.where(c == 254, bid_ref[0, j], c | 128), c)

        word_s[:, :] = rgb_ref[:, :] | (code_s[:, :].astype(jnp.uint32) << 24)

        for j, s in enumerate(range(-s_neg, s_pos + 1)):
            is_fill = s == fill_offset
            live = (valid_ref[0, j] != 0) | is_fill

            @pl.when(live)
            def _(j=j, s=s, is_fill=is_fill):
                rolled = _roll_lanes(word_s[:, :], s)
                iv = (rolled >> 24).astype(jnp.int32)
                bj = bid_ref[0, j]
                # code iv: vlo (single match) or vlo+128 (dual). This band
                # matches when it is the pixel's first band (iv == bj,
                # iv == bj + 128) or the dual second band vlo + 1
                # (iv == bj + 127) — three flat compares, no byte decode.
                m = ((valid_ref[0, j] != 0)
                     & ((iv == bj) | (iv == bj + 127) | (iv == bj + 128)))
                out_ref[:, :] = jnp.where(m, rolled, out_ref[:, :])
                cov_ref[:, :] = cov_ref[:, :] | m

                @pl.when(is_fill)
                def _():
                    fill_s[:, :] = rolled

        out_ref[:, :] = jnp.where(cov_ref[:, :], out_ref[:, :],
                                  fill_s[:, :]) & jnp.uint32(0x00FFFFFF)

    pl.run_scoped(body, pltpu.VMEM(shape, jnp.uint32),
                  pltpu.VMEM(shape, jnp.int32), pltpu.VMEM(shape, jnp.uint32))


def banded_compositor_fits(s_neg: int, s_pos: int) -> bool:
    """The banded kernel's 7-bit rank covers <= 126 valid shifts. 480p-1440p
    cap-sized tables fit; 4K (S=133 at limit_step_cap=24) falls back."""
    return s_neg + s_pos + 1 <= 126


def warp_composite_pallas_packed(img_u8: jnp.ndarray, depth: jnp.ndarray,
                                 st: ShiftTables, s_neg: int, s_pos: int,
                                 block_rows: int = 32,
                                 interpret: bool = False,
                                 banded: bool | None = None
                                 ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Like warp_composite_pallas but returns (packed u32 (H, W), covered),
    for fusion with the packed blur/select kernel."""
    img32 = img_u8.astype(jnp.uint32)
    packed = img32[..., 0] | (img32[..., 1] << 8) | (img32[..., 2] << 16)
    return _composite_prepacked(packed, depth, st, s_neg, s_pos,
                                block_rows=block_rows, interpret=interpret,
                                banded=banded)


def _composite_prepacked(packed: jnp.ndarray, depth: jnp.ndarray,
                         st: ShiftTables, s_neg: int, s_pos: int,
                         block_rows: int = 32, interpret: bool = False,
                         banded: bool | None = None
                         ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    h, w = packed.shape
    if banded is None:
        # Measured on the attached chip (1080p b=8, quiet host): banded
        # 0.555 vs classic 0.511 ms/frame — the precompute's band-table
        # pass + scratch round-trips cost more than the saved rotate.
        # Honest negative result; opt-in for future chips where cross-lane
        # rotates are relatively more expensive.
        banded = False
    banded = banded and banded_compositor_fits(s_neg, s_pos)
    # Shape the shift tables (1, S_pad) with a lane-aligned minor dim: under
    # vmap the batched SMEM arrays become (B, 1, S_pad) and each program's
    # block is the fully-mapped (1, S_pad) — the layout Pallas accepts.
    size = s_neg + s_pos + 1
    pad = (-size) % 128
    lo = jnp.pad(st.lo, (0, pad), constant_values=jnp.inf)[None]
    hi = jnp.pad(st.hi, (0, pad), constant_values=-jnp.inf)[None]
    valid_i = st.valid.astype(jnp.int32)
    valid = jnp.pad(valid_i, (0, pad))[None]

    grid = (pl.cdiv(h, block_rows),)
    row_block = pl.BlockSpec((block_rows, w), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)
    smem_vec = pl.BlockSpec(memory_space=pltpu.SMEM)

    out_shapes = (
        jax.ShapeDtypeStruct((h, w), jnp.uint32),
        jax.ShapeDtypeStruct((h, w), jnp.bool_),
    )
    fill = jnp.broadcast_to(st.fill_offset, (1, 128))
    if banded:
        # rank of each valid shift among valid shifts (invalid: don't care)
        bid = jnp.pad(jnp.cumsum(valid_i) - valid_i, (0, pad))[None]
        kernel = functools.partial(_warp_kernel_banded, s_neg=s_neg,
                                   s_pos=s_pos)
        args = (lo, hi, valid, bid, fill, depth, packed)
        n_smem = 5
    else:
        kernel = functools.partial(_warp_kernel, s_neg=s_neg, s_pos=s_pos)
        args = (lo, hi, valid, fill, depth, packed)
        n_smem = 4
    out_packed, covered = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[smem_vec] * n_smem + [row_block, row_block],
        out_specs=(row_block, row_block),
        out_shape=out_shapes,
        interpret=interpret,
    )(*args)
    return out_packed, covered


def _unpack_rgb(packed: jnp.ndarray) -> jnp.ndarray:
    return jnp.stack(
        [packed & 0xFF, (packed >> 8) & 0xFF, (packed >> 16) & 0xFF],
        axis=-1).astype(jnp.uint8)


def warp_composite_pallas(img_u8: jnp.ndarray, depth: jnp.ndarray,
                          st: ShiftTables, s_neg: int, s_pos: int,
                          block_rows: int = 32,
                          interpret: bool = False,
                          banded: bool | None = None
                          ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(H, W, 3) uint8 + (H, W) f32 depth -> (composite (H, W, 3) uint8,
    covered (H, W) bool). Drop-in for ops/warp.warp_composite_static."""
    out_packed, covered = warp_composite_pallas_packed(
        img_u8, depth, st, s_neg, s_pos, block_rows=block_rows,
        interpret=interpret, banded=banded)
    return _unpack_rgb(out_packed), covered


def _blur_channels(window, hb_s, kxw, kyw, bh: int, w: int, py: int):
    """Separable blur of the three packed channels of ``window``.

    The horizontal pass accumulates in SSA values when the unrolled tap
    slices fit the 16M kernel stack (one fewer VMEM round trip per tap than
    the scratch-ref form — measured win at 1080p); at 4K widths it falls
    back to accumulating through ``hb_s`` so Mosaic can free each tap's
    temporary (stack overflow otherwise, see kernel docstring).
    """
    rows = bh + 2 * py
    # Threshold calibrated on-device: the estimate undercounts Mosaic's live
    # temporaries ~1.6x (4K at 11.3M estimated blew the 16M stack at 17.98M
    # actual), so stay well clear; 1080p (4.6M est) keeps the SSA path.
    ssa_ok = rows * w * 4 * (len(kxw) + 4) <= 8 * 2 ** 20
    chans = []
    for shiftbits in (0, 8, 16):
        # Mosaic has no uint32<->float32 cast; the masked byte fits int32.
        ch = ((window >> shiftbits) & 0xFF).astype(jnp.int32).astype(jnp.float32)
        if ssa_ok:
            hb = float(kxw[0]) * ch[:, 0:w]
            for t in range(1, len(kxw)):
                hb = hb + float(kxw[t]) * ch[:, t:t + w]
            vb = jnp.zeros((bh, w), jnp.float32)
            for t in range(len(kyw)):
                vb = vb + float(kyw[t]) * hb[t:t + bh, :]
        else:
            hb_s[:, :] = jnp.zeros((rows, w), jnp.float32)
            for t in range(len(kxw)):
                hb_s[:, :] = hb_s[:, :] + float(kxw[t]) * ch[:, t:t + w]
            vb = jnp.zeros((bh, w), jnp.float32)
            for t in range(len(kyw)):
                # per-tap REF reads — materializing hb_s as one value keeps
                # the full window plus every tap slice live on the kernel
                # stack (measured 17.98M > 16M at 4K)
                vb = vb + float(kyw[t]) * hb_s[t:t + bh, :]
        chans.append(
            jnp.clip(jnp.round(vb), 0, 255).astype(jnp.int32).astype(jnp.uint32))
    return chans


def _blur_select_kernel(cov_ref, comp_hbm, out_ref, scratch, hb_s, sem,
                        *, kxw, kyw, bh: int, w: int, px: int, py: int):
    """Separable Gaussian blur + hole-select over one (bh, w) row block.

    ``comp_hbm`` is the reflect-padded packed composite
    (B, nblocks*bh + 2*py, w + 2*px) living in HBM/ANY; each program DMAs its
    (bh + 2*py)-row window (vertical halo) and blurs with static-slice
    multiply-adds — no wraparound anywhere, reflect handled by the XLA pad.

    The horizontal pass accumulates into the ``hb_s`` scratch ref rather
    than an SSA value: with value accumulation Mosaic keeps every unrolled
    tap's window slice on the kernel stack at once, which blows the 16M
    scoped-vmem limit at 4K widths (taps scale with kernel_size ~ H).
    """
    b = pl.program_id(0)
    i = pl.program_id(1)
    # DMA row count must be sublane-aligned (mult of 8); the window is
    # over-fetched to wr rows and the blur only reads the first bh + 2*py.
    wr = scratch.shape[0]
    copy = pltpu.make_async_copy(
        comp_hbm.at[b, pl.ds(i * bh, wr), :], scratch, sem)
    copy.start()
    copy.wait()
    window = scratch[:bh + 2 * py, :]

    chans_blurred = _blur_channels(window, hb_s, kxw, kyw, bh, w, py)
    blurred = (chans_blurred[0] | (chans_blurred[1] << 8)
               | (chans_blurred[2] << 16))
    center = window[py:py + bh, px:px + w] & jnp.uint32(0x00FFFFFF)
    covered = cov_ref[0, :, :]
    out_ref[0, :, :] = jnp.where(covered, center, blurred)


def blur_select_pallas(composite_packed: jnp.ndarray, covered: jnp.ndarray,
                       kernel_size: int, sigma: float, block_rows: int = 32,
                       interpret: bool = False) -> jnp.ndarray:
    """(B, H, W) packed u32 composite + covered -> hole-smoothed packed u32.

    Fuses reference PredictAndGenerate.py:184-195: Gaussian blur of the
    hole-filled composite (torchvision kernel/reflect/round semantics via
    ops/gaussian.gaussian_kernel1d) sampled at uncovered pixels.
    """
    from vr_video_generator_tpu.ops.gaussian import gaussian_kernel1d

    bsz, h, w = composite_packed.shape
    kx, ky = kernel_size * 2 + 3, kernel_size * 2 + 1
    kxw, kyw = gaussian_kernel1d(kx, sigma), gaussian_kernel1d(ky, sigma)
    px, py = kx // 2, ky // 2

    nblocks = pl.cdiv(h, block_rows)
    pad_h = nblocks * block_rows - h
    # DMA slices must be lane-aligned: pad the width to a multiple of 128
    # (the extra columns are dead — the blur only reads the first w+2*px),
    # and over-fetch the row window to a sublane multiple of 8.
    w_pad = (-(w + 2 * px)) % 128
    wr = block_rows + 2 * py + (-(block_rows + 2 * py)) % 8
    extra_rows = wr - (block_rows + 2 * py)
    comp_pad = jnp.pad(composite_packed,
                       ((0, 0), (py, py + pad_h + extra_rows),
                        (px, px + w_pad)),
                       mode="reflect")
    # covered's grid reads span nblocks*block_rows rows; keep every block
    # read in bounds.
    cov_pad = jnp.pad(covered, ((0, 0), (0, pad_h), (0, 0)))

    kernel = functools.partial(_blur_select_kernel, kxw=tuple(kxw),
                               kyw=tuple(kyw), bh=block_rows, w=w, px=px,
                               py=py)
    out = pl.pallas_call(
        kernel,
        grid=(bsz, nblocks),
        in_specs=[pl.BlockSpec((1, block_rows, w), lambda b, i: (b, i, 0),
                               memory_space=pltpu.VMEM),
                  # pinned to HBM: with ANY the compiler may try to stage the
                  # whole padded composite in VMEM (blows up at 4K widths)
                  pl.BlockSpec(memory_space=pltpu.HBM)],
        out_specs=pl.BlockSpec((1, block_rows, w), lambda b, i: (b, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bsz, nblocks * block_rows, w),
                                       jnp.uint32),
        scratch_shapes=[pltpu.VMEM((wr, w + 2 * px + w_pad), jnp.uint32),
                        pltpu.VMEM((block_rows + 2 * py, w), jnp.float32),
                        pltpu.SemaphoreType.DMA(())],
        interpret=interpret,
    )(cov_pad, comp_pad)
    return out[:, :h, :]


def _blur_select_sbs_kernel(edge_ref,                 # SMEM (B, 1) i32
                            cov_ref, comp_hbm, orig_hbm,
                            out_ref,                  # VMEM (1, bh, 2W) u32
                            scratch, hb_s, orig_s, sem, sem2,
                            *, kxw, kyw, bh: int, w: int, px: int, py: int):
    """Blur + hole-select + left-edge copy + SBS concat in one pass.

    Emits the full packed SBS row block: lanes [0, W) are the synthesized
    left eye (reference PredictAndGenerate.py:184-196 — blur-filled holes
    then the first edge_width columns copied from the original), lanes
    [W, 2W) are the original right eye (:197). Downstream consumes the
    packed uint32 frame directly (host-side native unpack to rgb24), so the
    XLA unpack/where/concat epilogue disappears from the device program.
    """
    b = pl.program_id(0)
    i = pl.program_id(1)
    wr = scratch.shape[0]
    copy = pltpu.make_async_copy(
        comp_hbm.at[b, pl.ds(i * bh, wr), :], scratch, sem)
    copy.start()
    ocopy = pltpu.make_async_copy(
        orig_hbm.at[b, pl.ds(i * bh, bh), :], orig_s, sem2)
    ocopy.start()
    copy.wait()
    window = scratch[:bh + 2 * py, :]

    chans_blurred = _blur_channels(window, hb_s, kxw, kyw, bh, w, py)
    blurred = (chans_blurred[0] | (chans_blurred[1] << 8)
               | (chans_blurred[2] << 16))
    center = window[py:py + bh, px:px + w] & jnp.uint32(0x00FFFFFF)
    covered = cov_ref[0, :, :]
    ocopy.wait()
    orig = orig_s[:, :w] & jnp.uint32(0x00FFFFFF)
    left = jnp.where(covered, center, blurred)
    cols = jax.lax.broadcasted_iota(jnp.int32, (bh, w), 1)
    left = jnp.where(cols < edge_ref[b, 0], orig, left)
    out_ref[0, :, :w] = left
    out_ref[0, :, w:] = orig


def blur_select_sbs_pallas(composite_packed: jnp.ndarray,
                           covered: jnp.ndarray, orig_packed: jnp.ndarray,
                           edge_width: jnp.ndarray, kernel_size: int,
                           sigma: float, block_rows: int = 32,
                           interpret: bool = False) -> jnp.ndarray:
    """(B, H, W) packed composite + covered + packed original + per-frame
    edge widths -> (B, H, 2W) packed SBS (left synth | right original)."""
    from vr_video_generator_tpu.ops.gaussian import gaussian_kernel1d

    bsz, h, w = composite_packed.shape
    kx, ky = kernel_size * 2 + 3, kernel_size * 2 + 1
    kxw, kyw = gaussian_kernel1d(kx, sigma), gaussian_kernel1d(ky, sigma)
    px, py = kx // 2, ky // 2

    nblocks = pl.cdiv(h, block_rows)
    pad_h = nblocks * block_rows - h
    w_pad = (-(w + 2 * px)) % 128
    wr = block_rows + 2 * py + (-(block_rows + 2 * py)) % 8
    extra_rows = wr - (block_rows + 2 * py)
    comp_pad = jnp.pad(composite_packed,
                       ((0, 0), (py, py + pad_h + extra_rows),
                        (px, px + w_pad)),
                       mode="reflect")
    w_op = w + (-w) % 128
    orig_pad = jnp.pad(orig_packed, ((0, 0), (0, pad_h), (0, w_op - w)))
    # covered's grid reads span nblocks*block_rows rows; pad like comp/orig
    # so the last block never relies on OOB-block read behavior.
    cov_pad = jnp.pad(covered, ((0, 0), (0, pad_h), (0, 0)))

    kernel = functools.partial(_blur_select_sbs_kernel, kxw=tuple(kxw),
                               kyw=tuple(kyw), bh=block_rows, w=w, px=px,
                               py=py)
    out = pl.pallas_call(
        kernel,
        grid=(bsz, nblocks),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec((1, block_rows, w), lambda b, i: (b, i, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.HBM),
                  pl.BlockSpec(memory_space=pltpu.HBM)],
        out_specs=pl.BlockSpec((1, block_rows, 2 * w), lambda b, i: (b, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bsz, nblocks * block_rows, 2 * w),
                                       jnp.uint32),
        scratch_shapes=[pltpu.VMEM((wr, w + 2 * px + w_pad), jnp.uint32),
                        pltpu.VMEM((block_rows + 2 * py, w), jnp.float32),
                        pltpu.VMEM((block_rows, w_op), jnp.uint32),
                        pltpu.SemaphoreType.DMA(()),
                        pltpu.SemaphoreType.DMA(())],
        interpret=interpret,
    )(edge_width.reshape(bsz, 1).astype(jnp.int32), cov_pad, comp_pad,
      orig_pad)
    return out[:, :h, :]


def warp_frame_pallas(img_u8: jnp.ndarray, depth: jnp.ndarray,
                      tables: PlaneTables, kernel_size: int, sigma: float,
                      s_neg: int, s_pos: int,
                      interpret: bool = False) -> jnp.ndarray:
    """Full per-frame warp with the Pallas compositor: blur/edge/concat stay
    in XLA (cheap and fusion-friendly). Mirrors ops/warp.warp_frame."""
    from vr_video_generator_tpu.ops.gaussian import gaussian_blur

    h, w, _ = img_u8.shape
    st = build_shift_tables(tables, s_neg, s_pos)
    composite, covered = warp_composite_pallas(img_u8, depth, st, s_neg, s_pos,
                                               interpret=interpret)
    kx, ky = kernel_size * 2 + 3, kernel_size * 2 + 1
    blurred = jnp.clip(jnp.round(gaussian_blur(composite, (kx, ky), sigma)),
                       0, 255).astype(jnp.uint8)
    result = jnp.where(covered[..., None], composite, blurred)
    cols = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    result = jnp.where((cols < tables.edge_width)[..., None], img_u8, result)
    return jnp.concatenate([result, img_u8], axis=1)


def adaptive_block_rows(width: int) -> int:
    """Keep per-block VMEM footprint roughly constant as width grows (4K
    blocks at 32 rows blow the kernel stack)."""
    return max(8, int(32 * 1920 / width) // 8 * 8)


def warp_batch_pallas(imgs_u8: jnp.ndarray, depths: jnp.ndarray,
                      offset_ranges: jnp.ndarray, cfg, height: int,
                      max_planes: int, kernel_size: int, sigma: float,
                      s_neg: int, s_pos: int, emit: str = "u8",
                      interpret: bool = False) -> jnp.ndarray:
    """Fully fused batched warp: compositor kernel + blur/select kernel.

    (B, H, W, 3) uint8 + (B, H, W) depth + (B, 2) smoothed ranges
    -> (B, H, 2W, 3) uint8 SBS (``emit="u8"``) or (B, H, 2W) packed-uint32
    SBS (``emit="packed"`` — edge copy and concat fused into the blur
    kernel; the host unpacks r|g<<8|b<<16 to rgb24). The blur kernel owns
    the batch grid itself (manual-DMA kernels don't compose with vmap), so
    this is the batched entry the pipeline calls instead of vmapping
    warp_frame.
    """
    from vr_video_generator_tpu.ops.warp import build_plane_tables

    b, h, w, _ = imgs_u8.shape

    def tables_fn(depth, rng_pair):
        t = build_plane_tables(depth, rng_pair, cfg, height, max_planes)
        return t, build_shift_tables(t, s_neg, s_pos)

    tables, st = jax.vmap(tables_fn)(depths, offset_ranges)

    rows = adaptive_block_rows(w)
    img32 = imgs_u8.astype(jnp.uint32)
    orig_packed = img32[..., 0] | (img32[..., 1] << 8) | (img32[..., 2] << 16)
    comp_packed, covered = jax.vmap(
        lambda im, d, s: _composite_prepacked(
            im, d, s, s_neg, s_pos, block_rows=rows, interpret=interpret)
    )(orig_packed, depths, st)

    if emit == "packed":
        return blur_select_sbs_pallas(comp_packed, covered, orig_packed,
                                      tables.edge_width, kernel_size, sigma,
                                      block_rows=rows, interpret=interpret)

    final_packed = blur_select_pallas(comp_packed, covered, kernel_size,
                                      sigma, block_rows=rows,
                                      interpret=interpret)
    result = _unpack_rgb(final_packed)

    cols = jax.lax.broadcasted_iota(jnp.int32, (b, h, w), 2)
    edge = cols < tables.edge_width[:, None, None]
    result = jnp.where(edge[..., None], imgs_u8, result)
    return jnp.concatenate([result, imgs_u8], axis=2)
