"""Fused attention half-block endpoints: [LN1 + qkv + head layout] and
[head concat + proj + LayerScale + residual].

The unfused path (reference dinov2_layers/block.py:82-89 + attention.py:49-62)
materializes in HBM, per block: the norm1 output, the (B, N, 3D) qkv tensor,
three per-head transposed/padded copies (the one-shot attention kernel's
input layout), the attention output's back-transpose, the proj output, and
the LayerScale product. These two kernels emit/consume the attention
kernel's (B, H, N_pad, Dh) layout directly, so the chain becomes
x -> [ln_qkv] -> attention -> [proj_ls_residual] -> x with one HBM tensor
between stages and zero transposes.

Rounding points mirror the unfused path: LN f32 stats + f32 scale/bias,
qkv dot f32-accumulated then cast to compute dtype before the bias add
(flax Dense), q pre-scaled in f32 exactly like oneshot_mha's prep, proj
dot f32-accumulated + bf16 bias, ls1 gamma multiply and residual add in
compute dtype. Pad K/V rows are zeroed (the attention kernel's contract).

Unlike the fused MLP half-block (D >= 512 only), this pays at every width
(vits 157 -> 186 fps): the win is removed layout/transpose/LN traffic, not
GEMM fusion.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vr_video_generator_tpu.ops.layernorm import ln_rows_f32

__all__ = ["ln_qkv_pallas", "proj_ls_residual_pallas", "attn_fusable"]


def _qkv_block_n(d: int, dtype) -> int | None:
    """Largest token-block for which the LN+qkv kernel's VMEM plan fits:
    resident (D, 3D) weights + x/h blocks + the f32 qkv product on the
    kernel stack + three double-buffered head-layout output blocks."""
    isz = jnp.dtype(dtype).itemsize
    w_bytes = 3 * d * d * isz
    for bn in (512, 256, 128):
        est = (w_bytes + bn * d * 2 * isz          # x block + h value
               + bn * 3 * d * (4 + isz)            # f32 t + cast copy
               + 3 * 2 * bn * d * isz)             # q/k/v out, double-buffered
        if est <= 13 * 2 ** 20:
            return bn
    return None


def attn_fusable(d: int, n: int, dtype) -> bool:
    """Weights must sit in VMEM (with a workable block plan) and heads must
    be lane-aligned."""
    return d % 128 == 0 and n >= 1 and _qkv_block_n(d, dtype) is not None


def _ln_qkv_kernel(x_ref, lnw_ref, lnb_ref, w_ref, b_ref,
                   q_ref, k_ref, v_ref,
                   *, heads: int, dh: int, n: int, bn: int, scale: float,
                   eps: float):
    blk = pl.program_id(1)
    h = ln_rows_f32(x_ref[0], lnw_ref, lnb_ref, eps).astype(q_ref.dtype)

    t = jax.lax.dot_general(h, w_ref[:, :], (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    t = t.astype(q_ref.dtype) + b_ref[0, :]

    d = heads * dh
    # rows at absolute index >= n are LN-of-zero garbage; zero K/V there so
    # the attention kernel's pad-denominator correction stays exact.
    row = blk * bn + jax.lax.broadcasted_iota(jnp.int32, (bn, dh), 0)
    live = row < n
    for hi in range(heads):
        q = t[:, hi * dh:(hi + 1) * dh]
        k = t[:, d + hi * dh:d + (hi + 1) * dh]
        v = t[:, 2 * d + hi * dh:2 * d + (hi + 1) * dh]
        # same rounding as oneshot_mha's prep: bf16 -> f32 * scale -> bf16
        q_ref[0, hi] = (q.astype(jnp.float32) * scale).astype(q_ref.dtype)
        k_ref[0, hi] = jnp.where(live, k, 0)
        v_ref[0, hi] = jnp.where(live, v, 0)


def ln_qkv_pallas(x: jnp.ndarray, ln_scale: jnp.ndarray, ln_bias: jnp.ndarray,
                  wqkv: jnp.ndarray, bqkv: jnp.ndarray, heads: int,
                  scale: float, eps: float = 1e-6, block_n: int = 512,
                  interpret: bool = False):
    """(B, N, D) -> (qt, kt, vt) each (B, heads, N_pad, D/heads), q
    pre-scaled and pads zeroed — the one-shot attention kernel's layout
    (ops/attention_pallas.oneshot_mha_heads)."""
    dt = x.dtype
    interpret = interpret or jax.default_backend() != "tpu"
    b, n, d = x.shape
    dh = d // heads
    assert wqkv.shape == (d, 3 * d)
    fit = _qkv_block_n(d, dt)
    if fit is None:
        # Resident (D, 3D) weights alone exceed the VMEM plan (e.g. vitg
        # D=1536); callers must gate on attn_fusable instead of landing here
        # with an unenforceable block_n.
        raise ValueError(f"ln_qkv_pallas: no VMEM-feasible block for D={d} "
                         f"({dt}); use the XLA path")
    block_n = min(block_n, fit)
    # n_pad is the next multiple of 512 (the attention kernel's q-block
    # size); every candidate bn (512/256/128) divides it.
    n_pad = n + (-n) % 512
    bn = min(block_n, n_pad)
    assert n_pad % bn == 0
    if n_pad != n:
        x = jnp.pad(x, ((0, 0), (0, n_pad - n), (0, 0)))

    row32 = lambda a: a.reshape(1, -1).astype(jnp.float32)
    kernel = functools.partial(_ln_qkv_kernel, heads=heads, dh=dh, n=n,
                               bn=bn, scale=scale, eps=eps)
    out_spec = pl.BlockSpec((1, heads, bn, dh), lambda bi, i: (bi, 0, i, 0),
                            memory_space=pltpu.VMEM)
    shape = jax.ShapeDtypeStruct((b, heads, n_pad, dh), dt)
    return pl.pallas_call(
        kernel,
        grid=(b, n_pad // bn),
        in_specs=[pl.BlockSpec((1, bn, d), lambda bi, i: (bi, i, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, d), lambda bi, i: (0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, d), lambda bi, i: (0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=(out_spec, out_spec, out_spec),
        out_shape=(shape, shape, shape),
        interpret=interpret,
    )(x, row32(ln_scale), row32(ln_bias), wqkv.astype(dt),
      bqkv.reshape(1, -1).astype(dt))


def _proj_kernel(o_refs, x_ref, w_ref, b_ref, gamma_ref, out_ref, cat_s,
                 *, heads: int, dh: int):
    for hi in range(heads):
        cat_s[:, hi * dh:(hi + 1) * dh] = o_refs[0, hi]
    y = jax.lax.dot_general(cat_s[:, :], w_ref[:, :], (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    y = y.astype(out_ref.dtype) + b_ref[0, :]
    out_ref[0] = x_ref[0] + gamma_ref[0, :] * y


def proj_ls_residual_pallas(ot: jnp.ndarray, x: jnp.ndarray,
                            wproj: jnp.ndarray, bproj: jnp.ndarray,
                            gamma: jnp.ndarray, block_n: int = 512,
                            interpret: bool = False) -> jnp.ndarray:
    """attention out (B, H, N_pad, Dh) + residual x (B, N, D) ->
    x + gamma * proj(concat_heads(ot))[:, :N]."""
    dt = x.dtype
    interpret = interpret or jax.default_backend() != "tpu"
    b, heads, n_pad, dh = ot.shape
    _, n, d = x.shape
    assert heads * dh == d and wproj.shape == (d, d)
    bn = min(block_n, n_pad)
    assert n_pad % bn == 0
    xp = jnp.pad(x, ((0, 0), (0, n_pad - n), (0, 0))) if n_pad != n else x

    row = lambda a: a.reshape(1, -1).astype(dt)
    kernel = functools.partial(_proj_kernel, heads=heads, dh=dh)
    out = pl.pallas_call(
        kernel,
        grid=(b, n_pad // bn),
        in_specs=[pl.BlockSpec((1, heads, bn, dh),
                               lambda bi, i: (bi, 0, i, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, bn, d), lambda bi, i: (bi, i, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, d), lambda bi, i: (0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, d), lambda bi, i: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, bn, d), lambda bi, i: (bi, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, n_pad, d), dt),
        scratch_shapes=[pltpu.VMEM((bn, d), dt)],
        interpret=interpret,
    )(ot, xp, wproj.astype(dt), row(bproj), row(gamma))
    return out[:, :n]
