"""Fused transformer-MLP half-block: LN + fc1 + GELU + fc2 + LayerScale +
residual in one Pallas kernel.

The reference runs this half-block as five separate torch ops
(dinov2_layers/block.py:91-107: norm2 -> Mlp(fc1, gelu, fc2) -> ls2 -> +x);
under XLA the same chain materializes the normalized activations, the
(M, 4D) hidden, and the GELU output in HBM between GEMMs. At 1080p/vits the
MLP GEMMs alone measure ~0.82 ms/frame on this chip while the full XLA chain
costs ~1.2 — the gap is pure elementwise/HBM overhead. This kernel keeps the
whole half-block in VMEM: one bf16 read of x, one bf16 write of the output,
with the hidden dimension walked in ``block_h`` chunks and the fc2 partial
products accumulated in an f32 scratch (numerically equal to XLA's single
f32-accumulated fc2 dot, up to chunk-boundary association).

Rounding points mirror the unfused path exactly: LN with f32 statistics and
compute-dtype output (ops/layernorm.py), fc1 dot f32-accumulated then cast to
the compute dtype before the bias add (flax Dense semantics), GELU via the
same A&S erf as ops/gelu.gelu_exact, fc2 accumulated f32 and cast once, ls2
gamma multiply and residual add in compute dtype.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vr_video_generator_tpu.ops.gelu import gelu_exact
from vr_video_generator_tpu.ops.layernorm import ln_rows_f32

__all__ = ["mlp_residual_pallas", "mlp_residual_ref",
           "swiglu_residual_pallas", "swiglu_residual_ref"]


def _kernel(x_ref, lnw_ref, lnb_ref, w1_ref, b1_ref, w2_ref, b2_ref,
            gamma_ref, o_ref, h_s, acc_s,
            *, n_h: int, eps: float, approx: bool):
    hb = pl.program_id(1)

    @pl.when(hb == 0)
    def _():
        y = ln_rows_f32(x_ref[:, :], lnw_ref, lnb_ref, eps)
        h_s[:, :] = y.astype(h_s.dtype)
        acc_s[:, :] = jnp.zeros(acc_s.shape, acc_s.dtype)

    t = jax.lax.dot_general(h_s[:, :], w1_ref[:, :], (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    t = t.astype(h_s.dtype) + b1_ref[0, :]
    if approx:
        g = jax.nn.gelu(t, approximate=True)
    else:
        g = gelu_exact(t)
    acc_s[:, :] = acc_s[:, :] + jax.lax.dot_general(
        g, w2_ref[:, :], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

    @pl.when(hb == n_h - 1)
    def _():
        y = acc_s[:, :].astype(o_ref.dtype) + b2_ref[0, :]
        o_ref[:, :] = x_ref[:, :] + gamma_ref[0, :] * y


def _kernel_resident(x_ref, lnw_ref, lnb_ref, w1_ref, b1_ref, w2_ref, b2_ref,
                     gamma_ref, o_ref, *, chunk: int, eps: float,
                     approx: bool):
    """Single-invocation variant (weights fully VMEM-resident): the h loop is
    unrolled and software-pipelined — chunk i+1's fc1 GEMM is issued before
    chunk i's GELU so the VLIW scheduler can hide the VPU transcendental under
    the MXU matmuls (the grid-h variant serializes them across grid steps)."""
    hidden = w1_ref.shape[1]
    n_c = hidden // chunk
    h = ln_rows_f32(x_ref[:, :], lnw_ref, lnb_ref, eps).astype(o_ref.dtype)

    def fc1(i):
        t = jax.lax.dot_general(
            h, w1_ref[:, i * chunk:(i + 1) * chunk], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        return t.astype(h.dtype) + b1_ref[0, i * chunk:(i + 1) * chunk]

    acc = None
    t_i = fc1(0)
    for i in range(n_c):
        t_next = fc1(i + 1) if i + 1 < n_c else None
        if approx:
            g = jax.nn.gelu(t_i, approximate=True)
        else:
            g = gelu_exact(t_i)
        part = jax.lax.dot_general(
            g, w2_ref[i * chunk:(i + 1) * chunk, :], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        acc = part if acc is None else acc + part
        t_i = t_next

    out = acc.astype(o_ref.dtype) + b2_ref[0, :]
    o_ref[:, :] = x_ref[:, :] + gamma_ref[0, :] * out


def _swiglu_kernel(x_ref, lnw_ref, lnb_ref, w1a_ref, b1a_ref, w1b_ref,
                   b1b_ref, w3_ref, b3_ref, gamma_ref, o_ref, h_s, acc_s,
                   *, n_h: int, eps: float):
    """SwiGLU half-block (vitg): LN + [x1|x2] projections + silu(x1)*x2 +
    w3 + LayerScale + residual, h-blocked with f32 fc-out accumulation.
    Mirrors SwiGLUFFN's rounding (models/dinov2.py:86-91; reference
    dinov2_layers/swiglu_ffn.py fused variant)."""
    hb = pl.program_id(1)

    @pl.when(hb == 0)
    def _():
        y = ln_rows_f32(x_ref[:, :], lnw_ref, lnb_ref, eps)
        h_s[:, :] = y.astype(h_s.dtype)
        acc_s[:, :] = jnp.zeros(acc_s.shape, acc_s.dtype)

    def proj(w_ref, b_ref):
        t = jax.lax.dot_general(h_s[:, :], w_ref[:, :],
                                (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        return t.astype(h_s.dtype) + b_ref[0, :]

    t1 = proj(w1a_ref, b1a_ref)
    t2 = proj(w1b_ref, b1b_ref)
    g = jax.nn.silu(t1) * t2
    acc_s[:, :] = acc_s[:, :] + jax.lax.dot_general(
        g, w3_ref[:, :], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

    @pl.when(hb == n_h - 1)
    def _():
        y = acc_s[:, :].astype(o_ref.dtype) + b3_ref[0, :]
        o_ref[:, :] = x_ref[:, :] + gamma_ref[0, :] * y


def swiglu_residual_ref(x, ln_scale, ln_bias, w12, b12, w3, b3, gamma,
                        eps: float = 1e-6):
    """XLA mirror of the fused SwiGLU half-block (exact unfused Block math)."""
    from vr_video_generator_tpu.ops.layernorm import _layernorm_ref

    dt = x.dtype
    h = _layernorm_ref(x, ln_scale, ln_bias, eps, dt)
    t = jnp.dot(h, w12.astype(dt),
                preferred_element_type=jnp.float32).astype(dt) + b12.astype(dt)
    x1, x2 = jnp.split(t, 2, axis=-1)
    g = jax.nn.silu(x1) * x2
    y = jnp.dot(g, w3.astype(dt),
                preferred_element_type=jnp.float32).astype(dt) + b3.astype(dt)
    return x + gamma.astype(dt) * y


def swiglu_residual_pallas(x: jnp.ndarray,
                           ln_scale: jnp.ndarray, ln_bias: jnp.ndarray,
                           w12: jnp.ndarray, b12: jnp.ndarray,
                           w3: jnp.ndarray, b3: jnp.ndarray,
                           gamma: jnp.ndarray,
                           eps: float = 1e-6, block_m: int = 512,
                           block_h: int = 512,
                           interpret: bool = False) -> jnp.ndarray:
    """x (..., D) -> x + gamma * SwiGLU(LN(x)); the vitg analog of
    mlp_residual_pallas (reference dinov2_layers/swiglu_ffn.py:13-63)."""
    dt = x.dtype
    interpret = interpret or jax.default_backend() != "tpu"
    lead, d = x.shape[:-1], x.shape[-1]
    hp = w12.shape[1] // 2
    assert w12.shape == (d, 2 * hp) and w3.shape == (hp, d)
    block_h = min(block_h, hp)
    if hp % block_h:
        block_h = hp
    assert d % 128 == 0
    n_h = hp // block_h

    m = 1
    for s in lead:
        m *= s
    x2d = x.reshape(m, d)
    block_m = min(block_m, m + (-m) % 8)
    m_pad = m + (-m) % block_m
    if m_pad != m:
        x2d = jnp.pad(x2d, ((0, m_pad - m), (0, 0)))

    row = lambda a: a.reshape(1, -1).astype(dt)
    row32 = lambda a: a.reshape(1, -1).astype(jnp.float32)
    w1a, w1b = w12[:, :hp].astype(dt), w12[:, hp:].astype(dt)
    b1a, b1b = b12[:hp], b12[hp:]

    kernel = functools.partial(_swiglu_kernel, n_h=n_h, eps=eps)
    hblk = lambda i, h: (0, h)
    out = pl.pallas_call(
        kernel,
        grid=(m_pad // block_m, n_h),
        in_specs=[
            pl.BlockSpec((block_m, d), lambda i, h: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda i, h: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda i, h: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((d, block_h), hblk, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_h), hblk, memory_space=pltpu.VMEM),
            pl.BlockSpec((d, block_h), hblk, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_h), hblk, memory_space=pltpu.VMEM),
            pl.BlockSpec((block_h, d), lambda i, h: (h, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda i, h: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda i, h: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_m, d), lambda i, h: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m_pad, d), dt),
        scratch_shapes=[pltpu.VMEM((block_m, d), dt),
                        pltpu.VMEM((block_m, d), jnp.float32)],
        interpret=interpret,
    )(x2d, row32(ln_scale), row32(ln_bias), w1a, row(b1a), w1b, row(b1b),
      w3.astype(dt), row(b3), row(gamma))
    return out[:m].reshape(*lead, d)


def mlp_residual_ref(x, ln_scale, ln_bias, w1, b1, w2, b2, gamma,
                     eps: float = 1e-6, approx: bool = False):
    """XLA mirror of the fused kernel (and the exact unfused Block math)."""
    from vr_video_generator_tpu.ops.layernorm import _layernorm_ref

    dt = x.dtype
    h = _layernorm_ref(x, ln_scale, ln_bias, eps, dt)
    t = jnp.dot(h, w1.astype(dt),
                preferred_element_type=jnp.float32).astype(dt) + b1.astype(dt)
    g = jax.nn.gelu(t, approximate=True) if approx else gelu_exact(t)
    y = jnp.dot(g, w2.astype(dt),
                preferred_element_type=jnp.float32).astype(dt) + b2.astype(dt)
    return x + gamma.astype(dt) * y


def mlp_residual_pallas(x: jnp.ndarray,
                        ln_scale: jnp.ndarray, ln_bias: jnp.ndarray,
                        w1: jnp.ndarray, b1: jnp.ndarray,
                        w2: jnp.ndarray, b2: jnp.ndarray,
                        gamma: jnp.ndarray,
                        eps: float = 1e-6, approx: bool = False,
                        block_m: int = 512, block_h: int = 512,
                        interpret: bool = False) -> jnp.ndarray:
    """x (..., D) -> x + gamma * Mlp(LN(x)); params f32 or compute dtype.

    Reference semantics: dinov2_layers/block.py:91-107 second half
    (norm2/Mlp/ls2/residual), inference path.
    """
    dt = x.dtype
    # forced-fused on a non-TPU backend (tests) runs the interpreter
    interpret = interpret or jax.default_backend() != "tpu"
    lead, d = x.shape[:-1], x.shape[-1]
    hidden = w1.shape[1]
    assert w1.shape == (d, hidden) and w2.shape == (hidden, d)
    block_h = min(block_h, hidden)
    if hidden % block_h:  # fall back to one chunk for odd hidden sizes
        block_h = hidden
    assert d % 128 == 0
    n_h = hidden // block_h

    m = 1
    for s in lead:
        m *= s
    x2 = x.reshape(m, d)
    block_m = min(block_m, m + (-m) % 8)
    m_pad = m + (-m) % block_m
    if m_pad != m:
        x2 = jnp.pad(x2, ((0, m_pad - m), (0, 0)))

    row = lambda a: a.reshape(1, -1).astype(dt)
    # LN scale/bias stay f32: the unfused path (ops/layernorm.py) applies
    # them in f32, and rounding them to bf16 here would shift every block's
    # activations ~2^-9 relative vs the reference rounding points.
    row32 = lambda a: a.reshape(1, -1).astype(jnp.float32)

    # Resident-weight pipelined variant when both weight matrices fit VMEM
    # comfortably (vits/vitb); vitl stays on the h-blocked grid.
    w_bytes = 2 * d * hidden * jnp.dtype(dt).itemsize
    if w_bytes <= 10 * 2 ** 20 and hidden % 512 == 0:
        bm = min(512, block_m, m_pad)
        if m_pad % bm:
            bm = block_m
        kernel = functools.partial(_kernel_resident, chunk=512, eps=eps,
                                   approx=approx)
        out = pl.pallas_call(
            kernel,
            grid=(m_pad // bm,),
            in_specs=[
                pl.BlockSpec((bm, d), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)]
            + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 7,
            out_specs=pl.BlockSpec((bm, d), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((m_pad, d), dt),
            interpret=interpret,
        )(x2, row32(ln_scale), row32(ln_bias), w1.astype(dt), row(b1),
          w2.astype(dt), row(b2), row(gamma))
        return out[:m].reshape(*lead, d)

    kernel = functools.partial(_kernel, n_h=n_h, eps=eps, approx=approx)
    out = pl.pallas_call(
        kernel,
        grid=(m_pad // block_m, n_h),
        in_specs=[
            pl.BlockSpec((block_m, d), lambda i, h: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda i, h: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda i, h: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((d, block_h), lambda i, h: (0, h),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_h), lambda i, h: (0, h),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_h, d), lambda i, h: (h, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda i, h: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda i, h: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_m, d), lambda i, h: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m_pad, d), dt),
        scratch_shapes=[pltpu.VMEM((block_m, d), dt),
                        pltpu.VMEM((block_m, d), jnp.float32)],
        interpret=interpret,
    )(x2, row32(ln_scale), row32(ln_bias), w1.astype(dt), row(b1), w2.astype(dt),
      row(b2), row(gamma))
    return out[:m].reshape(*lead, d)
