"""Fused LayerNorm: bf16 in/out, f32 statistics, single VMEM pass.

The encoder's 24+1 LayerNorms run in f32 for parity (the reference's torch
autocast keeps layer_norm in fp32), but the stock lowering materializes f32
copies of the (B, N, D) activations several times (~0.6 ms/frame of pure
HBM traffic at 1080p/vits). The Pallas kernel reads bf16 once, keeps the
f32 statistics in registers, and writes bf16 once. CPU/non-TPU falls back
to the equivalent XLA expression.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def ln_rows_f32(x, scale_row, bias_row, eps: float):
    """f32 LayerNorm of (rows, D) values with (1, D) scale/bias rows — the
    shared in-kernel body of every fused-LN Pallas kernel (this module,
    ops/mlp_pallas.py, ops/qkv_pallas.py)."""
    x = x.astype(jnp.float32)
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mean), axis=-1, keepdims=True)
    y = (x - mean) * jax.lax.rsqrt(var + eps)
    return y * scale_row[0, :].astype(jnp.float32) \
        + bias_row[0, :].astype(jnp.float32)


def _ln_kernel(x_ref, scale_ref, bias_ref, o_ref, *, eps: float):
    y = ln_rows_f32(x_ref[:, :], scale_ref, bias_ref, eps)
    o_ref[:, :] = y.astype(o_ref.dtype)


def _layernorm_ref(x: jnp.ndarray, scale: jnp.ndarray, bias: jnp.ndarray,
                   eps: float, out_dtype) -> jnp.ndarray:
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    y = y * scale.astype(jnp.float32) + bias.astype(jnp.float32)
    return y.astype(out_dtype)


def layernorm(x: jnp.ndarray, scale: jnp.ndarray, bias: jnp.ndarray,
              eps: float = 1e-6, out_dtype=None, block_rows: int = 512,
              interpret: bool = False) -> jnp.ndarray:
    """LayerNorm over the last axis of (..., D); f32 statistics."""
    out_dtype = out_dtype or x.dtype
    d = x.shape[-1]
    use_pallas = (jax.default_backend() == "tpu" or interpret) and d % 128 == 0
    if not use_pallas:
        return _layernorm_ref(x, scale, bias, eps, out_dtype)

    lead = x.shape[:-1]
    n = 1
    for s in lead:
        n *= s
    x2 = x.reshape(n, d)
    rows = min(block_rows, n)
    out = pl.pallas_call(
        functools.partial(_ln_kernel, eps=eps),
        grid=(pl.cdiv(n, rows),),
        in_specs=[pl.BlockSpec((rows, d), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, d), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, d), lambda i: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((rows, d), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, d), out_dtype),
        interpret=interpret,
    )(x2, scale.reshape(1, d), bias.reshape(1, d))
    return out.reshape(*lead, d)


