"""Fused LayerNorm parity: XLA reference expression, Pallas interpreter, and
torch.nn.functional.layer_norm."""

import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F

from vr_video_generator_tpu.ops.layernorm import layernorm


def test_matches_torch(rng):
    x = rng.standard_normal((4, 37, 384), dtype=np.float32)
    scale = rng.standard_normal(384, dtype=np.float32)
    bias = rng.standard_normal(384, dtype=np.float32)
    ref = F.layer_norm(torch.from_numpy(x), (384,), torch.from_numpy(scale),
                       torch.from_numpy(bias), eps=1e-6).numpy()
    ours = np.asarray(layernorm(jnp.asarray(x), jnp.asarray(scale),
                                jnp.asarray(bias)))
    assert np.abs(ours - ref).max() < 1e-5


def test_pallas_interpreter_matches_ref(rng):
    x = rng.standard_normal((300, 384), dtype=np.float32).astype(np.float32)
    xb = jnp.asarray(x).astype(jnp.bfloat16)
    scale = jnp.asarray(rng.standard_normal(384, dtype=np.float32))
    bias = jnp.asarray(rng.standard_normal(384, dtype=np.float32))
    ref = np.asarray(layernorm(xb, scale, bias)).astype(np.float32)
    ours = np.asarray(layernorm(xb, scale, bias, interpret=True,
                                block_rows=128)).astype(np.float32)
    assert np.abs(ours - ref).max() < 2e-2  # bf16 out rounding


def test_ragged_rows(rng):
    """Row count not divisible by block_rows."""
    x = jnp.asarray(rng.standard_normal((130, 128), dtype=np.float32))
    scale = jnp.ones((128,), jnp.float32)
    bias = jnp.zeros((128,), jnp.float32)
    ref = np.asarray(layernorm(x, scale, bias))
    ours = np.asarray(layernorm(x, scale, bias, interpret=True, block_rows=64))
    np.testing.assert_allclose(ours, ref, atol=1e-5)
