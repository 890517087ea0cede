"""Parity of the A&S exact-class GELU vs torch's exact erf GELU
(reference dinov2_layers/mlp.py:26,37 uses nn.GELU, the erf form)."""

import jax
import jax.numpy as jnp
import numpy as np
import torch

from vr_video_generator_tpu.ops.gelu import gelu_exact


def _dense_grid():
    # dense range around the nonlinearity + extremes + exact zeros
    return np.concatenate([
        np.linspace(-12.0, 12.0, 200001, dtype=np.float32),
        np.array([0.0, -0.0, 1e-30, -1e-30, 88.0, -88.0, 1e37, -1e37],
                 np.float32),
    ])


def test_gelu_exact_matches_torch_f32():
    x = _dense_grid()
    want = torch.nn.functional.gelu(torch.from_numpy(x)).numpy()
    got = np.asarray(gelu_exact(jnp.asarray(x)))
    assert np.all(np.isfinite(got))
    # A&S 7.1.26: |erf err| <= 1.5e-7 -> |gelu err| <= ~|x|*0.75e-7 + ulps
    tol = 8e-7 * np.maximum(np.abs(x), 1.0) + 1e-7
    np.testing.assert_array_less(np.abs(got - want), tol)


def test_gelu_exact_finite_where_torch_overflows():
    """0.5*x*(1+erf) stays finite at f32-max-scale inputs; torch's erf GELU
    overflows to inf at 3e38."""
    big = np.array([3e38, -3e38], np.float32)
    got = np.asarray(gelu_exact(jnp.asarray(big)))
    np.testing.assert_array_equal(got, np.array([big[0], -0.0], np.float32))
    assert not np.isfinite(
        torch.nn.functional.gelu(torch.from_numpy(big)).numpy()).all()


def test_gelu_exact_bf16_within_one_ulp_of_erf_gelu():
    """In the bf16 pipeline the approximation lands within one bf16 ulp of
    the exact erf GELU everywhere that matters; in the deep negative tail
    (x below about -5.7, where 1 - poly*exp rounds to exactly 1 in f32) it
    flushes to -0.0 where exact keeps values up to ~5e-8 — an absolute
    deviation far below any activation-relevant precision."""
    x = jnp.asarray(_dense_grid(), jnp.bfloat16)
    got = np.asarray(gelu_exact(x), np.float32)
    exact = np.asarray(jax.nn.gelu(x.astype(jnp.float32),
                                   approximate=False).astype(jnp.bfloat16),
                       np.float32)
    diff = np.abs(got - exact)
    # bf16 ulp(v) = f32 spacing * 2^16 (8 vs 24 mantissa bits); allow one
    # ulp on each side of the rounding point plus the tail-flush floor
    tol = np.maximum(2.0 * np.spacing(np.abs(exact)) * 2.0 ** 16, 1e-7)
    worst = (diff / tol).max()
    assert np.all(diff <= tol), f"worst diff/tol ratio {worst}"
    # the flush region never leaks above the tail: every flushed value is
    # one the exact GELU also puts below 1e-7
    flushed = (got == 0.0) & (exact != 0.0)
    assert np.abs(exact[flushed]).max() < 1e-7
    # and the flips are confined to single-ulp rounding, never value errors
    mask = np.abs(exact) > 1e-3
    np.testing.assert_array_less(
        diff[mask], (np.spacing(np.abs(exact)) * 2.0 ** 17)[mask] + 1e-12)
