"""Interpreter parity of the one-shot attention kernel vs XLA attention."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vr_video_generator_tpu.ops.attention_pallas import oneshot_mha


@pytest.mark.parametrize("b,n,h,d", [
    (2, 321, 6, 64),    # ViT-small geometry, pad-masked tail
    (1, 512, 2, 32),    # exact block multiple
])
def test_oneshot_parity(b, n, h, d):
    rng = np.random.default_rng(7)
    q = jnp.asarray(rng.standard_normal((b, n, h, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, n, h, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, n, h, d)), jnp.float32)
    scale = d ** -0.5
    want = jax.nn.dot_product_attention(q, k, v, scale=scale,
                                        implementation="xla")
    got = oneshot_mha(q, k, v, scale, block_q=256, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=0, atol=2e-5)


def test_oneshot_random_shape_sweep():
    """Seeded fuzz over (batch, seq, heads, head_dim, block_q): ragged
    tails, blocks larger than the sequence, and single-row remainders must
    all match XLA attention."""
    sweep = np.random.default_rng(424)
    for trial in range(8):
        b = int(sweep.integers(1, 3))
        n = int(sweep.integers(17, 700))
        h = int(sweep.choice([1, 2, 6]))
        d = int(sweep.choice([16, 32, 64]))
        block_q = int(sweep.choice([64, 128, 256, 512]))
        rng = np.random.default_rng(trial)
        q = jnp.asarray(rng.standard_normal((b, n, h, d)), jnp.float32)
        k = jnp.asarray(rng.standard_normal((b, n, h, d)), jnp.float32)
        v = jnp.asarray(rng.standard_normal((b, n, h, d)), jnp.float32)
        scale = d ** -0.5
        want = jax.nn.dot_product_attention(q, k, v, scale=scale,
                                            implementation="xla")
        got = oneshot_mha(q, k, v, scale, block_q=block_q, interpret=True)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=0, atol=2e-5,
            err_msg=f"trial {trial}: b={b} n={n} h={h} d={d} bq={block_q}")
