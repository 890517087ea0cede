"""Fused MLP half-block kernel (ops/mlp_pallas.py) parity tests.

Checks the one-kernel LN+fc1+GELU+fc2+LayerScale+residual against the exact
unfused composition (mirroring dinov2_layers/block.py:91-107 inference math)
in Pallas interpret mode, and that Block's fused dispatch produces the same
result and the same param tree as the unfused path.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vr_video_generator_tpu.ops.mlp_pallas import (mlp_residual_pallas,
                                                   mlp_residual_ref)


def _case(rng, m, d, hidden, dtype):
    x = jnp.asarray(rng.standard_normal((m, d)) * 0.5, dtype)
    p = dict(
        ln_scale=jnp.asarray(1.0 + 0.1 * rng.standard_normal(d), jnp.float32),
        ln_bias=jnp.asarray(0.1 * rng.standard_normal(d), jnp.float32),
        w1=jnp.asarray(rng.standard_normal((d, hidden)) * 0.05, jnp.float32),
        b1=jnp.asarray(0.1 * rng.standard_normal(hidden), jnp.float32),
        w2=jnp.asarray(rng.standard_normal((hidden, d)) * 0.05, jnp.float32),
        b2=jnp.asarray(0.1 * rng.standard_normal(d), jnp.float32),
        gamma=jnp.asarray(1.0 + 0.1 * rng.standard_normal(d), jnp.float32),
    )
    return x, p


@pytest.mark.parametrize("m,d,hidden,approx", [
    (600, 128, 512, False),   # uneven M -> padded rows exercised
    (512, 384, 1536, False),  # vits geometry, multiple h blocks
    (256, 128, 384, True),    # tanh mode, block_h > hidden clamp
])
def test_mlp_residual_parity_f32(m, d, hidden, approx):
    rng = np.random.default_rng(5)
    x, p = _case(rng, m, d, hidden, jnp.float32)
    want = mlp_residual_ref(x, **p, approx=approx)
    got = mlp_residual_pallas(x, **p, approx=approx, block_m=256, block_h=256,
                              interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=0, atol=2e-5)


def test_mlp_residual_parity_bf16():
    rng = np.random.default_rng(7)
    x, p = _case(rng, 300, 256, 1024, jnp.bfloat16)
    want = mlp_residual_ref(x, **p)
    got = mlp_residual_pallas(x, **p, block_m=128, block_h=512,
                              interpret=True)
    # same rounding points, but the erf's f32 exp can land 1 ulp apart
    # between in-kernel and XLA evaluation; through fc2 that accumulates to
    # a few bf16 ulps on ~2.0-magnitude outputs (measured max 0.047).
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want, np.float32),
                               rtol=0, atol=6e-2)


def test_block_fused_matches_unfused_and_tree():
    """Block(mlp_fused='fused', interpret via CPU pallas) == Block('xla'),
    with an identical parameter tree."""
    from vr_video_generator_tpu.models.dinov2 import Block

    rng = np.random.default_rng(11)
    x = jnp.asarray(rng.standard_normal((2, 40, 128)) * 0.5, jnp.float32)

    blk_x = Block(dim=128, num_heads=2, mlp_ratio=4.0, mlp_fused="xla")
    blk_f = Block(dim=128, num_heads=2, mlp_ratio=4.0, mlp_fused="fused")
    params = blk_x.init(jax.random.PRNGKey(0), x)["params"]
    tree_x = jax.tree_util.tree_structure(params)
    tree_f = jax.tree_util.tree_structure(
        blk_f.init(jax.random.PRNGKey(0), x)["params"])
    assert tree_x == tree_f

    want = blk_x.apply({"params": params}, x)
    got = blk_f.apply({"params": params}, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=0, atol=3e-5)


def test_swiglu_residual_parity():
    from vr_video_generator_tpu.ops.mlp_pallas import (swiglu_residual_pallas,
                                                       swiglu_residual_ref)

    rng = np.random.default_rng(13)
    m, d, hp = 300, 128, 256
    for dtype, atol in ((jnp.float32, 2e-5), (jnp.bfloat16, 6e-2)):
        x = jnp.asarray(rng.standard_normal((m, d)) * 0.5, dtype)
        p = dict(
            ln_scale=jnp.asarray(1 + 0.1 * rng.standard_normal(d), jnp.float32),
            ln_bias=jnp.asarray(0.1 * rng.standard_normal(d), jnp.float32),
            w12=jnp.asarray(rng.standard_normal((d, 2 * hp)) * 0.05, jnp.float32),
            b12=jnp.asarray(0.1 * rng.standard_normal(2 * hp), jnp.float32),
            w3=jnp.asarray(rng.standard_normal((hp, d)) * 0.05, jnp.float32),
            b3=jnp.asarray(0.1 * rng.standard_normal(d), jnp.float32),
            gamma=jnp.asarray(1 + 0.1 * rng.standard_normal(d), jnp.float32),
        )
        want = swiglu_residual_ref(x, **p)
        got = swiglu_residual_pallas(x, **p, block_m=128, block_h=128,
                                     interpret=True)
        np.testing.assert_allclose(np.asarray(got, np.float32),
                                   np.asarray(want, np.float32),
                                   rtol=0, atol=atol)


def test_block_swiglu_fused_matches_unfused_and_tree():
    """vitg-style Block (swiglufused) fused==unfused with identical tree."""
    from vr_video_generator_tpu.models.dinov2 import Block

    rng = np.random.default_rng(19)
    x = jnp.asarray(rng.standard_normal((2, 30, 128)) * 0.5, jnp.float32)
    blk_x = Block(dim=128, num_heads=2, mlp_ratio=4.0,
                  ffn_layer="swiglufused", mlp_fused="xla")
    blk_f = Block(dim=128, num_heads=2, mlp_ratio=4.0,
                  ffn_layer="swiglufused", mlp_fused="fused")
    params = blk_x.init(jax.random.PRNGKey(0), x)["params"]
    assert (jax.tree_util.tree_structure(params)
            == jax.tree_util.tree_structure(
                blk_f.init(jax.random.PRNGKey(0), x)["params"]))
    want = blk_x.apply({"params": params}, x)
    got = blk_f.apply({"params": params}, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=0, atol=3e-5)


def test_block_fused_bf16_close():
    """bf16 fused Block (attn + mlp halves both in kernels) vs unfused."""
    from vr_video_generator_tpu.models.dinov2 import Block

    rng = np.random.default_rng(29)
    x = jnp.asarray(rng.standard_normal((2, 40, 128)) * 0.5, jnp.bfloat16)
    blk_x = Block(dim=128, num_heads=2, mlp_ratio=4.0, mlp_fused="xla")
    blk_f = Block(dim=128, num_heads=2, mlp_ratio=4.0, mlp_fused="fused")
    params = blk_x.init(jax.random.PRNGKey(0), x)["params"]
    want = np.asarray(blk_x.apply({"params": params}, x), np.float32)
    got = np.asarray(blk_f.apply({"params": params}, x), np.float32)
    np.testing.assert_allclose(got, want, rtol=0, atol=6e-2)
    assert (np.abs(got - want) > 2e-2).mean() < 5e-3


def test_ln_qkv_layout_matches_unfused_prep():
    """ln_qkv_pallas emits exactly oneshot_mha's prep layout: transposed
    per-head blocks, q pre-scaled, pad rows of K/V zeroed."""
    from vr_video_generator_tpu.ops.qkv_pallas import ln_qkv_pallas
    from vr_video_generator_tpu.ops.layernorm import _layernorm_ref

    rng = np.random.default_rng(31)
    b, n, d, heads = 2, 300, 128, 2
    dh, scale = d // heads, (d // heads) ** -0.5
    x = jnp.asarray(rng.standard_normal((b, n, d)) * 0.5, jnp.float32)
    lnw = jnp.asarray(1 + 0.1 * rng.standard_normal(d), jnp.float32)
    lnb = jnp.asarray(0.1 * rng.standard_normal(d), jnp.float32)
    w = jnp.asarray(rng.standard_normal((d, 3 * d)) * 0.05, jnp.float32)
    bias = jnp.asarray(0.1 * rng.standard_normal(3 * d), jnp.float32)

    qt, kt, vt = ln_qkv_pallas(x, lnw, lnb, w, bias, heads, scale,
                               interpret=True)
    assert qt.shape == (b, heads, 512, dh)

    h = _layernorm_ref(x, lnw, lnb, 1e-6, x.dtype)
    t = jnp.dot(h, w, preferred_element_type=jnp.float32) + bias
    tr = np.asarray(t).reshape(b, n, 3, heads, dh)
    np.testing.assert_allclose(np.asarray(qt)[:, :, :n],
                               np.moveaxis(tr[:, :, 0], 1, 2) * scale,
                               rtol=0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(kt)[:, :, :n],
                               np.moveaxis(tr[:, :, 1], 1, 2),
                               rtol=0, atol=1e-5)
    assert np.all(np.asarray(kt)[:, :, n:] == 0)
    assert np.all(np.asarray(vt)[:, :, n:] == 0)


def test_attention_half_block_random_shape_sweep():
    """Seeded fuzz of the fused attention half-block chain (ln_qkv ->
    oneshot heads attention -> proj+ls+residual) vs the plain XLA
    expression, over random (b, n, d, heads, block_n)."""
    import jax

    from vr_video_generator_tpu.ops.attention_pallas import oneshot_mha_heads
    from vr_video_generator_tpu.ops.layernorm import _layernorm_ref
    from vr_video_generator_tpu.ops.qkv_pallas import (ln_qkv_pallas,
                                                       proj_ls_residual_pallas)

    sweep = np.random.default_rng(1111)
    for trial in range(6):
        d = int(sweep.choice([128, 256, 512]))
        dh = int(sweep.choice([32, 64]))
        heads = d // dh
        b = int(sweep.integers(1, 3))
        n = int(sweep.integers(30, 700))
        block_n = int(sweep.choice([128, 256, 512]))
        scale = dh ** -0.5
        rng = np.random.default_rng(trial)
        mk = lambda *s: jnp.asarray(rng.standard_normal(s) * 0.1, jnp.float32)
        x = mk(b, n, d)
        lnw, lnb = 1 + mk(d), mk(d)
        wq, bq = mk(d, 3 * d), mk(3 * d)
        wp, bp = mk(d, d), mk(d)
        gamma = mk(d)

        qt, kt, vt = ln_qkv_pallas(x, lnw, lnb, wq, bq, heads, scale,
                                   block_n=block_n, interpret=True)
        ot = oneshot_mha_heads(qt, kt, vt, n, interpret=True)
        got = proj_ls_residual_pallas(ot, x, wp, bp, gamma,
                                      block_n=block_n, interpret=True)

        h = _layernorm_ref(x, lnw, lnb, 1e-6, x.dtype)
        t = (jnp.dot(h, wq, preferred_element_type=jnp.float32)
             + bq).reshape(b, n, 3, heads, dh)
        q, k, v = (jnp.moveaxis(t[:, :, i], 1, 2) for i in range(3))
        a = jax.nn.softmax(
            jnp.einsum("bhqd,bhkd->bhqk", q * scale, k), axis=-1)
        cat = jnp.moveaxis(jnp.einsum("bhqk,bhkd->bhqd", a, v),
                           1, 2).reshape(b, n, d)
        want = x + gamma * (jnp.dot(cat, wp,
                                    preferred_element_type=jnp.float32) + bp)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=0, atol=2e-4,
            err_msg=f"trial {trial}: b={b} n={n} d={d} heads={heads} "
                    f"block_n={block_n}")
