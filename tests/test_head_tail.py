"""Interpreter-mode parity of the fused DPT head-tail kernel vs the XLA tail."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vr_video_generator_tpu.ops.head_tail_pallas import head_tail_pallas
from vr_video_generator_tpu.ops.resize import resize_bilinear


def xla_tail(path1, k1, b1, k2, b2, k3, b3, out_hw):
    """Mirror of models/dpt.py lines 141-151 (the fused region)."""
    dn = ("NHWC", "HWIO", "NHWC")
    y = jax.lax.conv_general_dilated(path1, k1, (1, 1), [(1, 1), (1, 1)],
                                     dimension_numbers=dn) + b1
    y = resize_bilinear(y, out_hw, align_corners=True, dtype=path1.dtype,
                        precision=jax.lax.Precision.DEFAULT)
    y = jax.lax.conv_general_dilated(y, k2, (1, 1), [(1, 1), (1, 1)],
                                     dimension_numbers=dn) + b2
    y = jax.nn.relu(y)
    y = jax.lax.conv_general_dilated(y, k3, (1, 1), [(0, 0), (0, 0)],
                                     dimension_numbers=dn) + b3
    return jax.nn.relu(y[..., 0]).astype(jnp.float32)


def _make_case(rng, b, h2, w2, c, c2, c3, patch=14, dtype=jnp.float32):
    h1, w1 = h2 * patch // 8, w2 * patch // 8
    path1 = jnp.asarray(rng.standard_normal((b, h2, w2, c)), dtype)
    k1 = jnp.asarray(rng.standard_normal((3, 3, c, c2)) * 0.1, dtype)
    b1 = jnp.asarray(rng.standard_normal((c2,)) * 0.1, dtype)
    k2 = jnp.asarray(rng.standard_normal((3, 3, c2, c3)) * 0.1, dtype)
    b2 = jnp.asarray(rng.standard_normal((c3,)) * 0.1, dtype)
    k3 = jnp.asarray(rng.standard_normal((1, 1, c3, 1)) * 0.1, dtype)
    b3 = jnp.asarray(rng.standard_normal((1,)) * 0.1, dtype)
    return (path1, k1, b1, k2, b2, k3, b3, (h1, w1))


@pytest.mark.parametrize("h2,w2,c,c2,c3", [
    (72, 128, 64, 32, 32),    # vits geometry (126x224 net input)
    (40, 64, 32, 16, 8),      # tiny, C2 != C3
])
def test_head_tail_parity(h2, w2, c, c2, c3):
    rng = np.random.default_rng(3)
    args = _make_case(rng, 2, h2, w2, c, c2, c3)
    want = xla_tail(*args)
    got = head_tail_pallas(*args, interpret=True)
    assert got.shape == want.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=0, atol=2e-4)


def test_head_tail_block_not_dividing():
    """H1 not a multiple of block_rows exercises the tail-block masking."""
    rng = np.random.default_rng(5)
    args = _make_case(rng, 1, 36, 48, 16, 16, 8)
    want = xla_tail(*args)
    got = head_tail_pallas(*args, block_rows=16, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=0, atol=2e-4)


def xla_tail_ext(x, k_oc, b_oc, k1, b1, k2, b2, k3, b3, out_hw):
    """Mirror of refinenet1 upsample + out_conv + tail (the ext fused region)."""
    dn = ("NHWC", "HWIO", "NHWC")
    y = resize_bilinear(x, (x.shape[1] * 2, x.shape[2] * 2),
                        align_corners=True, dtype=x.dtype,
                        precision=jax.lax.Precision.DEFAULT)
    y = jax.lax.conv_general_dilated(y, k_oc, (1, 1), [(0, 0), (0, 0)],
                                     dimension_numbers=dn) + b_oc
    return xla_tail(y, k1, b1, k2, b2, k3, b3, out_hw)


@pytest.mark.parametrize("h0,w0,c,c2,c3", [
    (36, 64, 64, 32, 32),     # vits geometry at 126x224 net input
    (20, 32, 32, 16, 8),
])
def test_head_tail_ext_parity(h0, w0, c, c2, c3):
    from vr_video_generator_tpu.ops.head_tail_pallas import head_tail_ext_pallas

    rng = np.random.default_rng(11)
    h1, w1 = h0 * 2 * 14 // 8, w0 * 2 * 14 // 8
    x = jnp.asarray(rng.standard_normal((2, h0, w0, c)), jnp.float32)
    k_oc = jnp.asarray(rng.standard_normal((1, 1, c, c)) * 0.1, jnp.float32)
    b_oc = jnp.asarray(rng.standard_normal((c,)) * 0.1, jnp.float32)
    (_, k1, b1, k2, b2, k3, b3, _) = _make_case(rng, 1, 8, 8, c, c2, c3)
    want = xla_tail_ext(x, k_oc, b_oc, k1, b1, k2, b2, k3, b3, (h1, w1))
    got = head_tail_ext_pallas(x, k_oc, b_oc, k1, b1, k2, b2, k3, b3,
                               (h1, w1), interpret=True)
    assert got.shape == want.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=0, atol=5e-4)


@pytest.mark.parametrize("h0,w0,c,c2,c3", [
    (36, 64, 256, 128, 32),   # vitl channel widths (126x224-net geometry)
    (20, 32, 64, 32, 16),     # small C through the same two-kernel path
])
def test_head_tail_big_parity(h0, w0, c, c2, c3):
    """Big-C two-kernel tail (front: upsample+folded out_conv+conv1+W-resize;
    back: H-resize+conv2+1x1) vs the XLA ext chain."""
    from vr_video_generator_tpu.ops.head_tail_pallas import (
        big_pick_plan, head_tail_big_pallas)

    rng = np.random.default_rng(23)
    h1, w1 = h0 * 2 * 14 // 8, w0 * 2 * 14 // 8
    x = jnp.asarray(rng.standard_normal((2, h0, w0, c)) * 0.1, jnp.float32)
    k_oc = jnp.asarray(rng.standard_normal((1, 1, c, c)) * 0.1, jnp.float32)
    b_oc = jnp.asarray(rng.standard_normal((c,)) * 0.1, jnp.float32)
    (_, k1, b1, k2, b2, k3, b3, _) = _make_case(rng, 1, 8, 8, c, c2, c3)
    want = xla_tail_ext(x, k_oc, b_oc, k1, b1, k2, b2, k3, b3, (h1, w1))
    got = head_tail_big_pallas(x, k_oc, b_oc, k1, b1, k2, b2, k3, b3,
                               (h1, w1), interpret=True)
    assert got.shape == want.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=0, atol=5e-4)


def test_big_plan_covers_vitl():
    """The planner must produce a plan for vitl's real deployment geometry
    (518x924 net input, C=256) in bf16 — the case ext_pick_block_rows bails
    on (VERDICT weak #6)."""
    from vr_video_generator_tpu.ops.head_tail_pallas import (
        big_pick_plan, ext_pick_block_rows)

    shape = (4, 148, 264, 256)  # rn[0] space at 518x924, vitl feats
    out_hw = (518, 924)
    assert ext_pick_block_rows(shape, 128, jnp.bfloat16, out_hw) is None
    plan = big_pick_plan(shape, 128, jnp.bfloat16, out_hw)
    assert plan is not None
    rm, a0, r, a = plan
    assert rm % 4 == 0 and a0 % 4 == 0 and r % 4 == 0 and a % 4 == 0


def xla_rcu_pair(rn0, path2, k1a, b1a, k2a, b2a, k1b, b1b, k2b, b2b):
    """Mirror of refinenet1's rcu1+rcu2 chain (util/blocks.py:29-141)."""
    dn = ("NHWC", "HWIO", "NHWC")

    def rcu(x, k1, b1, k2, b2):
        y = jax.nn.relu(x)
        y = jax.lax.conv_general_dilated(y, k1, (1, 1), [(1, 1), (1, 1)],
                                         dimension_numbers=dn) + b1
        y = jax.nn.relu(y)
        y = jax.lax.conv_general_dilated(y, k2, (1, 1), [(1, 1), (1, 1)],
                                         dimension_numbers=dn) + b2
        return y + x

    t = path2 + rcu(rn0, k1a, b1a, k2a, b2a)
    return rcu(t, k1b, b1b, k2b, b2b)


@pytest.mark.parametrize("h0,w0,c,r", [(36, 64, 16, 16), (20, 48, 8, 32)])
def test_rcu_pair_parity(h0, w0, c, r):
    from vr_video_generator_tpu.attic.refinenet_pre import refinenet_pre_pallas

    rng = np.random.default_rng(13)
    rn0 = jnp.asarray(rng.standard_normal((2, h0, w0, c)), jnp.float32)
    path2 = jnp.asarray(rng.standard_normal((2, h0, w0, c)), jnp.float32)
    ws = []
    for _ in range(2):
        ws += [jnp.asarray(rng.standard_normal((3, 3, c, c)) * 0.1, jnp.float32),
               jnp.asarray(rng.standard_normal((c,)) * 0.1, jnp.float32),
               jnp.asarray(rng.standard_normal((3, 3, c, c)) * 0.1, jnp.float32),
               jnp.asarray(rng.standard_normal((c,)) * 0.1, jnp.float32)]
    want = xla_rcu_pair(rn0, path2, *ws)
    got_t = refinenet_pre_pallas(rn0, path2, *ws, block_rows=r, interpret=True)
    got = jnp.transpose(got_t[:, :, :, 4:4 + w0], (0, 1, 3, 2))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=0, atol=3e-4)


def test_rcu_plus_ext_chain_parity():
    """attic refinenet_pre -> head_tail_ext_pallas(channel_major_halo) vs
    the full XLA refinenet1+tail chain."""
    from vr_video_generator_tpu.attic.refinenet_pre import refinenet_pre_pallas
    from vr_video_generator_tpu.ops.head_tail_pallas import head_tail_ext_pallas

    rng = np.random.default_rng(17)
    h0, w0, c, c2, c3 = 36, 64, 32, 16, 8
    h1, w1 = h0 * 2 * 14 // 8, w0 * 2 * 14 // 8
    rn0 = jnp.asarray(rng.standard_normal((2, h0, w0, c)), jnp.float32)
    path2 = jnp.asarray(rng.standard_normal((2, h0, w0, c)), jnp.float32)
    rcu_ws = []
    for _ in range(2):
        rcu_ws += [
            jnp.asarray(rng.standard_normal((3, 3, c, c)) * 0.1, jnp.float32),
            jnp.asarray(rng.standard_normal((c,)) * 0.1, jnp.float32),
            jnp.asarray(rng.standard_normal((3, 3, c, c)) * 0.1, jnp.float32),
            jnp.asarray(rng.standard_normal((c,)) * 0.1, jnp.float32)]
    k_oc = jnp.asarray(rng.standard_normal((1, 1, c, c)) * 0.1, jnp.float32)
    b_oc = jnp.asarray(rng.standard_normal((c,)) * 0.1, jnp.float32)
    (_, k1, b1, k2, b2, k3, b3, _) = _make_case(rng, 1, 8, 8, c, c2, c3)

    pre = xla_rcu_pair(rn0, path2, *rcu_ws)
    want = xla_tail_ext(pre, k_oc, b_oc, k1, b1, k2, b2, k3, b3, (h1, w1))

    pre_t = refinenet_pre_pallas(rn0, path2, *rcu_ws, block_rows=16,
                                 interpret=True)
    got = head_tail_ext_pallas(pre_t, k_oc, b_oc, k1, b1, k2, b2, k3, b3,
                               (h1, w1), block_rows=16,
                               channel_major_halo=True, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=0, atol=1e-3)


def test_head_tail_random_shape_sweep():
    """Seeded fuzz of all three fused tail variants (base, ext, big-C) at
    random geometries and channel widths vs the XLA chain."""
    from vr_video_generator_tpu.ops.head_tail_pallas import (
        head_tail_big_pallas, head_tail_ext_pallas)

    sweep = np.random.default_rng(2323)
    engaged = 0
    for trial in range(8):
        c = int(sweep.choice([16, 32, 64, 128]))
        c2 = max(8, c // int(sweep.choice([1, 2])))
        c3 = int(sweep.choice([8, 16, 32]))
        tag = f"trial {trial}: c={c} c2={c2} c3={c3}"
        if trial % 3 == 0:
            h2 = int(sweep.integers(20, 60))
            w2 = int(sweep.integers(24, 72))
            block_rows = int(sweep.choice([16, 32]))
            args = _make_case(sweep, 1, h2, w2, c, c2, c3)
            want = xla_tail(*args)
            got = head_tail_pallas(*args, block_rows=block_rows,
                                   interpret=True)
            atol = 2e-4
            tag += f" base h2={h2} w2={w2} block_rows={block_rows}"
        else:
            h0 = int(sweep.integers(10, 30))
            w0 = int(sweep.integers(12, 36))
            h1, w1 = h0 * 2 * 14 // 8, w0 * 2 * 14 // 8
            x = jnp.asarray(sweep.standard_normal((1, h0, w0, c)) * 0.1,
                            jnp.float32)
            k_oc = jnp.asarray(sweep.standard_normal((1, 1, c, c)) * 0.1,
                               jnp.float32)
            b_oc = jnp.asarray(sweep.standard_normal((c,)) * 0.1, jnp.float32)
            (_, k1, b1, k2, b2, k3, b3, _) = _make_case(sweep, 1, 8, 8,
                                                        c, c2, c3)
            want = xla_tail_ext(x, k_oc, b_oc, k1, b1, k2, b2, k3, b3,
                                (h1, w1))
            fn = head_tail_ext_pallas if trial % 3 == 1 else \
                head_tail_big_pallas
            try:
                got = fn(x, k_oc, b_oc, k1, b1, k2, b2, k3, b3, (h1, w1),
                         interpret=True)
            except ValueError:
                # the VMEM planner refused this geometry — the production
                # caller (models/dpt.py) gates on the same planner
                continue
            atol = 5e-4
            tag += f" {fn.__name__} h0={h0} w0={w0}"
        engaged += 1
        assert got.shape == want.shape, tag
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=0, atol=atol, err_msg=tag)
    assert engaged >= 4, f"sweep engaged only {engaged} geometries"
