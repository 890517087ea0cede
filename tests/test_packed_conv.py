"""Pixel-pair packed conv (attic/packed_conv.py) parity vs plain NHWC convs."""

import jax
import jax.numpy as jnp
import numpy as np

from vr_video_generator_tpu.attic.packed_conv import (pack_pairs, packed_conv3x3,
                                                    packed_kernel,
                                                    unpack_pairs)


def _conv(x, k, b):
    dn = ("NHWC", "HWIO", "NHWC")
    return jax.lax.conv_general_dilated(x, k, (1, 1), "SAME",
                                        dimension_numbers=dn) + b


def test_packed_conv_matches_plain():
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((2, 10, 16, 64)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((3, 3, 64, 64)) * 0.1, jnp.float32)
    b = jnp.asarray(rng.standard_normal((64,)) * 0.1, jnp.float32)
    want = _conv(x, k, b)
    got = unpack_pairs(packed_conv3x3(pack_pairs(x), k, b))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=0, atol=1e-5)


def test_packed_kernel_density():
    k = jnp.ones((3, 3, 64, 64))
    kp = np.asarray(packed_kernel(k))
    assert kp.shape == (3, 3, 128, 128)
    # 6 of 12 tap blocks filled (see module docstring)
    assert np.isclose((kp != 0).mean(), 0.5)


def test_rcu_chain_packed_matches_unpacked():
    """The refinenet1 chain as wired in models/dpt.py: x + rcu1(skip) then
    rcu2, packed vs plain."""
    rng = np.random.default_rng(7)
    feats = 64
    x = jnp.asarray(rng.standard_normal((1, 8, 12, feats)), jnp.float32)
    skip = jnp.asarray(rng.standard_normal((1, 8, 12, feats)), jnp.float32)
    ks = [jnp.asarray(rng.standard_normal((3, 3, feats, feats)) * 0.1,
                      jnp.float32) for _ in range(4)]
    bs = [jnp.asarray(rng.standard_normal((feats,)) * 0.1, jnp.float32)
          for _ in range(4)]

    def rcu(x, k1, b1, k2, b2):
        out = jax.nn.relu(x)
        out = _conv(out, k1, b1)
        out = jax.nn.relu(out)
        out = _conv(out, k2, b2)
        return out + x

    want = rcu(x + rcu(skip, ks[0], bs[0], ks[1], bs[1]),
               ks[2], bs[2], ks[3], bs[3])

    def rcu_p(xp, k1, b1, k2, b2):
        out = jax.nn.relu(xp)
        out = packed_conv3x3(out, k1, b1)
        out = jax.nn.relu(out)
        out = packed_conv3x3(out, k2, b2)
        return out + xp

    xp = pack_pairs(x) + rcu_p(pack_pairs(skip), ks[0], bs[0], ks[1], bs[1])
    got = unpack_pairs(rcu_p(xp, ks[2], bs[2], ks[3], bs[3]))
    # f32 accumulation-order differences through 4 chained convs
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=0, atol=3e-5)
