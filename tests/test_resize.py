"""Parity tests for the separable weight-matrix resizers against cv2 / torch,
the exact libraries the reference uses (dpt.py:213, dpt.py:196, blocks.py:144,
dinov2.py:199-205)."""

import cv2
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from vr_video_generator_tpu.ops.preprocess import network_input_size, preprocess_frames
from vr_video_generator_tpu.ops.resize import (
    resize_area_cv2,
    resize_bicubic,
    resize_bilinear,
)


@pytest.mark.parametrize("in_hw,out_hw", [
    ((1080, 1920), (518, 924)),   # 1080p -> depth-net input (pure downscale)
    ((720, 1280), (518, 924)),    # 720p  -> mixed: H down, W down
    ((480, 854), (518, 924)),     # 480p  -> upscale -> cv2 falls back to linear
    ((64, 48), (32, 24)),         # integer downscale
    ((100, 77), (53, 41)),        # awkward fractional downscale
])
def test_area_matches_cv2(rng, in_hw, out_hw):
    img = rng.random((in_hw[0], in_hw[1], 3), dtype=np.float32)
    ours = np.asarray(resize_area_cv2(img, out_hw))
    ref = cv2.resize(img, (out_hw[1], out_hw[0]), interpolation=cv2.INTER_AREA)
    assert np.abs(ours - ref).max() < 1e-4


@pytest.mark.parametrize("in_hw,out_hw", [
    ((518, 924), (1080, 1920)),   # depth upsample path (dpt.py:196)
    ((37, 37), (37, 66)),
    ((17, 23), (40, 51)),
])
def test_bicubic_align_corners_matches_torch(rng, in_hw, out_hw):
    img = rng.random((1, 1, in_hw[0], in_hw[1]), dtype=np.float32)
    ref = F.interpolate(torch.from_numpy(img), out_hw, mode="bicubic",
                        align_corners=True).numpy()
    ours = np.asarray(resize_bicubic(img[0, 0], out_hw, align_corners=True,
                                     h_axis=0, w_axis=1))
    assert np.abs(ours - ref[0, 0]).max() < 2e-4


def test_bicubic_scale_factor_matches_torch(rng):
    # DINOv2 pos-embed interpolation: scale_factor mode, align_corners=False,
    # with the 0.1 offset quirk (reference dinov2.py:194-205).
    pos = rng.random((1, 64, 37, 37), dtype=np.float32)
    w0, h0 = 37 + 0.1, 66 + 0.1
    sx, sy = w0 / 37.0, h0 / 37.0
    ref = F.interpolate(torch.from_numpy(pos), scale_factor=(sx, sy),
                        mode="bicubic", align_corners=False).numpy()
    out_hw = ref.shape[-2:]
    ours = np.asarray(resize_bicubic(pos, out_hw, align_corners=False,
                                     scale_hw=(sx, sy), h_axis=-2, w_axis=-1))
    assert np.abs(ours - ref).max() < 1e-4


@pytest.mark.parametrize("in_hw,out_hw", [
    ((37, 66), (74, 132)),        # fusion-block x2 (blocks.py:144)
    ((148, 264), (518, 924)),     # final x14-ish (dpt.py:147)
    ((5, 7), (9, 16)),
])
def test_bilinear_align_corners_matches_torch(rng, in_hw, out_hw):
    img = rng.random((2, 3, in_hw[0], in_hw[1]), dtype=np.float32)
    ref = F.interpolate(torch.from_numpy(img), out_hw, mode="bilinear",
                        align_corners=True).numpy()
    ours = np.asarray(resize_bilinear(img, out_hw, align_corners=True,
                                      h_axis=-2, w_axis=-1))
    assert np.abs(ours - ref).max() < 1e-4


@pytest.mark.parametrize("hw,expected", [
    ((1080, 1920), (518, 924)),
    ((2160, 3840), (518, 924)),
    ((480, 854), (518, 924)),
    ((518, 518), (518, 518)),
    ((700, 700), (518, 518)),
])
def test_network_input_size(hw, expected):
    # Oracle: the reference Resize.get_size policy (util/transform.py:62-107).
    assert network_input_size(*hw) == expected


def test_preprocess_matches_reference_chain(rng):
    # Full chain vs cv2+numpy reimplementation of image2tensor (dpt.py:204-228).
    frame = rng.integers(0, 256, (270, 480, 3), dtype=np.uint8)
    net_hw = network_input_size(270, 480)
    ours = np.asarray(preprocess_frames(frame, net_hw))

    img = frame.astype(np.float64) / 255.0
    img = cv2.resize(img, (net_hw[1], net_hw[0]), interpolation=cv2.INTER_AREA)
    img = (img - [0.485, 0.456, 0.406]) / [0.229, 0.224, 0.225]
    assert np.abs(ours - img).max() < 1e-4


def test_preprocess_folded_matches_exact(rng):
    """The folded fast path == the exact chain up to its compute dtype:
    f32 folded is the same linear map reassociated (tight); bf16 folded
    (the TPU deployment path) deviates only by bf16 weight rounding, well
    inside the parity budget (gated end-to-end in docs/BENCHLOG.md)."""
    import jax.numpy as jnp

    frame = rng.integers(0, 256, (2, 270, 480, 3), dtype=np.uint8)
    net_hw = network_input_size(270, 480)
    exact = np.asarray(preprocess_frames(frame, net_hw, dtype=jnp.float32))

    f32 = np.asarray(preprocess_frames(frame, net_hw, dtype=jnp.float32,
                                       impl="folded"))
    assert np.abs(f32 - exact).max() < 1e-4

    bf16 = np.asarray(preprocess_frames(frame, net_hw, dtype=jnp.bfloat16,
                                        impl="folded").astype(jnp.float32))
    assert np.abs(bf16 - exact).max() < 0.08
    assert np.abs(bf16 - exact).mean() < 0.01


def test_banded_plan_gate_and_exactness(rng):
    """The banded-blocked apply engages only where it saves work, and its
    factors are literal slices of the dense weight matrix — per-block the
    matmul is algebraically identical, so results agree to summation-order
    noise."""
    import jax
    import jax.numpy as jnp

    from vr_video_generator_tpu.ops.resize import (_apply_axis, _banded_plan,
                                                   cubic_weights)

    # big upsample (the depth endpoint): plan engages and shrinks K
    w = cubic_weights(518, 1080, align_corners=True)
    plan = _banded_plan(w)
    assert plan is not None
    starts, wblk = plan
    nb, block, span = wblk.shape
    assert nb * block >= 1080 and span < 518 // 2
    # block factors ARE slices of w (padded rows are zero)
    for i, s in enumerate(starts):
        rows = w[i * block:(i + 1) * block, s:s + span]
        np.testing.assert_array_equal(wblk[i][:rows.shape[0]], rows)

    # small in-network grids: dense is cheaper, plan declines
    assert _banded_plan(cubic_weights(37, 66, align_corners=False)) is None

    # banded vs dense: same numbers up to reduction-order noise
    # (banded=True pins the opt-in blocked path regardless of the env default)
    x = jnp.asarray(rng.random((2, 518, 31), dtype=np.float32))
    banded = _apply_axis(x, w, 1, "o", jnp.float32,
                         jax.lax.Precision.HIGH, banded=True)
    dense = jnp.einsum("abc,ob->aoc", x, jnp.asarray(w, jnp.float32),
                       precision=jax.lax.Precision.HIGH)
    assert banded.shape == (2, 1080, 31)
    np.testing.assert_allclose(np.asarray(banded), np.asarray(dense),
                               rtol=0, atol=1e-5)


def test_banded_resize_under_sharded_batch(rng, monkeypatch):
    """The banded-blocked apply partitions cleanly when the batch axis is
    sharded over the mesh (how every pipeline resize runs under shard_map's
    data axis): sharded output == single-device output up to reduction-order
    noise (XLA vectorizes the einsum differently at the per-shard batch
    extent; measured ~7e-7 on values of magnitude ~5). Shape chosen
    so _banded_plan actually engages on the H axis (518 -> 1080 has multiple
    128-row blocks with small spans; tiny test geometries stay dense)."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from vr_video_generator_tpu.ops import resize
    from vr_video_generator_tpu.ops.resize import (_banded_plan,
                                                   cubic_weights,
                                                   resize_bicubic)

    # pin the opt-in blocked path on (the production default is dense)
    monkeypatch.setattr(resize, "_BANDED_ENABLED", True)
    assert _banded_plan(cubic_weights(518, 1080, align_corners=False)) \
        is not None  # the path under test is actually engaged

    x = jnp.asarray(rng.standard_normal((8, 518, 12, 1)), jnp.float32)
    out_hw = (1080, 20)

    single = jax.jit(lambda v: resize_bicubic(v, out_hw,
                                              align_corners=False))(x)

    mesh = Mesh(np.array(jax.devices()[:8]), ("data",))
    xs = jax.device_put(x, NamedSharding(mesh, P("data")))
    sharded = jax.jit(
        lambda v: resize_bicubic(v, out_hw, align_corners=False),
        in_shardings=NamedSharding(mesh, P("data")),
        out_shardings=NamedSharding(mesh, P("data")))(xs)

    np.testing.assert_allclose(np.asarray(sharded), np.asarray(single),
                               rtol=0.0, atol=1e-5)


def test_banded_vs_dense_random_shape_sweep():
    """Seeded sweep of banded-vs-dense equivalence across random (in, out)
    sizes and weight kinds. Wherever _banded_plan engages, the blocked
    apply must reproduce the dense einsum to summation-order noise — this
    is the CPU guard behind the TPU banded-resize A/B."""
    import jax
    import jax.numpy as jnp

    from vr_video_generator_tpu.ops.resize import (_apply_axis, _banded_plan,
                                                   area_weights, cubic_weights,
                                                   linear_weights)

    sweep = np.random.default_rng(818)
    engaged = 0
    for trial in range(12):
        n_in = int(sweep.integers(64, 700))
        n_out = int(sweep.integers(64, 2200))
        kind = trial % 3
        if kind == 0:
            w = cubic_weights(n_in, n_out, align_corners=bool(trial & 1))
        elif kind == 1:
            w = linear_weights(n_in, n_out, align_corners=bool(trial & 1))
        else:
            w = area_weights(n_in, n_out)
        if _banded_plan(w) is None:
            continue
        engaged += 1
        x = jnp.asarray(sweep.random((2, n_in, 5), dtype=np.float32))
        banded = _apply_axis(x, w, 1, "o", jnp.float32,
                             jax.lax.Precision.HIGH, banded=True)
        dense = jnp.einsum("abc,ob->aoc", x, jnp.asarray(w, jnp.float32),
                           precision=jax.lax.Precision.HIGH)
        assert banded.shape == (2, n_out, 5), trial
        np.testing.assert_allclose(np.asarray(banded), np.asarray(dense),
                                   rtol=0, atol=1e-5,
                                   err_msg=f"trial {trial} {n_in}->{n_out}")
    assert engaged >= 4, f"sweep engaged the banded path only {engaged}x"


def test_preprocess_folded_random_size_sweep():
    """Seeded fuzz: folded == exact preprocess across random frame sizes
    (odd dims, portrait/landscape) in f32; each also checked against the
    cv2+numpy reference chain."""
    import jax.numpy as jnp

    sweep = np.random.default_rng(9)
    for trial in range(8):
        if trial < 4:  # upscale side of the 518 network target
            h = int(sweep.integers(40, 400))
            w = int(sweep.integers(40, 500))
        else:  # downscale side — the branch real 720p/1080p frames hit
            h = int(sweep.integers(560, 1200))
            w = int(sweep.integers(560, 2000))
        frame = sweep.integers(0, 256, (h, w, 3), dtype=np.uint8)
        net_hw = network_input_size(h, w)
        exact = np.asarray(preprocess_frames(frame, net_hw,
                                             dtype=jnp.float32))
        folded = np.asarray(preprocess_frames(frame, net_hw,
                                              dtype=jnp.float32,
                                              impl="folded"))
        assert np.abs(folded - exact).max() < 1e-4, \
            f"trial {trial}: {h}x{w} -> {net_hw}"
        img = frame.astype(np.float64) / 255.0
        img = cv2.resize(img, (net_hw[1], net_hw[0]),
                         interpolation=cv2.INTER_AREA)
        img = (img - [0.485, 0.456, 0.406]) / [0.229, 0.224, 0.225]
        assert np.abs(exact - img).max() < 1e-4, \
            f"trial {trial}: {h}x{w} vs cv2 chain"
