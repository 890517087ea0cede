"""Golden-parity tests: JAX DINOv2+DPT vs the reference PyTorch model on CPU
with identical (converted) weights."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from tests.torch_ref import build_torch_model
from vr_video_generator_tpu.models.convert import convert_state_dict
from vr_video_generator_tpu.models.depth_anything_v2 import DepthAnythingV2, infer_depth
from vr_video_generator_tpu.utils.config import ModelConfig


@pytest.fixture(scope="module")
def vits_pair():
    tmodel = build_torch_model("vits")
    cfg = ModelConfig.for_encoder("vits")
    params = convert_state_dict(tmodel.state_dict(), cfg)
    jmodel = DepthAnythingV2(cfg, dtype=jnp.float32)
    return tmodel, jmodel, params


def test_forward_parity_small_grid(vits_pair):
    """Core forward on a 70x98 (5x7-patch) input — exercises patch embed,
    pos-embed interpolation (non-square), all blocks, taps, and the DPT head."""
    tmodel, jmodel, params = vits_pair
    rng = np.random.default_rng(0)
    x = rng.standard_normal((1, 70, 98, 3), dtype=np.float32)

    with torch.no_grad():
        ref = tmodel(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()

    ours = np.asarray(jmodel.apply({"params": params}, jnp.asarray(x)))
    assert ours.shape == ref.shape
    scale = max(np.abs(ref).max(), 1e-6)
    assert np.abs(ours - ref).max() / scale < 2e-3


def test_forward_parity_square_518(vits_pair):
    """518x518 hits the pos-embed identity shortcut (reference dinov2.py:183)."""
    tmodel, jmodel, params = vits_pair
    rng = np.random.default_rng(1)
    x = rng.standard_normal((1, 518, 518, 3), dtype=np.float32).astype(np.float32)

    with torch.no_grad():
        ref = tmodel(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
    ours = np.asarray(jmodel.apply({"params": params}, jnp.asarray(x)))
    scale = max(np.abs(ref).max(), 1e-6)
    assert np.abs(ours - ref).max() / scale < 2e-3


def test_infer_depth_parity(vits_pair):
    """Full infer chain (preprocess + forward + bicubic upsample + scaler) vs
    the reference infer_image (dpt.py:190-202) at a reduced input_size."""
    tmodel, jmodel, params = vits_pair
    rng = np.random.default_rng(2)
    frame_rgb = rng.integers(0, 256, (72, 128, 3), dtype=np.uint8)

    with torch.no_grad():
        # reference takes BGR (it converts BGR->RGB internally, dpt.py:221)
        ref = tmodel.infer_image(frame_rgb[:, :, ::-1], input_size=126)
    ref = ref * 1.618  # vits scaler (reference PredictAndGenerate.py:27-28)

    ours = np.asarray(infer_depth(jmodel, params, jnp.asarray(frame_rgb[None]),
                                  input_size=126))[0]
    assert ours.shape == ref.shape
    scale = max(np.abs(ref).max(), 1e-6)
    assert np.abs(ours - ref).max() / scale < 5e-3


def test_vitb_forward_parity():
    """Converter + model parity for the vitb family (different widths, taps
    identical; exercises the per-encoder config table)."""
    tmodel = build_torch_model("vitb")
    cfg = ModelConfig.for_encoder("vitb")
    params = convert_state_dict(tmodel.state_dict(), cfg)
    jmodel = DepthAnythingV2(cfg, dtype=jnp.float32)
    rng = np.random.default_rng(5)
    x = rng.standard_normal((1, 70, 70, 3), dtype=np.float32)
    with torch.no_grad():
        ref = tmodel(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
    ours = np.asarray(jmodel.apply({"params": params}, jnp.asarray(x)))
    scale = max(np.abs(ref).max(), 1e-6)
    assert np.abs(ours - ref).max() / scale < 2e-3


def test_jit_and_batch(vits_pair):
    _, jmodel, params = vits_pair
    rng = np.random.default_rng(3)
    x = rng.standard_normal((2, 70, 70, 3), dtype=np.float32)
    fn = jax.jit(lambda p, v: jmodel.apply({"params": p}, v))
    out = np.asarray(fn(params, jnp.asarray(x)))
    assert out.shape == (2, 70, 70)
    single = np.asarray(fn(params, jnp.asarray(x[:1])))
    assert np.abs(out[0] - single[0]).max() < 1e-4


def test_pth_roundtrip_through_load_model(vits_pair, tmp_path):
    """The .pth branch that runs unattended when real weights arrive:
    torch.save(state_dict) -> factory.load_model(encoder_path=.pth) must
    yield exactly the params convert_state_dict produces directly."""
    from vr_video_generator_tpu.models.factory import load_model

    tmodel, _, params_direct = vits_pair
    path = tmp_path / "depth_anything_v2_vits.pth"
    torch.save(tmodel.state_dict(), str(path))

    model, params = load_model("vits", str(path), dtype=jnp.float32)
    assert model.cfg.encoder == "vits"
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(
            np.asarray(a, np.float32), np.asarray(b, np.float32)),
        params, params_direct)


def test_forward_parity_random_grid_sweep(vits_pair):
    """Seeded fuzz: random non-square multiple-of-14 inputs vs torch —
    pos-embed interpolation and the head's resize ladder at odd patch
    grids the fixed tests straddle."""
    tmodel, jmodel, params = vits_pair
    sweep = np.random.default_rng(41)
    fwd = jax.jit(lambda p, x: jmodel.apply({"params": p}, x))
    for trial in range(4):
        h = 14 * int(sweep.integers(4, 12))
        w = 14 * int(sweep.integers(4, 12))
        x = sweep.standard_normal((1, h, w, 3), dtype=np.float32)
        with torch.no_grad():
            ref = tmodel(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
        ours = np.asarray(fwd(params, jnp.asarray(x)))
        assert ours.shape == ref.shape, (trial, h, w)
        scale = max(np.abs(ref).max(), 1e-6)
        err = np.abs(ours - ref).max() / scale
        assert err < 2e-3, f"trial {trial} ({h}x{w}): rel err {err}"


def test_infer_depth_parity_random_frame_sweep(vits_pair):
    """Seeded fuzz of the full infer chain at random (non-multiple-of-14)
    frame sizes — preprocess policy, forward, bicubic upsample, scaler."""
    tmodel, jmodel, params = vits_pair
    sweep = np.random.default_rng(42)
    for trial in range(3):
        fh = int(sweep.integers(50, 150))
        fw = int(sweep.integers(70, 200))
        frame_rgb = sweep.integers(0, 256, (fh, fw, 3), dtype=np.uint8)
        with torch.no_grad():
            ref = tmodel.infer_image(frame_rgb[:, :, ::-1], input_size=126)
        ref = ref * 1.618
        ours = np.asarray(infer_depth(jmodel, params,
                                      jnp.asarray(frame_rgb[None]),
                                      input_size=126))[0]
        assert ours.shape == ref.shape, (trial, fh, fw)
        scale = max(np.abs(ref).max(), 1e-6)
        err = np.abs(ours - ref).max() / scale
        assert err < 5e-3, f"trial {trial} ({fh}x{fw}): rel err {err}"
