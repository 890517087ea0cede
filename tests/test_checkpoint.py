"""Orbax checkpoint roundtrip + vitg SwiGLU block test."""

import jax
import jax.numpy as jnp
import numpy as np

from vr_video_generator_tpu.models import checkpoint
from vr_video_generator_tpu.models.depth_anything_v2 import DepthAnythingV2
from vr_video_generator_tpu.models.factory import random_params
from vr_video_generator_tpu.utils.config import ModelConfig


def test_checkpoint_roundtrip(tmp_path):
    tiny = ModelConfig(encoder="vits", embed_dim=32, depth=2, num_heads=2,
                       features=16, out_channels=(8, 16, 32, 32),
                       intermediate_layers=(0, 1, 1, 1))
    model = DepthAnythingV2(tiny, dtype=jnp.float32)
    params = random_params(model)
    path = str(tmp_path / "ckpt")
    checkpoint.save(path, params)
    restored = checkpoint.load(path, like=params)
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(restored)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_swiglu_vitg_style_forward():
    tiny_g = ModelConfig(encoder="vitg", embed_dim=48, depth=2, num_heads=2,
                         features=16, out_channels=(8, 16, 32, 32),
                         intermediate_layers=(0, 1, 1, 1),
                         ffn_layer="swiglufused", depth_scaler=1.0)
    model = DepthAnythingV2(tiny_g, dtype=jnp.float32)
    params = random_params(model)
    assert "w12" in params["pretrained"]["block0"]["mlp"]
    x = jnp.zeros((1, 70, 70, 3))
    out = model.apply({"params": params}, x)
    assert out.shape == (1, 70, 70)


def test_load_model_orbax_dir_branch(tmp_path):
    """factory.load_model with a directory path restores the Orbax
    checkpoint (the production fast-startup path that skips torch)."""
    from vr_video_generator_tpu.models.factory import load_model

    model = DepthAnythingV2(ModelConfig.for_encoder("vits"), dtype=jnp.float32)
    params = random_params(model)
    path = str(tmp_path / "vits_orbax")
    checkpoint.save(path, params)

    _, restored = load_model("vits", path, dtype=jnp.float32)
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a),
                                                   np.asarray(b)),
        restored, params)
