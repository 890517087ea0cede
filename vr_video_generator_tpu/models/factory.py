"""Model factory — parity with reference SupportFunction.py:158-168 load_model."""

from __future__ import annotations

import os
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from vr_video_generator_tpu.models.convert import load_checkpoint
from vr_video_generator_tpu.models.depth_anything_v2 import DepthAnythingV2
from vr_video_generator_tpu.utils.config import ModelConfig


def random_params(model: DepthAnythingV2, seed: int = 0,
                  sample_hw: Tuple[int, int] = (70, 70)):
    """Randomly initialized params (for tests / benchmarks without weights).

    Parameter shapes are input-size independent, so a small sample keeps
    initialization cheap on CPU.
    """
    x = jnp.zeros((1, *sample_hw, 3), jnp.float32)
    return model.init(jax.random.PRNGKey(seed), x)["params"]


def load_model(encoder: str, encoder_path: Optional[str] = None,
               dtype=jnp.bfloat16, allow_random: bool = False,
               gelu: str = "exact", mlp_fused: str = "auto",
               tail: str = "auto"):
    """Build a DepthAnythingV2 and its params.

    Matches the reference factory's per-size configuration
    (reference SupportFunction.py:158-168). When ``encoder_path`` is missing
    and ``allow_random`` is set, falls back to seeded random weights so the
    full pipeline stays runnable without the downloaded checkpoints.
    """
    import dataclasses

    cfg = ModelConfig.for_encoder(encoder)
    if gelu == "tanh":
        cfg = dataclasses.replace(cfg, gelu_approx=True)
    if mlp_fused != "auto":
        cfg = dataclasses.replace(cfg, mlp_fused=mlp_fused)
    model = DepthAnythingV2(cfg, dtype=dtype, tail=tail)
    if encoder_path and os.path.isdir(encoder_path):
        # native Orbax checkpoint dir (models/checkpoint.py)
        from vr_video_generator_tpu.models import checkpoint

        params = checkpoint.load(encoder_path)
    elif encoder_path and os.path.exists(encoder_path):
        params = load_checkpoint(encoder_path, cfg)
        params = jax.tree.map(lambda a: jnp.asarray(np.asarray(a)), params)
    elif allow_random:
        params = random_params(model)
    else:
        raise FileNotFoundError(
            f"checkpoint not found: {encoder_path!r}; pass allow_random=True "
            "to run with seeded random weights")
    return model, params
