#!/usr/bin/env python
"""XLA-counted FLOPs per frame for each pipeline stage, per BASELINE config.

Complements scripts/stage_bench.py (measured ms/frame): FLOPs come from
``jit(fn).lower(...).compile().cost_analysis()`` on CPU at the PRODUCTION
geometry, so the floor-accounting MXU-rate table divides measured time by
the compiler's own operation count rather than a hand expansion. Run:
  JAX_PLATFORMS=cpu python scripts/flops.py --config 3
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import CONFIGS  # noqa: E402  (single source for config geometry)


def main():
    from vr_video_generator_tpu.utils.cache import honor_platform_env

    honor_platform_env()
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", type=int, default=2,
                        choices=sorted(CONFIGS))
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp

    from vr_video_generator_tpu.models.depth_anything_v2 import DepthAnythingV2
    from vr_video_generator_tpu.models.dinov2 import DinoVisionTransformer
    from vr_video_generator_tpu.models.factory import random_params
    from vr_video_generator_tpu.ops.preprocess import (network_input_size,
                                                       preprocess_frames)
    from vr_video_generator_tpu.ops.resize import resize_bicubic
    from vr_video_generator_tpu.utils.config import ModelConfig

    encoder_name, h, w, b, _step = CONFIGS[args.config]
    cfg = ModelConfig.for_encoder(encoder_name)
    hn, wn = network_input_size(h, w, multiple_of=cfg.patch_size)
    print(f"config {args.config}: {encoder_name} {w}x{h} b={b} "
          f"net {wn}x{hn}")

    rng = np.random.default_rng(0)
    model = DepthAnythingV2(cfg, dtype=jnp.float32)
    params = random_params(model)
    frames = jnp.asarray(rng.integers(0, 256, (b, h, w, 3)), jnp.uint8)
    x = jnp.asarray(rng.standard_normal((b, hn, wn, 3)), jnp.float32)
    depth = jnp.asarray(rng.random((b, hn, wn), np.float32))

    def preprocess(frames):
        return preprocess_frames(frames, (hn, wn), dtype=jnp.float32)

    def full(params, x):
        return model.apply({"params": params}, x)

    enc = DinoVisionTransformer(cfg, dtype=jnp.float32)

    def encoder(p, x):
        return enc.apply({"params": p}, x, cfg.intermediate_layers)

    def up(d):
        return resize_bicubic(d[..., None], (h, w), align_corners=True)[..., 0]

    stages = [("preprocess", preprocess, (frames,)),
              ("full_net", full, (params, x)),
              ("encoder", encoder, (params["pretrained"], x)),
              ("bicubic_up", up, (depth,))]
    for name, fn, fargs in stages:
        ca = jax.jit(fn).lower(*fargs).compile().cost_analysis()
        ca = ca[0] if isinstance(ca, (list, tuple)) else ca
        fl = ca.get("flops", 0.0)
        by = ca.get("bytes accessed", 0.0)
        print(f"{name:12s}: {fl / b / 1e9:9.2f} GFLOP/frame, "
              f"{by / b / 2**20:9.1f} MiB accessed/frame")


if __name__ == "__main__":
    main()
