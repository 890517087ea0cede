#!/usr/bin/env python
"""Per-stage device timings for the depth net at the headline config.

Times encoder, head, the head's tail (output convs + final x14-ish resize),
and the endpoint bicubic upsample in isolation with honest in-jit scan timing
(utils/benchlib.device_time). Run on TPU: python scripts/stage_bench.py
"""

import numpy as np


def main():
    from vr_video_generator_tpu.utils.cache import honor_platform_env
    from vr_video_generator_tpu.utils.devwatch import watch_backend_init

    honor_platform_env()
    watch_backend_init()  # diagnose a dead TPU relay instead of hanging
    import jax
    import jax.numpy as jnp

    from vr_video_generator_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    from vr_video_generator_tpu.models.depth_anything_v2 import DepthAnythingV2
    from vr_video_generator_tpu.models.dinov2 import DinoVisionTransformer
    from vr_video_generator_tpu.models.dpt import DPTHead
    from vr_video_generator_tpu.models.factory import random_params
    from vr_video_generator_tpu.ops.resize import resize_bicubic, resize_bilinear
    from vr_video_generator_tpu.utils.benchlib import device_time
    from vr_video_generator_tpu.utils.config import ModelConfig

    on_tpu = jax.default_backend() == "tpu"
    b = 8 if on_tpu else 2
    dtype = jnp.bfloat16 if on_tpu else jnp.float32
    # 1080p -> lower_bound(518, mult14) network input 518x924 -> ph,pw 37x66
    hn, wn = (518, 924) if on_tpu else (126, 224)
    h, w = (1080, 1920) if on_tpu else (270, 480)
    cfg = ModelConfig.for_encoder("vits")
    ph, pw = hn // 14, wn // 14

    rng = np.random.default_rng(0)
    model = DepthAnythingV2(cfg, dtype=dtype)
    params = random_params(model)

    x = jnp.asarray(rng.standard_normal((b, hn, wn, 3)), dtype)

    def full(params, x):
        return model.apply({"params": params}, x)

    enc = DinoVisionTransformer(cfg, dtype=dtype)
    enc_params = params["pretrained"]

    def encoder(p, x):
        return enc.apply({"params": p}, x, cfg.intermediate_layers)

    taps = jax.jit(encoder)(enc_params, x)
    head = DPTHead(cfg, dtype=dtype)
    head_params = params["depth_head"]

    def head_fn(p, taps):
        return head.apply({"params": p}, taps, ph, pw)

    # --- tail in isolation (timing-only weights): path1 -> depth at (hn, wn)
    path1 = jnp.asarray(rng.standard_normal((b, ph * 8, pw * 8, cfg.features)),
                        dtype)
    k1 = jnp.asarray(rng.standard_normal((3, 3, cfg.features, 32)) * 0.05, dtype)
    k2 = jnp.asarray(rng.standard_normal((3, 3, 32, 32)) * 0.05, dtype)
    k3 = jnp.asarray(rng.standard_normal((1, 1, 32, 1)) * 0.05, dtype)

    def tail(path1):
        y = jax.lax.conv_general_dilated(path1, k1, (1, 1), [(1, 1), (1, 1)],
                                         dimension_numbers=("NHWC", "HWIO", "NHWC"))
        y = resize_bilinear(y, (hn, wn), align_corners=True, dtype=dtype,
                            precision=jax.lax.Precision.DEFAULT)
        y = jax.lax.conv_general_dilated(y, k2, (1, 1), [(1, 1), (1, 1)],
                                         dimension_numbers=("NHWC", "HWIO", "NHWC"))
        y = jax.nn.relu(y)
        y = jax.lax.conv_general_dilated(y, k3, (1, 1), [(0, 0), (0, 0)],
                                         dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return jax.nn.relu(y[..., 0])

    depth = jnp.asarray(rng.random((b, hn, wn), dtype=np.float32))

    def up_c1(d):
        return resize_bicubic(d[..., None], (h, w), align_corners=True)[..., 0]

    def up_3d(d):
        return resize_bicubic(d, (h, w), align_corners=True,
                              h_axis=-2, w_axis=-1)

    stages = [
        ("full_net", full, (params, x)),
        ("encoder", encoder, (enc_params, x)),
        ("dpt_head", head_fn, (head_params, taps)),
        ("head_tail", tail, (path1,)),
        ("bicubic_up_c1", up_c1, (depth,)),
        ("bicubic_up_3d", up_3d, (depth,)),
    ]
    for name, fn, args in stages:
        per_call, _ = device_time(fn, *args, k=8 if on_tpu else 2)
        print(f"{name:15s}: {per_call / b * 1000:7.3f} ms/frame")


if __name__ == "__main__":
    main()
