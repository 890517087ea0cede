"""Headline benchmark: SBS conversion throughput at 1080p with DA-V2-Small.

Runs the full fused device pipeline (preprocess + depth net + temporal
smoothing + warp/fill + SBS concat) on the available accelerator and prints
ONE JSON line. Baseline: the reference's end-to-end ~12 fps SBS at 1080p on
an RTX 2080 Ti (reference Journal.txt:33; BASELINE.md).
"""

import json
import time

import numpy as np


def main() -> None:
    import jax
    import jax.numpy as jnp

    from vr_video_generator_tpu.models.depth_anything_v2 import DepthAnythingV2
    from vr_video_generator_tpu.models.factory import random_params
    from vr_video_generator_tpu.pipeline import SbsPipeline
    from vr_video_generator_tpu.utils.config import ModelConfig, RunConfig

    h, w, b = 1080, 1920, 8
    on_tpu = jax.default_backend() == "tpu"
    if not on_tpu:  # CPU smoke fallback keeps bench runnable anywhere
        h, w, b = 270, 480, 2

    model = DepthAnythingV2(ModelConfig.for_encoder("vits"),
                            dtype=jnp.bfloat16 if on_tpu else jnp.float32)
    params = random_params(model)
    cfg = RunConfig(batch_size=b, input_size=518 if on_tpu else 126)
    pipe = SbsPipeline(model, params, h, w, run_cfg=cfg)

    rng = np.random.default_rng(0)
    frames = jnp.asarray(rng.integers(0, 256, (b, h, w, 3), dtype=np.uint8))
    state = pipe.initial_state()

    # warmup/compile
    sbs, state = pipe.step(frames, state)
    jax.block_until_ready(sbs)

    iters = 12 if on_tpu else 3
    t0 = time.perf_counter()
    for _ in range(iters):
        sbs, state = pipe.step(frames, state)
    jax.block_until_ready(sbs)
    dt = time.perf_counter() - t0

    fps = iters * b / dt
    baseline_fps = 12.0  # reference Journal.txt:33 (2.5x realtime at 30fps)
    print(json.dumps({
        "metric": f"sbs_fps_{h}p_vits_depth_warp_fused",
        "value": round(fps, 2),
        "unit": "frames/s",
        "vs_baseline": round(fps / baseline_fps, 2),
    }))


if __name__ == "__main__":
    main()
