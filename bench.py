"""Headline benchmark: SBS conversion throughput at 1080p with DA-V2-Small.

Measures the full fused device pipeline (preprocess + depth net + temporal
smoothing + warp/fill + SBS concat). The jitted step returns the carried
temporal state plus a uint32 checksum of the SBS output — only the checksum
is fetched per step, so timing reflects device throughput + dispatch, not
host-link bandwidth for the 100MB/batch of pixels (which production runs
stream through the overlapped encode path instead).

Prints ONE JSON line. Baseline: the reference's end-to-end ~12 fps SBS at
1080p on an RTX 2080 Ti (reference Journal.txt:33; BASELINE.md).
"""

import json
import os
import time

import numpy as np


def main() -> None:
    import jax

    # Persistent compilation cache: the first run pays the XLA compile;
    # later runs start in seconds.
    cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             ".jax_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    import jax.numpy as jnp

    from vr_video_generator_tpu.models.depth_anything_v2 import DepthAnythingV2
    from vr_video_generator_tpu.models.factory import random_params
    from vr_video_generator_tpu.pipeline import SbsPipeline
    from vr_video_generator_tpu.utils.config import ModelConfig, RunConfig

    on_tpu = jax.default_backend() == "tpu"
    h, w, b = (1080, 1920, 8) if on_tpu else (270, 480, 2)

    model = DepthAnythingV2(ModelConfig.for_encoder("vits"),
                            dtype=jnp.bfloat16 if on_tpu else jnp.float32)
    params = random_params(model)
    cfg = RunConfig(batch_size=b, input_size=518 if on_tpu else 126)
    pipe = SbsPipeline(model, params, h, w, run_cfg=cfg)

    k_steps = 8 if on_tpu else 2

    @jax.jit
    def chained(params, frames, state):
        def body(carry, _):
            frames, state = carry
            sbs, state = pipe._step_impl(params, frames, state)
            # consume every output pixel so nothing dead-code-eliminates
            cs = jnp.sum(sbs, dtype=jnp.uint32)
            # Serializing data dependency: the next iteration's frames depend
            # on this iteration's checksum (the condition is never true, but
            # XLA cannot prove it). Without this, XLA overlaps scan
            # iterations and peak memory scales with the trip count.
            frames = jnp.where(cs == jnp.uint32(0xFFFFFFFF), frames ^ 1, frames)
            return (frames, state), cs
        (_, state), sums = jax.lax.scan(body, (frames, state), None,
                                        length=k_steps)
        return sums, state

    rng = np.random.default_rng(0)
    frames = jnp.asarray(rng.integers(0, 256, (b, h, w, 3), dtype=np.uint8))

    sums, _ = chained(params, frames, pipe.initial_state())  # compile+warmup
    _ = np.asarray(sums)

    best = float("inf")
    for _ in range(3):
        state = pipe.initial_state()
        t0 = time.perf_counter()
        sums, _ = chained(params, frames, state)
        _ = np.asarray(sums)  # scalar readback forces completion
        best = min(best, time.perf_counter() - t0)

    fps = k_steps * b / best
    baseline_fps = 12.0  # reference Journal.txt:33 (2.5x realtime at 30fps)
    print(json.dumps({
        "metric": f"sbs_fps_{h}p_vits_depth_warp_fused",
        "value": round(fps, 2),
        "unit": "frames/s",
        "vs_baseline": round(fps / baseline_fps, 2),
    }))


if __name__ == "__main__":
    main()
