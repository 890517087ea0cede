"""Headline benchmark: SBS conversion throughput at 1080p with DA-V2-Small.

Measures the full fused device pipeline (preprocess + depth net + temporal
smoothing + warp/fill + SBS concat). The timing loop runs INSIDE one jitted
``lax.scan`` (K chained batches, returning only a checksum + final state), so
the number reflects pure device throughput regardless of host-link bandwidth
or async-dispatch semantics. Prints ONE JSON line.

Baseline: the reference's end-to-end ~12 fps SBS at 1080p on an RTX 2080 Ti
(reference Journal.txt:33; BASELINE.md).
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

    on_tpu = jax.default_backend() == "tpu"
    h, w, b, k_steps = (1080, 1920, 8, 8) if on_tpu else (270, 480, 2, 2)

    model = DepthAnythingV2(ModelConfig.for_encoder("vits"),
                            dtype=jnp.bfloat16 if on_tpu else jnp.float32)
    params = random_params(model)
    cfg = RunConfig(batch_size=b, input_size=518 if on_tpu else 126)
    pipe = SbsPipeline(model, params, h, w, run_cfg=cfg)

    def chained(params, frames, state):
        def body(state, _):
            sbs, state = pipe._step_impl(params, frames, state)
            # consume every output pixel so nothing dead-code-eliminates
            return state, jnp.sum(sbs, dtype=jnp.int32)
        state, sums = jax.lax.scan(body, state, None, length=k_steps)
        return sums, state

    chained_jit = jax.jit(chained)

    rng = np.random.default_rng(0)
    frames = jnp.asarray(rng.integers(0, 256, (b, h, w, 3), dtype=np.uint8))
    state = pipe.initial_state()

    sums, _ = chained_jit(params, frames, state)  # compile + warmup
    _ = np.asarray(sums)

    best_fps = 0.0
    for _ in range(3):
        state = pipe.initial_state()
        t0 = time.perf_counter()
        sums, _ = chained_jit(params, frames, state)
        _ = np.asarray(sums)  # scalar readback forces completion
        dt = time.perf_counter() - t0
        best_fps = max(best_fps, k_steps * b / dt)

    baseline_fps = 12.0  # reference Journal.txt:33 (2.5x realtime at 30fps)
    print(json.dumps({
        "metric": f"sbs_fps_{h}p_vits_depth_warp_fused",
        "value": round(best_fps, 2),
        "unit": "frames/s",
        "vs_baseline": round(best_fps / baseline_fps, 2),
    }))


if __name__ == "__main__":
    main()
