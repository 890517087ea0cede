#!/usr/bin/env python
"""Compare warp implementations (xla / pallas / scan) on the current backend
with honest in-jit timing (utils/benchlib.py). Run on TPU:
    python scripts/perf_compare.py
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

    from vr_video_generator_tpu.ops.temporal import TemporalState, temporal_scan
    from vr_video_generator_tpu.ops.warp import WarpSpec
    from vr_video_generator_tpu.utils.benchlib import device_time
    from vr_video_generator_tpu.utils.config import StereoConfig

    on_tpu = jax.default_backend() == "tpu"
    h, w, b = (1080, 1920, 8) if on_tpu else (216, 384, 2)
    rng = np.random.default_rng(0)
    frames = jnp.asarray(rng.integers(0, 256, (b, h, w, 3), dtype=np.uint8))
    depth = jnp.asarray(rng.random((b, h, w), dtype=np.float32) * 9.0)

    for impl in ("xla", "pallas", "scan"):
        if impl == "pallas" and not on_tpu:
            continue
        spec = WarpSpec.create(h, w, StereoConfig(), impl=impl)

        def run(frames, depth):
            state = TemporalState.initial(h, w)
            blended, ranges, _ = temporal_scan(depth, state, spec)
            return jax.vmap(spec.warp)(frames, blended, ranges)

        try:
            per_call, _ = device_time(run, frames, depth, k=4 if on_tpu else 2)
            print(f"{impl:7s}: {per_call / b * 1000:.2f} ms/frame "
                  f"({b / per_call:.1f} fps)")
        except Exception as e:
            print(f"{impl:7s}: FAILED {str(e)[:200]}")


if __name__ == "__main__":
    main()
