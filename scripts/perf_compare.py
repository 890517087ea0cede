#!/usr/bin/env python
"""Compare warp implementations (scan / xla / pallas) on the current backend.

Uses checksum-only readback (see bench.py) so host-link bandwidth doesn't
pollute device timing. Run on TPU: python scripts/perf_compare.py
"""

import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", ".jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from vr_video_generator_tpu.ops.temporal import TemporalState, temporal_scan
    from vr_video_generator_tpu.ops.warp import WarpSpec
    from vr_video_generator_tpu.utils.config import StereoConfig

    h, w, b = (1080, 1920, 8) if jax.default_backend() == "tpu" else (216, 384, 2)
    rng = np.random.default_rng(0)
    frames = jnp.asarray(rng.integers(0, 256, (b, h, w, 3), dtype=np.uint8))
    depth = jnp.asarray((rng.random((b, h, w), dtype=np.float32) * 9.0))

    for impl in ("xla", "pallas", "scan"):
        spec = WarpSpec.create(h, w, StereoConfig(), impl=impl)

        @jax.jit
        def run(frames, depth):
            state = TemporalState.initial(h, w)
            blended, ranges, _ = temporal_scan(depth, state, spec)
            sbs = jax.vmap(spec.warp)(frames, blended, ranges)
            return jnp.sum(sbs, dtype=jnp.uint32)

        try:
            t0 = time.perf_counter()
            _ = np.asarray(run(frames, depth))
            compile_s = time.perf_counter() - t0
            iters = 10
            t0 = time.perf_counter()
            for _ in range(iters):
                _ = np.asarray(run(frames, depth))
            dt = (time.perf_counter() - t0) / iters
            print(f"{impl:7s}: {dt / b * 1000:.2f} ms/frame "
                  f"({b / dt:.1f} fps, compile {compile_s:.0f}s)")
        except Exception as e:
            print(f"{impl:7s}: FAILED {str(e)[:200]}")


if __name__ == "__main__":
    main()
