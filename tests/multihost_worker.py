"""Worker process for the multi-host sharded-runner test.

Each process owns 4 virtual CPU devices of a 2-process, 8-device pod and
must decode/encode only its own ``data`` slots. Invoked by
tests/test_multihost.py:  python multihost_worker.py PORT PID NPROC TMPDIR
"""

import os
import sys


def main() -> int:
    port, pid, nproc, tmpdir = sys.argv[1:5]
    inherited = [f for f in os.environ.get("XLA_FLAGS", "").split()
                 if "xla_force_host_platform_device_count" not in f]
    os.environ["XLA_FLAGS"] = " ".join(
        ["--xla_force_host_platform_device_count=4"] + inherited)
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    jax.config.update("jax_platforms", "cpu")
    from vr_video_generator_tpu.parallel.multihost import (initialize,
                                                           make_global_mesh)

    initialize(f"127.0.0.1:{port}", int(nproc), int(pid))
    assert jax.device_count() == 8, jax.devices()

    import jax.numpy as jnp

    from vr_video_generator_tpu.models.depth_anything_v2 import DepthAnythingV2
    from vr_video_generator_tpu.models.factory import random_params
    from vr_video_generator_tpu.parallel.sharded import ShardedSbsPipeline
    from vr_video_generator_tpu.runtime.sharded_runner import run_sharded
    from vr_video_generator_tpu.utils.config import ModelConfig, RunConfig

    from vr_video_generator_tpu.utils.logging import WorkerLog

    h, w, n_frames = 48, 64, 24
    mesh = make_global_mesh((8, 1))
    model = DepthAnythingV2(ModelConfig.for_encoder("vits"), dtype=jnp.float32)
    params = random_params(model)
    # depth_stride + audit: exercises step_local AND stride_audit_local
    # across a real process boundary (the audit trigger must stay globally
    # uniform or the SPMD programs desync — runtime/sharded_runner.py)
    cfg = RunConfig(batch_size=2, input_size=42, compute_dtype="float32",
                    warp_impl="xla", encoder="vits", depth_stride=2,
                    stride_audit_every=1)
    pipe = ShardedSbsPipeline(model, params, h, w, mesh, run_cfg=cfg)
    owned = pipe.local_slots
    assert 0 < len(owned) < 8, owned  # each host owns a strict subset

    done = run_sharded(pipe, os.path.join(tmpdir, "in.mp4"),
                       os.path.join(tmpdir, "Subclip/"), 0, n_frames,
                       max_frame_count=3, batch_size=2,
                       log=WorkerLog(os.path.join(tmpdir, f"mh_{pid}.txt")))
    print(f"proc {pid}: slots {owned} frames {done}", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
