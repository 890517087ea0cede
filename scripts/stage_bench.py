#!/usr/bin/env python
"""Per-stage device timings for the full compute path, per BASELINE config.

Times preprocess, encoder, head, the head's tail (output convs + final
x14-ish resize), the endpoint bicubic upsample, and the fused warp
compositor in isolation with honest in-jit scan timing
(utils/benchlib.device_time). This is the floor-accounting tool: each
stage's net ms/frame vs the full pipeline's, so headroom claims are
decompositions, not assertions (VERDICT r3 weak #5).

Run on TPU:
  python scripts/stage_bench.py               # config 2 (vits 1080p)
  python scripts/stage_bench.py --config 5    # vitl 4K
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import CONFIGS  # noqa: E402  (single source for config geometry)


def main():
    from vr_video_generator_tpu.utils.cache import honor_platform_env
    from vr_video_generator_tpu.utils.devwatch import watch_backend_init

    honor_platform_env()
    watch_backend_init()  # diagnose a dead TPU relay instead of hanging
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", type=int, default=2,
                        choices=sorted(CONFIGS))
    parser.add_argument("--stages", default="",
                        help="substring filter: only run matching stages")
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp

    from vr_video_generator_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    from vr_video_generator_tpu.models.depth_anything_v2 import DepthAnythingV2
    from vr_video_generator_tpu.models.dinov2 import DinoVisionTransformer
    from vr_video_generator_tpu.models.dpt import DPTHead
    from vr_video_generator_tpu.models.factory import random_params
    from vr_video_generator_tpu.ops.preprocess import (network_input_size,
                                                       preprocess_frames)
    from vr_video_generator_tpu.ops.resize import resize_bicubic, resize_bilinear
    from vr_video_generator_tpu.utils.benchlib import device_time
    from vr_video_generator_tpu.utils.config import ModelConfig, StereoConfig

    on_tpu = jax.default_backend() == "tpu"
    encoder_name, h, w, b, _step = CONFIGS[args.config]
    target = 518
    if not on_tpu:  # CPU smoke shape: tiny geometry, same code path
        h, w, b, target = 270, 480, 2, 126
    dtype = jnp.bfloat16 if on_tpu else jnp.float32
    cfg = ModelConfig.for_encoder(encoder_name)
    hn, wn = network_input_size(h, w, target=target,
                                multiple_of=cfg.patch_size)
    ph, pw = hn // cfg.patch_size, wn // cfg.patch_size
    print(f"config {args.config}: {encoder_name} {w}x{h} b={b} "
          f"net {wn}x{hn} ({'tpu bf16' if on_tpu else 'cpu f32'})")

    rng = np.random.default_rng(0)
    pre_impl = "folded" if (on_tpu and dtype == jnp.bfloat16) else "exact"

    # Stage inputs are built lazily through memoized prerequisite thunks so a
    # --stages filter skips the setup (model build, warm-up jits) of every
    # stage it excludes, not just its timing (ADVICE r4).
    _memo = {}

    def once(key, build):
        if key not in _memo:
            _memo[key] = build()
        return _memo[key]

    def get_frames():
        return once("frames", lambda: jnp.asarray(
            rng.integers(0, 256, (b, h, w, 3)), jnp.uint8))

    def get_model():
        return once("model", lambda: DepthAnythingV2(cfg, dtype=dtype))

    def get_params():
        return once("params", lambda: random_params(get_model()))

    def preprocess(frames):
        return preprocess_frames(frames, (hn, wn), dtype=dtype, impl=pre_impl)

    def preprocess_exact(frames):
        return preprocess_frames(frames, (hn, wn), dtype=dtype, impl="exact")

    def get_x():
        return once("x", lambda: jax.jit(preprocess)(get_frames()))

    def full(params, x):
        return get_model().apply({"params": params}, x)

    enc = DinoVisionTransformer(cfg, dtype=dtype)

    def encoder(p, x):
        return enc.apply({"params": p}, x, cfg.intermediate_layers)

    def get_taps():
        return once("taps", lambda: jax.jit(encoder)(
            get_params()["pretrained"], get_x()))

    head = DPTHead(cfg, dtype=dtype)

    def head_fn(p, taps):
        return head.apply({"params": p}, taps, ph, pw)

    # --- tail in isolation (timing-only weights): path1 -> depth at (hn, wn)
    def get_tail_inputs():
        def build():
            path1 = jnp.asarray(
                rng.standard_normal((b, ph * 8, pw * 8, cfg.features)), dtype)
            k1 = jnp.asarray(
                rng.standard_normal((3, 3, cfg.features, 32)) * 0.05, dtype)
            k2 = jnp.asarray(rng.standard_normal((3, 3, 32, 32)) * 0.05, dtype)
            k3 = jnp.asarray(rng.standard_normal((1, 1, 32, 1)) * 0.05, dtype)
            return path1, k1, k2, k3
        return once("tail_inputs", build)

    def tail(path1, k1, k2, k3):
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

    def get_depth_net():
        return once("depth_net", lambda: jnp.asarray(
            rng.random((b, hn, wn), dtype=np.float32)))

    def up_c1(d):
        return resize_bicubic(d[..., None], (h, w), align_corners=True)[..., 0]

    def up_3d(d):
        return resize_bicubic(d, (h, w), align_corners=True,
                              h_axis=-2, w_axis=-1)

    # --- warp compositor at source resolution (the production pallas path).
    # Depth spans the production ~[0, 12] range so the plane loop runs its
    # realistic trip count; ranges pinned at ls=12 for a stable shape.
    from vr_video_generator_tpu.ops.warp import WarpSpec

    warp_impl = "pallas" if on_tpu else "xla"
    spec = WarpSpec.create(h, w, StereoConfig(), impl=warp_impl)

    def get_warp_inputs():
        def build():
            depth_src = jnp.asarray(rng.random((b, h, w), np.float32) * 12.0)
            ranges = jnp.broadcast_to(
                spec.frame_offset_range(depth_src[0])[None], (b, 2))
            return get_frames(), depth_src, ranges
        return once("warp_inputs", build)

    def warp(frames, depth_src, ranges):
        return spec.warp_batch(frames, depth_src, ranges, emit="u8")

    def warp_packed(frames, depth_src, ranges):
        return spec.warp_batch(frames, depth_src, ranges, emit="packed")

    # --- the full production step under the SAME in-jit scan methodology,
    # so stage sums reconcile against an e2e number measured identically
    # (bench.py's fps additionally includes host I/O overlap).
    def get_pipe():
        from vr_video_generator_tpu.pipeline import SbsPipeline
        from vr_video_generator_tpu.utils.config import RunConfig

        return once("pipe", lambda: SbsPipeline(
            get_model(), get_params(), h, w, run_cfg=RunConfig(
                encoder=encoder_name, batch_size=b, input_size=target,
                compute_dtype="bfloat16" if dtype == jnp.bfloat16
                else "float32")))

    # params travel as an explicit argument: closed-over vitb/vitl weights
    # would be serialized into the remote-compile request as constants and
    # exceed the dev relay's HTTP body limit (observed 413 at vitb).
    def pipe_step(params, frames, state):
        return get_pipe()._step_impl(params, frames, state)

    # (name, fn, zero-arg input builder) — inputs materialize only for the
    # stages that survive the --stages filter.
    stages = [
        ("preprocess", preprocess, lambda: (get_frames(),)),
        ("preprocess_exact", preprocess_exact, lambda: (get_frames(),)),
        ("full_net", full, lambda: (get_params(), get_x())),
        ("encoder", encoder,
         lambda: (get_params()["pretrained"], get_x())),
        ("dpt_head", head_fn,
         lambda: (get_params()["depth_head"], get_taps())),
        ("head_tail", tail, get_tail_inputs),
        ("bicubic_up_c1", up_c1, lambda: (get_depth_net(),)),
        ("bicubic_up_3d", up_3d, lambda: (get_depth_net(),)),
        ("warp", warp, get_warp_inputs),
    ]
    if spec.impl == "pallas":  # production emit: packed uint32 SBS
        stages.append(("warp_packed", warp_packed, get_warp_inputs))
    stages.append(("pipeline_step", pipe_step, lambda: (
        get_params(), get_frames(), get_pipe().initial_state())))

    if args.stages:
        all_names = [s[0] for s in stages]
        stages = [s for s in stages if args.stages in s[0]]
        if not stages:
            parser.error(f"--stages {args.stages!r} matched none of "
                         f"{all_names}")
    for name, fn, build_args in stages:
        per_call, _ = device_time(fn, *build_args(), k=8 if on_tpu else 2)
        print(f"{name:15s}: {per_call / b * 1000:7.3f} ms/frame", flush=True)


if __name__ == "__main__":
    main()
