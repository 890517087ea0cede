#!/usr/bin/env python
"""Depth-stride fidelity study: quantify the speed/fidelity trade.

The depth-stride production mode (RunConfig.depth_stride, docs/PARITY.md)
runs the depth net on every s-th frame and lerps raw depth in between. This
script measures what that costs on synthetic motion, against the stride-1
parity path as ground truth:

  * RAW DEPTH error of the interpolated maps (RMS / max, relative to the
    ground-truth depth range) — the quantity the mode approximates;
  * SBS OUTPUT divergence (fraction of differing pixels, mean |diff| over
    them) — what a viewer could see after dampening/quantization;

for strides 2/4/8 at two pan speeds (slow/fast), because the error is a
function of scene motion: depth between anchors is off by at most the
depth change within one stride group. Deterministic (seeded weights and
scene), CPU-runnable in ~a minute with a tiny model.

Usage: python scripts/stride_study.py [--frames N]
"""

import argparse

import numpy as np


def make_scene(n_frames: int, h: int, w: int, speed: int) -> np.ndarray:
    """Textured background panning `speed` px/frame + a faster bright
    square (a depth-salient foreground object)."""
    rng = np.random.default_rng(7)
    tex = rng.integers(0, 255, (h, 2 * w, 3), dtype=np.uint8)
    tex = (tex // 2 + 64).astype(np.uint8)  # mid-contrast
    frames = np.empty((n_frames, h, w, 3), np.uint8)
    for t in range(n_frames):
        off = (t * speed) % w
        frames[t] = tex[:, off:off + w]
        # foreground square moving diagonally at 2x speed
        y = (5 + 2 * speed * t) % (h - 12)
        x = (9 + 2 * speed * t) % (w - 12)
        frames[t, y:y + 12, x:x + 12] = (250, 240, 80)
    return frames


def run(pipe, frames: np.ndarray, batch: int) -> np.ndarray:
    out = []
    state = pipe.initial_state()
    for i in range(0, frames.shape[0], batch):
        sbs, state = pipe.step(frames[i:i + batch], state)
        out.append(np.asarray(sbs))
    return np.concatenate(out)


def interp_depth(depth_full: np.ndarray, stride: int) -> np.ndarray:
    """Host-side reference of ops/temporal.stride_interpolate over a whole
    sequence (cold start holds anchor 0)."""
    n = depth_full.shape[0]
    anchors = depth_full[stride - 1::stride]
    prev = np.concatenate([anchors[:1], anchors[:-1]])
    w = (np.arange(1, stride + 1, dtype=np.float32) / stride)[None, :, None, None]
    out = prev[:, None] * (1 - w) + anchors[:, None] * w
    return out.reshape(n, *depth_full.shape[1:])


def main() -> None:
    from vr_video_generator_tpu.utils.cache import honor_platform_env
    from vr_video_generator_tpu.utils.devwatch import watch_backend_init

    honor_platform_env()
    watch_backend_init()  # diagnose a dead TPU relay instead of hanging
    parser = argparse.ArgumentParser()
    parser.add_argument("--frames", type=int, default=32,
                        help="rounded up to a multiple of 8 (the batch size "
                             "and largest stride must divide the total)")
    args = parser.parse_args()
    if args.frames < 8 or args.frames % 8:
        args.frames = max(8, -(-args.frames // 8) * 8)
        print(f"(frames rounded up to {args.frames}: the batch and the "
              "stride-8 arm need whole groups)")

    import jax

    jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp

    from vr_video_generator_tpu.models.depth_anything_v2 import DepthAnythingV2
    from vr_video_generator_tpu.models.factory import random_params
    from vr_video_generator_tpu.pipeline import SbsPipeline
    from vr_video_generator_tpu.utils.config import ModelConfig, RunConfig

    tiny = ModelConfig(encoder="vits", embed_dim=32, depth=4, num_heads=2,
                       mlp_ratio=4.0, features=16, out_channels=(8, 16, 32, 32),
                       intermediate_layers=(0, 1, 2, 3), depth_scaler=1.618)
    h, w, batch = 56, 98, 8
    model = DepthAnythingV2(tiny, dtype=jnp.float32)
    params = random_params(model)

    print(f"{args.frames} frames {w}x{h}, tiny seeded model, batch {batch}")
    print("depth errors are % of the ground-truth depth range; p99 is the "
          "robust tail (random-weight depth has single-pixel outliers that "
          "pin max at ~100% — real checkpoints are spatially smoother)")
    print(f"{'scene':>6} {'stride':>6} {'depth RMS%':>10} {'depth p99%':>10} "
          f"{'SBS diff px%':>12} {'mean|d| u8':>10}")
    for name, speed in (("slow", 1), ("fast", 6)):
        frames = make_scene(args.frames, h, w, speed)
        base_cfg = dict(batch_size=batch, input_size=56,
                        compute_dtype="float32")
        ref_pipe = SbsPipeline(model, params, h, w,
                               run_cfg=RunConfig(**base_cfg))
        sbs_ref = run(ref_pipe, frames, batch)
        depth_full = np.asarray(ref_pipe.depth_only(frames))
        drange = float(depth_full.max() - depth_full.min()) or 1.0

        for stride in (2, 4, 8):
            pipe = SbsPipeline(model, params, h, w,
                               run_cfg=RunConfig(**base_cfg,
                                                 depth_stride=stride))
            sbs = run(pipe, frames, batch)
            di = interp_depth(depth_full, stride)
            err = di - depth_full
            rms = float(np.sqrt((err ** 2).mean())) / drange * 100
            mx = float(np.percentile(np.abs(err), 99)) / drange * 100
            diff = sbs.astype(np.int16) - sbs_ref.astype(np.int16)
            npx = float((np.abs(diff).max(axis=-1) > 0).mean()) * 100
            mean_d = (float(np.abs(diff[diff != 0]).mean())
                      if (diff != 0).any() else 0.0)
            print(f"{name:>6} {stride:>6} {rms:>10.2f} {mx:>10.2f} "
                  f"{npx:>12.2f} {mean_d:>10.2f}")


if __name__ == "__main__":
    main()
