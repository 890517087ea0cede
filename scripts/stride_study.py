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
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


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


def make_depth(n_frames: int, h: int, w: int, speed: int) -> np.ndarray:
    """Temporally-coherent synthetic depth matched to make_scene's motion:
    a static y-gradient background plus a depth-9 gaussian blob riding the
    foreground square. This is the smooth, slowly-varying shape a real
    checkpoint emits on smooth motion — the model arms above measure the
    OPPOSITE extreme (a tiny random net whose depth decorrelates with every
    texture shift), so together they bracket the stride fidelity curve."""
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    base = 1.0 + 2.0 * yy / h  # floor-like gradient, span [1, 3]
    depth = np.empty((n_frames, h, w), np.float32)
    for t in range(n_frames):
        cy = (5 + 2 * speed * t) % (h - 12) + 6
        cx = (9 + 2 * speed * t) % (w - 12) + 6
        blob = 8.0 * np.exp(-(((yy - cy) / 7.0) ** 2 + ((xx - cx) / 7.0) ** 2))
        depth[t] = base + blob
    return depth


def spread_params(model, params, probe_frame: np.ndarray, scaler: float,
                  target_span: float = 9.0):
    """Structured-depth weights: recenter+amplify the final 1x1 head conv so
    scaled depth spans ~[0, target_span] with real plane structure, exactly
    like `parity_report --spread_depth` (same final-conv mutation, jax side).
    Random weights emit low-spread depth whose plane structure is noise; the
    mutated net keeps the SAME spatial response (a linear remap of the same
    conv output, clamped by the existing ReLU) but exercises the warp's full
    plane range — the fidelity curve then reflects structured depth, not
    pure random-weight depth."""
    import jax

    from vr_video_generator_tpu.pipeline import SbsPipeline
    from vr_video_generator_tpu.utils.config import RunConfig

    pipe = SbsPipeline(model, params, probe_frame.shape[0],
                       probe_frame.shape[1],
                       run_cfg=RunConfig(batch_size=1, input_size=56,
                                         compute_dtype="float32"))
    raw = np.asarray(pipe.depth_only(probe_frame[None])[0],
                     np.float64) / scaler  # pre-scaler units
    med, mx = float(np.median(raw)), float(raw.max())
    g = target_span / max(scaler * (mx - med), 1e-12)
    leaf = params["depth_head"]["output_conv2_2"]
    mutated = dict(leaf, kernel=leaf["kernel"] * g,
                   bias=(leaf["bias"] - med) * g)
    out = jax.tree_util.tree_map(lambda x: x, params)  # shallow-safe copy
    out["depth_head"] = dict(params["depth_head"], output_conv2_2=mutated)
    return out


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
    weight_arms = (
        ("random", params),
        # structured arm: the curve the verdict asked for — plane-rich depth
        # spanning the production range, not near-flat random-weight depth.
        # (The warp itself normalizes by ls = ceil(max depth), so a pure
        # linear remap would be SBS-invisible; what spread changes is the
        # relu-clamped zero background + the plane-boundary structure the
        # lerp must track, which is exactly the real-checkpoint shape.)
        ("spread", spread_params(model, params,
                                 make_scene(1, h, w, 1)[0],
                                 tiny.depth_scaler)),
    )
    # Production plane density: at H=56 the production offsets (0.025)
    # give the whole depth range ~1.4 px of shift — every steady-state
    # lerp error quantizes to the SAME plane and the SBS columns read 0
    # regardless of the true fidelity. 10x offsets make ~1 depth unit ~
    # 1 plane, the plane density a 1080p frame actually has.
    base_cfg = dict(batch_size=batch, input_size=56,
                    compute_dtype="float32",
                    offset_fg=0.25, offset_bg=-0.1)
    print("SBS columns are STEADY-STATE (first stride group excluded): a "
          "cold start holds anchor 0 over group 0 by construction, which "
          "otherwise dominates the stats; the 'cold px%' column reports "
          "that first-group divergence separately.")
    for wname, wparams in weight_arms:
        print(f"\n[{wname} weights]")
        print(f"{'scene':>6} {'stride':>6} {'depth RMS%':>10} "
              f"{'depth p99%':>10} {'SBS diff px%':>12} {'mean|d| u8':>10} "
              f"{'cold px%':>9}")
        for name, speed in (("slow", 1), ("fast", 6)):
            frames = make_scene(args.frames, h, w, speed)
            ref_pipe = SbsPipeline(model, wparams, h, w,
                                   run_cfg=RunConfig(**base_cfg))
            sbs_ref = run(ref_pipe, frames, batch)
            depth_full = np.asarray(ref_pipe.depth_only(frames))
            drange = float(depth_full.max() - depth_full.min()) or 1.0

            for stride in (2, 4, 8):
                pipe = SbsPipeline(model, wparams, h, w,
                                   run_cfg=RunConfig(**base_cfg,
                                                     depth_stride=stride))
                sbs = run(pipe, frames, batch)
                di = interp_depth(depth_full, stride)
                # steady state: group 0 holds anchor 0 on a cold start
                err = (di - depth_full)[stride:]
                rms = float(np.sqrt((err ** 2).mean())) / drange * 100
                mx = float(np.percentile(np.abs(err), 99)) / drange * 100
                diff = sbs.astype(np.int16) - sbs_ref.astype(np.int16)
                dmask = np.abs(diff).max(axis=-1) > 0
                npx = float(dmask[stride:].mean()) * 100
                body = diff[stride:]
                mean_d = (float(np.abs(body[body != 0]).mean())
                          if (body != 0).any() else 0.0)
                cold = float(dmask[:stride].mean()) * 100
                print(f"{name:>6} {stride:>6} {rms:>10.2f} {mx:>10.2f} "
                      f"{npx:>12.2f} {mean_d:>10.2f} {cold:>9.2f}")

    # --- coherent-depth arm: synthetic smooth depth straight into the warp
    # (no model), the temporal shape a real checkpoint emits on smooth
    # motion. Same boosted plane density as the model arms.
    from vr_video_generator_tpu.ops.warp import WarpSpec
    from vr_video_generator_tpu.utils.config import StereoConfig

    spec = WarpSpec.create(h, w, StereoConfig(offset_fg=0.25, offset_bg=-0.1),
                           impl="xla")
    print("\n[coherent synthetic depth, warp only]")
    print(f"{'scene':>6} {'stride':>6} {'depth RMS%':>10} "
          f"{'depth p99%':>10} {'SBS diff px%':>12} {'mean|d| u8':>10} "
          f"{'cold px%':>9}")
    for name, speed in (("slow", 1), ("fast", 6)):
        frames = make_scene(args.frames, h, w, speed)
        depth_true = make_depth(args.frames, h, w, speed)
        ranges = jax.vmap(spec.frame_offset_range)(jnp.asarray(depth_true))
        sbs_ref = np.asarray(spec.warp_batch(
            jnp.asarray(frames), jnp.asarray(depth_true), ranges))
        drange = float(depth_true.max() - depth_true.min()) or 1.0
        for stride in (2, 4, 8):
            di = interp_depth(depth_true, stride)
            sbs = np.asarray(spec.warp_batch(
                jnp.asarray(frames), jnp.asarray(di),
                jax.vmap(spec.frame_offset_range)(jnp.asarray(di))))
            err = (di - depth_true)[stride:]
            rms = float(np.sqrt((err ** 2).mean())) / drange * 100
            mx = float(np.percentile(np.abs(err), 99)) / drange * 100
            diff = sbs.astype(np.int16) - sbs_ref.astype(np.int16)
            dmask = np.abs(diff).max(axis=-1) > 0
            npx = float(dmask[stride:].mean()) * 100
            body = diff[stride:]
            mean_d = (float(np.abs(body[body != 0]).mean())
                      if (body != 0).any() else 0.0)
            cold = float(dmask[:stride].mean()) * 100
            print(f"{name:>6} {stride:>6} {rms:>10.2f} {mx:>10.2f} "
                  f"{npx:>12.2f} {mean_d:>10.2f} {cold:>9.2f}")


if __name__ == "__main__":
    main()
