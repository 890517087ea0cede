#!/usr/bin/env python
"""End-to-end parity report: our SBS output vs the reference algorithm.

Reference side = the upstream PyTorch Depth-Anything-V2 (imported read-only
from /root/reference, CPU fp32) + the numpy oracle port of SbsProcessor
(tests/oracle/warp_oracle.py). Our side = the full jitted pipeline with
converted weights.

Gate (the north star's 1e-2 PER-PIXEL tolerance, BASELINE.md): a frame
passes when the fraction of pixels deviating by more than ``--gate``
(normalized to [0,1]) is at most ``--frac_budget``. Mean and max abs diff
are reported alongside. A pure mean gate (the round-1 criterion) could hide
a localized warp bug; a strict max gate is meaningless for this algorithm —
a 1-ulp depth difference at a plane-quantization boundary legitimately
shifts single pixels by a whole plane offset.

With --encoder_path pointing at a real .pth both sides use real weights;
without it, seeded random torch weights are converted so the comparison
still exercises every numerical path.

Usage:
    python scripts/parity_report.py --video in.mp4 [--frames 8]
        [--encoder vits --encoder_path ckpt.pth] [--input_size 518]
        [--device cpu|tpu] [--compute_dtype float32|bfloat16]
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    from vr_video_generator_tpu.utils.cache import (enable_compilation_cache,
                                                    honor_platform_env)
    from vr_video_generator_tpu.utils.devwatch import watch_backend_init

    honor_platform_env()
    enable_compilation_cache()
    watch_backend_init()  # diagnose a dead TPU relay instead of hanging
    parser = argparse.ArgumentParser()
    parser.add_argument("--video", required=True)
    parser.add_argument("--frames", type=int, default=8)
    parser.add_argument("--encoder", default="vits")
    parser.add_argument("--encoder_path", default=None)
    parser.add_argument("--input_size", type=int, default=518)
    parser.add_argument("--gate", type=float, default=1e-2,
                        help="per-pixel abs-diff tolerance in [0,1]")
    parser.add_argument("--frac_budget", type=float, default=1e-3,
                        help="max fraction of pixels allowed over --gate")
    parser.add_argument("--device", choices=["cpu", "tpu"], default="cpu",
                        help="where OUR pipeline runs (reference is CPU fp32)")
    parser.add_argument("--compute_dtype", default="float32",
                        choices=["float32", "bfloat16"])
    parser.add_argument("--depth_scaler", type=float, default=None,
                        help="override the encoder's depth rescale constant "
                             "on BOTH sides (ours and the oracle) — used by "
                             "real_weights_runbook.py when it calibrates a "
                             "scaler for an off-family checkpoint")
    parser.add_argument("--spread_depth", action="store_true",
                        help="recenter+amplify the final head conv so random "
                             "weights yield depth spanning ~[0, 9] instead of "
                             "a near-flat map (deep encoders average the "
                             "input away; a flat map makes the warp trivial "
                             "and the parity vacuous). Both sides share the "
                             "mutated weights, so the comparison stays exact.")
    args = parser.parse_args()

    import torch

    import jax
    if args.device == "cpu":
        jax.config.update("jax_platforms", "cpu")  # fp32 apples-to-apples
    import jax.numpy as jnp

    from tests.oracle.warp_oracle import OracleSbs
    from tests.torch_ref import build_torch_model, load_reference_dav2
    from vr_video_generator_tpu.models.convert import convert_state_dict
    from vr_video_generator_tpu.models.depth_anything_v2 import DepthAnythingV2
    from vr_video_generator_tpu.pipeline import SbsPipeline
    from vr_video_generator_tpu.utils.config import DEPTH_SCALERS, ModelConfig, RunConfig
    from vr_video_generator_tpu.video.reader import VideoReader

    if args.encoder_path and os.path.exists(args.encoder_path):
        TorchDAV2 = load_reference_dav2()
        configs = {"vits": dict(features=64, out_channels=[48, 96, 192, 384]),
                   "vitb": dict(features=128, out_channels=[96, 192, 384, 768]),
                   "vitl": dict(features=256, out_channels=[256, 512, 1024, 1024]),
                   "vitg": dict(features=384,
                                out_channels=[1536, 1536, 1536, 1536])}
        tmodel = TorchDAV2(encoder=args.encoder, device="cpu",
                           **configs[args.encoder])
        tmodel.load_state_dict(torch.load(args.encoder_path, map_location="cpu",
                                          weights_only=True))
        tmodel = tmodel.eval()
        weights = f"real:{os.path.basename(args.encoder_path)}"
    else:
        print("note: no checkpoint given — using seeded random weights")
        tmodel = build_torch_model(args.encoder)
        weights = "seeded-random"

    import dataclasses

    cfg = ModelConfig.for_encoder(args.encoder)
    scaler = (args.depth_scaler if args.depth_scaler is not None
              else DEPTH_SCALERS[args.encoder])
    cfg = dataclasses.replace(cfg, depth_scaler=scaler)

    if args.spread_depth:
        # Deep random encoders (vitl: 24 blocks) average the input away and
        # emit a near-flat depth map (std ~1% of mean), which makes the warp
        # a single plane and the SBS comparison vacuous. Recenter + amplify
        # the final 1x1 head conv (output_conv2[2], reference dpt.py:109-116)
        # so scaled depth spans ~[0, 9] with real plane structure. The
        # mutation happens BEFORE weight conversion, so ours and the torch
        # reference run identical weights — the comparison stays exact.
        with VideoReader(args.video) as reader:
            probe = next(iter(reader.frames(0, 1)))
        with torch.no_grad():
            raw = tmodel.infer_image(probe[:, :, ::-1],
                                     input_size=args.input_size)
        raw = np.asarray(raw, np.float64)
        med, mx = float(np.median(raw)), float(raw.max())
        g = 9.0 / max(scaler * (mx - med), 1e-12)
        final = tmodel.depth_head.scratch.output_conv2[2]
        with torch.no_grad():
            final.weight.mul_(g)
            final.bias.copy_((final.bias - med) * g)
        print(f"spread_depth: median={med:.6g} max={mx:.6g} gain={g:.4g}")

    params = convert_state_dict(tmodel.state_dict(), cfg)

    with VideoReader(args.video) as reader:
        frames = [f for _, f in zip(range(args.frames), reader.frames(0, args.frames))]
    frames = np.stack(frames)
    h, w = frames.shape[1:3]

    model_dtype = jnp.float32 if args.compute_dtype == "float32" else jnp.bfloat16
    run_cfg = RunConfig(batch_size=len(frames), input_size=args.input_size,
                        compute_dtype=args.compute_dtype, encoder=args.encoder)
    jmodel = DepthAnythingV2(cfg, dtype=model_dtype)
    pipe = SbsPipeline(jmodel, params, h, w, run_cfg=run_cfg)
    ours, _ = pipe.step(frames, pipe.initial_state())
    ours = np.asarray(ours)
    print(f"ours: device={jax.devices()[0].platform} dtype={args.compute_dtype} "
          f"weights={weights} encoder={args.encoder} {w}x{h} "
          f"input_size={args.input_size}")

    oracle = OracleSbs()
    worst_mean = worst_max = worst_frac = 0.0
    for i, frame in enumerate(frames):
        with torch.no_grad():
            depth = tmodel.infer_image(frame[:, :, ::-1],
                                       input_size=args.input_size) * scaler
        ref = oracle.process(frame, depth)
        diff = np.abs(ours[i].astype(np.float64) - ref.astype(np.float64)) / 255.0
        frac = (diff > args.gate).mean()
        print(f"frame {i}: mean={diff.mean():.5f} max={diff.max():.3f} "
              f"frac_over_gate={frac:.6f}")
        worst_mean = max(worst_mean, diff.mean())
        worst_max = max(worst_max, diff.max())
        worst_frac = max(worst_frac, frac)

    ok = worst_frac <= args.frac_budget and worst_mean <= args.gate
    print(f"RESULT: worst frac(|diff|>{args.gate}) = {worst_frac:.6f} "
          f"(budget {args.frac_budget}), worst mean = {worst_mean:.5f}, "
          f"worst max = {worst_max:.3f} -> {'PASS' if ok else 'FAIL'}")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
