#!/usr/bin/env python
"""Real-checkpoint validation runbook — run this when the DA-V2 weights land.

This environment has no egress, so every committed parity artifact uses
seeded random torch weights (tests/torch_ref.py). The reference's observable
output, however, is defined by the downloaded checkpoints
(reference SupportFunction.py:158-168, README.md:33-39). This script is the
one command that stands between "weights arrive" and "north star proven":

    python scripts/real_weights_runbook.py --checkpoints_dir ./checkpoints \
        [--device cpu|tpu] [--frames 4] [--out REAL_WEIGHTS_REPORT.json]

For each BASELINE config whose encoder checkpoint exists
(depth_anything_v2_{vits,vitb,vitl}.pth) it:

  1. loads + converts the .pth into our param tree (models/convert.py);
  2. sanity-checks the depth range against the reference's documented
     per-encoder ranges (PredictAndGenerate.py:27-34: vits max~8-9 pre-scale,
     vitb ~16-18, vitl ~550-600) and verifies the scaled range stays under
     StereoConfig.limit_step_cap — the one assumption random weights cannot
     probe; off-family checkpoints (vitg — the reference defines no scaler —
     or any fine-tune missing its family band) get a scaler CALIBRATED to
     the family's ~[0,14] scaled range (calibrate_scaler), reported in the
     artifact and usable in production via --depth_scaler;
  3. dumps golden depth maps (ours vs upstream torch, both real weights) and
     records mean/max deviation;
  4. runs scripts/parity_report.py end-to-end (SBS per-pixel gate) at the
     config's geometry;

and writes one PASS/FAIL row per config to the JSON artifact.
"""

import argparse
import json
import os
import subprocess
import sys

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

# (encoder, height, width, offset_step_size) — BASELINE.json configs 1-5,
# plus 6 = vitg at 1080p (no BASELINE row: no official DA-V2 vitg checkpoint
# exists; the row makes the runbook the one command for that day too).
CONFIGS = {
    1: ("vits", 480, 854, 2),
    2: ("vits", 1080, 1920, 1),
    3: ("vitb", 1080, 1920, 1),
    4: ("vitl", 1440, 2560, 1),
    5: ("vitl", 2160, 3840, 1),
    6: ("vitg", 1080, 1920, 1),
}
# Pre-scaler depth.max() ranges the reference's scalers were calibrated on
# (reference PredictAndGenerate.py:27-34). Wide margins: scene-dependent.
# None = no reference calibration exists (vitg): ALWAYS derive the scaler.
EXPECTED_RAW_MAX = {"vits": (4.0, 14.0), "vitb": (8.0, 28.0),
                    "vitl": (250.0, 900.0), "vitg": None}

# Scaled-depth target the reference family lands on: vits 8-9 x 1.618 ~ 14.6,
# vitb 16-18 x 0.8 ~ 14.4, vitl 550-600 x 0.0208 ~ 12.5 (all pre /14
# normalisation, reference PredictAndGenerate.py:27-34,102-104). 13.0 sits
# inside that family band with 2x headroom under StereoConfig.limit_step_cap.
CAL_TARGET_MAX = 13.0


def calibrate_scaler(raw_depth_max: float,
                     target_max: float = CAL_TARGET_MAX) -> float:
    """Scaler that lands a checkpoint's raw depth range on the reference
    family's ~[0, 14] scaled range. Used for vitg (the reference defines no
    scaler — no official checkpoint exists) and for any off-family
    checkpoint whose raw range misses the documented band."""
    return target_max / max(float(raw_depth_max), 1e-12)


def synth_clip(path: str, h: int, w: int, n: int = 8, seed: int = 7) -> None:
    import cv2

    rng = np.random.default_rng(seed)
    vw = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), 30, (w, h))
    base = rng.random((h // 16 + 1, w // 16 + 1, 3))
    for i in range(n):
        small = np.roll(base, i * 2, axis=1)
        frame = cv2.resize((small * 255).astype(np.uint8), (w, h),
                           interpolation=cv2.INTER_CUBIC)
        vw.write(frame)
    vw.release()


def depth_golden(encoder: str, ckpt: str, video: str, frames: int,
                 input_size: int) -> dict:
    """Ours-vs-torch depth maps with real weights; returns stats + range check."""
    import torch

    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from tests.torch_ref import load_reference_dav2
    from vr_video_generator_tpu.models.convert import convert_state_dict
    from vr_video_generator_tpu.models.depth_anything_v2 import (
        DepthAnythingV2, infer_depth)
    from vr_video_generator_tpu.utils.config import (
        DEPTH_SCALERS, ModelConfig, StereoConfig)
    from vr_video_generator_tpu.video.reader import VideoReader

    TorchDAV2 = load_reference_dav2()
    tconf = {"vits": dict(features=64, out_channels=[48, 96, 192, 384]),
             "vitb": dict(features=128, out_channels=[96, 192, 384, 768]),
             "vitl": dict(features=256, out_channels=[256, 512, 1024, 1024]),
             "vitg": dict(features=384,
                          out_channels=[1536, 1536, 1536, 1536])}
    tmodel = TorchDAV2(encoder=encoder, device="cpu", **tconf[encoder])
    tmodel.load_state_dict(torch.load(ckpt, map_location="cpu",
                                      weights_only=True))
    tmodel = tmodel.eval()

    cfg = ModelConfig.for_encoder(encoder)
    params = convert_state_dict(tmodel.state_dict(), cfg)
    jmodel = DepthAnythingV2(cfg, dtype=jnp.float32)

    with VideoReader(video) as reader:
        fr = [f for _, f in zip(range(frames), reader.frames(0, frames))]
    fr = np.stack(fr)

    ours = np.asarray(infer_depth(jmodel, params, jnp.asarray(fr),
                                  input_size=input_size))
    worst_mean = worst_max = 0.0
    raw_maxes = []
    for i, f in enumerate(fr):
        with torch.no_grad():
            ref = tmodel.infer_image(f[:, :, ::-1], input_size=input_size)
        ref = np.asarray(ref, np.float32)
        raw_maxes.append(float(ref.max()))
        scale = max(float(np.abs(ref).max()), 1e-6)
        d = np.abs(ours[i] / DEPTH_SCALERS[encoder] - ref) / scale
        worst_mean = max(worst_mean, float(d.mean()))
        worst_max = max(worst_max, float(d.max()))

    family = EXPECTED_RAW_MAX[encoder]
    raw_max = max(raw_maxes)
    shipped = DEPTH_SCALERS[encoder]
    cap = StereoConfig().limit_step_cap
    raw_range_ok = family is not None and family[0] <= raw_max <= family[1]
    # Auto-calibrate when the shipped scaler was never validated for this
    # family (vitg) or the checkpoint's raw range misses the documented band
    # or the shipped scaler would blow the step cap (off-family fine-tune):
    # derive scaler = target/raw_max against the reference's ~[0,14] range.
    calibrated = (not raw_range_ok) or (raw_max * shipped > cap)
    scaler_used = calibrate_scaler(raw_max) if calibrated else shipped
    scaled_max = raw_max * scaler_used
    return {
        "depth_rel_mean": worst_mean, "depth_rel_max": worst_max,
        "raw_depth_max": raw_max,
        "shipped_scaler": shipped,
        "calibrated": calibrated,
        "scaler_used": scaler_used,
        "scaled_depth_max": scaled_max,
        "raw_range_ok": raw_range_ok,
        "under_step_cap": scaled_max <= cap,
        "depth_ok": worst_mean < 1e-3 and worst_max < 5e-2,
    }


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--checkpoints_dir", default="./checkpoints")
    ap.add_argument("--video", default="",
                    help="use this clip for every config instead of "
                         "synthesizing per-geometry clips")
    ap.add_argument("--frames", type=int, default=4)
    ap.add_argument("--input_size", type=int, default=518)
    ap.add_argument("--device", choices=["cpu", "tpu"], default="cpu")
    ap.add_argument("--compute_dtype", default=None,
                    choices=[None, "float32", "bfloat16"],
                    help="default: float32 on cpu, bfloat16 on tpu")
    ap.add_argument("--configs", default="1,2,3,4,5")
    ap.add_argument("--out", default="REAL_WEIGHTS_REPORT.json")
    ap.add_argument("--workdir", default="/tmp/real_weights_runbook")
    args = ap.parse_args()
    dtype = args.compute_dtype or (
        "bfloat16" if args.device == "tpu" else "float32")

    os.makedirs(args.workdir, exist_ok=True)
    rows = []
    golden_cache = {}
    for c in [int(x) for x in args.configs.split(",") if x]:
        encoder, h, w, step = CONFIGS[c]
        ckpt = os.path.join(args.checkpoints_dir,
                            f"depth_anything_v2_{encoder}.pth")
        row = {"config": c, "encoder": encoder, "geometry": f"{w}x{h}",
               "checkpoint": ckpt}
        if not os.path.exists(ckpt):
            row["status"] = "SKIP (checkpoint missing)"
            rows.append(row)
            print(json.dumps(row))
            continue

        video = args.video or os.path.join(args.workdir, f"clip_{h}p.mp4")
        if not args.video and not os.path.exists(video):
            synth_clip(video, h, w)

        # Key by (encoder, clip): configs sharing an encoder run different
        # geometry clips, and the depth-range/step-cap gate must be judged
        # on the clip this row's parity run actually saw.
        if (encoder, video) not in golden_cache:
            golden_cache[encoder, video] = depth_golden(
                encoder, ckpt, video, args.frames, args.input_size)
        row["golden_depth"] = golden_cache[encoder, video]

        cmd = [sys.executable, os.path.join(ROOT, "scripts/parity_report.py"),
               "--video", video, "--frames", str(args.frames),
               "--encoder", encoder, "--encoder_path", ckpt,
               "--input_size", str(args.input_size),
               "--device", args.device, "--compute_dtype", dtype]
        if row["golden_depth"]["calibrated"]:
            # the SBS parity run must use the derived scaler on both sides:
            # with the shipped one the plane table would clip at the step cap
            # (our side masks; the oracle's cutoff list grows unbounded)
            cmd += ["--depth_scaler",
                    repr(row["golden_depth"]["scaler_used"])]
        env = dict(os.environ)
        if args.device == "cpu":
            env["JAX_PLATFORMS"] = "cpu"
        proc = subprocess.run(cmd, capture_output=True, text=True, env=env)
        row["parity_tail"] = proc.stdout.strip().splitlines()[-1:]
        ok = (proc.returncode == 0 and row["golden_depth"]["depth_ok"]
              and row["golden_depth"]["under_step_cap"])
        row["status"] = "PASS" if ok else "FAIL"
        rows.append(row)
        print(json.dumps(row))

    artifact = {"device": args.device, "compute_dtype": dtype, "rows": rows,
                "all_pass": all(r["status"] == "PASS" for r in rows
                                if not r["status"].startswith("SKIP"))
                and any(r["status"] == "PASS" for r in rows)}
    with open(args.out, "w") as f:
        json.dump(artifact, f, indent=2)
    print(f"wrote {args.out}: "
          f"{'PASS' if artifact['all_pass'] else 'INCOMPLETE/FAIL'}")
    return 0 if artifact["all_pass"] else 1


if __name__ == "__main__":
    sys.exit(main())
