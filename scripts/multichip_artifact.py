#!/usr/bin/env python
"""Committable production-geometry multichip artifact (VERDICT r4 #5).

``__graft_entry__.dryrun_multichip(8, 'production')`` proves 1080p SPMD
partitioning, but it prints to stdout and runs mesh-major — on this 1-core
host each (mesh, arm) combo costs ~15-20 min of CPU, so a killed run leaves
no committed evidence. This tool runs the SAME production loop shape
(ShardedSbsPipeline, 3 chained state-carrying steps per combo — what
runtime/sharded_runner.py executes per batch) but:

  * arm-major order: the parity arm covers ALL requested meshes first, so
    even a truncated run demonstrates (8,1)/(4,2)/(2,4) partitioning;
  * rewrites the JSON artifact after EVERY combo (truncation-proof);
  * records per-combo wall seconds, output shape/dtype, and the temporal
    state-carry assertions, plus the repo HEAD it ran at.

Reference scope: the reference has no multi-device story at all (one CUDA
device, reference PredictAndGenerate.py); this artifact is TPU-native
scale-out evidence at deployment shapes.

Usage (self-provisions an 8-device virtual CPU mesh):
  python scripts/multichip_artifact.py --out MULTICHIP_PROD_r05.json \
      --combos parity:8x1,parity:4x2,parity:2x4,stride2:8x1
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ARMS = {
    "parity": dict(depth_stride=1),
    "stride2": dict(depth_stride=2),
}


def _head_commit(repo: str) -> str:
    try:
        return subprocess.run(
            ["git", "-C", repo, "rev-parse", "--short", "HEAD"],
            capture_output=True, text=True, timeout=30).stdout.strip()
    except Exception:
        return "unknown"


def parse_combos(spec: str):
    combos = []
    for item in spec.split(","):
        arm, _, mesh = item.strip().partition(":")
        if arm not in ARMS:
            raise SystemExit(f"unknown arm {arm!r} (expected {sorted(ARMS)})")
        n_data, _, n_model = mesh.partition("x")
        combos.append((arm, (int(n_data), int(n_model))))
    return combos


def run_combos(args) -> None:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from vr_video_generator_tpu.models.depth_anything_v2 import DepthAnythingV2
    from vr_video_generator_tpu.models.factory import random_params
    from vr_video_generator_tpu.parallel.mesh import make_mesh
    from vr_video_generator_tpu.parallel.sharded import ShardedSbsPipeline
    from vr_video_generator_tpu.utils.config import ModelConfig, RunConfig

    combos = parse_combos(args.combos)
    h, w, b = args.height, args.width, args.batch_per_slot
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    artifact = {
        "geometry": f"{w}x{h} vits input_size={args.input_size} "
                    f"b={b}/data-slot",
        "n_devices": args.n_devices,
        "backend": jax.default_backend(),
        "head": _head_commit(repo),
        "n_steps_per_combo": 3,
        "note": "bf16 production program STRUCTURE on f32 CPU math "
                "(virtual --xla_force_host_platform_device_count devices; "
                "the bench host has one real chip). Each combo jits the "
                "full sharded SBS step over the mesh and chains 3 steps "
                "carrying TemporalState, as runtime/sharded_runner.py does.",
        "combos": [],
        "complete": False,
    }

    model = DepthAnythingV2(ModelConfig.for_encoder("vits"), dtype=jnp.float32)
    params = random_params(model)
    rng = np.random.default_rng(0)
    devices = jax.devices()[:args.n_devices]

    def dump():
        with open(args.out, "w") as f:
            json.dump(artifact, f, indent=1)

    dump()
    for arm, (n_data, n_model) in combos:
        t0 = time.time()
        mesh = make_mesh((n_data, n_model), devices=devices[:n_data * n_model])
        cfg = RunConfig(batch_size=b, input_size=args.input_size,
                        compute_dtype="float32", **ARMS[arm])
        pipe = ShardedSbsPipeline(model, params, h, w, mesh, run_cfg=cfg)
        states = pipe.initial_state()
        frames = rng.integers(0, 256, (n_data * b, h, w, 3), dtype=np.uint8)
        for step in range(3):
            sbs, states = pipe.step(np.roll(frames, 7 * step, axis=2), states)
        jax.block_until_ready((sbs, states))
        assert sbs.shape == (n_data * b, h, 2 * w, 3), sbs.shape
        assert np.asarray(states.has_state).all(), arm
        if cfg.depth_stride > 1:
            assert states.anchor_prev is not None
        artifact["combos"].append({
            "arm": arm, "mesh": f"(data={n_data}, model={n_model})",
            "depth_stride": cfg.depth_stride,
            "steps": 3, "sbs_shape": list(sbs.shape),
            "sbs_dtype": str(sbs.dtype),
            "state_carried": True,
            "wall_s": round(time.time() - t0, 1),
        })
        dump()
        print(f"combo {arm} mesh=({n_data},{n_model}): OK "
              f"{artifact['combos'][-1]['wall_s']}s", flush=True)
    artifact["complete"] = True
    dump()
    print(f"multichip artifact complete -> {args.out}", flush=True)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n_devices", type=int, default=8)
    ap.add_argument("--height", type=int, default=1080)
    ap.add_argument("--width", type=int, default=1920)
    ap.add_argument("--batch_per_slot", type=int, default=2)
    ap.add_argument("--input_size", type=int, default=518)
    ap.add_argument("--combos",
                    default="parity:8x1,parity:4x2,parity:2x4,stride2:8x1",
                    help="comma list of arm:DATAxMODEL, run in order")
    ap.add_argument("--out", default="MULTICHIP_PROD.json")
    args = ap.parse_args()

    # Self-provision virtual CPU devices BEFORE jax initializes (the session
    # site plugin pins the TPU relay; forcing cpu via config.update in a
    # fresh subprocess is the relay-proof path — see __graft_entry__).
    if os.environ.get("_VRVG_MULTICHIP_CHILD") == "1":
        import jax

        jax.config.update("jax_platforms", "cpu")
        run_combos(args)
        return 0
    env = dict(os.environ)
    env["_VRVG_MULTICHIP_CHILD"] = "1"
    env["JAX_PLATFORMS"] = "cpu"
    flags = " ".join(f for f in env.get("XLA_FLAGS", "").split()
                     if "xla_force_host_platform_device_count" not in f)
    env["XLA_FLAGS"] = (
        flags +
        f" --xla_force_host_platform_device_count={args.n_devices}").strip()
    return subprocess.run([sys.executable] + sys.argv, env=env).returncode


if __name__ == "__main__":
    sys.exit(main())
