"""Headline benchmark: SBS conversion throughput, BASELINE.json configs.

Measures the full fused device pipeline (preprocess + depth net + temporal
smoothing + warp/fill + SBS concat). K steps run inside ONE jitted lax.scan
with a serializing data dependency (see utils/benchlib.py) and only a uint32
checksum is fetched, so timing reflects pure device throughput — production
runs stream pixels through the overlapped encode path instead.

Default (no args) runs the headline config: DA-V2-Small at 1080p, one chip —
and prints ONE JSON line. ``--config N`` selects the other BASELINE configs.
Baseline: the reference's end-to-end ~12 fps SBS at 1080p on an RTX 2080 Ti
(reference Journal.txt:33; BASELINE.md).
"""

import argparse
import json
import time

import numpy as np

# (encoder, height, width, batch, offset_step_size) per BASELINE.json configs
CONFIGS = {
    1: ("vits", 480, 854, 8, 2),    # 480p clip, step 2 (CPU-runnable small)
    2: ("vits", 1080, 1920, 8, 1),  # headline: 1080p full pipeline
    3: ("vitb", 1080, 1920, 8, 1),  # vitb, per-pixel step 1
    4: ("vitl", 1440, 2560, 4, 1),  # vitl 1440p
    5: ("vitl", 2160, 3840, 4, 1),  # vitl 4K (frame-sharded on pods); b=4
                                    # fits HBM and beats b=2 by ~11% (the
                                    # attention fusion needs the larger M)
}


def run_config(config: int, gelu: str = "exact", mesh_shape=None,
               depth_stride: int = 1) -> dict:
    from vr_video_generator_tpu.utils.cache import (enable_compilation_cache,
                                                    honor_platform_env)

    # the CPU-smoke path ("runnable anywhere") needs JAX_PLATFORMS=cpu to win
    # over the site plugin's TPU pin — without this a dead relay hangs it
    honor_platform_env()
    enable_compilation_cache()

    import jax

    import jax.numpy as jnp

    from vr_video_generator_tpu.models.depth_anything_v2 import DepthAnythingV2
    from vr_video_generator_tpu.models.factory import random_params
    from vr_video_generator_tpu.pipeline import SbsPipeline
    from vr_video_generator_tpu.utils.config import RunConfig

    on_tpu = jax.default_backend() == "tpu"
    encoder, h, w, b, step = CONFIGS[config]
    if not on_tpu:  # CPU smoke: shrink so the bench stays runnable anywhere
        encoder, h, w, b = "vits", 270, 480, max(2, depth_stride)

    cfg = RunConfig(batch_size=b, input_size=518 if on_tpu else 126,
                    offset_step_size=step, encoder=encoder, gelu=gelu,
                    depth_stride=depth_stride)
    model = DepthAnythingV2(cfg.model(),
                            dtype=jnp.bfloat16 if on_tpu else jnp.float32)
    params = random_params(model)
    if mesh_shape is not None:
        return _run_sharded(model, params, h, w, b, cfg, mesh_shape,
                            k_steps=8 if on_tpu else 2)
    pipe = SbsPipeline(model, params, h, w, run_cfg=cfg)

    k_steps = 8 if on_tpu else 2
    rng = np.random.default_rng(0)
    frames = jnp.asarray(rng.integers(0, 256, (b, h, w, 3), dtype=np.uint8))
    fps = _measure(pipe._step_impl, params, frames, pipe.initial_state,
                   k_steps=k_steps, n_frames=b)
    stride_tag = f"_stride{depth_stride}" if depth_stride > 1 else ""
    return _json_line(f"sbs_fps_{h}p_{encoder}_depth_warp_fused{stride_tag}",
                      fps)


BASELINE_FPS = 12.0  # reference Journal.txt:33 (2.5x realtime at 30fps)


def _json_line(metric: str, fps: float) -> dict:
    return {"metric": metric, "value": round(fps, 2), "unit": "frames/s",
            "vs_baseline": round(fps / BASELINE_FPS, 2)}


def _measure(step_impl, params, frames, make_state, k_steps: int,
             n_frames: int) -> float:
    """Best-of-6 timing of K chained pipeline steps inside one jitted scan.

    Shared by the single-chip and sharded paths — only the step function and
    the frame count per step differ. Returns frames/s."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def chained(params, frames, state):
        def body(carry, _):
            frames, state = carry
            sbs, state = step_impl(params, frames, state)
            # consume every output pixel so nothing dead-code-eliminates
            cs = jnp.sum(sbs, dtype=jnp.uint32)
            # Serializing data dependency: the next iteration's frames depend
            # on this iteration's checksum (the condition is never true, but
            # XLA cannot prove it). Without this, XLA overlaps scan
            # iterations and peak memory scales with the trip count.
            frames = jnp.where(cs == jnp.uint32(0xFFFFFFFF), frames ^ 1, frames)
            return (frames, state), cs
        (_, state), sums = jax.lax.scan(body, (frames, state), None,
                                        length=k_steps)
        return sums, state

    sums, _ = chained(params, frames, make_state())  # compile+warmup
    _ = np.asarray(sums)

    # best-of-6: the relay/host load drifts on minute scales (BENCHLOG
    # measured 174-192 fps from the same binary across one day); more
    # samples make one recorded run a fairer estimate of the binary.
    best = float("inf")
    for _ in range(6):
        state = make_state()
        t0 = time.perf_counter()
        sums, _ = chained(params, frames, state)
        _ = np.asarray(sums)  # scalar readback forces completion
        best = min(best, time.perf_counter() - t0)
    return k_steps * n_frames / best


def _run_sharded(model, params, h, w, b, cfg, mesh_shape, k_steps) -> dict:
    """Same chained-scan measurement through ShardedSbsPipeline._step_impl.

    mesh=(1,1) on the single attached chip runs the EXACT scale-out program
    (shard_map temporal scan + pallas warp under the mesh, sharded params)
    so its fps is directly comparable to the single-chip SbsPipeline number
    (VERDICT r2 missing #3: the sharded path had only ever run on virtual
    CPU meshes)."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    from vr_video_generator_tpu.parallel.mesh import make_mesh
    from vr_video_generator_tpu.parallel.sharded import ShardedSbsPipeline

    mesh = make_mesh(tuple(mesh_shape))
    pipe = ShardedSbsPipeline(model, params, h, w, mesh, run_cfg=cfg)
    n = pipe.n_data * b

    rng = np.random.default_rng(0)
    frames = jax.device_put(
        rng.integers(0, 256, (n, h, w, 3), dtype=np.uint8),
        NamedSharding(mesh, P("data")))
    fps = _measure(pipe._step_impl, pipe.params, frames, pipe.initial_state,
                   k_steps=k_steps, n_frames=n)
    d, m = mesh.shape["data"], mesh.shape["model"]
    stride = cfg.depth_stride
    stride_tag = f"_stride{stride}" if stride > 1 else ""
    return _json_line(f"sbs_fps_{h}p_{model.cfg.encoder}_sharded_mesh{d}x{m}"
                      f"{stride_tag}", fps)


def main() -> None:
    import sys

    from vr_video_generator_tpu.utils.cache import honor_platform_env
    from vr_video_generator_tpu.utils.devwatch import (require_backend,
                                                       watch_backend_init)

    honor_platform_env()  # before any jax backend init (see run_config)
    # A down TPU relay blocks the first backend touch forever with no
    # output (multi-hour outage observed 2026-08-17); diagnose on stderr
    # instead of hanging silently under the driver.
    done = watch_backend_init()
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", type=int, default=2, choices=sorted(CONFIGS))
    parser.add_argument("--all", action="store_true",
                        help="run every BASELINE config; one JSON line each")
    parser.add_argument("--gelu", type=str, default="exact",
                        choices=["exact", "tanh"])
    parser.add_argument("--sharded", type=str, default="",
                        help="run through ShardedSbsPipeline on a DxM mesh, "
                             "e.g. --sharded 1x1 (the attached single chip)")
    parser.add_argument("--depth_stride", type=int, default=1,
                        help="opt-in depth-stride production mode (depth "
                             "net on every s-th frame; 1 = parity default)")
    parser.add_argument("--reps", type=int, default=1,
                        help="repetitions per config, interleaved config-"
                             "major (rep 1 of every config, then rep 2, …) "
                             "so minute-scale chip/relay drift hits all "
                             "configs equally; the JSON line reports the "
                             "median with a min/max spread. Default 1 keeps "
                             "the driver's bare single-line contract.")
    args, _ = parser.parse_known_args()
    # Hard init deadline (after argparse so --help never blocks): the
    # devwatch warning alone leaves the process blocked forever on a dead
    # relay, which under the round driver burns the whole bench budget. On
    # timeout emit one honest JSON failure line and exit non-zero. Same
    # VRVG_INIT_TIMEOUT semantics as the orchestrator (0 waits forever).
    try:
        require_backend(done)
    except RuntimeError as e:
        print(json.dumps({
            "metric": "backend_init_timeout", "value": 0.0,
            "unit": "frames/s", "vs_baseline": 0.0, "error": str(e),
            "last_real_chip": "see committed BENCH_MATRIX_r03*.jsonl "
                              "(real-TPU matrix) and docs/BENCHLOG.md"}))
        sys.exit(2)
    mesh_shape = None
    if args.sharded:
        mesh_shape = tuple(int(v)
                           for v in args.sharded.replace("x", ",").split(","))
    reps = max(1, args.reps)
    if args.all:
        import jax

        on_tpu = jax.default_backend() == "tpu"
        configs = []
        for c in sorted(CONFIGS):
            # CPU smoke overrides the batch to max(2, stride), which the
            # stride always divides — the skip only applies to TPU configs.
            if (on_tpu and args.depth_stride > 1
                    and CONFIGS[c][3] % args.depth_stride):
                print(f"config {c}: skipped — depth_stride "
                      f"{args.depth_stride} does not divide its batch "
                      f"{CONFIGS[c][3]}", file=sys.stderr)
                continue
            configs.append(c)
    else:
        configs = [args.config]

    # Config-major interleaving: rep r of EVERY config runs before rep r+1
    # of any, so the known ±6% minute-scale drift (docs/BENCHLOG.md "chip
    # day drift") lands on all configs alike instead of biasing whichever
    # config happened to run during a fast window.
    lines: dict = {c: [] for c in configs}
    for rep in range(reps):
        for c in configs:
            line = run_config(c, gelu=args.gelu, mesh_shape=mesh_shape,
                              depth_stride=args.depth_stride)
            lines[c].append(line)
            if reps > 1:  # progress without breaking the stdout contract
                print(f"rep {rep + 1}/{reps} config {c}: "
                      f"{line['value']} fps", file=sys.stderr, flush=True)
            else:
                # stream each single-rep result as it lands: a mid-matrix
                # crash (relay death, OOM on a later config) must not lose
                # the chip-minutes already measured
                final = dict(config=c, **line) if args.all else line
                print(json.dumps(final), flush=True)
    if reps > 1:
        for c in configs:
            final = dict(config=c, **lines[c][-1]) if args.all else lines[c][-1]
            vals = sorted(l["value"] for l in lines[c])
            final["value"] = round(float(np.median(vals)), 2)
            final["vs_baseline"] = round(final["value"] / BASELINE_FPS, 2)
            final["spread"] = {"min": vals[0], "max": vals[-1], "reps": reps}
            print(json.dumps(final), flush=True)


if __name__ == "__main__":
    main()
