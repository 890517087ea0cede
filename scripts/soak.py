"""Endurance soak: a REAL long CLI conversion on the real chip, instrumented.

The reference's worst production scars were slow leaks over hours-long runs
(reference Journal.txt:49-53 — the VRAM saga; production shape is an 86-min
video, Journal.txt:33). Nothing in rounds 1-3 demonstrated flat memory and
steady subclip cadence at that scale; this script does:

  * runs the actual CLI entry (cli.main) on a long 1080p source
    (scripts/soak_gen.py makes one), repair_mode 0 — convert + combine;
  * a sampler thread records host RSS (this process + the ffmpeg subprocess
    tree), device memory (jax memory_stats when the backend exposes it),
    and the subclip count every few seconds;
  * ffmpeg I/O goes through real subprocesses: the host's real ffmpeg when
    present, else the behavioral double (tests/fakes) with spool mode so
    encoder concurrency matches real ffmpeg's stdin draining;
  * afterwards the integrity checker and the post-combine frame-count
    verification must come back clean;
  * writes ONE artifact JSON (default SOAK_r04.json) with throughput
    percentiles from subclip cadence, first/second-half medians, and an
    RSS slope over the conversion's second half (leak detector).

Usage:
  python scripts/soak_gen.py /tmp/soak_r04/in.mp4 100000
  python scripts/soak.py --video /tmp/soak_r04/in.mp4 \
      --workdir /tmp/soak_r04 --out SOAK_r04.json
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from vr_video_generator_tpu.utils.cache import (enable_compilation_cache,  # noqa: E402
                                                honor_platform_env)
from vr_video_generator_tpu.utils.devwatch import (require_backend,  # noqa: E402
                                                   watch_backend_init)


def _install_double(workdir: str) -> str:
    """Point VRVG_FFMPEG/VRVG_FFPROBE at the behavioral double (spool mode)."""
    from tests.fakes.ffmpeg_double import install_shims

    ffmpeg, ffprobe = install_shims(os.path.join(workdir, "ffbin"))
    os.environ["VRVG_FFMPEG"] = ffmpeg
    os.environ["VRVG_FFPROBE"] = ffprobe
    os.environ["FAKE_FFMPEG_SPOOL"] = "1"
    return "behavioral double (spool mode)"


def _tree_rss_mb(root_pid: int) -> float:
    """Sum VmRSS of root_pid and every descendant (the ffmpeg children)."""
    children: dict[int, list[int]] = {}
    for pid_s in os.listdir("/proc"):
        if not pid_s.isdigit():
            continue
        try:
            with open(f"/proc/{pid_s}/stat") as f:
                stat_line = f.read()
            # comm may contain spaces/parens (e.g. '(rs:main Q:Reg)') —
            # fields are only well-defined after the LAST ')'
            fields = stat_line[stat_line.rindex(")") + 2:].split()
            children.setdefault(int(fields[1]), []).append(int(pid_s))
        except (OSError, ValueError):
            continue
    total_kb = 0
    stack = [root_pid]
    while stack:
        pid = stack.pop()
        stack.extend(children.get(pid, []))
        try:
            with open(f"/proc/{pid}/status") as f:
                for line in f:
                    if line.startswith("VmRSS:"):
                        total_kb += int(line.split()[1])
                        break
        except OSError:
            continue
    return total_kb / 1024.0


def _device_mem_mb() -> float | None:
    try:
        import jax
        stats = jax.local_devices()[0].memory_stats()
        if stats and "bytes_in_use" in stats:
            return stats["bytes_in_use"] / 2**20
    except Exception:
        pass
    return None


class Sampler(threading.Thread):
    def __init__(self, subclip_dir: str, every_s: float,
                 partial_out: str | None = None):
        super().__init__(daemon=True)
        self.subclip_dir = subclip_dir
        self.every_s = every_s
        self.partial_out = partial_out  # crash/truncation-proof trail
        self.samples: list[dict] = []
        self._halt = threading.Event()

    def run(self) -> None:
        t0 = time.time()
        while not self._halt.is_set():
            try:
                clips = len([f for f in os.listdir(self.subclip_dir)
                             if f.endswith(".mp4")])
            except OSError:
                clips = 0
            self.samples.append({
                "t": round(time.time() - t0, 1),
                "rss_mb": round(_tree_rss_mb(os.getpid()), 1),
                "device_mb": _device_mem_mb(),
                "subclips": clips,
            })
            if self.partial_out and len(self.samples) % 12 == 0:
                try:
                    with open(self.partial_out, "w") as f:
                        json.dump({"partial": True,
                                   "samples": self.samples[-2000:]}, f)
                except OSError:
                    pass
            self._halt.wait(self.every_s)

    def stop(self) -> None:
        self._halt.set()


def _slope_per_hour(ts: list[float], ys: list[float]) -> float:
    """Least-squares slope in units/hour over the given points."""
    import numpy as np
    if len(ts) < 3:
        return 0.0
    t = np.asarray(ts) / 3600.0
    y = np.asarray(ys)
    t = t - t.mean()
    denom = float((t * t).sum())
    return float((t * (y - y.mean())).sum() / denom) if denom else 0.0


def _pct(vals: list[float], q: float) -> float:
    import numpy as np
    return round(float(np.percentile(vals, q)), 2)


def device_soak(args) -> int:
    """Device-side endurance at full production cadence: loop the REAL
    pipeline step over ``--device_only`` frames on the chip, keeping SBS
    output on-device (a scalar checksum readback every few batches bounds
    the dispatch queue). The e2e CLI soak on this host is capped at ~0.5
    fps by the axon tunnel's ~6 MB/s device->host readback (a relay
    artifact, docs/BENCHLOG.md round 2 — a real TPU host does PCIe), so
    100k-frame device-memory endurance is only reachable this way; the
    wall-bounded e2e soak covers host RSS + subclip cadence."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from vr_video_generator_tpu.utils.config import RunConfig
    from vr_video_generator_tpu.pipeline import SbsPipeline
    from vr_video_generator_tpu.video.reader import VideoReader, probe_video

    n_frames = args.device_only
    b = args.batch_size
    _, n_src, w, h = probe_video(args.video)
    reader = VideoReader(args.video, 0)
    feed = []
    for _ in range(8):  # rotating real-content batches
        frames = [reader.read() for _ in range(b)]
        if any(f is None for f in frames):
            raise RuntimeError("source video too short for the feed buffer")
        feed.append(jax.device_put(jnp.asarray(np.stack(frames))))
    reader.close()

    run_cfg = RunConfig(encoder=args.encoder, batch_size=b,
                        depth_stride=args.depth_stride,
                        input_size=args.input_size,
                        chunk_batches=args.chunk_batches,
                        compute_dtype=args.compute_dtype)
    pipe = SbsPipeline.create(run_cfg, h, w, allow_random=True)
    ck = args.chunk_batches
    if ck > 1:  # chunked superstep: ck batches per dispatch (step_many)
        feed = [jnp.stack([feed[(j + i) % len(feed)] for i in range(ck)])
                for j in range(len(feed))]
        step = pipe.step_many
    else:
        step = pipe.step
    state = pipe.initial_state()

    def sync(out):  # chunked superstep returns a tuple of k batch outputs
        arr = out[-1] if isinstance(out, tuple) else out
        float(jnp.sum(arr[0, 0].astype(jnp.float32)))

    sbs, state = step(feed[0], state)  # compile
    sync(sbs)

    samples: list[dict] = []
    sample_every = max(4, (n_frames // (b * ck)) // 200)
    sync_every = max(1, 4 // ck)
    t0 = time.time()
    done = 0
    batch_i = 0
    step_times: list[float] = []
    tb = time.time()
    while done < n_frames:
        sbs, state = step(feed[batch_i % len(feed)], state)
        batch_i += 1
        done += b * ck
        if batch_i % sync_every == 0:  # bound dispatch queue; amortized sync
            sync(sbs)
            now = time.time()
            step_times.append((now - tb) / (sync_every * ck * b))
            tb = now
        if batch_i % sample_every == 0:
            samples.append({
                "t": round(time.time() - t0, 1), "frames": done,
                "rss_mb": round(_tree_rss_mb(os.getpid()), 1),
                "device_mb": _device_mem_mb(),
            })
    sync(sbs)
    wall = time.time() - t0

    dev = [s["device_mb"] for s in samples if s["device_mb"] is not None]
    ms = [t * 1000 for t in step_times]
    half = len(ms) // 2
    artifact = {
        "mode": "device_only",
        "encoder": args.encoder,
        "frames": done, "resolution": f"{w}x{h}",
        "depth_stride": args.depth_stride, "batch_size": b,
        "chunk_batches": ck,
        "wall_s": round(wall, 1),
        "fps_device": round(done / wall, 2),
        "step_ms_per_frame": {
            "p10": _pct(ms, 10), "p50": _pct(ms, 50), "p90": _pct(ms, 90),
            "first_half_p50": _pct(ms[:half], 50) if half else 0,
            "second_half_p50": _pct(ms[half:], 50) if half else 0,
        },
        "rss_mb": {
            "start": samples[0]["rss_mb"] if samples else 0,
            "end": samples[-1]["rss_mb"] if samples else 0,
            "slope_mb_per_hour_2nd_half": round(_slope_per_hour(
                [s["t"] for s in samples[len(samples) // 2:]],
                [s["rss_mb"] for s in samples[len(samples) // 2:]]), 1),
        },
        "device_mb": {
            "available": bool(dev),
            "start": dev[0] if dev else None,
            "end": dev[-1] if dev else None,
            "peak": max(dev) if dev else None,
        },
        "note": "SBS kept on-device: the axon dev tunnel reads back at "
                "~6 MB/s (relay artifact, docs/BENCHLOG.md round 2); the "
                "e2e artifact covers the host I/O tier at its wall rate.",
        "samples": samples[::max(1, len(samples) // 240)],
    }
    with open(args.out, "w") as f:
        json.dump(artifact, f, indent=1)
    flat_dev = (not dev) or (dev[-1] <= max(dev[0] * 1.05, dev[0] + 64))
    ok = done >= n_frames and flat_dev
    print(json.dumps({k: v for k, v in artifact.items() if k != "samples"},
                     indent=1), flush=True)
    print(f"device soak {'PASS' if ok else 'FAIL'} -> {args.out}", flush=True)
    return 0 if ok else 1


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--video", default="/tmp/soak_r04/in.mp4")
    ap.add_argument("--workdir", default="/tmp/soak_r04")
    ap.add_argument("--out", default="SOAK_r04.json")
    ap.add_argument("--device_only", type=int, default=0, metavar="N",
                    help="loop N frames through the device pipeline only "
                         "(no SBS readback): device-memory endurance at "
                         "production cadence despite the relay's ~6 MB/s "
                         "readback cap")
    ap.add_argument("--depth_stride", type=int, default=2,
                    help="production-mode stride (VERDICT r3 permits stride "
                         "2 to fit wall-clock); 1 = parity mode")
    ap.add_argument("--batch_size", type=int, default=8)
    ap.add_argument("--chunk_batches", type=int, default=1,
                    help="device_only mode: batches per dispatch "
                         "(pipeline.step_many superstep; 1 = per-batch)")
    ap.add_argument("--encoder", default="vits",
                    help="device_only mode: depth encoder (the 4K soak arm "
                         "runs vitl, BASELINE config 5)")
    ap.add_argument("--max_frame_count", type=int, default=250)
    ap.add_argument("--num_workers", type=int, default=6,
                    help="concurrent encoder subprocesses")
    ap.add_argument("--sample_every", type=float, default=5.0)
    ap.add_argument("--end_frame", type=int, default=10**9)
    # smoke-test knobs (CPU-runnable soak of the soak harness itself)
    ap.add_argument("--input_size", type=int, default=518)
    ap.add_argument("--compute_dtype", default="bfloat16",
                    choices=["bfloat16", "float32"])
    args = ap.parse_args()

    honor_platform_env()
    enable_compilation_cache()  # relay compiles are minutes-cold without it
    done = watch_backend_init()

    if args.device_only:
        require_backend(done)
        return device_soak(args)

    workdir = os.path.abspath(args.workdir)
    os.makedirs(workdir, exist_ok=True)
    if shutil.which("ffmpeg") and shutil.which("ffprobe"):
        encoder_note = "host ffmpeg"
    else:
        encoder_note = _install_double(workdir)

    subclip_dir = os.path.join(workdir, "Subclip") + os.sep
    debug_dir = os.path.join(workdir, "Debug") + os.sep
    out_path = os.path.join(workdir, "out.mkv")

    require_backend(done)
    import jax

    from vr_video_generator_tpu.cli import main as cli_main
    from vr_video_generator_tpu.video.check import check_subclips
    from vr_video_generator_tpu.video.combine import verify_frame_count
    from vr_video_generator_tpu.video.reader import probe_video

    _, n_frames, w, h = probe_video(args.video)
    end_frame = min(args.end_frame, n_frames)
    print(f"soak: {end_frame} frames at {w}x{h}, stride {args.depth_stride}, "
          f"{args.num_workers} encoders via {encoder_note}, "
          f"backend={jax.default_backend()}", flush=True)

    sampler = Sampler(subclip_dir, args.sample_every,
                      partial_out=args.out + ".partial")
    sampler.start()
    t0 = time.time()
    rc = cli_main([
        "--VideoDir", args.video, "--OutputDir", out_path,
        "--DebugDir", debug_dir, "--SubClipDir", subclip_dir,
        "--Max_Frame_Count", str(args.max_frame_count),
        "--batch_size", str(args.batch_size),
        "--depth_stride", str(args.depth_stride),
        "--stride_audit_every", "200",
        "--Num_Workers", str(args.num_workers),
        "--end_frame", str(end_frame),
        "--encoder", args.encoder,
        "--input_size", str(args.input_size),
        "--compute_dtype", args.compute_dtype,
        "--allow_random_weights",
    ])
    wall_s = time.time() - t0
    sampler.stop()
    sampler.join()

    # conversion-phase boundary = the last subclip's mtime (combine follows)
    clip_files = sorted(
        (os.path.getmtime(os.path.join(subclip_dir, f)), f)
        for f in os.listdir(subclip_dir) if f.endswith(".mp4"))
    mtimes = [m for m, _ in clip_files]
    convert_s = (mtimes[-1] - t0) if mtimes else 0.0
    cadences = [b - a for a, b in zip(mtimes, mtimes[1:]) if b > a]
    clip_fps = [args.max_frame_count / c for c in cadences] if cadences else []
    half = len(clip_fps) // 2

    conv_samples = [s for s in sampler.samples if s["t"] <= convert_s]
    second_half = [s for s in conv_samples if s["t"] >= convert_s / 2]
    rss_slope = _slope_per_hour([s["t"] for s in second_half],
                                [s["rss_mb"] for s in second_half])
    dev = [s["device_mb"] for s in conv_samples if s["device_mb"] is not None]

    issues = check_subclips(subclip_dir)
    diff = verify_frame_count(args.video, out_path)

    artifact = {
        "frames": end_frame,
        "resolution": f"{w}x{h}",
        "depth_stride": args.depth_stride,
        "encoder_io": encoder_note,
        "rc": rc,
        "wall_s": round(wall_s, 1),
        "convert_s": round(convert_s, 1),
        "combine_s": round(wall_s - convert_s, 1),
        "fps_e2e_convert": round(end_frame / convert_s, 2) if convert_s else 0,
        "clip_fps": {
            "clips": len(clip_fps),
            "p10": _pct(clip_fps, 10) if clip_fps else 0,
            "p50": _pct(clip_fps, 50) if clip_fps else 0,
            "p90": _pct(clip_fps, 90) if clip_fps else 0,
            "first_half_p50": _pct(clip_fps[:half], 50) if half else 0,
            "second_half_p50": _pct(clip_fps[half:], 50) if half else 0,
        },
        "rss_mb": {
            "start": conv_samples[0]["rss_mb"] if conv_samples else 0,
            "end": conv_samples[-1]["rss_mb"] if conv_samples else 0,
            "peak": max((s["rss_mb"] for s in sampler.samples), default=0),
            "slope_mb_per_hour_2nd_half": round(rss_slope, 1),
        },
        "device_mb": {
            "available": bool(dev),
            "start": round(dev[0], 1) if dev else None,
            "end": round(dev[-1], 1) if dev else None,
            "peak": round(max(dev), 1) if dev else None,
        },
        "checker_issues": [str(i) for i in issues],
        "frame_count_diff": diff,
        "samples": sampler.samples[::max(1, len(sampler.samples) // 240)],
    }
    with open(args.out, "w") as f:
        json.dump(artifact, f, indent=1)
    ok = (rc == 0 and not issues and diff == 0)
    print(json.dumps({k: v for k, v in artifact.items() if k != "samples"},
                     indent=1), flush=True)
    print(f"soak {'PASS' if ok else 'FAIL'} -> {args.out}", flush=True)
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
