"""Host-I/O throughput bench: numpy vs native C++ tier on the 4K SBS path.

Measures the two host-side byte movers that bound 4K60 output (~1.5 GB/s,
SURVEY.md §7 "Host I/O throughput"):

  * decode staging: BGR frame -> RGB row of a contiguous device_put batch
    (numpy reversed-slice copy vs native bgr_to_rgb straight into the row);
  * encoder pipe: raw frames -> subprocess stdin (Python .tobytes() +
    BufferedWriter vs native EINTR-safe write_full on the fd).

Run: python scripts/host_io_bench.py  (no JAX / no device needed)
"""

import subprocess
import sys
import time

import numpy as np

sys.path.insert(0, ".")

from vr_video_generator_tpu import native  # noqa: E402

H, W = 2160, 3840            # 4K source; SBS frame is double width
SBS_SHAPE = (H, 2 * W, 3)
N_FRAMES = 24
REPS = 4


def gbps(nbytes, seconds):
    return nbytes / seconds / 1e9


def bench_decode_staging():
    rng = np.random.default_rng(0)
    bgr = [rng.integers(0, 256, (H, W, 3), dtype=np.uint8) for _ in range(N_FRAMES)]
    batch = np.empty((N_FRAMES, H, W, 3), np.uint8)
    total = batch.nbytes * REPS

    t0 = time.perf_counter()
    for _ in range(REPS):
        for i, f in enumerate(bgr):
            batch[i] = f[:, :, ::-1]
    t_np = time.perf_counter() - t0

    t0 = time.perf_counter()
    for _ in range(REPS):
        for i, f in enumerate(bgr):
            native.bgr_to_rgb(f, batch[i])
    t_nat = time.perf_counter() - t0
    return gbps(total, t_np), gbps(total, t_nat)


def bench_encoder_pipe():
    rng = np.random.default_rng(0)
    frames = rng.integers(0, 256, (N_FRAMES, *SBS_SHAPE), dtype=np.uint8)
    total = frames.nbytes * REPS

    def sink():
        return subprocess.Popen(["sh", "-c", "cat > /dev/null"],
                                stdin=subprocess.PIPE)

    proc = sink()
    t0 = time.perf_counter()
    for _ in range(REPS):
        for f in frames:
            proc.stdin.write(np.ascontiguousarray(f).tobytes())
    proc.stdin.close(); proc.wait()
    t_py = time.perf_counter() - t0

    proc = sink()
    fd = proc.stdin.fileno()
    t0 = time.perf_counter()
    for _ in range(REPS):
        for f in frames:
            native.write_full(fd, f)
    proc.stdin.close(); proc.wait()
    t_nat = time.perf_counter() - t0
    return gbps(total, t_py), gbps(total, t_nat)


def main():
    assert native.available(), "native tier failed to build"
    d_np, d_nat = bench_decode_staging()
    print(f"decode staging (BGR->RGB batch row, 4K): "
          f"numpy {d_np:.2f} GB/s -> native {d_nat:.2f} GB/s "
          f"({d_nat / d_np:.2f}x)")
    e_py, e_nat = bench_encoder_pipe()
    print(f"encoder pipe (raw 4K SBS -> subprocess stdin): "
          f"python {e_py:.2f} GB/s -> native {e_nat:.2f} GB/s "
          f"({e_nat / e_py:.2f}x)")
    need = 2 * W * H * 3 * 60 / 1e9
    print(f"4K60 SBS requirement: {need:.2f} GB/s sustained")


if __name__ == "__main__":
    main()
