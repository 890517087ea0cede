"""Generate the endurance-soak source video: long, 1080p, structured.

Content is synthetic but non-trivial for the pipeline: a rolling gradient
background (global pan -> moving depth field) plus foreground blocks moving
at different speeds (distinct depth planes, occlusion churn). Low entropy
keeps the file and generation time sane (~10 KiB/frame vs ~600 for noise).

Usage: python scripts/soak_gen.py OUT.mp4 [n_frames]
"""

import os
import sys
import time

import cv2
import numpy as np

H, W, FPS = 1080, 1920, 30.0


def generate(path: str, n_frames: int) -> None:
    yy, xx = np.mgrid[0:H, 0:W]
    bg = np.stack([(xx * 255 // W), (yy * 255 // H),
                   ((xx + yy) * 127 // (H + W))], axis=-1).astype(np.uint8)
    writer = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), FPS,
                             (W, H))
    if not writer.isOpened():
        raise RuntimeError(f"cv2.VideoWriter failed to open {path}")
    t0 = time.time()
    for i in range(n_frames):
        f = np.roll(bg, (i * 5) % W, axis=1)
        if i % 2:
            f = f.copy()  # roll already copies; only copy when reusing
        for k, sp in enumerate((3, 7, 13)):
            x = (i * sp + k * 500) % (W - 200)
            y = 150 + k * 250
            f[y:y + 180, x:x + 200] = (40 * k + 60, 220 - 60 * k, 30 + 70 * k)
        writer.write(f)
        if i and i % 10000 == 0:
            dt = time.time() - t0
            print(f"{i}/{n_frames} frames, {i / dt:.0f} fps gen, "
                  f"{os.path.getsize(path) / 2**20:.0f} MiB", flush=True)
    writer.release()
    print(f"done: {n_frames} frames in {time.time() - t0:.0f}s, "
          f"{os.path.getsize(path) / 2**30:.2f} GiB", flush=True)


if __name__ == "__main__":
    out = sys.argv[1]
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 100_000
    generate(out, n)
