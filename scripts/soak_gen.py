"""Generate the endurance-soak source video: long, 1080p, structured.

Content is synthetic but non-trivial for the pipeline: a rolling gradient
background (global pan -> moving depth field) plus foreground blocks moving
at different speeds (distinct depth planes, occlusion churn). Low entropy
keeps the file and generation time sane (~10 KiB/frame vs ~600 for noise).

Usage: python scripts/soak_gen.py OUT.mp4 [n_frames] [HxW]
(HxW e.g. 2160x3840 for the 4K soak arm; default 1080x1920)
"""

import os
import sys
import time

import cv2
import numpy as np

H, W, FPS = 1080, 1920, 30.0


def generate(path: str, n_frames: int, h: int = H, w: int = W) -> None:
    yy, xx = np.mgrid[0:h, 0:w]
    bg = np.stack([(xx * 255 // w), (yy * 255 // h),
                   ((xx + yy) * 127 // (h + w))], axis=-1).astype(np.uint8)
    writer = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), FPS,
                             (w, h))
    if not writer.isOpened():
        raise RuntimeError(f"cv2.VideoWriter failed to open {path}")
    t0 = time.time()
    for i in range(n_frames):
        f = np.roll(bg, (i * 5) % w, axis=1)
        if i % 2:
            f = f.copy()  # roll already copies; only copy when reusing
        sy, sx = h / H, w / W  # block geometry scales with the frame
        for k, sp in enumerate((3, 7, 13)):
            x = int((i * sp * sx + k * 500 * sx) % (w - 200 * sx))
            y = int((150 + k * 250) * sy)
            f[y:y + int(180 * sy), x:x + int(200 * sx)] = \
                (40 * k + 60, 220 - 60 * k, 30 + 70 * k)
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
    if len(sys.argv) > 3:
        hh, ww = (int(v) for v in sys.argv[3].split("x"))
    else:
        hh, ww = H, W
    generate(out, n, hh, ww)
