"""Multi-chip conversion runtime: n_data temporal segments, one device step.

The TPU-native form of the reference's whole orchestration layer
(reference PredictAndGenerate.py:273-321): where the reference spawns
Num_Workers segment processes that each own a video slice and queue frames
to GPU-server processes, here the host keeps n_data segment cursors
(decoder + subclip writer each) and feeds ONE sharded device step whose
``data`` mesh axis owns one contiguous slice per chip. Segment boundaries,
subclip naming, black-frame substitution, and per-segment smoothing state
all match the reference's worker semantics.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import List, Optional

import numpy as np

from vr_video_generator_tpu.parallel.sharded import ShardedSbsPipeline
from vr_video_generator_tpu.utils.logging import ProgressMeter, WorkerLog
from vr_video_generator_tpu.video.reader import VideoReader
from vr_video_generator_tpu.video.writer import SubclipWriter


@dataclass
class _Segment:
    begin: int
    end: int
    cursor: int
    reader: VideoReader
    pending: List[np.ndarray]
    clip_begin: int

    def done(self) -> bool:
        return self.cursor >= self.end


def partition_segments(start: int, end: int, n: int) -> List[tuple]:
    """Contiguous [begin, end) slices, reference step policy
    (PredictAndGenerate.py:274-275): step = ceil(range / n)."""
    step = max(1, math.ceil((end - start) / n))
    out = []
    for lo in range(start, end, step):
        out.append((lo, min(lo + step, end)))
    while len(out) < n:  # degenerate tail: empty segments
        out.append((end, end))
    return out


def run_sharded(pipeline: ShardedSbsPipeline, video_path: str,
                subclip_dir: str, start: int, end: int,
                max_frame_count: int, batch_size: int,
                log: Optional[WorkerLog] = None,
                writer_backend: str = "auto") -> int:
    """Convert frames [start, end) with n_data concurrent segments."""
    log = log or WorkerLog(None)
    n_data = pipeline.n_data
    b = batch_size
    segs: List[_Segment] = []
    fps = None
    for lo, hi in partition_segments(start, end, n_data):
        reader = VideoReader(video_path, begin=lo)
        fps = fps or reader.fps
        segs.append(_Segment(begin=lo, end=hi, cursor=lo, reader=reader,
                             pending=[], clip_begin=lo))
    writer = SubclipWriter(subclip_dir, fps, 2 * pipeline.width,
                           pipeline.height, backend=writer_backend)

    total = max(end - start, 1)
    meter = ProgressMeter(total, log)
    states = pipeline.initial_state()
    frames_done = 0
    h, w = pipeline.height, pipeline.width

    def flush(seg: _Segment, force: bool) -> None:
        while (len(seg.pending) >= max_frame_count
               or (force and seg.pending)):
            chunk = seg.pending[:max_frame_count]
            seg.pending = seg.pending[max_frame_count:]
            writer.write_clip(seg.clip_begin, chunk)
            seg.clip_begin += len(chunk)

    while any(not s.done() for s in segs):
        batch = np.zeros((n_data, b, h, w, 3), np.uint8)
        counts = []
        for i, seg in enumerate(segs):
            n_want = min(b, seg.end - seg.cursor)
            for j, frame in enumerate(seg.reader.frames(seg.cursor,
                                                        seg.cursor + n_want)):
                batch[i, j] = frame
            if 0 < n_want < b:  # pad with the last frame for static shapes
                batch[i, n_want:] = batch[i, n_want - 1]
            counts.append(n_want)
        sbs, states = pipeline.step(batch.reshape(n_data * b, h, w, 3), states)
        sbs_np = np.asarray(sbs).reshape(n_data, b, h, 2 * w, 3)
        for i, seg in enumerate(segs):
            if counts[i]:
                seg.pending.extend(sbs_np[i, :counts[i]])
                seg.cursor += counts[i]
                frames_done += counts[i]
                flush(seg, force=seg.done())
        meter.report(max(frames_done, 1))

    for seg in segs:
        flush(seg, force=True)
        seg.reader.close()
    writer.close()
    log.write("Sharded runner ending")
    return frames_done
