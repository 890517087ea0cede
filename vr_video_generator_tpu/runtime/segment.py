"""Segment processing loop — the TPU-native 'nibba_woka'.

The reference's segment worker (reference PredictAndGenerate.py:200-272)
decodes frame-by-frame, software-pipelines depth against warp, batches
Max_Frame_Count frames into subclips, and logs progress/errors. Here one
loop per host does the same with device batches:

  * decode runs on a background thread into a bounded queue (double
    buffering — the TPU analog of the reference's submit-frame(i+1) /
    warp(i) overlap, :226-234);
  * the jitted pipeline step is dispatched asynchronously; device->host
    readback of batch i overlaps compute of batch i+1;
  * encode subprocesses overlap everything (SubclipWriter waits on the
    previous process only when starting the next, :241-242);
  * decode failures degrade to black frames (:222-225) and errors are
    captured to the debug dir + ERROR.txt (:259-272).
"""

from __future__ import annotations

import queue
import threading
from typing import List, Optional

import numpy as np

from vr_video_generator_tpu.pipeline import SbsPipeline
from vr_video_generator_tpu.utils.logging import (ProgressMeter, WorkerLog,
                                                  record_overflow,
                                                  stride_audit_line)
from vr_video_generator_tpu.video.reader import VideoReader
from vr_video_generator_tpu.video.writer import SubclipWriter


def _decode_batches(reader: VideoReader, begin: int, end: int,
                    batch_size: int, out_q: "queue.Queue") -> None:
    """Decode frames [begin, end) into contiguous (batch, H, W, 3) staging
    buffers. Each frame is decoded straight into its batch row
    (VideoReader.read_into — native GIL-free swizzle/pipe-read when the C++
    tier is built), so there is no per-frame allocation or np.stack gather.
    """
    h, w = reader.height, reader.width
    try:
        i = begin
        while i < end:
            n = min(batch_size, end - i)
            batch = np.empty((n, h, w, 3), np.uint8)
            for k in range(n):
                if not reader.read_into(batch[k]):
                    batch[k] = 0  # black frame on decode failure (ref :222-225)
            out_q.put(batch)
            i += n
        out_q.put(None)  # normal EOF
    except BaseException as e:  # noqa: BLE001
        # A decoder CRASH (as opposed to a per-frame read failure, which
        # degrades to black above) must not masquerade as EOF — ship the
        # exception to the consumer so process_segment re-raises it into
        # the ERROR.txt funnel instead of reporting a silently short
        # segment.
        out_q.put(e)


class EmitWindow:
    """Trims a processed output stream to the written range: drops the
    ``discard`` leading frames and caps emission at ``budget`` frames.

    The depth-stride runtimes decode extra frames on BOTH sides of a
    segment so anchor groups stay on the absolute video frame grid
    (leading: down to floor(begin/s)*s; trailing: up to ceil(end/s)*s when
    the video has the frames — otherwise the final group anchors on a pad
    copy exactly like the sequential run at video end); the extra outputs
    are processed for their effect on the temporal state only.
    """

    def __init__(self, discard: int, budget: int):
        self.discard, self.budget = discard, budget

    def take(self, frames):
        if self.discard:
            drop = min(self.discard, len(frames))
            self.discard -= drop
            frames = frames[drop:]
        if len(frames) > self.budget:
            frames = frames[:self.budget]
        self.budget -= len(frames)
        return frames


def process_segment(pipeline: SbsPipeline, reader: VideoReader,
                    writer: SubclipWriter, begin: int, end: int,
                    max_frame_count: int, batch_size: int = 8,
                    log: Optional[WorkerLog] = None,
                    report_every: int = 1,
                    timer: Optional["StageTimer"] = None,
                    profile_csv: Optional[str] = None,
                    initial_state=None, discard_first: int = 0,
                    discard_last: int = 0,
                    overflow_path: Optional[str] = None) -> int:
    """Convert frames [begin, end); returns the number of frames written.

    ``discard_first`` / ``discard_last``: decode and process that many
    extra frames before ``begin`` / after ``end`` (the caller must open
    ``reader`` at begin - discard_first, and end + discard_last must not
    exceed the video) and drop their outputs — used by the orchestrator to
    keep depth-stride anchor groups on the absolute video frame grid when
    the range is not stride-aligned (repair ranges), so regenerated frames
    are bit-identical to the original run's on both edges.
    """
    from vr_video_generator_tpu.utils.profiling import StageTimer

    timer = timer or StageTimer()
    log = log or WorkerLog(None)
    stream_base = begin - discard_first  # first decoded frame
    decode_end = end + discard_last
    total = decode_end - stream_base
    meter = ProgressMeter(total, log)
    log.write(f"Worker begin from {begin} to {end}")

    batches: "queue.Queue" = queue.Queue(maxsize=2)
    decoder = threading.Thread(target=_decode_batches,
                               args=(reader, stream_base, decode_end,
                                     batch_size, batches),
                               daemon=True)
    decoder.start()

    state = (initial_state if initial_state is not None
             else pipeline.initial_state())
    pending: List[np.ndarray] = []
    clip_begin = begin
    frames_done = 0
    prev_sbs = None
    clips_written = 0

    def flush(force: bool) -> None:
        nonlocal pending, clip_begin, clips_written
        while len(pending) >= max_frame_count or (force and pending):
            chunk, pending = pending[:max_frame_count], pending[max_frame_count:]
            writer.write_clip(clip_begin, chunk)
            clip_begin += len(chunk)
            clips_written += 1

    run_cfg = pipeline.run_cfg
    stride = run_cfg.depth_stride
    audit_every = run_cfg.stride_audit_every
    # Adaptive stride (RunConfig.stride_max_rms): the sampled audit signal
    # ACTS — probe batches run the audited full-depth program; when the
    # probed rms exceeds the threshold the loop stays on full depth (every
    # batch audited, so the re-raise signal is free) until the error
    # subsides for stride_hold consecutive batches.
    adaptive = stride > 1 and run_cfg.stride_max_rms > 0
    if adaptive and audit_every <= 0:
        audit_every = 8  # documented probe-cadence default (cli.py)
    audit_on = audit_every > 0 and stride > 1
    mode_full = False
    hold = 0
    batch_idx = 0
    window = EmitWindow(discard_first, end - begin)
    # Chunked dispatch (RunConfig.chunk_batches): consecutive full
    # non-probe batches accumulate here and go to the device as ONE
    # step_many superstep — bit-identical outputs, k fewer dispatches
    # (the relay's per-call floor and the jax-runtime per-dispatch RSS
    # leak both divide by k; see pipeline.step_many).
    chunk_k = max(1, run_cfg.chunk_batches)
    chunk_buf: List[np.ndarray] = []

    def readback_prev() -> None:
        nonlocal prev_sbs, pending
        if prev_sbs is None:
            return
        sbs_np, n_prev = prev_sbs
        with timer.stage("device_readback"):
            if isinstance(sbs_np, tuple):  # chunked superstep: k outputs
                host = np.concatenate([np.asarray(o) for o in sbs_np])
            else:
                host = np.asarray(sbs_np)
        pending.extend(window.take(host[:n_prev]))
        with timer.stage("encode"):
            flush(force=False)
        prev_sbs = None

    def dispatch_chunk() -> None:
        nonlocal state, prev_sbs, chunk_buf
        if not chunk_buf:
            return
        k = len(chunk_buf)
        with timer.stage("device_dispatch"):
            if k == 1:  # reuse the per-batch program (no k=1 scan compile)
                sbs_dev, state = pipeline.step(chunk_buf[0], state)
            else:
                sbs_dev, state = pipeline.step_many(np.stack(chunk_buf),
                                                    state)
        chunk_buf = []
        readback_prev()
        prev_sbs = (sbs_dev, k * batch_size)

    while True:
        with timer.stage("decode_wait"):
            batch = batches.get()
        if batch is None:
            dispatch_chunk()
            break
        if isinstance(batch, BaseException):
            raise RuntimeError(
                f"decode thread crashed at frame "
                f"{stream_base + frames_done}") from batch
        # pad the final short batch to the compiled batch size
        n_real = batch.shape[0]
        if n_real < batch_size:
            pad = np.repeat(batch[-1:], batch_size - n_real, axis=0)
            batch = np.concatenate([batch, pad], axis=0)
        lo = stream_base + frames_done
        # Audits observe only on full batches — padded copies skew the
        # error stats. (Adaptive full-depth batches still RUN on a short
        # final batch for output fidelity; they just don't transition.)
        probe = (audit_on and n_real == batch_size
                 and batch_idx % audit_every == 0)
        if (chunk_k > 1 and n_real == batch_size and not probe
                and not (adaptive and mode_full)):
            chunk_buf.append(batch)
            frames_done += n_real
            batch_idx += 1
            next_is_probe = audit_on and batch_idx % audit_every == 0
            if len(chunk_buf) >= chunk_k or next_is_probe:
                dispatch_chunk()
            if frames_done % (batch_size * report_every) == 0:
                meter.report(frames_done)
            continue
        dispatch_chunk()  # order-preserving flush before any per-batch path
        if adaptive and (mode_full or probe):
            with timer.stage("device_dispatch"):
                sbs_dev, state, rms, mx = pipeline.step_audited(
                    batch, state, n_valid=n_real)
            if n_real == batch_size:
                log.write(stride_audit_line(
                    lo, lo + n_real, rms, mx,
                    pipeline.spec.cfg.limit_step_cap))
                if rms > run_cfg.stride_max_rms:
                    if not mode_full:
                        log.write(f"adaptive stride: dropped to full depth "
                                  f"at frame {lo} (rms {rms:.4f} > "
                                  f"{run_cfg.stride_max_rms})")
                    mode_full = True
                    hold = max(1, run_cfg.stride_hold)
                elif mode_full:
                    hold -= 1
                    if hold <= 0:
                        mode_full = False
                        log.write(f"adaptive stride: re-raised to stride "
                                  f"{stride} at frame {lo + n_real} (rms "
                                  f"{rms:.4f} <= {run_cfg.stride_max_rms})")
        else:
            # Sampled observe-only audit (read-only; must run before the
            # step donates the state; syncs the device, hence sampled).
            if probe and not adaptive:
                with timer.stage("stride_audit"):
                    rms, mx = pipeline.stride_audit(batch, state)
                log.write(stride_audit_line(
                    lo, lo + n_real, rms, mx,
                    pipeline.spec.cfg.limit_step_cap))
            with timer.stage("device_dispatch"):
                sbs_dev, state = pipeline.step(batch, state, n_valid=n_real)
        readback_prev()
        prev_sbs = (sbs_dev, n_real)
        frames_done += n_real
        batch_idx += 1
        if frames_done % (batch_size * report_every) == 0:
            meter.report(frames_done)

    readback_prev()
    with timer.stage("encode"):
        flush(force=True)
        writer.wait()
    decoder.join()
    meter.report(max(frames_done, 1))
    overflow = int(np.asarray(state.overflow))
    if overflow:
        log.write(f"WARNING: scaled depth exceeded limit_step_cap on "
                  f"{overflow} frames (clamped; check the encoder's "
                  f"depth_scaler)")
        # machine-readable record for the run summary / checktool / GUI
        record_overflow(overflow_path, begin, end, overflow)
    if profile_csv:
        timer.dump_csv(profile_csv)
    log.write("Worker ending")
    return (end - begin) - window.budget  # frames actually written
