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
import queue
import threading
from dataclasses import dataclass
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from vr_video_generator_tpu.parallel.sharded import ShardedSbsPipeline
from vr_video_generator_tpu.runtime.segment import EmitWindow
from vr_video_generator_tpu.utils.logging import (ProgressMeter, WorkerLog,
                                                  record_overflow,
                                                  stride_audit_line)
from vr_video_generator_tpu.video.reader import VideoReader, probe_video
from vr_video_generator_tpu.video.writer import SubclipWriter, get_ffmpeg_config


@dataclass
class _Segment:
    begin: int
    end: int            # last written frame (exclusive)
    decode_end: int     # last decoded frame (exclusive; anchor-grid aligned)
    cursor: int
    reader: VideoReader
    pending: List[np.ndarray]
    clip_begin: int
    window: "EmitWindow"  # trims decoded outputs to [begin, end)

    def done(self) -> bool:
        return self.cursor >= self.decode_end


def partition_segments(start: int, end: int, n: int,
                       stride: int = 1) -> List[tuple]:
    """Contiguous [begin, end) slices, reference step policy
    (PredictAndGenerate.py:274-275): step = ceil(range / n).

    ``stride`` > 1 rounds the step up to a stride multiple so interior
    segment begins stay on the absolute anchor grid (depth-stride groups
    align to video frame indices, not segment-relative positions — see
    run_sharded); unaligned begins still work via per-slot discard, this
    just avoids re-deciding the same frames."""
    step = max(1, math.ceil((end - start) / n))
    if stride > 1:
        step = -(-step // stride) * stride
    out = []
    for lo in range(start, end, step):
        out.append((lo, min(lo + step, end)))
    while len(out) < n:  # degenerate tail: empty segments
        out.append((end, end))
    return out


def _primed_states(pipeline: ShardedSbsPipeline, slot_begins: List[int],
                   video_path: str, b: int, warmup: int,
                   reader_backend: str, multi_host: bool,
                   any_preceding: bool, global_begins: List[int]):
    """Per-slot halo warm-up: prime each data slot's temporal state on the
    frames preceding its segment (the reference resets per worker,
    PredictAndGenerate.py:131-145 — a smoothing discontinuity this removes).

    Copies of a slot's first fed frame are a fixed point of the smoothing
    state (see SbsPipeline.primed_state), so every slot is front-padded to
    the same k = ceil(warmup/b) whole batches and the warm-up runs through
    the normal sharded step, SBS output discarded. Slots with NO preceding
    frames (begin == 0) are reset to a true cold start afterwards: their
    all-pad window is a fixed point of the stride-1 state, but with
    depth_stride > 1 it would leave ``anchor_prev`` primed on frame 0 —
    diverging from the single-chip path, which skips warm-up at begin == 0
    (runtime/orchestrator.py). The reset makes that equivalence hold by
    construction for every stride.

    ``any_preceding`` / ``global_begins`` must be computed from ALL slots'
    begins, not just this process's owned slots (both are required for that
    reason — an owned-only default would be the exact non-uniform decision
    this paragraph forbids): the warm-up steps (and the reset's select)
    launch the global SPMD program, so every process must make the
    identical decision (a per-process early return would leave the hosts
    whose slots start at 0 out of the collectives and deadlock the rest).
    """
    states = pipeline.initial_state()
    if warmup <= 0 or not any_preceding:
        return states
    k = -(-warmup // b)
    h, w = pipeline.height, pipeline.width

    def window(lo: int):
        # Lazy k*b-frame window: front-pad copies of the first decoded frame,
        # then the real preceding frames. Streaming one batch column per step
        # bounds host memory at n_slots*b frames instead of staging the whole
        # n_slots*k*b warm-up (multi-GB at 4K geometries). Exactly ``warmup``
        # real frames (not k*b) so the primed state matches the single-chip
        # path bit-for-bit: SbsPipeline.primed_state on frames
        # [max(0, lo - warmup), lo) with min_batches = k — the same fixed k
        # is used there so slots with begin < warmup (more front pads, which
        # are NOT a fixed point under depth_stride > 1) prime identically in
        # both runtimes.
        wu_begin = max(0, lo - warmup)
        n_real = max(lo - wu_begin, 1)
        with VideoReader(video_path, begin=wu_begin,
                         backend=reader_backend) as wr:
            it = iter(wr.frames(wu_begin, max(lo, wu_begin + 1)))
            frame = next(it)
            for _ in range(k * b - n_real):
                yield frame
            yield frame
            for _ in range(n_real - 1):
                frame = next(it, frame)  # short read: repeat the last frame
                yield frame

    gens = [window(lo) for lo in slot_begins]
    for _ in range(k):
        local = np.empty((len(slot_begins), b, h, w, 3), np.uint8)
        for slot_i, gen in enumerate(gens):
            for j in range(b):
                local[slot_i, j] = next(gen)
        local = local.reshape(len(slot_begins) * b, h, w, 3)
        if multi_host:
            _, states = pipeline.step_local(local, states)
        else:
            _, states = pipeline.step(local, states)
    begins = global_begins
    if any(lo == 0 for lo in begins):
        # Cold-start reset for slots with no preceding frames (see docstring).
        # Globally uniform: every process computes the same mask and runs the
        # same jitted select program over the sharded state (the mask is a
        # baked-in replicated constant, so no host array mixes shardings).
        keep = np.asarray([lo > 0 for lo in begins])

        @jax.jit
        def _reset_cold(warmed, cold):
            def sel(w_leaf, c_leaf):
                m = jnp.asarray(keep).reshape(
                    (-1,) + (1,) * (w_leaf.ndim - 1))
                return jnp.where(m, w_leaf, c_leaf)

            return jax.tree.map(sel, warmed, cold)

        states = _reset_cold(states, pipeline.initial_state())
    return states._replace(overflow=states.overflow * 0)


def run_sharded(pipeline: ShardedSbsPipeline, video_path: str,
                subclip_dir: str, start: int, end: int,
                max_frame_count: int, batch_size: int,
                log: Optional[WorkerLog] = None,
                reader_backend: str = "auto",
                writer_backend: str = "auto",
                warmup: int = 0,
                overflow_path: "Optional[str]" = None) -> int:
    """Convert frames [start, end) with n_data concurrent segments.

    Multi-host aware: every process runs the same (globally uniform) step
    count, but decodes/encodes only the ``data`` slots whose devices it owns
    (parallel/multihost.py) and feeds them via ``step_local`` — frames never
    cross hosts. Single-host this reduces to all slots local.

    The depth-stride anchor grid is ABSOLUTE (video frame indices): with
    depth_stride s > 1 each slot starts processing at the aligned
    proc = floor(begin/s)*s and discards the first begin - proc outputs, so
    frame g is an anchor iff g % s == s-1 no matter how the video is
    partitioned — sharded output equals the single-chip and sequential
    outputs frame-for-frame. A segment-relative grid would give repair
    ranges and mesh slots a different anchor phase than the surrounding
    frames (visible depth seams at stride > 1).
    """
    log = log or WorkerLog(None)
    n_data = pipeline.n_data
    b = batch_size
    s = pipeline.depth_stride
    bounds = partition_segments(start, end, n_data, stride=s)
    owned = pipeline.local_slots
    multi_host = len(owned) < n_data
    # warm-up window on the anchor grid too (multiple of s): the window's
    # front pads (k*b - n_real, with b % s == 0) then never shift phase
    warmup = -(-warmup // s) * s
    video_length = probe_video(video_path)[1]
    # Aligned decode windows per slot; empty slots decode nothing (their
    # frames belong to a real slot — re-deciding them would double-count
    # the overflow diagnostic).
    proc = [(lo // s) * s if lo < hi else lo for lo, hi in bounds]
    dec_end = [min(-(-hi // s) * s, video_length) if lo < hi else lo
               for lo, hi in bounds]

    segs: List[Optional[_Segment]] = [None] * n_data
    fps = None
    for i in owned:
        lo, hi = bounds[i]
        reader = VideoReader(video_path, begin=proc[i], backend=reader_backend)
        fps = fps or reader.fps
        segs[i] = _Segment(begin=lo, end=hi, decode_end=dec_end[i],
                           cursor=proc[i], reader=reader, pending=[],
                           clip_begin=lo,
                           window=EmitWindow(lo - proc[i], hi - lo))
    # Encoder parity with the single-chip path (runtime/orchestrator.py):
    # honor cfg.encoder_device's ffmpeg argv (NVENC etc.) and let every
    # owned slot's clip encode overlap instead of serializing on one pipe.
    cfg = pipeline.run_cfg
    _, ffmpeg_config = get_ffmpeg_config(video_path, cfg.encoder_device) \
        if cfg.encoder_device else (None, None)
    writer = SubclipWriter(subclip_dir, fps, 2 * pipeline.width,
                           pipeline.height, ffmpeg_config=ffmpeg_config,
                           max_concurrent=max(1, cfg.num_workers, len(owned)),
                           backend=writer_backend)

    total = max(sum(hi - lo for lo, hi in (bounds[i] for i in owned)), 1)
    meter = ProgressMeter(total, log)
    frames_done = 0
    h, w = pipeline.height, pipeline.width
    # Same trip count on every process: the longest segment anywhere decides.
    n_steps = max(-(-(e - p) // b) for p, e in zip(proc, dec_end))

    def flush(seg: _Segment, force: bool) -> None:
        while (len(seg.pending) >= max_frame_count
               or (force and seg.pending)):
            chunk = seg.pending[:max_frame_count]
            seg.pending = seg.pending[max_frame_count:]
            writer.write_clip(seg.clip_begin, chunk)
            seg.clip_begin += len(chunk)

    def emit(sbs, counts) -> None:
        """Read one step's SBS back and route per-slot frames to writers."""
        nonlocal frames_done
        if multi_host:
            shards = {sh.index[0].start or 0: np.asarray(sh.data)
                      for sh in sbs.addressable_shards}
            sbs_np = np.concatenate(
                [shards[k] for k in sorted(shards)], axis=0)
        else:
            sbs_np = np.asarray(sbs)
        # packed emit: (n, h, 2w) uint32 words the writer unpacks host-side
        sbs_np = sbs_np.reshape((len(owned), b) + sbs_np.shape[1:])
        for slot_i, i in enumerate(owned):
            seg = segs[i]
            if counts[slot_i]:
                take = seg.window.take(sbs_np[slot_i, :counts[slot_i]])
                seg.pending.extend(take)
                seg.cursor += counts[slot_i]
                frames_done += len(take)
                flush(seg, force=seg.done())
        meter.report(max(frames_done, 1))

    audit_every = cfg.stride_audit_every
    audit_on = audit_every > 0 and pipeline.depth_stride > 1

    try:
        states = _primed_states(pipeline, [proc[i] for i in owned],
                                video_path, b, warmup, reader_backend,
                                multi_host,
                                any_preceding=any(p > 0 for p in proc),
                                global_begins=proc)
        # Decode ahead on a background thread and read the PREVIOUS step's
        # SBS back while the current one computes — the same double
        # buffering the single-chip loop has (runtime/segment.py), which
        # the first cut of this runner lacked (TPU idled during every
        # decode+encode).
        batches: "queue.Queue" = queue.Queue(maxsize=2)
        decoder = threading.Thread(
            target=_decode_steps,
            args=([segs[i] for i in owned], b, h, w, n_steps, batches),
            daemon=True)
        decoder.start()

        prev = None  # (sbs device array, counts) of the in-flight step
        for step_idx in range(n_steps):
            item = batches.get()
            if isinstance(item, BaseException):
                raise RuntimeError("sharded decode thread crashed") from item
            local, counts, starts = item
            n_valid = np.asarray(counts, np.int32)
            # Sampled stride-fidelity audit. The trigger is the (globally
            # uniform) step index — NOT per-slot fill levels: the audit
            # launches a global SPMD program, so a per-process condition
            # would leave some hosts out of the collectives and deadlock the
            # rest. Padded slots still compute (garbage) stats; they are
            # simply not logged.
            if audit_on and step_idx % audit_every == 0:
                stats = (pipeline.stride_audit_local(local, states)
                         if multi_host else
                         pipeline.stride_audit(local, states))
                for slot_i, i in enumerate(owned):
                    if counts[slot_i] == b and i in stats:
                        rms, mx = stats[i]
                        log.write(stride_audit_line(
                            starts[slot_i], starts[slot_i] + b, rms, mx,
                            pipeline.spec.cfg.limit_step_cap, slot=i))
            if multi_host:
                sbs, states = pipeline.step_local(local, states, n_valid)
            else:
                sbs, states = pipeline.step(local, states, n_valid)
            if prev is not None:
                emit(*prev)
            prev = (sbs, counts)
        if prev is not None:
            emit(*prev)
        decoder.join()
        for i in owned:
            flush(segs[i], force=True)
    finally:
        # SubclipWriter.close waits on in-flight encoders before closing
        for i in owned:
            segs[i].reader.close()
        writer.close()
    # overflow is (n_data,) sharded P("data"): each data shard is replicated
    # across the model axis, so dedupe by data index (like the sbs readback)
    # or the tally overcounts by n_model.
    overflow = sum({s.index[0].start or 0: int(np.asarray(s.data).sum())
                    for s in states.overflow.addressable_shards}.values())
    if overflow:
        log.write(f"WARNING: scaled depth exceeded limit_step_cap on "
                  f"{overflow} frames (clamped; check the encoder's "
                  f"depth_scaler)")
        # machine-readable record for the run summary / checktool / GUI
        # (multi-host: each process records its owned slots' total)
        record_overflow(overflow_path, start, end, overflow)
    log.write("Sharded runner ending")
    return frames_done


def _decode_steps(segs_owned: List[_Segment], b: int, h: int, w: int,
                  n_steps: int, out_q: "queue.Queue") -> None:
    """Background producer of staged step batches: exactly ``n_steps``
    (local, counts, starts) tuples, then None. Uses its own cursors —
    ``_Segment.cursor`` stays the EMIT-side accounting the consumer
    advances. A crash ships the exception to the consumer (same contract
    as runtime/segment._decode_batches)."""
    cursors = [seg.cursor for seg in segs_owned]
    try:
        for _ in range(n_steps):
            local = np.empty((len(segs_owned), b, h, w, 3), np.uint8)
            counts, starts = [], []
            for slot_i, seg in enumerate(segs_owned):
                n_want = max(min(b, seg.decode_end - cursors[slot_i]), 0)
                starts.append(cursors[slot_i])
                for j, frame in enumerate(seg.reader.frames(
                        cursors[slot_i], cursors[slot_i] + n_want)):
                    local[slot_i, j] = frame
                if n_want < b:  # pad with the last frame for static shapes
                    local[slot_i, n_want:] = (local[slot_i, n_want - 1]
                                              if n_want else 0)
                counts.append(n_want)
                cursors[slot_i] += n_want
            out_q.put((local.reshape(len(segs_owned) * b, h, w, 3),
                       counts, starts))
        out_q.put(None)
    except BaseException as e:  # noqa: BLE001 — shipped to the consumer
        out_q.put(e)
