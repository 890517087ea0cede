"""Run orchestration: repair modes, directory lifecycle, segment dispatch.

The reference's main_func spawns a process fleet and wires Queues
(reference PredictAndGenerate.py:273-321); on TPU the depth model lives
inside the jitted pipeline, so orchestration reduces to: prepare dirs per
repair_mode (:400-419), run the conversion loop over the requested frame
range, and combine subclips + audio. Repair parity:

  repair_mode 0: clear debug+subclip dirs, convert everything, combine
  repair_mode 1: KEEP the debug dir, convert the given range, no combine
  repair_mode 2: clear debug dir, combine existing subclips with audio
  repair_mode 3: clear debug dir, combine video only (debug)

(Debug-dir lifecycle matches the reference exactly — :402-405 clears it in
every mode EXCEPT 1, so a combine-only rerun does wipe prior segment logs.)

An extra ``check_and_repair`` entry reruns exactly the broken ranges found
by video/check.py — the library-form of Check_Clips.py's repair loop.
"""

from __future__ import annotations

import os
from typing import Optional

from vr_video_generator_tpu.pipeline import SbsPipeline
from vr_video_generator_tpu.utils.config import RunConfig
from vr_video_generator_tpu.utils.fsutil import create_folder_if_not_exist, remove_all_files
from vr_video_generator_tpu.utils.logging import (WorkerLog, overflow_message,
                                                  overflow_path, print_flush,
                                                  summarize_overflow)
from vr_video_generator_tpu.video.check import check_subclips
from vr_video_generator_tpu.video.combine import combine_clips
from vr_video_generator_tpu.video.reader import VideoReader, probe_video
from vr_video_generator_tpu.video.writer import SubclipWriter, get_ffmpeg_config
from vr_video_generator_tpu.runtime.segment import process_segment


def convert_range(cfg: RunConfig, begin: int, end: int,
                  pipeline: Optional[SbsPipeline] = None,
                  allow_random: bool = False,
                  log: Optional[WorkerLog] = None) -> int:
    """Convert frames [begin, end) of cfg.video_dir into subclips.

    With ``cfg.mesh_shape`` set, dispatches to the multi-chip sharded
    runtime (one contiguous temporal segment per ``data`` slot) instead of
    the single-chip loop.
    """
    fps, video_length, width, height = probe_video(cfg.video_dir)
    end = min(end, video_length)
    if end <= begin:
        return 0
    if cfg.mesh_shape is not None and pipeline is None:
        return _convert_range_sharded(cfg, begin, end, width, height,
                                      allow_random=allow_random, log=log)
    if pipeline is not None and not isinstance(pipeline, SbsPipeline):
        # a ShardedSbsPipeline fed to the single-chip loop would reinterpret
        # the batch as n_data separate temporal segments — refuse loudly
        raise TypeError("convert_range takes a single-chip SbsPipeline; "
                        "for the sharded runtime set cfg.mesh_shape and "
                        "pass pipeline=None")
    if pipeline is None:
        pipeline = SbsPipeline.create(cfg, height, width,
                                      allow_random=allow_random)
    _, ffmpeg_config = get_ffmpeg_config(cfg.video_dir, cfg.encoder_device) \
        if cfg.encoder_device else (None, None)
    writer = SubclipWriter(cfg.subclip_dir, fps, 2 * width, height,
                           ffmpeg_config=ffmpeg_config,
                           max_concurrent=max(1, cfg.num_workers),
                           backend=cfg.writer_backend)
    log = log or WorkerLog(os.path.join(cfg.debug_dir, f"segment_{begin}.txt"))
    profile_csv = os.path.join(cfg.debug_dir, f"segment_{begin}_profile.csv")
    try:
        # Depth-stride anchor grid is absolute (video frame indices):
        # process from the aligned proc_begin (and, when the video has the
        # frames, through the aligned proc_end) discarding the re-decided
        # edge outputs, so repair ranges / arbitrary start_frames render
        # bit-identically to the original full run (see run_sharded, which
        # does the same per slot). At stride 1 this is all identity.
        s = cfg.depth_stride
        proc_begin = (begin // s) * s
        proc_end = min(-(-end // s) * s, video_length)
        warmup = -(-cfg.warmup_frames // s) * s  # window on the grid too
        init_state = None
        if warmup > 0 and proc_begin > 0:
            # halo warm-up: prime the temporal state on the preceding frames
            # so this segment (or repair range) continues the full-video
            # sequence (no reference-style reset discontinuity)
            import numpy as np

            wu_begin = max(0, proc_begin - warmup)
            with VideoReader(cfg.video_dir, begin=wu_begin,
                             backend=cfg.reader_backend) as wr:
                warm = np.stack(list(wr.frames(wu_begin, proc_begin)))
            # min_batches pins the pad count at begin < warmup so the primed
            # state matches a sharded-slot warm-up exactly (see primed_state)
            init_state = pipeline.primed_state(
                warm, cfg.batch_size,
                min_batches=-(-warmup // cfg.batch_size))
        with VideoReader(cfg.video_dir, begin=proc_begin,
                         backend=cfg.reader_backend) as reader:
            return process_segment(pipeline, reader, writer, begin, end,
                                   max_frame_count=cfg.max_frame_count,
                                   batch_size=cfg.batch_size, log=log,
                                   profile_csv=profile_csv,
                                   initial_state=init_state,
                                   discard_first=begin - proc_begin,
                                   discard_last=proc_end - end,
                                   overflow_path=overflow_path(cfg.debug_dir))
    except Exception as e:  # error funnel parity (reference :259-272)
        log.error(f"Segment {begin} failed", e,
                  error_path=os.path.join(cfg.debug_dir, "ERROR.txt"))
        raise
    finally:
        writer.close()


def _convert_range_sharded(cfg: RunConfig, begin: int, end: int,
                           width: int, height: int,
                           allow_random: bool = False,
                           log: Optional[WorkerLog] = None) -> int:
    import jax

    from vr_video_generator_tpu.models.factory import load_model
    from vr_video_generator_tpu.parallel.mesh import make_mesh
    from vr_video_generator_tpu.parallel.sharded import ShardedSbsPipeline
    from vr_video_generator_tpu.runtime.sharded_runner import run_sharded

    import jax.numpy as jnp

    mesh = make_mesh(cfg.mesh_shape)
    dtype = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32
    model, params = load_model(cfg.encoder, cfg.encoder_path, dtype=dtype,
                               allow_random=allow_random, gelu=cfg.gelu,
                               mlp_fused=cfg.mlp_fused, tail=cfg.tail)
    pipe = ShardedSbsPipeline(model, params, height, width, mesh, run_cfg=cfg)
    suffix = f"sharded_p{jax.process_index()}"
    log = log or WorkerLog(os.path.join(cfg.debug_dir, f"{suffix}.txt"))
    try:
        return run_sharded(pipe, cfg.video_dir, cfg.subclip_dir, begin, end,
                           max_frame_count=cfg.max_frame_count,
                           batch_size=cfg.batch_size, log=log,
                           reader_backend=cfg.reader_backend,
                           writer_backend=cfg.writer_backend,
                           warmup=cfg.warmup_frames,
                           overflow_path=overflow_path(cfg.debug_dir))
    except Exception as e:  # error funnel parity (reference :259-272)
        log.error("Sharded conversion failed", e,
                  error_path=os.path.join(cfg.debug_dir, "ERROR.txt"))
        raise


def run(cfg: RunConfig, allow_random: bool = False) -> None:
    """Full run with repair_mode dispatch (reference :400-419)."""
    from vr_video_generator_tpu.utils.devwatch import (require_backend,
                                                       watch_backend_init)

    done = None
    if cfg.repair_mode in (0, 1):
        # Kick backend init now (concurrent with dir/video setup) and get a
        # stderr diagnosis if it stalls — a down TPU relay otherwise hangs
        # the run forever with no output. Combine-only modes (2/3) are pure
        # ffmpeg host work and must not touch (or contend for) the device.
        done = watch_backend_init()
    create_folder_if_not_exist(cfg.debug_dir)
    create_folder_if_not_exist(cfg.subclip_dir)
    if cfg.repair_mode != 1:
        remove_all_files(cfg.debug_dir)
    if cfg.repair_mode == 0:
        remove_all_files(cfg.subclip_dir)

    if cfg.repair_mode in (0, 1):
        # fail loudly (VRVG_INIT_TIMEOUT, default 600s; 0 waits forever)
        # rather than hanging at the first device touch below
        require_backend(done)
        from vr_video_generator_tpu.utils.profiling import trace

        with trace(cfg.profile_dir or None):
            convert_range(cfg, cfg.start_frame, cfg.end_frame,
                          allow_random=allow_random)
        # Run-level overflow summary: an operator must see "N frames
        # clamped" on stdout without reading per-segment logs (the
        # reference's equivalent condition is silently unbounded,
        # PredictAndGenerate.py:101-118).
        total, _ = summarize_overflow(overflow_path(cfg.debug_dir))
        if total:
            print_flush(overflow_message(total, cfg.encoder))
    if cfg.repair_mode in (0, 2):
        combine_clips(cfg.subclip_dir, cfg.video_dir, cfg.output_dir,
                      just_combine=0)
    if cfg.repair_mode == 3:
        combine_clips(cfg.subclip_dir, cfg.video_dir, cfg.output_dir,
                      just_combine=1)
    if cfg.repair_mode in (0, 2, 3):
        # post-combine frame-count check (reference Combine_Clips.py:56-62)
        from vr_video_generator_tpu.video.combine import verify_frame_count

        verify_frame_count(cfg.video_dir, cfg.output_dir, verbose=True)


def check_and_repair(cfg: RunConfig, repair: bool = True,
                     allow_random: bool = False, pipeline=None) -> list:
    """Integrity-check subclips; optionally regenerate broken ranges
    (library form of reference Check_Clips.py:15-37). One pipeline is
    built lazily and reused across every repaired range (each range would
    otherwise re-load and re-jit the model); callers may also pass a
    prebuilt single-chip ``pipeline``. With ``cfg.mesh_shape`` set, each
    range goes through the sharded runtime (which owns its pipeline)."""
    issues = check_subclips(cfg.subclip_dir, remove_bad=repair)
    if repair:
        if pipeline is None and cfg.mesh_shape is None and issues:
            _, _, width, height = probe_video(cfg.video_dir)
            pipeline = SbsPipeline.create(cfg, height, width,
                                          allow_random=allow_random)
        for issue in issues:
            lo, hi = issue.repair_range
            convert_range(cfg, lo, hi, allow_random=allow_random,
                          pipeline=pipeline)
        if issues:
            total, _ = summarize_overflow(overflow_path(cfg.debug_dir))
            if total:
                print_flush(overflow_message(total, cfg.encoder))
    return issues
