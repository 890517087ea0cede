"""Orchestrator tests: repair modes, resume, check-and-repair loop."""

import os

import numpy as np
import pytest

import jax.numpy as jnp

from tests.test_pipeline import TINY, H, W
from tests.test_video import write_synthetic_video, FPS
from vr_video_generator_tpu.models.depth_anything_v2 import DepthAnythingV2
from vr_video_generator_tpu.models.factory import random_params
from vr_video_generator_tpu.pipeline import SbsPipeline
from vr_video_generator_tpu.runtime import orchestrator
from vr_video_generator_tpu.utils.config import RunConfig
from vr_video_generator_tpu.video.check import check_subclips
from vr_video_generator_tpu.video.combine import sorted_subclips
from vr_video_generator_tpu.video.reader import probe_video


@pytest.fixture
def env(tmp_path):
    video = tmp_path / "in.mp4"
    write_synthetic_video(video, 12, h=H, w=W)
    cfg = RunConfig(
        video_dir=str(video),
        output_dir=str(tmp_path / "out.mkv"),
        debug_dir=str(tmp_path / "Debug") + os.sep,
        subclip_dir=str(tmp_path / "Subclip") + os.sep,
        max_frame_count=4, batch_size=4, input_size=56,
        compute_dtype="float32",
    )
    model = DepthAnythingV2(TINY, dtype=jnp.float32)
    pipeline = SbsPipeline(model, random_params(model), H, W, run_cfg=cfg)
    return cfg, pipeline


def test_convert_range_and_repair(env):
    cfg, pipeline = env
    n = orchestrator.convert_range(cfg, 0, 12, pipeline=pipeline)
    assert n == 12
    clips = sorted_subclips(cfg.subclip_dir)
    assert clips == ["0_3.mp4", "4_7.mp4", "8_11.mp4"]
    assert check_subclips(cfg.subclip_dir) == []

    # sabotage: delete the middle clip, then check-and-repair regenerates it
    os.remove(os.path.join(cfg.subclip_dir, "4_7.mp4"))
    issues = check_subclips(cfg.subclip_dir)
    assert len(issues) == 1 and issues[0].repair_range == (4, 8)
    orchestrator.convert_range(cfg, 4, 8, pipeline=pipeline)
    assert check_subclips(cfg.subclip_dir) == []


def test_repair_mode_2_combines_existing(env, monkeypatch, tmp_path):
    cfg, pipeline = env
    monkeypatch.chdir(os.path.dirname(cfg.video_dir))
    orchestrator.convert_range(cfg, 0, 12, pipeline=pipeline)
    import dataclasses
    cfg2 = dataclasses.replace(cfg, repair_mode=2)
    # run() would rebuild the pipeline with real weights; call combine via run
    # path for mode 2 only (no conversion happens)
    orchestrator.run(cfg2, allow_random=True)
    _, frames, w, h = probe_video(cfg.output_dir)
    assert (frames, w, h) == (12, 2 * W, H)
