"""Behavioral tests of the ffmpeg tier against REAL subprocesses.

Until round 4, the reader pipe, writer lifecycle, and the combine remux
chain were verified through argv-recording monkeypatches — the commands
were proven right but never executed. These tests run the production code
against the behavioral double (tests/fakes/ffmpeg_double.py, installed via
the ``fake_ffmpeg`` fixture): real processes, real pipes, real EOF/EPIPE
semantics, real exit codes, real file lifecycles.

Matches reference call sites: decode/encode pipes SupportFunction.py:181-216
+ PredictAndGenerate.py:241-246; concat/remux Combine_Clips.py:19-50.
"""

import os
import shutil
import subprocess

import cv2
import numpy as np
import pytest

from tests.test_video import FPS, H, W, write_synthetic_video
from vr_video_generator_tpu.video.check import check_subclips
from vr_video_generator_tpu.video.combine import (combine_clips,
                                                  sorted_subclips,
                                                  verify_frame_count)
from vr_video_generator_tpu.video.reader import (VideoReader, find_binary,
                                                 get_length, probe_video)
from vr_video_generator_tpu.video.writer import SubclipWriter, get_ffmpeg_config


def _seek_backends():
    """Always exercise the double; ALSO the real binary when the host has
    one (zero environment-skips either way)."""
    backends = ["double"]
    if shutil.which("ffmpeg"):
        backends.append("real")
    return backends


@pytest.mark.parametrize("which", _seek_backends())
def test_reader_pipe_frame_exact_seek(tmp_path, fake_ffmpeg, monkeypatch,
                                      which):
    """ffmpeg backend at begin=k must yield exactly the frames cv2 yields —
    the select=gte(n,begin) filter is frame-exact for arbitrary GOPs
    (reference seeks frame-exactly via cv2, SupportFunction.py:170-177)."""
    if which == "real":
        monkeypatch.setenv("VRVG_FFMPEG", shutil.which("ffmpeg"))
    path = tmp_path / "in.mp4"
    write_synthetic_video(path, 20)
    with VideoReader(str(path), begin=7, backend="cv2") as ref:
        want = list(ref.frames(7, 20))
    with VideoReader(str(path), begin=7, backend="ffmpeg") as reader:
        assert reader._proc is not None  # really the pipe backend
        got = list(reader.frames(7, 20))
    assert len(got) == len(want) == 13
    for a, b in zip(got, want):
        # same bitstream both ways; allow tiny colorspace rounding skew
        assert np.mean(np.abs(a.astype(int) - b.astype(int))) < 2.0


def test_reader_pipe_streaming_from_zero(tmp_path, fake_ffmpeg):
    """begin=0 through the pipe: pure streaming, every frame crosses, and
    auto-backend policy actually picks ffmpeg now that a binary exists."""
    path = tmp_path / "in.mp4"
    write_synthetic_video(path, 10)
    with VideoReader(str(path), begin=0, backend="auto") as reader:
        assert reader.backend == "ffmpeg"
        got = list(reader.frames(0, 10))
    with VideoReader(str(path), begin=0, backend="cv2") as ref:
        want = list(ref.frames(0, 10))
    for a, b in zip(got, want):
        assert np.array_equal(a, b)


def test_reader_pipe_eof_black_frames(tmp_path, fake_ffmpeg):
    """Pipe EOF (short read) degrades to black frames, same contract as the
    cv2 backend (reference PredictAndGenerate.py:222-225)."""
    path = tmp_path / "short.mp4"
    write_synthetic_video(path, 5)
    with VideoReader(str(path), begin=0, backend="ffmpeg") as reader:
        frames = list(reader.frames(0, 8))
    assert len(frames) == 8
    assert frames[4].any()
    for f in frames[5:]:
        assert not f.any()


def test_reader_close_mid_stream_reaps_child(tmp_path, fake_ffmpeg):
    """Abandoning a pipe reader mid-stream (segment worker error paths) must
    reap the decoder — terminate() alone leaves a zombie per reader."""
    path = tmp_path / "in.mp4"
    write_synthetic_video(path, 30)
    reader = VideoReader(str(path), begin=0, backend="ffmpeg")
    assert reader.read() is not None  # child alive and producing
    proc = reader._proc
    reader.close()
    assert proc.returncode is not None  # reaped, not just signalled
    assert reader._proc is None


def test_writer_encode_pipe_end_to_end(tmp_path, fake_ffmpeg):
    """write_clip through a REAL encoder subprocess: frames cross the stdin
    pipe, the subclip decodes with the exact frame count, and the checker
    accepts the layout."""
    subdir = str(tmp_path / "sub") + os.sep
    writer = SubclipWriter(subdir, FPS, W, H, backend="auto")
    assert writer.backend == "ffmpeg"
    rng = np.random.default_rng(3)
    frames = rng.integers(0, 256, (10, H, W, 3), dtype=np.uint8)
    writer.write_clip(0, list(frames[:6]))
    writer.write_clip(6, list(frames[6:]))
    writer.close()
    assert sorted_subclips(subdir) == ["0_5.mp4", "6_9.mp4"]
    assert check_subclips(subdir) == []
    _, n, w, h = probe_video(os.path.join(subdir, "0_5.mp4"))
    assert (n, w, h) == (6, W, H)


def test_writer_production_argv_roundtrip(tmp_path, fake_ffmpeg):
    """The orchestrator's exact argv (get_ffmpeg_config: rawvideo rgb24 at
    DOUBLE width, reference SupportFunction.py:184-201) drives the encoder
    correctly end to end."""
    video = tmp_path / "in.mp4"
    write_synthetic_video(video, 4)
    n, config = get_ffmpeg_config(str(video), device="cpu")
    assert n == 4
    subdir = str(tmp_path / "sub") + os.sep
    writer = SubclipWriter(subdir, FPS, 2 * W, H, ffmpeg_config=config,
                           backend="ffmpeg")
    sbs = np.random.default_rng(0).integers(0, 256, (5, H, 2 * W, 3),
                                            dtype=np.uint8)
    writer.write_clip(0, list(sbs))
    writer.close()
    _, n, w, h = probe_video(os.path.join(subdir, "0_4.mp4"))
    assert (n, w, h) == (5, 2 * W, H)


def test_writer_survives_slow_consumer_backpressure(tmp_path, fake_ffmpeg,
                                                    monkeypatch):
    """A slow encoder fills the OS pipe buffer; the writer must block on
    stdin (not drop or error) and every frame must land."""
    monkeypatch.setenv("FAKE_FFMPEG_SLOW", "0.01")
    subdir = str(tmp_path / "sub") + os.sep
    writer = SubclipWriter(subdir, FPS, W, H, backend="ffmpeg")
    frames = [np.full((H, W, 3), i % 256, np.uint8) for i in range(40)]
    writer.write_clip(0, frames)  # 40*9216B ≈ 360 KB >> 64 KB pipe buffer
    writer.close()
    _, n, _, _ = probe_video(os.path.join(subdir, "0_39.mp4"))
    assert n == 40


def test_writer_encoder_death_mid_stream(tmp_path, fake_ffmpeg, monkeypatch):
    """Encoder dying mid-stream (OOM-kill, codec crash) while the writer is
    pushing frames: the write must raise — not hang on a full pipe, not
    pass silently — and the dead child must be reaped."""
    monkeypatch.setenv("FAKE_FFMPEG_DIE_AFTER", "2")
    subdir = str(tmp_path / "sub") + os.sep
    writer = SubclipWriter(subdir, FPS, W, H, backend="ffmpeg")
    frames = [np.zeros((H, W, 3), np.uint8)] * 40
    with pytest.raises((BrokenPipeError, OSError)):
        writer.write_clip(0, frames)
    assert writer._procs == []  # error path killed + reaped, no leak


def test_writer_failed_finalize_raises_at_reap(tmp_path, fake_ffmpeg,
                                               monkeypatch):
    """An encoder that consumes everything but exits nonzero (disk full at
    finalize) must surface at the reap point — through a REAL subprocess."""
    monkeypatch.setenv("FAKE_FFMPEG_EXIT", "3")
    subdir = str(tmp_path / "sub") + os.sep
    writer = SubclipWriter(subdir, FPS, W, H, backend="ffmpeg")
    writer.write_clip(0, [np.zeros((H, W, 3), np.uint8)] * 2)
    with pytest.raises(subprocess.CalledProcessError):
        writer.close()


def _make_subclips(tmp_path, total=9, split=5):
    subdir = str(tmp_path / "sub") + os.sep
    writer = SubclipWriter(subdir, FPS, W, H, backend="cv2")
    rng = np.random.default_rng(0)
    frames = rng.integers(0, 256, (total, H, W, 3), dtype=np.uint8)
    writer.write_clip(0, list(frames[:split]))
    writer.write_clip(split, list(frames[split:]))
    writer.close()
    return subdir


def test_combine_full_chain_carries_everything(tmp_path, fake_ffmpeg):
    """The whole combine chain as real subprocesses: concat the subclips,
    extract audio + subtitles, remux with metadata/chapters — then assert
    the output really carries all of it (sidecar) and decodes to the full
    frame count. Reference Combine_Clips.py:19-50 (which drops subs,
    chapters, and tags — we carry them)."""
    subdir = _make_subclips(tmp_path)
    orig = tmp_path / "orig.mkv"
    write_synthetic_video(orig, 9)
    fake_ffmpeg.sidecar(orig, audio=2, subs=["subrip"], chapters=3,
                        tags={"title": "The Original"})
    out = tmp_path / "out.mkv"
    assert combine_clips(subdir, str(orig), str(out),
                         workdir=str(tmp_path)) == 0
    _, n, w, h = probe_video(str(out))
    assert (n, w, h) == (9, W, H)
    assert verify_frame_count(str(orig), str(out)) == 0
    carried = fake_ffmpeg.read_sidecar(out)
    assert len(carried["audio"]) == 2
    assert [s["codec_name"] for s in carried["subs"]] == ["subrip"]
    assert len(carried["chapters"]) == 3
    assert carried["tags"] == {"title": "The Original"}
    # temps cleaned up
    leftovers = [p.name for p in tmp_path.iterdir()
                 if p.name.startswith(("temp_video", "original_", "input_"))]
    assert leftovers == []


def test_combine_mov_text_srt_transcode_fallback(tmp_path, fake_ffmpeg,
                                                 capsys):
    """mp4-style mov_text subs can't stream-copy into the Matroska side-car;
    the REAL extraction fails and the SRT transcode retry succeeds — the
    output carries subrip subs and the note is printed."""
    subdir = _make_subclips(tmp_path)
    orig = tmp_path / "orig.mp4"
    write_synthetic_video(orig, 9)
    fake_ffmpeg.sidecar(orig, audio=1, subs=["mov_text"])
    out = tmp_path / "out.mkv"
    combine_clips(subdir, str(orig), str(out), workdir=str(tmp_path))
    carried = fake_ffmpeg.read_sidecar(out)
    assert [s["codec_name"] for s in carried["subs"]] == ["subrip"]
    assert len(carried["audio"]) == 1
    assert "transcoded to SRT" in capsys.readouterr().out


def test_combine_mp4_output_retries_without_subs(tmp_path, fake_ffmpeg,
                                                 capsys):
    """An .mp4 OUTPUT rejects the subrip copy at the remux (real container
    semantics); the chain must retry audio-only and warn — the output still
    lands with audio."""
    subdir = _make_subclips(tmp_path)
    orig = tmp_path / "orig.mkv"
    write_synthetic_video(orig, 9)
    fake_ffmpeg.sidecar(orig, audio=1, subs=["subrip"])
    out = tmp_path / "out.mp4"
    combine_clips(subdir, str(orig), str(out), workdir=str(tmp_path))
    carried = fake_ffmpeg.read_sidecar(out)
    assert len(carried["audio"]) == 1 and carried["subs"] == []
    assert "subtitle tracks dropped" in capsys.readouterr().out
    _, n, _, _ = probe_video(str(out))
    assert n == 9


def test_combine_bitmap_subs_dropped_with_warning(tmp_path, fake_ffmpeg,
                                                  capsys):
    """Bitmap subtitles (PGS) survive neither copy-to-mks nor SRT transcode:
    both REAL extraction attempts fail; the combine proceeds without subs
    and warns."""
    subdir = _make_subclips(tmp_path)
    orig = tmp_path / "orig.mkv"
    write_synthetic_video(orig, 9)
    fake_ffmpeg.sidecar(orig, audio=1, subs=["hdmv_pgs_subtitle"])
    out = tmp_path / "out.mkv"
    combine_clips(subdir, str(orig), str(out), workdir=str(tmp_path))
    carried = fake_ffmpeg.read_sidecar(out)
    assert len(carried["audio"]) == 1 and carried["subs"] == []
    assert "could not be extracted" in capsys.readouterr().out


def test_combine_plain_source_skips_remux(tmp_path, fake_ffmpeg):
    """A source the REAL ffprobe double reports as bare (no audio/subs/
    chapters/tags) takes the O(1) rename: the output is the concat result
    itself and no remux sidecar exists."""
    subdir = _make_subclips(tmp_path)
    orig = tmp_path / "orig.mkv"
    write_synthetic_video(orig, 9)  # no sidecar: probe reports all-empty
    out = tmp_path / "out.mkv"
    combine_clips(subdir, str(orig), str(out), workdir=str(tmp_path))
    _, n, _, _ = probe_video(str(out))
    assert n == 9
    assert not os.path.exists(str(out) + ".streams.json")  # no remux ran


def test_combine_just_combine_skips_audio(tmp_path, fake_ffmpeg):
    """repair_mode 3 debug path (reference PredictAndGenerate.py:417-419):
    concat only, no audio extraction even when the original has audio."""
    subdir = _make_subclips(tmp_path)
    orig = tmp_path / "orig.mkv"
    write_synthetic_video(orig, 9)
    fake_ffmpeg.sidecar(orig, audio=2)
    out = tmp_path / "out.mkv"
    combine_clips(subdir, str(orig), str(out), just_combine=1,
                  workdir=str(tmp_path))
    _, n, _, _ = probe_video(str(out))
    assert n == 9
    assert not os.path.exists(str(out) + ".streams.json")


def test_combine_concat_list_quoting_real_parse(tmp_path, fake_ffmpeg):
    """A subclip directory containing an apostrophe exercises the concat
    list's close-escape-reopen quoting against a REAL parser."""
    subdir = str(tmp_path / "O'Brien clips") + os.sep
    writer = SubclipWriter(subdir, FPS, W, H, backend="cv2")
    frames = np.random.default_rng(0).integers(0, 256, (6, H, W, 3),
                                               dtype=np.uint8)
    writer.write_clip(0, list(frames))
    writer.close()
    orig = tmp_path / "orig.mkv"
    write_synthetic_video(orig, 6)
    out = tmp_path / "out.mkv"
    combine_clips(subdir, str(orig), str(out), workdir=str(tmp_path))
    _, n, _, _ = probe_video(str(out))
    assert n == 6


def test_get_length_via_real_ffprobe(tmp_path, fake_ffmpeg):
    """Duration probe through a REAL ffprobe subprocess (reference
    SupportFunction.py:43-49)."""
    video = tmp_path / "in.mp4"
    write_synthetic_video(video, 20)
    assert find_binary("ffprobe") == fake_ffmpeg.ffprobe
    assert abs(get_length(str(video)) - 20 / FPS) < 0.25


def test_probe_original_parses_real_ffprobe_json(tmp_path, fake_ffmpeg):
    """_probe_original against the double's REAL JSON output: counts and
    the boilerplate-tag filter."""
    from vr_video_generator_tpu.video.combine import _probe_original

    orig = tmp_path / "orig.mkv"
    write_synthetic_video(orig, 5)
    fake_ffmpeg.sidecar(orig, audio=2, subs=["subrip", "ass"], chapters=1,
                        tags={"ENCODER": "x264"})  # boilerplate-only
    probe = _probe_original(str(orig))
    assert probe == {"audio": 2, "subs": 2, "chapters": 1, "tags": False}
    fake_ffmpeg.sidecar(orig, tags={"title": "real tag"})
    assert _probe_original(str(orig))["tags"] is True


@pytest.mark.slow
def test_cli_end_to_end_through_real_ffmpeg(tmp_path, fake_ffmpeg,
                                            monkeypatch):
    """The capstone: the FULL conversion (decode pipe -> depth+warp ->
    encode pipes -> integrity check -> concat+audio remux) with every
    ffmpeg/ffprobe invocation a real subprocess. The production I/O path
    end to end, no fakes inside the process."""
    monkeypatch.chdir(tmp_path)
    video = tmp_path / "in.mp4"
    write_synthetic_video(video, 14)
    fake_ffmpeg.sidecar(video, audio=1, subs=["subrip"], chapters=2,
                        tags={"title": "e2e"})
    from vr_video_generator_tpu.cli import main

    out = tmp_path / "out.mkv"
    rc = main([
        "--VideoDir", str(video), "--OutputDir", str(out),
        "--DebugDir", str(tmp_path / "Debug") + os.sep,
        "--SubClipDir", str(tmp_path / "Subclip") + os.sep,
        "--Max_Frame_Count", "6", "--batch_size", "4", "--input_size", "56",
        "--compute_dtype", "float32", "--allow_random_weights",
    ])
    assert rc == 0
    subdir = str(tmp_path / "Subclip") + os.sep
    assert sorted_subclips(subdir) == ["0_5.mp4", "6_11.mp4", "12_13.mp4"]
    assert check_subclips(subdir) == []
    _, n, w, h = probe_video(str(out))
    assert (n, w, h) == (14, 2 * W, H)
    carried = fake_ffmpeg.read_sidecar(out)
    assert len(carried["audio"]) == 1
    assert [s["codec_name"] for s in carried["subs"]] == ["subrip"]
    assert len(carried["chapters"]) == 2
    assert carried["tags"] == {"title": "e2e"}
