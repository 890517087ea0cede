"""Video I/O tier tests: reader, subclip writer, combiner, integrity checker,
and the full CLI end-to-end on a synthetic clip (BASELINE config 1 analog:
CPU-runnable tiny run)."""

import os

import cv2
import numpy as np
import pytest

from vr_video_generator_tpu.video.check import check_subclips, parse_clip_name
from vr_video_generator_tpu.video.combine import combine_clips, sorted_subclips
from vr_video_generator_tpu.video.reader import VideoReader, probe_video
from vr_video_generator_tpu.video.writer import SubclipWriter

H, W, FPS = 48, 64, 10.0


def write_synthetic_video(path, n_frames, h=H, w=W, fps=FPS):
    writer = cv2.VideoWriter(str(path), cv2.VideoWriter_fourcc(*"mp4v"),
                             fps, (w, h))
    assert writer.isOpened()
    rng = np.random.default_rng(7)
    frames = []
    for i in range(n_frames):
        frame = np.full((h, w, 3), i * 9 % 256, np.uint8)
        frame[:, : w // 3] = rng.integers(0, 255, 3, dtype=np.uint8)
        frames.append(frame)
        writer.write(frame[:, :, ::-1])
    writer.release()
    return frames


def test_reader_probe_and_seek(tmp_path):
    path = tmp_path / "in.mp4"
    write_synthetic_video(path, 12)
    fps, n, w, h = probe_video(str(path))
    assert (n, w, h) == (12, W, H)
    with VideoReader(str(path), begin=5) as reader:
        frames = list(reader.frames(5, 12))
    assert len(frames) == 7
    assert frames[0].shape == (H, W, 3)


def test_subclip_writer_and_checker(tmp_path):
    subdir = str(tmp_path / "sub") + os.sep
    writer = SubclipWriter(subdir, FPS, W, H, backend="cv2")
    rng = np.random.default_rng(0)
    frames = rng.integers(0, 256, (10, H, W, 3), dtype=np.uint8)
    writer.write_clip(0, list(frames[:6]))
    writer.write_clip(6, list(frames[6:]))
    writer.close()
    assert sorted_subclips(subdir) == ["0_5.mp4", "6_9.mp4"]
    assert parse_clip_name("6_9.mp4") == (6, 9)
    assert check_subclips(subdir) == []


def test_checker_finds_gap_and_length_issue(tmp_path):
    subdir = str(tmp_path / "sub") + os.sep
    writer = SubclipWriter(subdir, FPS, W, H, backend="cv2")
    rng = np.random.default_rng(0)
    frames = rng.integers(0, 256, (12, H, W, 3), dtype=np.uint8)
    writer.write_clip(0, list(frames[:4]))
    writer.write_clip(6, list(frames[6:10]))   # gap: frames 4-5 missing
    writer.close()
    # corrupt the name of the second clip to claim a wrong length
    os.rename(os.path.join(subdir, "6_9.mp4"), os.path.join(subdir, "6_10.mp4"))
    issues = check_subclips(subdir)
    kinds = sorted(i.kind for i in issues)
    assert kinds == ["continuity", "length"]
    length_issue = next(i for i in issues if i.kind == "length")
    assert length_issue.repair_range == (6, 11)
    continuity_issue = next(i for i in issues if i.kind == "continuity")
    assert continuity_issue.repair_range == (4, 6)


def test_checker_catches_one_frame_gap(tmp_path):
    """A genuine 1-frame gap must be flagged (the old predicate accepted
    end == next_begin, which masked exactly this case)."""
    subdir = str(tmp_path / "sub") + os.sep
    writer = SubclipWriter(subdir, FPS, W, H, backend="cv2")
    rng = np.random.default_rng(0)
    frames = rng.integers(0, 256, (10, H, W, 3), dtype=np.uint8)
    writer.write_clip(0, list(frames[:6]))     # 0_5
    writer.write_clip(7, list(frames[7:]))     # 7_9: frame 6 missing
    writer.close()
    issues = check_subclips(subdir)
    assert [(i.kind, i.repair_range) for i in issues] == [("continuity", (6, 7))]


def test_checker_catches_overlapping_clips(tmp_path):
    """Clips 0_5 + 5_9 double-own frame 5 under the writer's end-inclusive
    naming; the later clip is dropped and ONLY its tail past the kept clip
    is queued for repair — a (5, 10) full-range repair would regenerate
    5_9.mp4 and re-create the very overlap just flagged, forever."""
    subdir = str(tmp_path / "sub") + os.sep
    writer = SubclipWriter(subdir, FPS, W, H, backend="cv2")
    rng = np.random.default_rng(0)
    frames = rng.integers(0, 256, (11, H, W, 3), dtype=np.uint8)
    writer.write_clip(0, list(frames[:6]))     # 0_5
    writer.write_clip(5, list(frames[5:10]))   # 5_9 (overlap at frame 5)
    writer.close()
    issues = check_subclips(subdir, remove_bad=True)
    assert [(i.kind, i.filename, i.repair_range) for i in issues] == [
        ("continuity", "5_9.mp4", (6, 10))]
    assert sorted_subclips(subdir) == ["0_5.mp4"]
    # repairing that range yields a clean, overlap-free layout
    writer = SubclipWriter(subdir, FPS, W, H, backend="cv2")
    writer.write_clip(6, list(frames[6:10]))   # 6_9
    writer.close()
    assert check_subclips(subdir) == []


def test_checker_fully_contained_clip_needs_no_repair(tmp_path):
    """A clip fully inside the kept one (0_9 + 3_6) is pure duplication:
    removal alone fixes it, so its repair range is empty."""
    subdir = str(tmp_path / "sub") + os.sep
    writer = SubclipWriter(subdir, FPS, W, H, backend="cv2")
    rng = np.random.default_rng(1)
    frames = rng.integers(0, 256, (10, H, W, 3), dtype=np.uint8)
    writer.write_clip(0, list(frames))         # 0_9
    writer.write_clip(3, list(frames[3:7]))    # 3_6, contained
    writer.close()
    issues = check_subclips(subdir, remove_bad=True)
    assert [(i.kind, i.filename, i.repair_range) for i in issues] == [
        ("continuity", "3_6.mp4", (7, 7))]
    assert sorted_subclips(subdir) == ["0_9.mp4"]
    assert check_subclips(subdir) == []


def test_checker_double_bad_clip_removed_once(tmp_path):
    """A clip that is BOTH short and overlapping is removed exactly once
    (regression: os.remove raised FileNotFoundError on the second attempt
    and aborted the scan). The overlap verdict subsumes the length one —
    the clip is dropped and only its non-owned tail repaired, so emitting a
    full-range length issue too would regenerate the overlap."""
    import cv2

    subdir = str(tmp_path / "sub") + os.sep
    writer = SubclipWriter(subdir, FPS, W, H, backend="cv2")
    rng = np.random.default_rng(0)
    frames = rng.integers(0, 256, (10, H, W, 3), dtype=np.uint8)
    writer.write_clip(0, list(frames[:6]))     # 0_5
    writer.close()
    # 5_9 claims 5 frames but holds only 3 AND overlaps frame 5
    bad = os.path.join(subdir, "5_9.mp4")
    wr = cv2.VideoWriter(bad, cv2.VideoWriter_fourcc(*"mp4v"), FPS, (W, H))
    for f in frames[5:8]:
        wr.write(f[:, :, ::-1])
    wr.release()
    issues = check_subclips(subdir, remove_bad=True)
    assert [(i.kind, i.filename, i.repair_range) for i in issues] == [
        ("continuity", "5_9.mp4", (6, 10))]
    assert sorted_subclips(subdir) == ["0_5.mp4"]


def test_auto_backend_policy():
    from vr_video_generator_tpu.video.reader import pick_auto_backend
    assert pick_auto_backend(0, "/usr/bin/ffmpeg") == "ffmpeg"
    assert pick_auto_backend(100, "/usr/bin/ffmpeg") == "cv2"
    assert pick_auto_backend(0, None) == "cv2"
    assert pick_auto_backend(100, None) == "cv2"


# frame-exact-seek coverage lives in tests/test_ffmpeg_behavior.py
# (test_reader_pipe_frame_exact_seek): it always runs against the behavioral
# double and ALSO against a real ffmpeg binary when the host has one — no
# environment skip either way.


def test_nvenc_argv_parity(tmp_path):
    """--encoder_device nvidia argv must match the reference's hevc_nvenc
    flag set (reference SupportFunction.py:202-215) and the cpu path its
    libopenh264 ladder (:197-201), around the same rawvideo-stdin prefix."""
    from vr_video_generator_tpu.video.writer import get_ffmpeg_config

    path = tmp_path / "in.mp4"
    write_synthetic_video(path, 4)

    n, cpu = get_ffmpeg_config(str(path), device="cpu")
    assert n == 4
    # common prefix: rawvideo rgb24 stdin at DOUBLE width, -an, yuv420p
    def has_pair(argv, a, b):
        return any(argv[i] == a and argv[i + 1] == b
                   for i in range(len(argv) - 1))

    for a, b in (("-f", "rawvideo"), ("-vcodec", "rawvideo"),
                 ("-pix_fmt", "rgb24"), ("-s", f"{2 * W}x{H}"),
                 ("-i", "-"), ("-pix_fmt", "yuv420p")):
        assert has_pair(cpu, a, b), (a, b)
    assert "-an" in cpu
    i = cpu.index("-c:v")
    assert cpu[i:i + 2] == ["-c:v", "libopenh264"]
    assert cpu[cpu.index("-b:v"):][:6] == ["-b:v", "5M", "-maxrate", "10M",
                                           "-bufsize", "20M"]

    _, nv = get_ffmpeg_config(str(path), device="nvidia")
    i = nv.index("-c:v")
    # exact flag/value pairs from the reference nvidia branch, same order
    assert nv[i:] == ["-c:v", "hevc_nvenc", "-cq", "29", "-rc", "vbr",
                      "-preset", "p7", "-multipass", "0", "-tune", "5"]
    # the encoder branch is the ONLY difference between the two argvs
    assert nv[:i] == cpu[:cpu.index("-c:v")]


def test_combine_clips_cv2_fallback(tmp_path, monkeypatch):
    # force the no-ffmpeg fallback regardless of host
    monkeypatch.setenv("PATH", "")
    subdir = str(tmp_path / "sub") + os.sep
    writer = SubclipWriter(subdir, FPS, W, H, backend="cv2")
    rng = np.random.default_rng(0)
    frames = rng.integers(0, 256, (9, H, W, 3), dtype=np.uint8)
    writer.write_clip(0, list(frames[:5]))
    writer.write_clip(5, list(frames[5:]))
    writer.close()
    out = str(tmp_path / "out.mp4")
    combine_clips(subdir, str(tmp_path / "orig.mp4"), out, just_combine=1)
    _, n, w, h = probe_video(out)
    assert (n, w, h) == (9, W, H)


class _FakeFfmpeg:
    """Records every ffmpeg argv and scripts per-step return codes; creates
    the step's output file on success so downstream os.replace/cleanup work
    (no real ffmpeg binary exists on this host). An rc value may be a list,
    consumed one call at a time (for retry chains within one kind)."""

    def __init__(self, rc):
        self.rc = rc
        self.calls = []

    def classify(self, cmd):
        if "concat" in cmd:
            return "concat"
        out = cmd[-1]
        if out.endswith(".mka"):
            return "audio"
        if out.endswith(".mks"):
            return "subs"
        if any(a.endswith(".mks") for a in cmd[:-1]):
            return "remux_subs"
        return "remux"

    def __call__(self, cmd, check=False, **kw):
        import subprocess
        from types import SimpleNamespace

        self.calls.append(list(cmd))
        kind = self.classify(cmd)
        rc = self.rc.get(kind, 0)
        if isinstance(rc, list):
            rc = rc.pop(0) if rc else 0
        if rc == 0:
            with open(cmd[-1], "w") as f:
                f.write(kind)
        if check and rc != 0:
            raise subprocess.CalledProcessError(rc, cmd)
        return SimpleNamespace(returncode=rc, args=list(cmd))

    def argv(self, kind):
        return [c for c in self.calls if self.classify(c) == kind]


def _combine_with_fake(tmp_path, monkeypatch, rc, probe=None,
                       out_name="out.mkv"):
    """probe: what _probe_original reports (None = ffprobe unavailable,
    the conservative carry-everything default this host exercises)."""
    import vr_video_generator_tpu.video.combine as cmb

    subdir = tmp_path / "sub"
    subdir.mkdir()
    (subdir / "0_4.mp4").write_bytes(b"clip")
    fake = _FakeFfmpeg(rc)
    monkeypatch.setattr(cmb, "find_binary", lambda name: "ffmpeg")
    monkeypatch.setattr(cmb.subprocess, "run", fake)
    monkeypatch.setattr(cmb, "_probe_original", lambda path: probe)
    out = tmp_path / out_name
    cmb.combine_clips(str(subdir) + os.sep, str(tmp_path / "orig.mkv"),
                      str(out), workdir=str(tmp_path))
    return fake, out


def test_combine_remux_carries_audio_and_subtitles(tmp_path, monkeypatch):
    """Full-success path: one remux with the audio .mka AND subtitle .mks
    side-cars mapped in (subtitle carry is a capability the reference's
    Combine_Clips.py:19-42 lacks)."""
    fake, out = _combine_with_fake(tmp_path, monkeypatch, rc={})
    (remux,) = fake.argv("remux_subs")
    # the original rides along as the last input for metadata/chapters
    assert str(tmp_path / "orig.mkv") in remux
    assert remux[-9:] == ["-map", "2:s", "-map_metadata", "3",
                          "-map_chapters", "3", "-c", "copy", str(out)]
    assert ["-map", "0:v", "-map", "1:a"] == remux[-13:-9]
    assert out.exists() and not fake.argv("remux")
    # side-cars and concat temp are cleaned up afterwards
    assert not list(tmp_path.glob("original_*")) and \
        not list(tmp_path.glob("temp_video*"))


def test_combine_remux_retries_without_subs(tmp_path, monkeypatch, capsys):
    """If the output container rejects the subtitle copy, the combine retries
    audio-only instead of failing — and says so."""
    fake, out = _combine_with_fake(tmp_path, monkeypatch,
                                   rc={"remux_subs": 1})
    assert len(fake.argv("remux_subs")) == 1 and len(fake.argv("remux")) == 1
    (retry,) = fake.argv("remux")
    assert retry[-11:-3] == ["-map", "0:v", "-map", "1:a",
                             "-map_metadata", "2", "-map_chapters", "2"]
    assert out.exists()
    assert "subtitle tracks dropped" in capsys.readouterr().out


def test_combine_subs_only_retry_still_carries_metadata(tmp_path, monkeypatch):
    """No audio + failing subtitle remux retries metadata-only (the concat
    video would lose the original's global metadata and chapters)."""
    fake, out = _combine_with_fake(tmp_path, monkeypatch,
                                   rc={"audio": 1, "remux_subs": 1})
    (retry,) = fake.argv("remux")
    assert retry[-9:-3] == ["-map", "0:v",
                            "-map_metadata", "1", "-map_chapters", "1"]
    assert out.exists() and out.read_text() == "remux"


def test_combine_video_only_source_still_remuxes_metadata(tmp_path,
                                                          monkeypatch):
    """A source with no audio and no subtitles (e.g. a chaptered video-only
    mkv) still gets the metadata/chapters remux instead of a bare rename."""
    fake, out = _combine_with_fake(tmp_path, monkeypatch,
                                   rc={"audio": 1, "subs": 1})
    (remux,) = fake.argv("remux")
    assert remux[-9:-3] == ["-map", "0:v",
                            "-map_metadata", "1", "-map_chapters", "1"]
    assert out.exists() and out.read_text() == "remux"
    assert not fake.argv("remux_subs")


def test_combine_metadata_remux_failure_degrades_to_concat(tmp_path,
                                                           monkeypatch,
                                                           capsys):
    """Video-only source whose metadata remux fails falls back to the plain
    concat output with a warning (no audio to lose -> not a hard failure)."""
    fake, out = _combine_with_fake(tmp_path, monkeypatch,
                                   rc={"audio": 1, "subs": 1, "remux": 1})
    assert out.exists() and out.read_text() == "concat"
    assert "metadata remux failed" in capsys.readouterr().out


def test_combine_audio_remux_failure_raises_with_argv_and_cleans(tmp_path,
                                                                 monkeypatch):
    """Losing audio is a hard failure: the raise carries the actual failing
    ffmpeg argv, and the side-car temps are still cleaned up."""
    import subprocess as sp

    with pytest.raises(sp.CalledProcessError) as ei:
        _combine_with_fake(tmp_path, monkeypatch,
                           rc={"subs": 1, "remux": 1})
    assert "-map_chapters" in ei.value.cmd  # real argv, not a placeholder
    leftovers = [p.name for p in tmp_path.iterdir()
                 if p.name.startswith(("temp_video", "original_", "input_"))]
    assert leftovers == []


def test_concat_entry_escapes_quotes():
    """The concat demuxer parses `file '<path>'` with shell-style quoting —
    a path containing an apostrophe must use the close-escape-reopen form or
    the entry truncates at the quote."""
    from vr_video_generator_tpu.video.combine import _concat_entry

    assert _concat_entry("/a/plain/path.mp4") == "file '/a/plain/path.mp4'\n"
    assert _concat_entry("/home/O'Brien/0_4.mp4") == \
        "file '/home/O'\\''Brien/0_4.mp4'\n"


def test_combine_in_place_output_stages_then_replaces(tmp_path, monkeypatch):
    """output == original (overwrite-in-place): ffmpeg refuses same-file
    input/output, so the remux must write a staged sibling and replace the
    original only afterwards."""
    (tmp_path / "orig.mkv").write_bytes(b"original")
    fake, out = _combine_with_fake(tmp_path, monkeypatch, rc={},
                                   out_name="orig.mkv")
    (remux,) = fake.argv("remux_subs")
    assert remux[-1] != str(out)  # wrote a staged temp, not the original
    assert os.path.basename(remux[-1]).endswith("orig.mkv")
    assert out.read_text() == "remux_subs"  # ...then replaced over it
    assert [p.name for p in tmp_path.iterdir()
            if p.name.startswith(".combine_")] == []


def test_combine_probe_empty_source_skips_remux(tmp_path, monkeypatch):
    """When ffprobe proves the original has no audio, no subtitles, no
    chapters, and no non-boilerplate tags, the combine keeps the O(1)
    rename instead of rewriting the whole container."""
    probe = {"audio": 0, "subs": 0, "chapters": 0, "tags": False}
    fake, out = _combine_with_fake(tmp_path, monkeypatch, rc={}, probe=probe)
    assert out.read_text() == "concat"  # temp_video renamed, no remux
    assert not fake.argv("remux") and not fake.argv("remux_subs")
    assert not fake.argv("audio") and not fake.argv("subs")  # not attempted


def test_combine_probe_chapters_force_remux(tmp_path, monkeypatch):
    """A chaptered but audio-less/sub-less source still pays the metadata
    remux — chapters must carry."""
    probe = {"audio": 0, "subs": 0, "chapters": 3, "tags": False}
    fake, out = _combine_with_fake(tmp_path, monkeypatch, rc={}, probe=probe)
    (remux,) = fake.argv("remux")
    assert remux[-9:-3] == ["-map", "0:v",
                            "-map_metadata", "1", "-map_chapters", "1"]
    assert out.read_text() == "remux"


def test_combine_probed_audio_extraction_failure_is_hard(tmp_path,
                                                         monkeypatch):
    """If ffprobe says audio streams exist but extraction fails, emitting a
    silent output would be quiet data loss — must raise."""
    probe = {"audio": 2, "subs": 0, "chapters": 0, "tags": False}
    with pytest.raises(RuntimeError, match="audio stream"):
        _combine_with_fake(tmp_path, monkeypatch, rc={"audio": 1},
                           probe=probe)


def test_combine_subs_srt_transcode_fallback(tmp_path, monkeypatch, capsys):
    """Subtitle codecs Matroska rejects as-is (e.g. mp4 mov_text) get a
    second extraction attempt transcoding to SRT — and a note says so."""
    probe = {"audio": 1, "subs": 1, "chapters": 0, "tags": False}
    fake, out = _combine_with_fake(tmp_path, monkeypatch,
                                   rc={"subs": [1, 0]}, probe=probe)
    subs_calls = fake.argv("subs")
    assert len(subs_calls) == 2
    assert ["-c:s", "copy"] == subs_calls[0][-3:-1]
    assert ["-c:s", "srt"] == subs_calls[1][-3:-1]
    assert fake.argv("remux_subs") and out.exists()
    assert "transcoded to SRT" in capsys.readouterr().out


def test_combine_unextractable_subs_warn(tmp_path, monkeypatch, capsys):
    """Probed subtitle streams that survive neither copy nor SRT transcode
    are dropped WITH a warning (silent loss contradicted the docs)."""
    probe = {"audio": 1, "subs": 1, "chapters": 0, "tags": False}
    fake, out = _combine_with_fake(tmp_path, monkeypatch,
                                   rc={"subs": [1, 1]}, probe=probe)
    assert len(fake.argv("subs")) == 2 and not fake.argv("remux_subs")
    assert out.exists()
    assert "could not be extracted" in capsys.readouterr().out


def test_combine_default_workdir_is_output_dir(tmp_path, monkeypatch):
    """No workdir argument: temps land beside the output (always writable),
    not in the process cwd — a read-only cwd must not break the combine."""
    import vr_video_generator_tpu.video.combine as cmb

    subdir = tmp_path / "sub"
    subdir.mkdir()
    (subdir / "0_4.mp4").write_bytes(b"clip")
    outdir = tmp_path / "outdir"
    outdir.mkdir()
    fake = _FakeFfmpeg({})
    monkeypatch.setattr(cmb, "find_binary", lambda name: "ffmpeg")
    monkeypatch.setattr(cmb.subprocess, "run", fake)
    monkeypatch.setattr(cmb, "_probe_original", lambda path: None)
    monkeypatch.chdir(tmp_path)  # cwd != output dir
    cmb.combine_clips(str(subdir) + os.sep, str(tmp_path / "orig.mkv"),
                      str(outdir / "out.mkv"))
    (concat,) = fake.argv("concat")
    list_path = concat[concat.index("-i") + 1]
    assert os.path.dirname(list_path) == str(outdir)
    assert (outdir / "out.mkv").exists()
    assert [p.name for p in tmp_path.iterdir()
            if p.name.startswith(("temp_video", "original_", "input_"))] == []


@pytest.mark.slow
def test_cli_end_to_end(tmp_path, monkeypatch):
    """Full conversion on a tiny clip with random vits weights at a reduced
    input size — the CPU-runnable end-to-end slice (SURVEY.md §7 step 3)."""
    monkeypatch.chdir(tmp_path)
    video = tmp_path / "in.mp4"
    write_synthetic_video(video, 14)
    from vr_video_generator_tpu.cli import main

    rc = main([
        "--VideoDir", str(video), "--OutputDir", str(tmp_path / "out.mkv"),
        "--DebugDir", str(tmp_path / "Debug") + os.sep,
        "--SubClipDir", str(tmp_path / "Subclip") + os.sep,
        "--Max_Frame_Count", "6", "--batch_size", "4", "--input_size", "56",
        "--compute_dtype", "float32", "--allow_random_weights",
        "--unknown_flag_is_ignored", "1",
    ])
    assert rc == 0
    subdir = str(tmp_path / "Subclip") + os.sep
    clips = sorted_subclips(subdir)
    assert clips == ["0_5.mp4", "6_11.mp4", "12_13.mp4"]
    assert check_subclips(subdir) == []
    _, n, w, h = probe_video(str(tmp_path / "out.mkv"))
    assert (n, w, h) == (14, 2 * W, H)


def test_reader_black_frames_past_eof(tmp_path):
    """Decode failure degrades to black frames (reference
    PredictAndGenerate.py:222-225): frames() past the real EOF — the case a
    container whose header overstates its frame count produces — yields
    zeros instead of raising, so a worker keeps its segment contract."""
    path = tmp_path / "short.mp4"
    write_synthetic_video(path, 5)
    with VideoReader(str(path), begin=0) as reader:
        frames = list(reader.frames(0, 8))
    assert len(frames) == 8
    assert frames[4].any()  # last real frame decodes
    for f in frames[5:]:
        assert f.shape == (H, W, 3) and f.dtype == np.uint8
        assert not f.any()  # substituted black


def test_checker_random_damage_sweep(tmp_path):
    """Seeded fuzz of check_subclips: random interior damage (deleted,
    truncated, or overlapping clips) must leave only well-formed disjoint
    clips after remove_bad, with the repair ranges covering every frame
    the surviving clips lost. (Missing head/tail clips are out of contract
    — the reference checker also only scans between found clips.)"""
    from vr_video_generator_tpu.video.check import check_subclips, parse_clip_name
    from vr_video_generator_tpu.video.combine import sorted_subclips

    def write_clip(d, begin, end_incl, n_frames=None):
        n = (end_incl + 1 - begin) if n_frames is None else n_frames
        w = cv2.VideoWriter(str(d / f"{begin}_{end_incl}.mp4"),
                            cv2.VideoWriter_fourcc(*"mp4v"), FPS, (32, 24))
        for _ in range(n):
            w.write(np.zeros((24, 32, 3), np.uint8))
        w.release()

    sweep = np.random.default_rng(77)
    for trial in range(6):
        d = tmp_path / f"t{trial}"
        d.mkdir()
        # random partition of [0, total) into 3-5 clips
        n_clips = int(sweep.integers(3, 6))
        cuts = np.sort(sweep.choice(np.arange(1, 20), n_clips - 1,
                                    replace=False))
        bounds = [0, *cuts.tolist(), 20]
        spans = list(zip(bounds[:-1], bounds[1:]))
        for lo, hi in spans:
            write_clip(d, lo, hi - 1)
        # 1-2 interior corruptions
        damage = set()
        for _ in range(int(sweep.integers(1, 3))):
            which = int(sweep.integers(1, len(spans) - 1))
            lo, hi = spans[which]
            kind = int(sweep.integers(0, 3))
            if kind == 0:      # delete -> gap
                (d / f"{lo}_{hi - 1}.mp4").unlink(missing_ok=True)
            elif kind == 1:    # truncate -> length issue
                write_clip(d, lo, hi - 1, n_frames=max(1, hi - lo - 1))
            else:              # extra overlapping clip
                write_clip(d, max(0, lo - 1), hi - 1)
            damage.update(range(lo, hi))

        issues = check_subclips(str(d), remove_bad=True)
        kept = sorted_subclips(str(d))
        covered = set()
        for name in kept:
            b, e = parse_clip_name(name)
            span = set(range(b, e + 1))
            assert not (span & covered), f"trial {trial}: kept clips overlap"
            from vr_video_generator_tpu.video.reader import probe_video
            _, real_len, _, _ = probe_video(str(d / name))
            assert real_len == e + 1 - b, f"trial {trial}: kept a bad clip"
            covered |= span
        repair = set()
        for i in issues:
            repair.update(range(*i.repair_range))
        missing = set(range(0, 20)) - covered
        assert missing <= repair, (
            f"trial {trial}: frames {sorted(missing - repair)} lost but "
            f"not in any repair range (issues={issues})")


def test_get_length(tmp_path):
    """Duration probe (reference SupportFunction.py:43-49): frame_count/fps
    fallback on ffprobe-less hosts."""
    from vr_video_generator_tpu.video.reader import get_length

    video = tmp_path / "in.mp4"
    write_synthetic_video(video, 20)
    assert abs(get_length(str(video)) - 20 / FPS) < 0.25


def test_writer_raises_on_encoder_failure(tmp_path):
    """A nonzero encoder exit must raise (at the reap point), not pass
    silently — a failed finalize used to leave a truncated subclip in a
    'successful' run."""
    import sys

    fake = [sys.executable, "-c",
            "import sys; sys.stdin.buffer.read(); sys.exit(3)"]
    writer = SubclipWriter(str(tmp_path) + os.sep, FPS, W, H,
                           ffmpeg_config=fake, backend="ffmpeg")
    frames = [np.zeros((H, W, 3), np.uint8)] * 2
    writer.write_clip(0, frames)  # starts the fake encoder
    import subprocess as sp

    with pytest.raises(sp.CalledProcessError):
        writer.close()


def test_writer_forced_ffmpeg_backend_fails_at_construction(tmp_path,
                                                            monkeypatch):
    """--writer_backend ffmpeg with no binary must fail at construction with
    a clear message (like VideoReader), not with an opaque Popen TypeError
    after the first batch was already computed."""
    monkeypatch.setenv("PATH", "")
    monkeypatch.chdir(tmp_path)  # no vendored ./ffmpeg dir either
    with pytest.raises(RuntimeError, match="ffmpeg binary not found"):
        SubclipWriter(str(tmp_path) + os.sep, FPS, W, H, backend="ffmpeg")


def test_find_binary_env_override_uses_project_prefix(tmp_path, monkeypatch):
    """VRVG_FFMPEG (the project's knob prefix, like VRVG_INIT_TIMEOUT) pins
    a specific binary."""
    from vr_video_generator_tpu.video.reader import find_binary

    fake = tmp_path / "my_ffmpeg"
    fake.write_text("#!/bin/sh\n")
    monkeypatch.setenv("VRVG_FFMPEG", str(fake))
    assert find_binary("ffmpeg") == str(fake)


def test_reader_ffmpeg_argv_pins_probed_frame_size(tmp_path, monkeypatch):
    """The pipe backend must pin rawvideo output to the probed WxH (a
    mid-stream resolution change would otherwise misframe every subsequent
    fixed-size read into sheared garbage), with the frame-exact select
    filter ahead of the scale in the same chain."""
    import vr_video_generator_tpu.video.reader as rd

    video = tmp_path / "in.mp4"
    write_synthetic_video(video, 4)
    captured = {}

    class FakeProc:
        stdout = None

        def __init__(self, args, **kw):
            captured["args"] = args

    monkeypatch.setattr(rd.subprocess, "Popen", FakeProc)
    monkeypatch.setattr(rd, "find_binary",
                        lambda name: "ffmpeg" if name == "ffmpeg" else None)
    VideoReader(str(video), begin=0, backend="ffmpeg")
    args = captured["args"]
    assert args[args.index("-vf") + 1] == f"scale={W}:{H}"
    VideoReader(str(video), begin=2, backend="ffmpeg")
    args = captured["args"]
    assert args[args.index("-vf") + 1] == f"select=gte(n\\,2),scale={W}:{H}"
    assert "-vsync" in args
