"""Subclip concatenation + audio remux — parity with reference Combine_Clips.py.

ffmpeg path: concat demuxer with stream copy, extract every audio track from
the original to .mka, remux (reference Combine_Clips.py:19-42); soft subtitle
tracks are carried too (a capability the reference lacks — it drops them).
cv2 fallback (no ffmpeg binary): re-encode concat, video only.
"""

from __future__ import annotations

import os
import subprocess
from typing import List

import cv2

from vr_video_generator_tpu.utils.logging import print_flush
from vr_video_generator_tpu.video.reader import find_binary, probe_video


def sorted_subclips(subclip_dir: str) -> List[str]:
    """Subclip filenames sorted by numeric begin-frame (reference
    Combine_Clips.py:9-10 — '*4' filter keeps .mp4 only)."""
    files = [f for f in os.listdir(subclip_dir) if f.endswith("4")]
    return sorted(files, key=lambda x: int(os.path.splitext(x)[0].split("_")[0]))


def combine_clips(subclip_dir: str, original_path: str, output_path: str,
                  just_combine: int = 0, workdir: str = ".") -> int:
    """Concatenate subclips; just_combine=1 skips the audio remux (the
    reference's repair_mode 3 debug path, PredictAndGenerate.py:417-419)."""
    ffmpeg = find_binary("ffmpeg")
    clips = sorted_subclips(subclip_dir)
    if not clips:
        raise FileNotFoundError(f"no subclips in {subclip_dir}")

    if ffmpeg:
        file_list_path = os.path.join(workdir, "input_list.txt")
        temp_video = os.path.join(workdir, "temp_video.mkv")
        audio_path = os.path.join(workdir, "original_audio.mka")
        subs_path = os.path.join(workdir, "original_subs.mks")
        try:
            with open(file_list_path, "w+") as f:
                for name in clips:
                    f.write(f"file '{os.path.abspath(os.path.join(subclip_dir, name))}'\n")
            subprocess.run([ffmpeg, "-f", "concat", "-safe", "0", "-y",
                            "-i", file_list_path, "-c", "copy", temp_video],
                           check=True)
            if just_combine == 1:
                os.replace(temp_video, output_path)
                return 0
            has_audio = subprocess.run(
                [ffmpeg, "-y", "-i", original_path, "-map", "0:a", "-c:a",
                 "copy", audio_path]).returncode == 0
            # Capability win over the reference (Combine_Clips.py:19-42
            # remuxes audio only): soft subtitle tracks ride along too, via a
            # Matroska side-car. If the output container rejects the subtitle
            # copy (e.g. .mp4 + srt), retry without subtitles instead of
            # failing.
            has_subs = subprocess.run(
                [ffmpeg, "-y", "-i", original_path, "-map", "0:s", "-c:s",
                 "copy", subs_path]).returncode == 0

            def _remux(with_subs: bool) -> "subprocess.CompletedProcess":
                cmd = [ffmpeg, "-y", "-i", temp_video]
                maps = ["-map", "0:v"]
                idx = 1
                if has_audio:
                    cmd += ["-i", audio_path]
                    maps += ["-map", f"{idx}:a"]
                    idx += 1
                if with_subs:
                    cmd += ["-i", subs_path]
                    maps += ["-map", f"{idx}:s"]
                    idx += 1
                # global metadata + chapters from the original (no-ops when
                # the source has none) — the reference's remux drops both
                cmd += ["-i", original_path]
                maps += ["-map_metadata", str(idx), "-map_chapters", str(idx)]
                cmd += maps + ["-c", "copy", output_path]
                return subprocess.run(cmd)

            # Remux even for video-only sources so global metadata and
            # chapters always carry.
            proc = _remux(has_subs)
            if proc.returncode != 0 and has_subs:
                proc = _remux(False)
                if proc.returncode == 0:
                    print_flush("WARNING: output container rejected the "
                                "subtitle copy; subtitle tracks dropped "
                                "(use a .mkv output to keep them)")
            if proc.returncode != 0:
                if has_audio:
                    # losing audio is a hard failure (reference parity);
                    # keep the failing argv for diagnostics
                    raise subprocess.CalledProcessError(proc.returncode,
                                                        proc.args)
                print_flush("WARNING: metadata remux failed; output carries "
                            "the combined video only")
                os.replace(temp_video, output_path)
        finally:
            for p in (temp_video, audio_path, subs_path, file_list_path):
                try:
                    os.remove(p)
                except OSError:
                    pass
        return 0

    # cv2 fallback: re-encode concat, no audio.
    first = os.path.join(subclip_dir, clips[0])
    fps, _, width, height = probe_video(first)
    writer = cv2.VideoWriter(output_path, cv2.VideoWriter_fourcc(*"mp4v"),
                             fps, (width, height))
    if not writer.isOpened():
        raise RuntimeError(f"cv2.VideoWriter failed to open {output_path}")
    for name in clips:
        cap = cv2.VideoCapture(os.path.join(subclip_dir, name))
        while True:
            ok, frame = cap.read()
            if not ok:
                break
            writer.write(frame)
        cap.release()
    writer.release()
    return 0


def verify_frame_count(original_path: str, output_path: str,
                       verbose: bool = False) -> int:
    """Post-combine frame-count check (reference Combine_Clips.py:56-62);
    returns the absolute difference. ``verbose`` prints the reference's
    comparison lines (each file probed exactly once)."""
    _, n_orig, _, _ = probe_video(original_path)
    _, n_out, _, _ = probe_video(output_path)
    if verbose:
        print_flush("These frames count should be the same")
        print_flush(f"Original: {n_orig} output: {n_out}, "
                    f"difference: {abs(n_out - n_orig)}")
    return abs(n_out - n_orig)
