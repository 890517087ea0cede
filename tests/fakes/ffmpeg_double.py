#!/usr/bin/env python3
"""Behavioral ffmpeg/ffprobe test double.

The production video tier shells out to ffmpeg/ffprobe for five distinct
jobs (reference SupportFunction.py:181-216, Combine_Clips.py:19-50):

  1. decode pipe   — ``ffmpeg -i in [-vsync 0] -vf [select=gte(n\\,B),]scale=W:H
                      -f rawvideo -pix_fmt rgb24 -``             (video/reader.py)
  2. encode pipe   — ``ffmpeg -y -f rawvideo … -i - … out.mp4``  (video/writer.py)
  3. concat demux  — ``ffmpeg -f concat -safe 0 -y -i list.txt -c copy t.mkv``
  4. side extract  — ``ffmpeg -y -i orig -map 0:a -c:a copy a.mka`` (+ subs .mks)
  5. remux         — ``ffmpeg -y -i t.mkv [-i a.mka] [-i s.mks] -i orig
                      -map 0:v [-map 1:a] [-map 2:s] -map_metadata N
                      -map_chapters N -c copy out``              (video/combine.py)

No ffmpeg binary exists on this host, so until round 4 those paths were
verified only through argv-recording monkeypatches. This double is a REAL
executable that the production code spawns as a REAL subprocess: it consumes
stdin with genuine pipe backpressure, emits rawvideo on stdout honoring the
frame-exact ``select`` filter, parses the concat list with its shell-style
quoting, and returns the same exit-code semantics real ffmpeg does for the
cases the retry chains depend on (no matching ``-map`` stream, un-copyable
subtitle codecs per container, missing concat entries).

Video essence is handled with cv2 (mp4v), which this host's OpenCV decodes
and encodes fine — the double is about SUBPROCESS BEHAVIOR (pipes, EOF,
partial frames, exit codes, file lifecycle), not codec parity.

Non-video side content (audio/subtitle streams, chapters, global tags) has
no cv2 representation, so the double uses a JSON *sidecar* convention:
``<video>.streams.json`` describes the streams beyond the video one (see
``make_sidecar``). Extraction side-cars (.mka/.mks) are written as bare JSON
stream lists; the final remux merges everything into the output's sidecar so
tests can assert exactly what was carried.

Failure-injection knobs (env vars, read by the ENCODE job only):
  FAKE_FFMPEG_SLOW=seconds   sleep per frame read — slow consumer, exercises
                             writer-side stdin backpressure;
  FAKE_FFMPEG_DIE_AFTER=N    exit(3) after N frames WITHOUT draining stdin —
                             encoder death mid-stream (writer sees EPIPE);
  FAKE_FFMPEG_EXIT=N         consume everything, then exit N — failed
                             finalize (writer must refuse at the reap);
  FAKE_FFMPEG_SPOOL=1        drain stdin to a disk spool at pipe speed and
                             encode afterwards — models real ffmpeg's
                             faster-than-encode stdin consumption so
                             SubclipWriter's max_concurrent encoder overlap
                             behaves as in production (used by the soak).
"""

from __future__ import annotations

import json
import os
import re
import shlex
import sys

# Subtitle codecs Matroska stores as-is vs only after an SRT transcode vs
# not at all (bitmap subs) — mirrors the real mux behavior the combine
# retry chain was written against.
_MKV_OK_SUBS = {"subrip", "srt", "ass", "ssa", "webvtt"}
_TEXT_SUBS = _MKV_OK_SUBS | {"mov_text", "text"}
_MP4_OK_SUBS = {"mov_text"}

SIDECAR_SUFFIX = ".streams.json"


def install_shims(bindir):
    """Write executable ffmpeg/ffprobe shims invoking this double into
    ``bindir``; returns (ffmpeg_path, ffprobe_path). The ONE place the
    shim invocation convention lives — tests/conftest.py's fixture and
    scripts/soak.py both install through here. Callers export
    VRVG_FFMPEG/VRVG_FFPROBE (and FAKE_FFMPEG_SPOOL=1 when encoder
    concurrency should match real ffmpeg's stdin draining)."""
    import stat

    os.makedirs(bindir, exist_ok=True)
    double = os.path.abspath(__file__)
    paths = []
    for name in ("ffmpeg", "ffprobe"):
        shim = os.path.join(bindir, name)
        with open(shim, "w") as f:
            f.write(f"#!/bin/sh\nexec '{sys.executable}' '{double}' "
                    f"{name} \"$@\"\n")
        os.chmod(shim, os.stat(shim).st_mode | stat.S_IXUSR | stat.S_IXGRP)
        paths.append(shim)
    return tuple(paths)


def make_sidecar(path, audio=0, subs=(), chapters=0, tags=None):
    """Test helper: describe a video file's non-video side content.

    ``subs`` is a sequence of subtitle codec names (e.g. ["mov_text"]).
    Importable from tests; the double itself only reads these files.
    """
    side = {
        "audio": [{"codec_type": "audio", "codec_name": "aac", "index": i}
                  for i in range(audio)],
        "subs": [{"codec_type": "subtitle", "codec_name": c, "index": i}
                 for i, c in enumerate(subs)],
        "chapters": [{"id": i, "start": i * 10.0} for i in range(chapters)],
        "tags": dict(tags or {}),
    }
    with open(str(path) + SIDECAR_SUFFIX, "w") as f:
        json.dump(side, f)
    return side


def _load_sidecar(path):
    try:
        with open(str(path) + SIDECAR_SUFFIX) as f:
            return json.load(f)
    except (OSError, ValueError):
        return {"audio": [], "subs": [], "chapters": [], "tags": {}}


def _err(msg, code=1):
    print(f"[fake-ffmpeg] {msg}", file=sys.stderr)
    sys.exit(code)


# ---------------------------------------------------------------------------
# argv parsing — the subset of ffmpeg grammar the production tier emits:
# interleaved per-input options, -i inputs, then output options + one output.

_VALUE_FLAGS = {
    "-v", "-f", "-vcodec", "-pix_fmt", "-s", "-r", "-vf", "-vsync",
    "-c", "-c:v", "-c:a", "-c:s", "-b:v", "-maxrate", "-bufsize",
    "-map", "-map_metadata", "-map_chapters", "-safe",
    "-cq", "-rc", "-preset", "-multipass", "-tune",
    "-show_entries", "-of",
}
_BARE_FLAGS = {"-y", "-an", "-show_streams", "-show_format", "-show_chapters"}


def parse_argv(argv):
    """Returns (inputs, output) where each input is {path, opts} and output
    is {path, opts}; opts["-map"] collects into a list."""
    inputs = []
    opts = {}
    out_path = None
    i = 0
    while i < len(argv):
        a = argv[i]
        if a == "-i":
            inputs.append({"path": argv[i + 1], "opts": opts})
            opts = {}
            i += 2
        elif a in _VALUE_FLAGS:
            if a == "-map":
                opts.setdefault("-map", []).append(argv[i + 1])
            else:
                opts[a] = argv[i + 1]
            i += 2
        elif a in _BARE_FLAGS:
            opts[a] = True
            i += 1
        elif a.startswith("-") and a != "-":
            _err(f"unknown flag {a!r} (double out of date with production argv)",
                 code=64)
        else:
            out_path = a
            i += 1
    return inputs, {"path": out_path, "opts": opts}


# ---------------------------------------------------------------------------
# ffmpeg jobs


def _probe_cv2(path):
    import cv2
    if not os.path.exists(path):
        _err(f"{path}: No such file or directory")
    cap = cv2.VideoCapture(path)
    try:
        fps = cap.get(cv2.CAP_PROP_FPS)
        n = int(cap.get(cv2.CAP_PROP_FRAME_COUNT))
        w = int(cap.get(cv2.CAP_PROP_FRAME_WIDTH))
        h = int(cap.get(cv2.CAP_PROP_FRAME_HEIGHT))
    finally:
        cap.release()
    return fps, n, w, h


def _job_decode_pipe(inp, out):
    """rawvideo rgb24 to stdout, honoring select=gte(n\\,B) + scale=W:H."""
    import cv2

    vf = out["opts"].get("-vf", "")
    begin = 0
    m = re.search(r"select=gte\(n\\?,(\d+)\)", vf)
    if m:
        begin = int(m.group(1))
    m = re.search(r"scale=(\d+):(\d+)", vf)
    scale = (int(m.group(1)), int(m.group(2))) if m else None

    if not os.path.exists(inp["path"]):
        _err(f"{inp['path']}: No such file or directory")
    cap = cv2.VideoCapture(inp["path"])
    stdout = sys.stdout.buffer
    n = 0
    try:
        while True:
            ok, bgr = cap.read()
            if not ok or bgr is None:
                break
            n += 1
            if n <= begin:          # select drops pre-begin frames: nothing
                continue            # crosses the pipe (decode-and-discard)
            if scale and (bgr.shape[1], bgr.shape[0]) != scale:
                bgr = cv2.resize(bgr, scale, interpolation=cv2.INTER_AREA)
            try:
                stdout.write(bgr[:, :, ::-1].tobytes())  # BGR -> RGB
            except BrokenPipeError:
                sys.exit(1)  # consumer closed early — real ffmpeg exits 1
        stdout.flush()
    finally:
        cap.release()
    sys.exit(0)


def _job_encode_pipe(inp, out):
    """Read rawvideo rgb24 frames from stdin until EOF; encode via cv2."""
    import time

    import cv2
    import numpy as np

    w, h = map(int, inp["opts"]["-s"].split("x"))
    fps = float(inp["opts"].get("-r", 30))
    slow = float(os.environ.get("FAKE_FFMPEG_SLOW", 0) or 0)
    die_after = int(os.environ.get("FAKE_FFMPEG_DIE_AFTER", -1) or -1)
    frame_bytes = w * h * 3

    out_dir = os.path.dirname(os.path.abspath(out["path"]))
    if not os.path.isdir(out_dir):
        _err(f"{out['path']}: No such file or directory")
    spool_path = None
    if os.environ.get("FAKE_FFMPEG_SPOOL"):
        # Drain stdin to disk at pipe speed, encode afterwards: real ffmpeg
        # consumes stdin much faster than its encoder finishes the file, so
        # the producer unblocks early and max_concurrent children overlap.
        spool_path = out["path"] + ".rawspool"
        with open(spool_path, "wb") as sp:
            while True:
                chunk = sys.stdin.buffer.read(1 << 20)
                if not chunk:
                    break
                sp.write(chunk)
        stdin = open(spool_path, "rb")
    else:
        stdin = sys.stdin.buffer
    writer = cv2.VideoWriter(out["path"], cv2.VideoWriter_fourcc(*"mp4v"),
                             fps, (w, h))
    if not writer.isOpened():
        _err(f"could not open encoder for {out['path']}")
    n = 0
    while True:
        if die_after >= 0 and n >= die_after:
            writer.release()
            sys.exit(3)  # die mid-stream, stdin NOT drained -> producer EPIPE
        raw = stdin.read(frame_bytes)
        if not raw:
            break
        while len(raw) < frame_bytes:  # pipe reads may return short
            more = stdin.read(frame_bytes - len(raw))
            if not more:
                break
            raw += more
        if len(raw) < frame_bytes:
            print("[fake-ffmpeg] dropping partial trailing frame",
                  file=sys.stderr)
            break
        frame = np.frombuffer(raw, np.uint8).reshape(h, w, 3)
        writer.write(frame[:, :, ::-1])  # RGB -> BGR
        n += 1
        if slow:
            time.sleep(slow)
    writer.release()
    if spool_path:
        stdin.close()
        os.remove(spool_path)
    sys.exit(int(os.environ.get("FAKE_FFMPEG_EXIT", 0) or 0))


def _parse_concat_list(list_path):
    """Concat demuxer list: ``file '<path>'`` lines with shell-style quoting
    (the '\\'' close-escape-reopen dance for embedded apostrophes)."""
    paths = []
    with open(list_path) as f:
        for line in f:
            line = line.strip()
            if not line or line.startswith("#"):
                continue
            if not line.startswith("file "):
                _err(f"concat list: unsupported directive {line!r}")
            try:
                parts = shlex.split(line[5:])
            except ValueError as e:
                _err(f"concat list: bad quoting {line!r}: {e}")
            if len(parts) != 1:
                _err(f"concat list: expected one path in {line!r}")
            paths.append(parts[0])
    return paths


def _job_concat(inp, out):
    import cv2

    paths = _parse_concat_list(inp["path"])
    if not paths:
        _err("concat list is empty")
    for p in paths:
        if not os.path.exists(p):
            _err(f"{p}: No such file or directory")
    fps, _, w, h = _probe_cv2(paths[0])
    writer = cv2.VideoWriter(out["path"], cv2.VideoWriter_fourcc(*"mp4v"),
                             fps, (w, h))
    if not writer.isOpened():
        _err(f"could not open encoder for {out['path']}")
    for p in paths:
        cap = cv2.VideoCapture(p)
        while True:
            ok, frame = cap.read()
            if not ok:
                break
            writer.write(frame)
        cap.release()
    writer.release()
    sys.exit(0)


def _job_extract(inp, out, kind):
    """-map 0:a / -map 0:s stream extraction to a JSON side-car."""
    side = _load_sidecar(inp["path"])
    streams = side["audio"] if kind == "a" else side["subs"]
    if not streams:
        _err(f"Stream map '0:{kind}' matches no streams")
    if kind == "s":
        codec = out["opts"].get("-c:s", "copy")
        names = {s["codec_name"] for s in streams}
        if codec == "copy" and not names <= _MKV_OK_SUBS:
            _err(f"subtitle codec(s) {sorted(names - _MKV_OK_SUBS)} not "
                 "currently supported in Matroska container")
        if codec == "srt":
            if not names <= _TEXT_SUBS:
                _err(f"cannot transcode bitmap subtitles "
                     f"{sorted(names - _TEXT_SUBS)} to SRT")
            streams = [{**s, "codec_name": "subrip"} for s in streams]
    with open(out["path"], "w") as f:
        json.dump({"streams": streams}, f)
    sys.exit(0)


def _read_side_json(path):
    try:
        with open(path) as f:
            return json.load(f)["streams"]
    except (OSError, ValueError, KeyError):
        _err(f"{path}: invalid side-car input")


def _job_remux(inputs, out):
    """-c copy remux: byte-copy input 0's video, merge mapped side streams
    and -map_metadata/-map_chapters source into the output's sidecar."""
    import shutil

    maps = out["opts"].get("-map", [])
    carried = {"audio": [], "subs": [], "chapters": [], "tags": {}}
    has_video = False
    for m in maps:
        idx_s, _, sel = m.partition(":")
        idx = int(idx_s)
        if idx >= len(inputs):
            _err(f"Invalid input file index: {idx}")
        src = inputs[idx]["path"]
        if sel == "v":
            if not os.path.exists(src):
                _err(f"{src}: No such file or directory")
            has_video = True
            video_src = src
        elif sel == "a":
            carried["audio"] = _read_side_json(src)
        elif sel == "s":
            subs = _read_side_json(src)
            names = {s["codec_name"] for s in subs}
            ext = os.path.splitext(out["path"])[1].lower()
            # container acceptance under -c copy: .mkv takes matroska-safe
            # codecs; .mp4 only mov_text — subrip into mp4 FAILS, which is
            # exactly what drives combine's retry-without-subs chain.
            ok = _MKV_OK_SUBS if ext in (".mkv", ".mks", ".webm") \
                else _MP4_OK_SUBS
            if not names <= ok:
                _err(f"subtitle codec(s) {sorted(names - ok)} not supported "
                     f"in {ext or 'output'} container")
            carried["subs"] = subs
        else:
            _err(f"unsupported map selector {m!r}")
    if not has_video:
        _err("no video stream mapped")
    for key in ("-map_metadata", "-map_chapters"):
        if key in out["opts"]:
            idx = int(out["opts"][key])
            if idx >= len(inputs):
                _err(f"Invalid input file index: {idx}")
            meta_side = _load_sidecar(inputs[idx]["path"])
            if key == "-map_metadata":
                carried["tags"] = meta_side["tags"]
            else:
                carried["chapters"] = meta_side["chapters"]
    shutil.copyfile(video_src, out["path"])
    with open(out["path"] + SIDECAR_SUFFIX, "w") as f:
        json.dump(carried, f)
    sys.exit(0)


def main_ffmpeg(argv):
    inputs, out = parse_argv(argv)
    if not inputs or out["path"] is None:
        _err("usage: need at least one -i input and one output")
    if out["path"] == "-":
        return _job_decode_pipe(inputs[0], out)
    if len(inputs) == 1 and inputs[0]["path"] == "-":
        return _job_encode_pipe(inputs[0], out)
    if inputs[0]["opts"].get("-f") == "concat":
        return _job_concat(inputs[0], out)
    maps = out["opts"].get("-map", [])
    if len(inputs) == 1 and maps in (["0:a"], ["0:s"]):
        return _job_extract(inputs[0], out, maps[0][-1])
    if maps:
        return _job_remux(inputs, out)
    _err(f"unrecognized job shape: argv={argv!r}", code=64)


# ---------------------------------------------------------------------------
# ffprobe jobs


def main_ffprobe(argv):
    inputs, out = parse_argv(argv)
    # ffprobe has no -i: the input is the trailing positional parse_argv
    # classified as "output".
    path = out["path"]
    opts = out["opts"]
    if path is None:
        _err("ffprobe: no input")
    if opts.get("-show_entries") == "format=duration":
        fps, n, _, _ = _probe_cv2(path)
        print(f"{n / fps if fps else 0.0:.6f}")
        sys.exit(0)
    if opts.get("-of") == "json":
        fps, n, w, h = _probe_cv2(path)
        side = _load_sidecar(path)
        streams = [{"codec_type": "video", "codec_name": "mpeg4",
                    "width": w, "height": h, "nb_frames": str(n)}]
        streams += side["audio"] + side["subs"]
        info = {
            "streams": streams,
            "chapters": side["chapters"],
            "format": {"duration": f"{n / fps if fps else 0.0:.6f}",
                       "tags": side["tags"]},
        }
        print(json.dumps(info))
        sys.exit(0)
    _err(f"unrecognized ffprobe shape: argv={argv!r}", code=64)


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else ""
    if mode == "ffmpeg":
        main_ffmpeg(sys.argv[2:])
    elif mode == "ffprobe":
        main_ffprobe(sys.argv[2:])
    else:
        _err("usage: ffmpeg_double.py {ffmpeg|ffprobe} ARGS...", code=64)
