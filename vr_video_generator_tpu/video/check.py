"""Subclip integrity checking and repair — parity with reference Check_Clips.py.

Every subclip's real frame count must match the count its ``{begin}_{end}``
name promises, and consecutive clips must be frame-contiguous (reference
Check_Clips.py:15-37). Issues are returned as structured records; repair
(regenerating exactly the broken ranges) is orchestrated by the runtime
(runtime/orchestrator.py), mirroring the reference's re-invocation with
--repair_mode 1.
"""

from __future__ import annotations

import dataclasses
import os
from typing import List, Tuple

from vr_video_generator_tpu.video.combine import sorted_subclips
from vr_video_generator_tpu.video.reader import probe_video


@dataclasses.dataclass(frozen=True)
class ClipIssue:
    kind: str                 # 'length' | 'continuity'
    filename: str
    repair_range: Tuple[int, int]  # [start, end) frame range to regenerate


def parse_clip_name(name: str) -> Tuple[int, int]:
    stem = os.path.splitext(name)[0]
    begin, end_inclusive = stem.split("_")
    return int(begin), int(end_inclusive)


def check_subclips(subclip_dir: str, remove_bad: bool = False) -> List[ClipIssue]:
    """Scan sorted subclips for length and continuity issues
    (reference Check_Clips.py:19-37)."""
    issues: List[ClipIssue] = []
    clips = sorted_subclips(subclip_dir)
    for i, name in enumerate(clips):
        begin, end_inclusive = parse_clip_name(name)
        path = os.path.join(subclip_dir, name)
        _, real_len, _, _ = probe_video(path)
        expected = end_inclusive + 1 - begin
        if real_len != expected:
            issues.append(ClipIssue("length", name, (begin, end_inclusive + 1)))
            if remove_bad:
                os.remove(path)
        if i + 1 < len(clips):
            next_begin, _ = parse_clip_name(clips[i + 1])
            if end_inclusive != next_begin and end_inclusive != next_begin - 1:
                issues.append(ClipIssue("continuity", name,
                                        (end_inclusive + 1, next_begin)))
    return issues
