"""Subclip integrity checker/repairer as a package entry point.

Flag parity with the reference's standalone Check_Clips.py (reference
Check_Clips.py:1-37): ``--repair_mode 0`` only reports issues; any other
value removes bad clips and regenerates their exact frame ranges, taking
the full run-config flag surface for the regeneration (encoder, offsets,
batch, …) via ``cli.parse_run_config``.

Usage:  python -m vr_video_generator_tpu.checktool --SubClipDir Subclip/ \
            [--repair_mode 1 --VideoDir in.mp4 ...]

The GUI's "Repair Subclips" action spawns exactly this module
(ui/tkapp.py) — the reference GUI's integrity button is dead
(UserInterface.py:276, callback=None).
"""

from __future__ import annotations

import argparse
from typing import List, Optional


def main(argv: Optional[List[str]] = None) -> int:
    parser = argparse.ArgumentParser(prog="vr_video_generator_tpu.checktool")
    parser.add_argument("--SubClipDir", type=str, required=True)
    parser.add_argument("--repair_mode", type=int, default=0)
    parser.add_argument("--DebugDir", type=str, default="",
                        help="also report the run's depth-overflow records "
                             "(OVERFLOW.jsonl) from this debug dir")
    args, rest = parser.parse_known_args(argv)

    from vr_video_generator_tpu.video.check import check_subclips

    def report_overflow() -> None:
        if not args.DebugDir:
            return
        from vr_video_generator_tpu.utils.logging import (overflow_message,
                                                          overflow_path,
                                                          summarize_overflow)

        total, _ = summarize_overflow(overflow_path(args.DebugDir))
        if total:
            print(overflow_message(total))

    if args.repair_mode == 0:
        issues = check_subclips(args.SubClipDir)
        for issue in issues:
            print(f"{issue.kind} issue on {issue.filename}: "
                  f"repair range {issue.repair_range}")
        if not issues:
            print(f"OK: no issues in {args.SubClipDir}")
        report_overflow()
        return 0

    from vr_video_generator_tpu.cli import parse_run_config
    from vr_video_generator_tpu.runtime.orchestrator import check_and_repair

    # our own --DebugDir flag consumed the value; hand it back to the run
    # config so repair segments log (and record overflow) in the right dir
    debug = ["--DebugDir", args.DebugDir] if args.DebugDir else []
    cfg, cli_args = parse_run_config(
        rest + debug + ["--SubClipDir", args.SubClipDir,
                        "--repair_mode", "1"])
    issues = check_and_repair(cfg, repair=True,
                              allow_random=cli_args.allow_random_weights)
    print(f"repaired {len(issues)} issue(s)")
    if not issues:
        # check_and_repair already summarized overflow when it repaired;
        # still surface a prior run's records on a clean check
        report_overflow()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
