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
    args, rest = parser.parse_known_args(argv)

    from vr_video_generator_tpu.video.check import check_subclips

    if args.repair_mode == 0:
        issues = check_subclips(args.SubClipDir)
        for issue in issues:
            print(f"{issue.kind} issue on {issue.filename}: "
                  f"repair range {issue.repair_range}")
        if not issues:
            print(f"OK: no issues in {args.SubClipDir}")
        return 0

    from vr_video_generator_tpu.cli import parse_run_config
    from vr_video_generator_tpu.runtime.orchestrator import check_and_repair

    cfg, cli_args = parse_run_config(
        rest + ["--SubClipDir", args.SubClipDir, "--repair_mode", "1"])
    issues = check_and_repair(cfg, repair=True,
                              allow_random=cli_args.allow_random_weights)
    print(f"repaired {len(issues)} issue(s)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
