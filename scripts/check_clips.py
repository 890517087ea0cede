#!/usr/bin/env python
"""Standalone subclip integrity checker/repairer — parity with the
reference's Check_Clips.py CLI (same flags)."""

import argparse

from vr_video_generator_tpu.cli import parse_run_config
from vr_video_generator_tpu.runtime.orchestrator import check_and_repair
from vr_video_generator_tpu.video.check import check_subclips

if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--SubClipDir", type=str, required=True)
    parser.add_argument("--repair_mode", type=int, default=0)
    args, rest = parser.parse_known_args()
    if args.repair_mode == 0:
        for issue in check_subclips(args.SubClipDir):
            print(f"{issue.kind} issue on {issue.filename}: "
                  f"repair range {issue.repair_range}")
    else:
        cfg, cli_args = parse_run_config(
            rest + ["--SubClipDir", args.SubClipDir, "--repair_mode", "1"])
        issues = check_and_repair(cfg, repair=True,
                                  allow_random=cli_args.allow_random_weights)
        print(f"repaired {len(issues)} issue(s)")
