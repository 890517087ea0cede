#!/usr/bin/env bash
# Combine existing subclips with audio, no re-conversion — parity with the
# reference's "Script/just combine videos.bat" (repair_mode 2).
set -euo pipefail
python -m vr_video_generator_tpu.cli --repair_mode 2 "$@"
