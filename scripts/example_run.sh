#!/usr/bin/env bash
# Example full CLI invocation — parity with the reference's Script/Build.txt
# sample command (same flag surface, TPU-build extras at the end).
set -euo pipefail

python -m vr_video_generator_tpu.cli \
  --VideoDir "./Videos/Input/Original/input.mp4" \
  --OutputDir "./Videos/Output/SBS input.mkv" \
  --DebugDir "./Debug/" \
  --SubClipDir "./Subclip/" \
  --encoder vits \
  --encoder_path "./checkpoints/depth_anything_v2_vits.pth" \
  --offset_fg 0.025 --offset_bg -0.01 --offset_step_size 1 \
  --Max_Frame_Count 15 \
  --start_frame 0 --end_frame 99999999999999 \
  --repair_mode 0 \
  --batch_size 8 --compute_dtype bfloat16 --warp_impl auto
