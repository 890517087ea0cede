#!/usr/bin/env python
"""Standalone subclip integrity checker/repairer — parity with the
reference's Check_Clips.py CLI (same flags). Thin wrapper over the
package entry point: python -m vr_video_generator_tpu.checktool"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from vr_video_generator_tpu.checktool import main

if __name__ == "__main__":
    raise SystemExit(main())
