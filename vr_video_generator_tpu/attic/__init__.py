"""Attic: tested, documented NEGATIVE results kept off the hot path.

Everything here works and has parity tests, but measured slower than the
shipped implementation on the attached TPU (see docs/BENCHLOG.md and
NOTES.md for the numbers and root causes). Kept as groundwork in case the
calculus changes (different chip generation, Mosaic scheduler improvements):

- ``packed_conv``: pixel-pair packed 3x3 convs for C=64 NHWC tensors
  (vits refinenet RCUs). Parity-exact, but 186.4 -> 182.4 fps at
  1080p/vits — XLA's schedule for the half-zero K=1152 packed conv loses
  more than the N=64 lane pad costs.
- ``refinenet_pre``: fused rcu2(path2 + rcu1(rn0)) Pallas kernel feeding
  head_tail_ext_pallas's channel_major_halo input. Slower than XLA's RCUs
  (0.43 vs 0.26 ms/frame net): the 4-conv halo forces +12 recomputed rows
  per VMEM-bounded block, and in-kernel banded GEMMs run at ~50 TF/s vs
  XLA's ~85 on the same shapes.
"""
