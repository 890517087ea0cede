"""vr_video_generator_tpu — a TPU-native 2D→SBS-3D video conversion framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
Gia-Huynh/VR-Video-Generator (reference mounted at /root/reference):
monocular depth estimation with Depth-Anything-V2 (DINOv2 ViT encoder +
DPT decoder), temporal depth smoothing, depth-plane forward warping with
occlusion fill, and side-by-side stereo frame synthesis — all fused into a
single jitted, mesh-shardable program per batch of frames, fed by
double-buffered host video I/O.

Architecture (TPU-first, not a port):
  - the reference's GPU-server processes + multiprocessing Queues
    (reference PredictAndGenerate.py:23-61,273-321) are replaced by one
    pjit-sharded program over a frame batch;
  - the reference's per-plane ``torch.roll`` + ``nonzero`` scatter loop
    (PredictAndGenerate.py:150-183) is replaced by a static-shape
    priority-select gather (ops/warp.py) and a fused Pallas kernel
    (ops/warp_pallas.py);
  - cv2 decode / ffmpeg encode subprocesses survive as the host I/O tier
    (video/), feeding ``jax.device_put`` with double buffering.
"""

from vr_video_generator_tpu.version import __version__

__all__ = ["__version__"]
