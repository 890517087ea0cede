"""Device-mesh construction for the SBS pipeline.

Axes:
  * ``data``  — frame-segment parallelism: each slot owns a contiguous
    temporal slice with its own smoothing state. This is the TPU-native form
    of the reference's N segment-worker processes
    (reference PredictAndGenerate.py:274-275,300-311), but over ICI instead
    of OS pipes.
  * ``model`` — tensor parallelism inside the depth net (attention heads /
    MLP hidden sharded; XLA inserts the all-reduces). The reference has no
    TP (SURVEY.md §2c); this axis exists for vitl/vitg at high input sizes.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh


def make_mesh(shape: Optional[Tuple[int, int]] = None,
              devices: Optional[Sequence] = None) -> Mesh:
    """Build a (data, model) mesh. ``shape=None`` puts every device on
    ``data`` (pure segment parallelism — the reference's only strategy)."""
    devices = list(devices if devices is not None else jax.devices())
    if shape is None:
        shape = (len(devices), 1)
    n_data, n_model = shape
    if n_data * n_model != len(devices):
        raise ValueError(f"mesh shape {shape} != {len(devices)} devices")
    arr = np.asarray(devices).reshape(n_data, n_model)
    return Mesh(arr, axis_names=("data", "model"))
