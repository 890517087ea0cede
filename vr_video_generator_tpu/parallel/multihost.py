"""Multi-host bootstrap: jax.distributed init + per-host segment ownership.

On a pod slice each host owns the segment slices of its local ``data`` mesh
slots: the video is partitioned once globally (runtime/sharded_runner.py's
``partition_segments``), every host decodes only its own slices, and the
pjit'd step runs over the global mesh with DCN handling only the (tiny)
cross-host program coordination — frames never cross hosts (SURVEY.md §2c:
DCN only for frame-shard hand-off, which contiguous ownership avoids
entirely). Temporal state stays host-local because each slot's state belongs
to its slice.
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import jax

from vr_video_generator_tpu.parallel.mesh import make_mesh


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> None:
    """Initialize jax.distributed when running multi-host; safe no-op on a
    single host with no coordinator configured."""
    if coordinator_address is None and num_processes in (None, 1):
        return
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)


def local_data_slots(mesh) -> List[int]:
    """Indices along the ``data`` axis whose first device is local to this
    process — the segment slices this host must decode/encode."""
    local = set(jax.local_devices())
    slots = []
    arr = mesh.devices  # (n_data, n_model)
    for i in range(arr.shape[0]):
        if arr[i, 0] in local:
            slots.append(i)
    return slots


def make_global_mesh(shape: Optional[Tuple[int, int]] = None):
    """Mesh over all processes' devices (jax.devices() is global after
    initialize())."""
    return make_mesh(shape)
