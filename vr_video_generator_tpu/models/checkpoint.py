"""Native parameter checkpoints (Orbax) — fast reload without .pth parsing.

The reference's only model persistence is the downloaded torch ``.pth``
(reference SupportFunction.py:158-168). Converting on every startup costs a
torch unpickle + layout transposes; ``save``/``load`` here persist the
converted JAX pytree via Orbax (sharded-restore capable), so production
startup skips torch entirely.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax


def save(path: str, params: Any) -> None:
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path, params, force=True)


def load(path: str, like: Optional[Any] = None) -> Any:
    """Restore a params pytree; ``like`` (a matching pytree of arrays or
    ShapeDtypeStructs, possibly sharded) guides layout/placement."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    with ocp.StandardCheckpointer() as ckptr:
        if like is not None:
            target = jax.tree.map(
                lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype,
                                               sharding=getattr(x, "sharding", None))
                if hasattr(x, "shape") else x, like)
            return ckptr.restore(path, target)
        return ckptr.restore(path)
