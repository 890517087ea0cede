"""Parameter partition rules — tensor parallelism for the depth net.

Megatron-style head/hidden sharding of the DINOv2 blocks over the ``model``
mesh axis: qkv and fc1 split their output features, proj and fc2 split their
input features, so each block needs exactly one all-reduce per sublayer —
inserted automatically by XLA from these shardings (pjit; no hand-written
collectives). Everything else (convs, norms, embeddings) is replicated: the
DPT head is conv-dominated and batch-sharded via the ``data`` axis instead.
"""

from __future__ import annotations

from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

# (path-suffix match, PartitionSpec) — first match wins.
_TP_RULES = (
    (("attn", "qkv", "kernel"), P(None, "model")),
    (("attn", "qkv", "bias"), P("model")),
    (("attn", "proj", "kernel"), P("model", None)),
    (("mlp", "fc1", "kernel"), P(None, "model")),
    (("mlp", "fc1", "bias"), P("model")),
    (("mlp", "fc2", "kernel"), P("model", None)),
)


def _spec_for_path(path) -> P:
    keys = tuple(getattr(p, "key", str(p)) for p in path)
    for suffix, spec in _TP_RULES:
        if keys[-len(suffix):] == suffix:
            return spec
    return P()


def param_specs(params) -> Any:
    """PartitionSpec pytree matching ``params``."""
    return jax.tree_util.tree_map_with_path(
        lambda path, _: _spec_for_path(path), params)


def param_shardings(params, mesh: Mesh) -> Any:
    return jax.tree.map(lambda spec: NamedSharding(mesh, spec),
                        param_specs(params))


def shard_params(params, mesh: Mesh):
    """Place params on the mesh with TP shardings."""
    return jax.device_put(params, param_shardings(params, mesh))
