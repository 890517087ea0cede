"""Honest device timing on high-latency-dispatch backends.

Single-dispatch timings on the dev TPU carry ~30ms of relay overhead and
``block_until_ready`` is unreliable, so the only trustworthy measurement is
K repetitions of the workload inside ONE jitted ``lax.scan`` with a scalar
readback. Two subtleties this helper handles:

  * dead-code elimination — every output element feeds a checksum;
  * iteration overlap — XLA overlaps scan iterations whose bodies are
    independent, multiplying peak memory by the trip count (an OOM at
    1080p). A never-true ``where`` makes each iteration's inputs depend on
    the previous iteration's checksum, forcing serial execution at the cost
    of one fused select pass.
"""

from __future__ import annotations

import time
from typing import Any, Callable, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _checksum(tree: Any) -> jnp.ndarray:
    leaves = [l for l in jax.tree.leaves(tree) if hasattr(l, "dtype")]
    total = jnp.zeros((), jnp.float32)
    for leaf in leaves:
        total = total + jnp.sum(leaf.astype(jnp.float32))
    return total


def _poison(x: jnp.ndarray, cs: jnp.ndarray) -> jnp.ndarray:
    flag = cs == jnp.float32(1.2345678e33)  # never true; unprovable to XLA
    if jnp.issubdtype(x.dtype, jnp.integer) or x.dtype == jnp.bool_:
        return jnp.where(flag, x ^ jnp.ones_like(x), x)
    return jnp.where(flag, x + jnp.ones_like(x), x)


def device_time(fn: Callable, *args: Any, k: int = 8,
                reps: int = 3) -> Tuple[float, float]:
    """Best wall-clock seconds per invocation of ``fn(*args)``.

    Returns (seconds_per_call, total_best_seconds_for_k).
    """

    @jax.jit
    def scan_fn(args):
        def body(carry, _):
            out = fn(*carry)
            cs = _checksum(out)
            carry = jax.tree.map(lambda a: _poison(a, cs), carry)
            return carry, cs
        _, css = jax.lax.scan(body, args, None, length=k)
        return css

    args = jax.tree.map(jnp.asarray, args)
    _ = np.asarray(scan_fn(args))  # compile + warmup
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        _ = np.asarray(scan_fn(args))
        best = min(best, time.perf_counter() - t0)
    return best / k, best
