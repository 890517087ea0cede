"""Backend-init watchdog: diagnose a hung accelerator bring-up.

In this deployment the TPU backend is reached through a relay; when the
relay is down, the first backend touch (``jax.devices()`` or the first jit)
blocks forever with no output — observed for hours during the 2026-08-17
outage. The reference has no analog (CUDA init fails fast); a remote-attached
TPU needs one. ``watch_backend_init`` starts backend initialization on a
daemon thread and prints a diagnosis if it hasn't completed within the
threshold, so an operator staring at a silent process learns *why* within
minutes instead of never.

Safe to call unconditionally: backend init is idempotent and lock-guarded in
JAX, so the probe thread either completes instantly (already initialized),
warms the backend concurrently with video/file setup, or blocks — exactly
the case the watchdog exists to report.
"""

from __future__ import annotations

import sys
import threading
from typing import Callable, Optional

_done_event: Optional[threading.Event] = None
_init_error: Optional[BaseException] = None
_lock = threading.Lock()


def _default_probe() -> None:
    import jax

    jax.devices()


def _default_warn(threshold_s: float) -> None:
    print(
        f"[devwatch] JAX backend init still pending after {threshold_s:.0f}s. "
        "A remote TPU relay that is down blocks forever here; if this is a "
        "TPU run, check the relay/plugin. To run on CPU instead, set "
        "JAX_PLATFORMS=cpu. First TPU compiles are slow but device "
        "*enumeration* should take seconds.",
        file=sys.stderr,
        flush=True,
    )


def watch_backend_init(
    threshold_s: float = 180.0,
    *,
    probe: Optional[Callable[[], None]] = None,
    warn: Optional[Callable[[float], None]] = None,
    once: bool = True,
) -> threading.Event:
    """Begin backend init on a daemon thread; warn if it stalls.

    Returns an Event set when the backend finished initializing (or the
    probe raised — a fast failure is a *diagnosed* failure, not a stall).
    ``once`` collapses repeat calls in one process to a no-op returning
    the FIRST call's event, so library code can call this freely and a
    later require_backend still sees the true init state (a fresh pre-set
    event here would let a second caller sail past a hung relay).
    """
    global _done_event
    done = threading.Event()
    if once:
        with _lock:
            if _done_event is not None:
                return _done_event
            _done_event = done
    probe_fn = probe or _default_probe
    warn_fn = warn or _default_warn

    def _probe_thread() -> None:
        global _init_error
        try:
            probe_fn()
        except BaseException as e:  # noqa: BLE001 — diagnosed, not swallowed:
            # a fast init failure is a *result*; the caller's own first
            # device touch will raise the same error with a full traceback.
            # Re-raising here would only crash a daemon thread (and trip
            # pytest's unhandled-thread-exception warning).
            _init_error = e
            print(f"[devwatch] backend init probe failed: {e!r}",
                  file=sys.stderr, flush=True)
        finally:
            done.set()

    def _watch_thread() -> None:
        if not done.wait(threshold_s):
            warn_fn(threshold_s)

    threading.Thread(target=_probe_thread, daemon=True,
                     name="devwatch-probe").start()
    threading.Thread(target=_watch_thread, daemon=True,
                     name="devwatch-watch").start()
    return done


def require_backend(done: threading.Event,
                    deadline_s: Optional[float] = None) -> None:
    """Block until backend init completes or the deadline expires; raise a
    diagnosed RuntimeError on timeout instead of letting the first device
    touch hang forever. Deadline default: the VRVG_INIT_TIMEOUT env var
    (seconds, 600 if unset); <= 0 waits forever. Healthy enumeration takes
    seconds — only a dead relay (or a wedged plugin) ever reaches this."""
    import os

    if deadline_s is None:
        deadline_s = float(os.environ.get("VRVG_INIT_TIMEOUT", "600"))
    if deadline_s <= 0:
        done.wait()
        return
    if not done.wait(deadline_s):
        raise RuntimeError(
            f"JAX backend init did not complete within {deadline_s:.0f}s — "
            "TPU relay down? Set JAX_PLATFORMS=cpu to run on CPU, or "
            "VRVG_INIT_TIMEOUT=0 to wait indefinitely.")
