"""Backend-init watchdog behavior (utils/devwatch.py)."""

import threading
import time

from vr_video_generator_tpu.utils import devwatch


def _fresh():
    devwatch._done_event = None


def test_fast_probe_no_warning():
    _fresh()
    warned = []
    done = devwatch.watch_backend_init(
        threshold_s=0.5, probe=lambda: None, warn=warned.append, once=False)
    assert done.wait(5.0)
    time.sleep(0.7)  # past the threshold: watcher must have stayed quiet
    assert warned == []


def test_stalled_probe_warns_once_at_threshold():
    _fresh()
    warned = []
    release = threading.Event()
    done = devwatch.watch_backend_init(
        threshold_s=0.2, probe=release.wait, warn=warned.append, once=False)
    t0 = time.monotonic()
    deadline = t0 + 10.0
    while not warned and time.monotonic() < deadline:
        time.sleep(0.02)
    assert warned == [0.2]
    assert time.monotonic() - t0 >= 0.2
    assert not done.is_set()
    release.set()
    assert done.wait(5.0)


def test_probe_exception_still_sets_done():
    _fresh()
    warned = []

    def boom():
        raise RuntimeError("init failed fast")

    done = devwatch.watch_backend_init(
        threshold_s=0.2, probe=boom, warn=warned.append, once=False)
    assert done.wait(5.0)  # fast failure is a diagnosed failure, not a stall
    time.sleep(0.3)
    assert warned == []


def test_once_collapses_repeat_calls():
    _fresh()
    calls = []
    first = devwatch.watch_backend_init(
        threshold_s=0.1, probe=lambda: calls.append(1), warn=lambda s: None)
    assert first.wait(5.0)
    second = devwatch.watch_backend_init(
        threshold_s=0.1, probe=lambda: calls.append(2), warn=lambda s: None)
    assert second is first  # the FIRST call's event, no second probe thread
    assert second.is_set()
    time.sleep(0.2)
    assert calls == [1]


def test_once_repeat_call_sees_a_still_hung_probe():
    """A second library call must NOT get a pre-set event while the first
    probe is still blocked — require_backend would sail past a dead relay."""
    _fresh()
    release = threading.Event()
    first = devwatch.watch_backend_init(
        threshold_s=30.0, probe=release.wait, warn=lambda s: None)
    second = devwatch.watch_backend_init(
        threshold_s=30.0, probe=lambda: None, warn=lambda s: None)
    assert second is first and not second.is_set()
    release.set()
    assert second.wait(5.0)


def test_real_probe_initializes_cpu_backend():
    _fresh()
    # conftest pinned jax to CPU, so the default probe completes quickly.
    done = devwatch.watch_backend_init(threshold_s=30.0, once=False)
    assert done.wait(30.0)


def test_require_backend_raises_on_timeout(monkeypatch):
    import threading

    import pytest

    from vr_video_generator_tpu.utils.devwatch import require_backend

    ready = threading.Event()
    ready.set()
    require_backend(ready, deadline_s=0.05)  # no-op when init completed

    never = threading.Event()
    with pytest.raises(RuntimeError, match="relay"):
        require_backend(never, deadline_s=0.05)

    # env default is honored; <= 0 waits (use a pre-set event to not block)
    monkeypatch.setenv("VRVG_INIT_TIMEOUT", "0.05")
    with pytest.raises(RuntimeError):
        require_backend(never)
    monkeypatch.setenv("VRVG_INIT_TIMEOUT", "0")
    require_backend(ready)
