"""Test configuration: force JAX onto CPU with 8 virtual devices so all
multi-chip sharding paths are exercised without TPU hardware."""

import os

# Force CPU unconditionally — the session environment registers a TPU plugin
# at interpreter start and pins jax_platforms to it, so the env var alone is
# not enough; override the config before any backend initializes. Sharding
# tests rely on 8 virtual CPU devices.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)


class FakeFfmpeg:
    """Handle to the behavioral ffmpeg/ffprobe double (tests/fakes/
    ffmpeg_double.py): real executables the production tier spawns as real
    subprocesses. ``ffmpeg``/``ffprobe`` are the shim paths; ``sidecar``
    fabricates non-video side content for an "original" video."""

    def __init__(self, bindir):
        self.bindir = str(bindir)
        self.ffmpeg = os.path.join(self.bindir, "ffmpeg")
        self.ffprobe = os.path.join(self.bindir, "ffprobe")

    @staticmethod
    def sidecar(path, **kw):
        from tests.fakes.ffmpeg_double import make_sidecar
        return make_sidecar(path, **kw)

    @staticmethod
    def read_sidecar(path):
        import json

        from tests.fakes.ffmpeg_double import SIDECAR_SUFFIX
        with open(str(path) + SIDECAR_SUFFIX) as f:
            return json.load(f)


@pytest.fixture
def fake_ffmpeg(tmp_path, monkeypatch):
    """Install the behavioral double as THE ffmpeg/ffprobe for this test via
    the VRVG_FFMPEG/VRVG_FFPROBE overrides find_binary honors first."""
    from tests.fakes.ffmpeg_double import install_shims

    bindir = tmp_path / "ffbin"
    install_shims(str(bindir))
    handle = FakeFfmpeg(bindir)
    monkeypatch.setenv("VRVG_FFMPEG", handle.ffmpeg)
    monkeypatch.setenv("VRVG_FFPROBE", handle.ffprobe)
    return handle
