"""
The backend-quirks quarantine: every environment-coupled workaround
lives in pyshepseg_tpu/_backend_quirks.py and is a no-op / plain default
on normal backends (this suite runs on CPU).
"""

import os
import subprocess
import sys

import jax

from pyshepseg_tpu import _backend_quirks as quirks
from pyshepseg_tpu import utils


def test_not_on_tunnel_backend_here():
    assert quirks.onTunnelBackend() is False


def test_cache_bypass_noop_off_tunnel():
    before = jax.config.jax_compilation_cache_dir
    with quirks.compilationCacheBypass():
        assert jax.config.jax_compilation_cache_dir == before
    assert jax.config.jax_compilation_cache_dir == before


def test_device_answers_on_cpu():
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    # deviceAnswers spawns a subprocess itself; just exercise it with the
    # CPU pin in OUR env (inherited by the probe)
    old = os.environ.get("JAX_PLATFORMS")
    os.environ["JAX_PLATFORMS"] = "cpu"
    try:
        assert quirks.deviceAnswers(timeoutS=120)
    finally:
        if old is None:
            os.environ.pop("JAX_PLATFORMS", None)
        else:
            os.environ["JAX_PLATFORMS"] = old
    del env


def test_await_device_fast_on_healthy_backend():
    waited, ok = quirks.awaitDevice(maxWaitS=180, probeTimeoutS=120,
                                    verbose=False)
    assert ok


def test_utils_reexports():
    # callers historically reached these via utils
    assert utils.onTunnelBackend is quirks.onTunnelBackend
    assert utils.compilationCacheBypass is quirks.compilationCacheBypass
    assert utils.awaitDevice is quirks.awaitDevice
    assert utils.setupCompilationCache is quirks.setupCompilationCache
    assert utils.honourJaxPlatformsEnv is quirks.honourJaxPlatformsEnv
    assert utils.deviceAnswers is quirks.deviceAnswers


def test_quarantine_is_total():
    """grep: no module in the package other than _backend_quirks (and
    no test helper import of it) mentions the tunnel backend by name."""
    pkgdir = os.path.dirname(quirks.__file__)
    hits = []
    for root, _, files in os.walk(pkgdir):
        for f in files:
            if not f.endswith(".py"):
                continue
            path = os.path.join(root, f)
            if os.path.basename(path) == "_backend_quirks.py":
                continue
            text = open(path, encoding="utf-8").read()
            if "axon" in text.lower():
                hits.append(path)
    assert hits == [], hits
