"""
Environment-specific backend workarounds, quarantined in ONE module.

Everything here exists because of one deployment environment: the
experimental "axon" remote-device tunnel used to reach a TPU during
development, whose perf trade-offs differ from a directly-attached
TPU VM (high dispatch latency, ~40 MB/s host<->device bandwidth,
occasional wedged-dispatch phases, and program-dependent stalls when
loading persistently-cached executables). On a real TPU VM — and on
CPU — every entry point below is a fast no-op or plain default
behaviour, so the rest of the library carries no environment-coupled
branches (it calls these helpers and never mentions the tunnel).
"""

import os
import sys
import contextlib
import threading as _threading


def onTunnelBackend():
    """True when the accelerator is reached through the axon
    remote-device tunnel (experimental PJRT backend with different perf
    trade-offs). False on directly-attached TPUs and on CPU."""
    import jax
    try:
        version = getattr(jax.devices()[0].client, "platform_version", "")
    except Exception:
        version = ""
    return "axon" in version


# Reentrant: a caller holding the bypass (e.g. a driver warming several
# programs) may reach TPUKMeans.fit, which takes it again on the same
# thread.
_cacheFlipLock = _threading.RLock()


@contextlib.contextmanager
def compilationCacheBypass():
    """Context manager: temporarily disable the persistent compilation
    cache when on the tunnel backend. Some programs' CACHED executables
    stall for minutes on first execution there while a fresh compile
    takes seconds (program-dependent; measured for the k-means fit and
    the test-scene Voronoi kernel). The flip is process-global, so it is
    serialised behind a lock. No-op on every other backend."""
    import jax
    if not onTunnelBackend():
        yield
        return
    # Read the cache dir only INSIDE the lock: a concurrent caller that
    # peeked while another had flipped it to None would decide "no
    # bypass" and run unserialised, with the cache restored mid-flight.
    with _cacheFlipLock:
        cacheDir = jax.config.jax_compilation_cache_dir
        if cacheDir is None:
            yield
            return
        jax.config.update("jax_compilation_cache_dir", None)
        try:
            yield
        finally:
            jax.config.update("jax_compilation_cache_dir", cacheDir)


def honourJaxPlatformsEnv():
    """
    Pin the platform named by the JAX_PLATFORMS env var through the
    config API. Site customizations (e.g. the tunnel's plugin) can
    override the env var at import time, so a CPU-intended process
    would otherwise register — and possibly wedge on — the accelerator
    backend it is deliberately avoiding; the config API wins over both.
    Call before the first jax dispatch (every console script does).
    No-op when the variable is unset.
    """
    p = os.environ.get("JAX_PLATFORMS")
    if p:
        import jax
        jax.config.update("jax_platforms", p)


# Honour a JAX_PLATFORMS request through the config API inside the
# probe: the tunnel's site customization overrides the env var, so a
# CPU-intended caller would otherwise probe (and wedge on) the
# remote backend it is deliberately avoiding.
_PROBE_SNIPPET = ("import os, jax; p = os.environ.get('JAX_PLATFORMS'); "
                  "p and jax.config.update('jax_platforms', p); "
                  "import jax.numpy as jnp; jax.devices(); "
                  "print(float(jnp.ones((64, 64)).sum()))")


def deviceAnswers(timeoutS=120):
    """
    One out-of-process probe: does a trivial device dispatch complete
    within ``timeoutS``? Probing from a throwaway subprocess keeps the
    CALLER from becoming the wedged process when the backend is down.
    """
    import subprocess
    try:
        r = subprocess.run([sys.executable, "-c", _PROBE_SNIPPET],
                           capture_output=True, timeout=timeoutS)
        return r.returncode == 0
    except Exception:
        return False


def awaitDevice(maxWaitS=900, probeTimeoutS=100, verbose=True):
    """
    Wait until the accelerator answers a trivial dispatch, probing from
    a THROWAWAY subprocess with a hard timeout. The remote-device
    tunnel sometimes wedges a fresh process's FIRST dispatch (the
    process hangs with no CPU use); probing out-of-process lets the
    caller wait out such a phase instead of becoming the wedged process
    itself. No-op (fast success) on healthy backends, including CPU.
    Returns ``(secondsWaited, ok)``; ``ok`` is False when the budget ran
    out with the device still unresponsive (the caller may still try,
    or fail loudly).
    """
    import time
    t0 = time.time()
    while True:
        if deviceAnswers(timeoutS=probeTimeoutS):
            return round(time.time() - t0, 1), True
        if time.time() - t0 > maxWaitS:
            if verbose:
                print(f"WARNING: device probe failing after {maxWaitS}s;"
                      " proceeding anyway", file=sys.stderr, flush=True)
            return round(time.time() - t0, 1), False
        if verbose:
            print("WARNING: device dispatch wedged, waiting for the "
                  "backend...", file=sys.stderr, flush=True)
        time.sleep(60)


def setupCompilationCache(cacheDir):
    """
    Enable the persistent XLA compilation cache at ``cacheDir``.

    Measured trade-off on the remote tunnel: loading the cached
    segmentation executables is ~2.5x faster than fresh HLO compiles
    (123 s vs 310 s for the full pipeline warm-up), so the cache stays
    on — EXCEPT for the k-means fit program, whose cache-loaded
    executable stalls for minutes on first execution (400+ s vs ~22 s
    fresh); TPUKMeans.fit runs its own compiles under
    :func:`compilationCacheBypass`. On real locally-attached TPUs and
    on CPU the cache is enabled unconditionally.

    Returns True when the cache was enabled.
    """
    import jax
    jax.config.update("jax_compilation_cache_dir", cacheDir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    return True
