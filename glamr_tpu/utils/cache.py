"""Persistent XLA compile-cache configuration shared by every CLI.

Cold start of the recon stage programs is minutes over a tunneled TPU and
is dominated by DOZENS of small helper programs besides the big stage
scan — each under jax's default 1.0 s persistence threshold, so with the
defaults they recompile in every process and the cache never converges.
Every entry point therefore calls enable_compile_cache() so one warmup
run (`glamr-warmup`, cli/warmup.py) makes all subsequent run_demo /
run_dataset / train invocations start warm.

Precedence for the cache directory:
  GLAMR_CACHE_DIR > JAX_COMPILATION_CACHE_DIR > ~/.cache/jax
"""
from __future__ import annotations

import os


def accelerator_reachable() -> bool:
    """Liveness probe for a tunneled accelerator BEFORE jax touches the
    backend. When the tunnel relay process (stdio<->vsock bridge) dies,
    jax.devices() blocks forever on the claim instead of failing; entry
    points that must not hang (bench.py, __graft_entry__) probe this and
    fall back to the CPU platform. Returns True when no tunnel is
    configured (plain environments trust jax's own discovery); the /proc
    scan is read-only and cannot disturb a live tunnel."""
    import glob

    if not os.environ.get("PALLAS_AXON_POOL_IPS"):
        return True
    for p in glob.glob("/proc/[0-9]*/cmdline"):
        try:
            with open(p, "rb") as f:
                if b"tpu_init" in f.read():
                    return True
        except OSError:
            continue
    return False


def accelerator_usable(timeout_s: float = 150.0) -> bool:
    """Stronger liveness probe: can THIS process actually claim the
    accelerator right now?

    accelerator_reachable() only checks that the tunnel relay process is
    alive — but jax.devices() can still block indefinitely when another
    process holds the single-tenant TPU claim, or die on libtpu
    client/terminal version skew (the round-1 MULTICHIP failure mode).
    This probe attempts a real claim in a SUBPROCESS under a timeout, so
    the caller can fall back to the CPU platform instead of hanging.
    Returns True without probing when no tunnel is configured."""
    import subprocess
    import sys

    if not os.environ.get("PALLAS_AXON_POOL_IPS"):
        return True
    if not accelerator_reachable():
        return False
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)  # probe the accelerator, not a forced CPU
    try:
        proc = subprocess.run(
            [sys.executable, "-c",
             "import jax; d = jax.devices(); "
             "assert d and d[0].platform != 'cpu', d"],
            env=env, timeout=timeout_s,
            stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
        )
        return proc.returncode == 0
    except subprocess.TimeoutExpired:
        return False


def host_cpu_device():
    """The host CPU backend's first device, or None when the platform
    plugin registers no 'cpu' backend (observed: the tunneled-TPU plugin
    exposing just ['axon']). The single probe point for "can I pin tiny
    eager prep work to the host?" — library code should use this instead
    of calling jax.devices('cpu') directly."""
    import jax

    try:
        return jax.devices("cpu")[0]
    except RuntimeError:
        return None


def host_prep_scope():
    """Context manager pinning eager host-side prep to the CPU backend.

    Many once-per-sequence prep paths issue dozens of tiny ops; with a
    (possibly remote) accelerator as the default device each costs a
    compile + tunnel round-trip, so they run on the CPU backend instead.
    When no 'cpu' backend is registered (see host_cpu_device) fall back
    to the default device rather than crashing: correctness is
    unaffected, only the dispatch-locality optimization is lost.
    """
    import contextlib

    cpu = host_cpu_device()
    if cpu is None:
        return contextlib.nullcontext()
    import jax

    return jax.default_device(cpu)


def enable_compile_cache(cache_dir: str | None = None) -> str:
    """Point jax at a persistent compile cache and persist EVERYTHING
    (no min-compile-time / min-size thresholds). Returns the directory.

    Also restores standard JAX_PLATFORMS semantics: a platform plugin
    (the tunneled-TPU one does this) may rewrite jax_platforms at import
    time, silently overriding an explicit `JAX_PLATFORMS=cpu`; since
    every CLI calls this helper, re-applying the env var here makes
    `JAX_PLATFORMS` trustworthy across all entry points (previously only
    cli/warmup.py did this locally).

    When the env names a NON-cpu platform, the host 'cpu' backend is kept
    registered alongside it (appended to the list — the named platform
    stays first, hence the default). Re-applying a bare
    `JAX_PLATFORMS=axon` verbatim deletes the CPU backend, which silently
    disables host_prep_scope's host pinning and sends every tiny eager
    init op over the accelerator tunnel — measured 2.2 s vs 0.6 s on the
    900-frame flagship optimize (the round-2 "optimizer core
    regression")."""
    import jax

    if os.environ.get("JAX_PLATFORMS"):
        plats = os.environ["JAX_PLATFORMS"]
        names = [p.strip() for p in plats.split(",") if p.strip()]
        if "cpu" not in names:
            plats = ",".join(names + ["cpu"])
        jax.config.update("jax_platforms", plats)
    d = (cache_dir
         or os.environ.get("GLAMR_CACHE_DIR")
         or os.environ.get("JAX_COMPILATION_CACHE_DIR")
         or os.path.expanduser("~/.cache/jax"))
    jax.config.update("jax_compilation_cache_dir", d)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    return d
