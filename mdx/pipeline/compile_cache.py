"""Persistent XLA compilation cache for fresh deploys.

Cold-starting the product recompiles every fused program through the TPU
toolchain — measured ≈22 min for the three raw-ingest dtype buckets of a
mixed stream (docs/PERF.md "known next levers"); the compiled executables
are content-addressed by HLO, so a process restart on the same host/chip
repays none of it.  Enabling JAX's persistent compilation cache keyed to
a local directory makes every program compile once per HOST instead of
once per PROCESS: restarts, worker respawns, and multi-process serving
all reuse the cached executables.

Controlled by ``MDX_COMPILE_CACHE``:

* unset  → enabled at ``~/.cache/mdx/jax-cache`` (or ``$XDG_CACHE_HOME``)
* a path → enabled there
* ``0`` / ``off`` / ``""`` → disabled (JAX's own defaults apply)

``enable()`` is idempotent and never raises — a read-only filesystem
degrades to the uncached behaviour.  It uses ``jax.config.update``, not
env vars (``JAX_COMPILATION_CACHE_DIR`` is inert in jax 0.9.0 — the
config stays None however early the env var is set).  NOTE: the backend
gate below calls ``jax.default_backend()``, which INITIALISES the JAX
backend — configure the platform first (``jax.config.update(
"jax_platforms", ...)`` / XLA_FLAGS device-count forcing) or the
process is locked to the default platform.

TPU-only: ``enable()`` refuses on the CPU backend.  jax/jaxlib 0.9.0's
XLA:CPU cache-load path (``cpu_aot_loader``) executes SPMD programs with
colliding collective rendezvous run-ids: repeated back-to-back runs of a
cache-LOADED multi-device executable let a straggler device thread from
run N join run N+1's all-reduce — ``rendezvous.h:315 Check failed:
id < num_threads (4 vs. 4)`` / ``356 use_count() == num_threads
(5 vs. 4)`` — and the CHECK aborts the whole process (SIGABRT, often no
Python-visible error).  Freshly JIT-compiled executables are immune, so
only the cache's load path is affected; TPU executables round-trip fine
(measured, docs/PERF.md "fresh deploys").  ``MDX_COMPILE_CACHE_FORCE=1``
overrides the gate for single-device CPU use at your own risk.
"""

from __future__ import annotations

import logging
import os

log = logging.getLogger(__name__)

_DISABLED = ("0", "off", "false", "no")
_enabled_dir: str | None = None


def cache_dir() -> str | None:
    """Resolved cache directory, or None when disabled."""
    v = os.environ.get("MDX_COMPILE_CACHE")
    if v is not None:
        v = v.strip()
        return None if v.lower() in _DISABLED or not v else v
    base = os.environ.get("XDG_CACHE_HOME") or os.path.join(
        os.path.expanduser("~"), ".cache")
    return os.path.join(base, "mdx", "jax-cache")


def enable() -> str | None:
    """Point JAX's persistent compilation cache at ``cache_dir()``.

    Returns the directory in use (None when disabled or unavailable).
    Must run before the first compilation to benefit that program;
    later calls are no-ops.
    """
    global _enabled_dir
    if _enabled_dir is not None:
        return _enabled_dir
    d = cache_dir()
    if d is None:
        return None
    try:
        import jax

        if (jax.default_backend() == "cpu"
                and os.environ.get("MDX_COMPILE_CACHE_FORCE") != "1"):
            # XLA:CPU AOT reload executes collectives with colliding
            # rendezvous run-ids and CHECK-aborts (module docstring).
            log.info("compile cache disabled on the CPU backend "
                     "(jaxlib 0.9.0 AOT-reload rendezvous bug); set "
                     "MDX_COMPILE_CACHE_FORCE=1 to override")
            return None
        os.makedirs(d, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", d)
        # cache everything: tunnel compiles are minutes, entries are MBs
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception as e:  # pragma: no cover - defensive
        log.warning("compile cache unavailable (%s); continuing uncached", e)
        return None
    _enabled_dir = d
    return d
