"""Device profiling hooks (SURVEY.md §5: the reference has *no* perf
profiling; mdx adds jax.profiler capture + per-phase timings as
first-class trace events).

* ``phase_timer`` — context manager that logs wall time (and device sync
  time) of a pipeline phase into an :class:`AgentTraceLogger`.
* ``maybe_profile`` — wraps a block in ``jax.profiler.trace`` when
  ``MDX_PROFILE_DIR`` is set; the resulting TensorBoard trace shows XLA
  op-level device timelines.
"""

from __future__ import annotations

import contextlib
import os
import time

from mdx.pipeline.trace import AgentTraceLogger


@contextlib.contextmanager
def phase_timer(trace: AgentTraceLogger | None, phase: str,
                sync=None):
    """Time a phase; ``sync`` is an optional callable (e.g.
    ``lambda: jax.block_until_ready(out)``) run before stopping the clock
    so device work is attributed to the phase that launched it."""
    t0 = time.perf_counter()
    try:
        yield
    finally:
        if sync is not None:
            try:
                sync()
            except Exception:
                pass
        wall_ms = (time.perf_counter() - t0) * 1000.0
        if trace is not None:
            trace.log_device_timing(phase, wall_ms)


@contextlib.contextmanager
def maybe_profile(name: str):
    """jax.profiler capture gated on MDX_PROFILE_DIR."""
    profile_dir = os.environ.get("MDX_PROFILE_DIR")
    if not profile_dir:
        yield
        return
    import jax

    os.makedirs(profile_dir, exist_ok=True)
    with jax.profiler.trace(profile_dir):
        yield
