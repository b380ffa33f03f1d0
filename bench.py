"""Headline benchmark: images/sec/chip, 16-metric + 7-step enhance pass, 512².

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "images/sec/chip", "vs_baseline": N}

Measured program (matches BASELINE.json's headline metric): one jitted XLA
program that computes all 16 quality metrics (ref pipeline/metrics.py:42-158)
AND runs the full 7-op enhancement chain with its three safeguards
(ref pipeline/enhancement.py:235-369) on a device batch of 512×512 slices.

Baseline: the reference is pure NumPy/scikit-image on CPU with no published
numbers (BASELINE.md).  The denominator for ``vs_baseline`` is, in order of
preference (provenance reported in ``baseline_kind``):

1. ``MDX_BASELINE_IPS`` env var — an explicitly injected measured number;
2. ``BASELINE_REF.json`` — the REAL reference path measured by
   ``tools/bench_reference.py`` (skimage/PyWavelets where installed — the
   CI baseline job records it; see BASELINE.md "Measured reference");
3. live measurement of ``mdx.refimpl`` — the NumPy float64 re-derivation
   of the same formulas (golden-tested in tests/test_ops_golden.py), timed
   on one 512² image, single-threaded.  Per the measured per-component
   bound (tools/baseline_bias.py; BASELINE.md) this can overstate the
   ratio by up to ~2.3×; the kind field says so explicitly.

The committed BASELINE_REF.json carries the bound-corrected denominator
(``refimpl-f32-bound``, 2.63 img/s on the bench host) so ``vs_baseline``
is a defensible LOWER bound on the true ratio until a real skimage-path
measurement replaces it.

The JSON line also carries ``vpu_util`` — estimated total ops / elapsed /
VPU peak for the measured pass (docs/PERF.md roofline; op counts ±30%) —
so rounds are judged on an efficiency figure, not just throughput.

Env knobs: MDX_BENCH_BATCH (default 32), MDX_BENCH_REPS (default 10),
MDX_BENCH_SKIP_BASELINE=1 reuses the last recorded refimpl value.
"""

from __future__ import annotations

import json
import os
import time

import numpy as np

# Persistent XLA compilation cache: first compile of the fused pass through
# the remote-TPU tunnel takes minutes; cache it across invocations.  The
# JAX_COMPILATION_CACHE_DIR env var is inert in jax 0.9.0 — go through
# compile_cache.enable() (jax.config.update; TPU-gated), pointed at the
# bench's own /tmp dir unless the caller set one.
os.environ.setdefault("MDX_COMPILE_CACHE", "/tmp/mdx_jax_cache")

_BASELINE_CACHE = os.path.join(os.path.dirname(__file__), ".bench_baseline.json")
_BASELINE_REF = os.path.join(os.path.dirname(__file__), "BASELINE_REF.json")

# Estimated VPU ops per pixel for the headline pass (16 metrics + 7-op chain
# + 3 safeguards).  Hand-summed from the docs/PERF.md roofline table
# (TV ~2580 + percentiles 256 + CLAHE ~830 + wavelet ~43 + bilateral ~100 +
# p90 cut 64 + unsharp ~100 + local_variance ~70), ±30% like its source.
_EST_OPS_PER_PX = 4040.0
_VPU_PEAK_OPS = 3.9e12  # v5e f32 VPU peak (docs/PERF.md roofline)

# The benched plan: all seven ops active with mid-range parameters
# (ref pipeline/schemas.py PARAM_BOUNDS midpoints, bilateral d=5).
_PLAN_OPS = ("denoise", "clahe", "gamma", "unsharp", "post_denoise",
             "bilateral", "tv_denoise")
_PLAN_PARAMS = dict(
    clahe_clip_limit=0.02, clahe_tile_size=16, gamma=0.95,
    unsharp_radius=1.0, unsharp_amount=0.6, denoise_mode="soft",
    post_denoise_strength=0.3, bilateral_d=5, bilateral_sigma_color=0.05,
    bilateral_sigma_space=0.05, tv_denoise_weight=0.05)


def _init_watchdog(name: str = "bench.py"):
    """Backend-init watchdog: with the remote-TPU tunnel down or wedged,
    jax backend init blocks FOREVER (even jax.devices() hangs — seen
    during the round-3 outage).  A healthy init is seconds; compiles
    (minutes) happen after init and are not bounded by this.  On timeout:
    message to stderr, exit 2, stdout stays empty (the ONE JSON line
    contract never emits a bogus measurement).

    Returns an Event the caller must .set() once the backend is up.
    MDX_BENCH_INIT_TIMEOUT <= 0 disables the watchdog entirely.
    """
    import sys
    import threading

    init_done = threading.Event()
    timeout_s = float(os.environ.get("MDX_BENCH_INIT_TIMEOUT", "600"))
    if timeout_s <= 0:
        return init_done

    def _watchdog():
        if not init_done.wait(timeout_s):
            print(f"{name}: jax backend init did not complete within "
                  f"{timeout_s:.0f}s — TPU tunnel down or wedged; "
                  f"no measurement taken", file=sys.stderr, flush=True)
            os._exit(2)

    threading.Thread(target=_watchdog, daemon=True).start()
    return init_done


def _make_batch(n: int, hw: int = 512) -> np.ndarray:
    rng = np.random.default_rng(0)
    yy, xx = np.mgrid[0:hw, 0:hw]
    base = 0.35 + 0.3 * np.sin(xx / 37.0) * np.cos(yy / 53.0)
    imgs = base[None] + rng.normal(0, 0.06, (n, hw, hw))
    return np.clip(imgs, 0.0, 1.0).astype(np.float32)


def _measure_tpu(batch: np.ndarray, reps: int) -> float:
    """Time the fused pass with tunnel-safe methodology.

    Through the remote-TPU tunnel ``block_until_ready`` returns before the
    device finishes and bulk downloads are slow, so: (1) the ``reps``
    passes run inside ONE jitted ``fori_loop`` with a data dependency
    between iterations, (2) only a scalar leaves the device, and (3) the
    measured per-call round-trip latency of a trivial program is
    subtracted.
    """
    import jax
    import jax.numpy as jnp

    from functools import partial

    from mdx.core import enhance as E
    from mdx.core import metrics as M

    static = E.PlanStatic(
        ops=_PLAN_OPS, tile_size=_PLAN_PARAMS["clahe_tile_size"],
        bilateral_d=_PLAN_PARAMS["bilateral_d"], plan_order=_PLAN_OPS)
    dyn = E.PlanDynamic(
        clahe_clip_limit=_PLAN_PARAMS["clahe_clip_limit"],
        gamma=_PLAN_PARAMS["gamma"],
        unsharp_radius=_PLAN_PARAMS["unsharp_radius"],
        unsharp_amount=_PLAN_PARAMS["unsharp_amount"],
        post_denoise_strength=_PLAN_PARAMS["post_denoise_strength"],
        bilateral_sigma_color=_PLAN_PARAMS["bilateral_sigma_color"],
        bilateral_sigma_space=_PLAN_PARAMS["bilateral_sigma_space"],
        tv_denoise_weight=_PLAN_PARAMS["tv_denoise_weight"],
        denoise_soft=True)

    x = jax.device_put(jnp.asarray(batch))

    # Per-call round-trip latency baseline (compile + 5 timed calls).
    tiny = jax.jit(lambda v: jnp.sum(v))
    float(tiny(x))
    t0 = time.perf_counter()
    for _ in range(5):
        float(tiny(x))
    rtt = (time.perf_counter() - t0) / 5

    from mdx.core.batching import map_subbatches

    @partial(jax.jit, static_argnames=("s", "n"))
    def fused_loop(v, s, d, n):
        def step(c, dd):
            stats = M.image_stats(c)
            return stats, E.apply_plan(c, s, dd,
                                       niqe_before=stats["niqe"])

        def body(i, carry):
            # ≤32-image groups: XLA fusion degrades past that batch
            # (mdx/core/batching.py); 16 metrics + 7 ops + 3 safeguards
            stats, (enh, flags) = map_subbatches(step, carry, d)
            # chain iterations through EVERY output (all 18 stats + the
            # guard flags) so XLA cannot dead-code-eliminate any metric —
            # depending only on one stat lets the compiler drop the rest
            # (measured: a sigma-only dependency inflates the number ~1.5×)
            dep = sum(jnp.sum(a.astype(jnp.float32)) for a in stats.values())
            dep = dep + sum(jnp.sum(f.astype(jnp.float32))
                            for f in jax.tree_util.tree_leaves(flags))
            return enh * (1.0 + 1e-12 * dep)
        return jnp.sum(jax.lax.fori_loop(0, n, body, v))

    float(fused_loop(x, static, dyn, reps))  # compile + warm
    t0 = time.perf_counter()
    float(fused_loop(x, static, dyn, reps))
    dt = max(time.perf_counter() - t0 - rtt, 1e-9)

    # Compiler-counted FLOPs for the measured program (VERDICT r4 weak
    # #3): XLA's own cost model replaces the ±30% hand-summed roofline
    # estimate in the vpu_util the driver records.  Per-image = total
    # program flops / (batch × reps in the fori_loop).
    flops_per_img = None
    try:
        ca = fused_loop.lower(x, static, dyn, reps).compile().cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0] if ca else {}
        fl = float(ca.get("flops", 0.0))
        if fl > 0:
            flops_per_img = fl / (batch.shape[0] * reps)
    except Exception:
        flops_per_img = None
    return batch.shape[0] * reps / dt, flops_per_img


def _measure_baseline(img: np.ndarray) -> float:
    """Single-image NumPy float64 reference-spec pass (metrics + 7-op
    chain).  Best of 3 runs — the most favourable number for the reference,
    i.e. the most conservative vs_baseline for us."""
    from mdx.refimpl import pipeline_np as R

    best = 0.0
    for _ in range(3):
        t0 = time.perf_counter()
        R.compute_metrics(img)
        R.compute_niqe(img)
        R.apply_plan(img, list(_PLAN_OPS), dict(_PLAN_PARAMS))
        best = max(best, 1.0 / (time.perf_counter() - t0))
    return best


def main() -> None:
    init_done = _init_watchdog("bench.py")

    from mdx.pipeline.compile_cache import enable as _enable_compile_cache

    _enable_compile_cache()  # TPU-gated; no-op on the CPU backend
    import jax

    jax.devices()
    init_done.set()
    batch_n = int(os.environ.get("MDX_BENCH_BATCH", "32"))
    reps = int(os.environ.get("MDX_BENCH_REPS", "10"))

    batch = _make_batch(batch_n)
    value, flops_per_img = _measure_tpu(batch, reps)

    baseline, kind = _resolve_baseline(batch)

    vpu_util, vpu_kind = _vpu_util(value, flops_per_img)
    # the analytic roofline estimate is kept alongside: XLA's cost model
    # counts ~25× fewer "flops" than the hand-counted VPU ops (it scores
    # compare/select/transcendental VPU work at ≈0), so the two fields
    # measure different things — cost-analysis for a stable compiler-
    # derived trend, analytic for comparability with the PERF.md
    # roofline and earlier rounds
    vpu_analytic = value * 512 * 512 * _EST_OPS_PER_PX / _VPU_PEAK_OPS

    print(json.dumps({
        "metric": "images/sec/chip, 16-metric + 7-step enhance pass, 512^2",
        "value": round(value, 3),
        "unit": "images/sec/chip",
        "vs_baseline": round(value / baseline, 2),
        "baseline_kind": kind,
        "baseline_ips": round(baseline, 4),
        "vpu_util": round(vpu_util, 3),
        "vpu_util_kind": vpu_kind,
        "vpu_util_analytic": round(vpu_analytic, 3),
    }))


def _vpu_util(value: float, flops_per_img: float | None
              ) -> tuple[float, str]:
    """MFU-style efficiency aggregate: total ops / elapsed / VPU peak.

    Preferred numerator is XLA's own compiled cost analysis (measured,
    not hand-summed); the analytic docs/PERF.md roofline estimate (±30%)
    remains the fallback when cost_analysis is unavailable."""
    if flops_per_img is not None and flops_per_img > 0:
        return value * flops_per_img / _VPU_PEAK_OPS, "xla-cost-analysis"
    return (value * 512 * 512 * _EST_OPS_PER_PX / _VPU_PEAK_OPS,
            "analytic-estimate")


def _resolve_baseline(batch: np.ndarray) -> tuple[float, str]:
    """Measured-reference denominator with explicit provenance."""
    env = os.environ.get("MDX_BASELINE_IPS")
    if env:
        return float(env), "env MDX_BASELINE_IPS (externally measured)"
    try:
        with open(_BASELINE_REF) as f:
            rec = json.load(f)
        impl = rec.get("impl", "?")
        if impl in ("reference", "skimage"):
            kind = f"measured reference ({impl} path, BASELINE_REF.json)"
        else:
            kind = (f"{impl} (BASELINE_REF.json): measured upper bound on "
                    "the real reference's speed — conservative for us; "
                    "see BASELINE.md")
        return float(rec["images_per_sec"]), kind
    except (OSError, ValueError, KeyError):
        pass

    cached = None
    if os.path.exists(_BASELINE_CACHE):
        try:
            with open(_BASELINE_CACHE) as f:
                cached = json.load(f).get("baseline_images_per_sec")
        except (OSError, ValueError):
            cached = None
    if os.environ.get("MDX_BENCH_SKIP_BASELINE") and cached:
        baseline = cached
    else:
        baseline = _measure_baseline(batch[0].astype(np.float64))
        # keep the fastest baseline ever observed (conservative for us)
        baseline = max(baseline, cached or 0.0)
        try:
            with open(_BASELINE_CACHE, "w") as f:
                json.dump({"baseline_images_per_sec": baseline}, f)
        except OSError:
            pass
    return baseline, ("refimpl float64 oracle (measured bias bound: may "
                      "overstate the ratio up to ~2.3x vs the real skimage "
                      "path — tools/baseline_bias.py, BASELINE.md)")


if __name__ == "__main__":
    main()
