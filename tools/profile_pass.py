"""Phase profiler for the fused QA pass — per-block device timings.

Times each building block of the headline pass (metrics + 7-op enhance) in
isolation at a given batch/size, with the tunnel-safe methodology from
bench.py: reps chained inside one jitted ``fori_loop`` with a data
dependency, scalar-only fetch, per-call RTT subtracted.

Usage::

    python tools/profile_pass.py [--batch 32] [--hw 512] [--reps 10]

Prints one line per block: ``name  ms/batch``.  Numbers feed docs/PERF.md.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

# JAX_COMPILATION_CACHE_DIR env is inert in jax 0.9.0; route through the
# TPU-gated compile_cache.enable() after imports instead.
os.environ.setdefault("MDX_COMPILE_CACHE", "/tmp/mdx_jax_cache")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# bound backend init: a wedged TPU tunnel otherwise hangs the tool
# forever before main() (MDX_BENCH_INIT_TIMEOUT, <=0 disables)
from bench import _init_watchdog  # noqa: E402

_init_done = _init_watchdog("profile_pass.py")

from mdx.pipeline.compile_cache import enable as _enable_compile_cache  # noqa: E402

_enable_compile_cache()
_init_done.set()

import numpy as np


# shared synthetic-CXR generator (bench.py) so profiles and the headline
# bench measure identical inputs
from bench import _make_batch as make_batch  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--hw", type=int, default=512)
    ap.add_argument("--reps", type=int, default=10)
    ap.add_argument("--only", type=str, default="",
                    help="comma-separated block-name substrings to run")
    ap.add_argument("--ab", type=str, default="",
                    help="comma-separated ops to A/B "
                         "(unsharp,bilateral,wavelet): times the "
                         "xla vs pallas lowering with a device-side "
                         "parity scalar (max-abs-diff); "
                         "each candidate PINS its lowering (immune to "
                         "the MDX_*_IMPL env).  On a CPU backend the "
                         "pallas candidate runs in interpret mode (tool "
                         "validation only; timings meaningless)")
    ap.add_argument("--ab-only", action="store_true",
                    help="run ONLY the --ab pairs, skipping the regular "
                         "profile blocks (the tunnel-window A/B mode)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from mdx.core import enhance as E
    from mdx.core import metrics as M
    from mdx.ops import filters as F
    from mdx.ops import hist as H
    from mdx.ops import wavelet as W
    from mdx.ops.clahe import clahe as clahe_fn
    from mdx.ops.tv import tv_chambolle
    from mdx.ops.bilateral import bilateral as bilateral_fn

    x = jax.device_put(jnp.asarray(make_batch(args.batch, args.hw)))

    tiny = jax.jit(lambda v: jnp.sum(v))
    float(tiny(x))
    t0 = time.perf_counter()
    for _ in range(5):
        float(tiny(x))
    rtt = (time.perf_counter() - t0) / 5

    def timeit(name, fn, force=False):
        """fn: [N,H,W] -> [N,H,W]-ish array; chained reps, scalar fetch.
        ``force`` bypasses the --only/--ab-only filters (--ab rows were
        explicitly requested)."""
        if not force and args.ab_only:
            return
        if (not force and args.only
                and not any(s in name for s in args.only.split(","))):
            return

        def make_loop(reps):
            @jax.jit
            def loop(v):
                def body(i, carry):
                    out = fn(carry)
                    # fold the result back into the carry so reps chain
                    s = jnp.sum(out) if out.ndim <= 1 else jnp.mean(out)
                    return carry * (1.0 + 1e-12 * s)
                return jnp.sum(jax.lax.fori_loop(0, reps, body, v))
            return loop

        reps = args.reps
        loop = make_loop(reps)
        try:
            float(loop(x))  # compile + warm
        except Exception as e:  # noqa: BLE001
            # a candidate that fails the REAL backend compile (Mosaic
            # passes the client-side export check does not run) must
            # not kill the remaining rows of a scarce tunnel window
            print(f"{name:34s} COMPILE/RUN FAILED: "
                  f"{str(e).splitlines()[0][:200]}")
            return
        t0 = time.perf_counter()
        float(loop(x))
        elapsed = time.perf_counter() - t0
        # tiny ops drown in tunnel RTT at the default rep count (seen
        # as NEGATIVE ms/batch after the subtraction): escalate reps
        # until the loop body dominates the RTT by >=10x
        while elapsed - rtt < 10 * rtt and reps < 4096:
            scale = max(2, int((12 * rtt) / max(elapsed - rtt, 1e-4)))
            reps = min(4096, reps * scale)
            loop = make_loop(reps)
            float(loop(x))
            t0 = time.perf_counter()
            float(loop(x))
            elapsed = time.perf_counter() - t0
        best = elapsed - rtt
        for _ in range(2):
            t0 = time.perf_counter()
            float(loop(x))
            best = min(best, time.perf_counter() - t0 - rtt)
        print(f"{name:34s} {best / reps * 1e3:8.2f} ms/batch"
              + (f"  [reps={reps}]" if reps != args.reps else ""))

    static = E.PlanStatic(
        ops=("denoise", "clahe", "gamma", "unsharp", "post_denoise",
             "bilateral", "tv_denoise"),
        tile_size=16, bilateral_d=5,
        plan_order=("denoise", "clahe", "gamma", "unsharp", "post_denoise",
                    "bilateral", "tv_denoise"))
    dyn = E.PlanDynamic(
        clahe_clip_limit=0.02, gamma=0.95, unsharp_radius=1.0,
        unsharp_amount=0.6, post_denoise_strength=0.3,
        bilateral_sigma_color=0.05, bilateral_sigma_space=0.05,
        tv_denoise_weight=0.05, denoise_soft=True)

    # ---- metric blocks ----
    timeit("estimate_sigma (db2 dwt)", W.estimate_sigma)
    timeit("laplace", F.laplace)
    timeit("gradient_magnitude", F.gradient_magnitude)
    timeit("percentiles x4 (value)", lambda v: H.percentiles(v, [5., 25., 75., 95.]))
    timeit("percentile p90 (grad)",
           lambda v: H.percentiles(F.gradient_magnitude(v), [90.])[0])
    timeit("histogram01 256 + entropy", lambda v: H.shannon_entropy01(v, 256))
    timeit("grad hist 128 + entropy", lambda v: H.entropy_from_hist(
        H.histogram_scaled(F.gradient_magnitude(v), 128,
                           jnp.max(v.reshape(v.shape[0], -1), axis=-1) + 1e-8)))
    timeit("local_variance 7", lambda v: F.local_variance(v, 7))
    timeit("local_variance 16", lambda v: F.local_variance(v, 16))
    def _all_stats(v):
        s = M.image_stats(v)
        return sum(jnp.sum(a) for a in s.values()) + jnp.zeros(())
    timeit("image_stats (all metrics)", _all_stats)

    # ---- enhance blocks ----
    timeit("denoise_wavelet (Bayes, full)", lambda v: W.denoise_wavelet(v))
    timeit("clahe", lambda v: clahe_fn(v, clip_limit=jnp.float32(0.02), tile_size=16))
    timeit("gamma", lambda v: F.adjust_gamma(v, jnp.float32(0.95)))
    timeit("unsharp", lambda v: F.unsharp_mask(v, jnp.float32(1.0), jnp.float32(0.6)))
    timeit("light_denoise (post)", lambda v: E.light_denoise(v, jnp.float32(0.3)))
    timeit("bilateral d=5", lambda v: bilateral_fn(
        v, 5, jnp.float32(0.05), jnp.float32(0.05)))
    timeit("tv_denoise w=0.05", lambda v: tv_chambolle(v, jnp.float32(0.05)))
    timeit("apply_plan (7 ops + guards)",
           lambda v: E.apply_plan(v, static, dyn)[0])
    timeit("FULL pass (stats + plan)",
           lambda v: E.apply_plan(v, static, dyn)[0]
           * (1.0 + 1e-12 * _all_stats(v)))

    # ---- lowering A/Bs (hardware decision for the MDX_*_IMPL autos) ----
    if args.ab:
        from mdx.ops import pallas_kernels as PK

        on_tpu = jax.default_backend() == "tpu"
        rad, amt = jnp.float32(1.0), jnp.float32(0.6)
        sc = jnp.float32(0.05)
        ab_pairs = {}
        if "unsharp" in args.ab:
            ab_pairs["unsharp"] = {
                "xla": lambda v: F.unsharp_mask(v, rad, amt, impl="xla"),
                "pallas": (lambda v: F.unsharp_mask(v, rad, amt,
                                                    impl="pallas"))
                if on_tpu else
                (lambda v: PK.unsharp_tpu(v, rad, amt, interpret=True)),
            }
        if "bilateral" in args.ab:
            ab_pairs["bilateral"] = {
                "xla": lambda v: bilateral_fn(v, 5, sc, sc, impl="xla"),
                "pallas": (lambda v: bilateral_fn(v, 5, sc, sc,
                                                  impl="pallas"))
                if on_tpu else
                (lambda v: PK.bilateral_tpu(v, 5, sc, sc, interpret=True)),
            }
        if "wavelet" in args.ab:
            def _wav_pallas_interp(v):
                lv = W.default_levels(v.shape[-2:], "db1")
                sig = W.mad_sigma_from_hh(W.dwt2(v, "db1")[1][2])
                return PK.wavelet_denoise_tpu(
                    v, sig, jnp.ones((v.shape[0],)), lv, interpret=True)

            ab_pairs["wavelet"] = {
                "xla": lambda v: W.denoise_wavelet(v, impl="xla"),
                "pallas": (lambda v: W.denoise_wavelet(v, impl="pallas"))
                if on_tpu else _wav_pallas_interp,
            }
        for op, pair in ab_pairs.items():
            try:
                pj = jax.jit(
                    lambda v, _a=pair["xla"], _b=pair["pallas"]:
                    jnp.max(jnp.abs(_a(v) - _b(v))))
                print(f"{op + ' parity max|xla-pallas|':34s} "
                      f"{float(pj(x)):8.2e}")
            except Exception as exc:  # noqa: BLE001
                # a pinned 'pallas' that cannot dispatch at this shape
                # (h not divisible by any band), or one that fails the
                # REAL backend compile (Mosaic passes the client-side
                # export check does not run) — skip the pair instead of
                # crashing the tunnel window
                print(f"{op}: skipped ({str(exc).splitlines()[0][:200]})")
                continue
            for variant, fn in pair.items():
                timeit(f"{op}:{variant}", fn, force=True)


if __name__ == "__main__":
    main()
