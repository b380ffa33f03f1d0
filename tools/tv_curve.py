"""Speed-vs-quality curve for the relaxed-parity TV modes.

VERDICT r4 #4: TV-Chambolle is ~56% of the dense pass's VPU roofline and
its ~86 content-dependent iterations are locked by reference parity; the
opt-in ``MDX_TV_MODE=fast`` cap (mdx/ops/tv.py TV_MODES) is the lever.
This tool measures both sides of the trade so the cap value is chosen
from data, not vibes:

* ``--quality`` (any backend; CPU fine): for each candidate iteration
  cap, max|Δ| and SSIM of the capped full-chain output vs the
  reference-parity chain, plus the objective-score delta through the
  real validation scorer — on the bench's synthetic CXR batch.
* ``--timing`` (real TPU): headline-program throughput (bench.py's
  fused metrics+chain loop) with tv_mode=ref vs fast, tunnel-safe
  chained-reps methodology.

Results feed docs/PERF.md "Relaxed-parity TV" and pick TV_MODES['fast'].
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

os.environ.setdefault("MDX_COMPILE_CACHE", "/tmp/mdx_jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import _init_watchdog  # noqa: E402

_init_done = _init_watchdog("tv_curve.py")

from mdx.pipeline.compile_cache import enable as _enable_compile_cache  # noqa: E402

_enable_compile_cache()
_init_done.set()

import numpy as np  # noqa: E402

from bench import _PLAN_OPS, _PLAN_PARAMS, _make_batch  # noqa: E402


def _plan(tv_mode: str):
    from mdx.core import enhance as E

    static = E.PlanStatic(
        ops=_PLAN_OPS, tile_size=_PLAN_PARAMS["clahe_tile_size"],
        bilateral_d=_PLAN_PARAMS["bilateral_d"], plan_order=_PLAN_OPS,
        tv_mode=tv_mode)
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
    return static, dyn


def quality(batch_n: int, hw: int, caps: list[int]) -> None:
    import jax
    import jax.numpy as jnp

    from mdx.core import enhance as E
    from mdx.core.score import objective_score
    from mdx.core.validate import validate
    from mdx.ops.tv import TV_MODES
    from mdx.ops.ssim import ssim as ssim_fn

    x = jnp.asarray(_make_batch(batch_n, hw))

    def chain(v, cap):
        TV_MODES["_curve"] = (2e-4, cap)
        try:
            static, dyn = _plan("_curve")
            return E.apply_plan(v, static, dyn)[0]
        finally:
            del TV_MODES["_curve"]

    ref = jax.jit(lambda v: chain(v, 200))(x)
    sc_ref = objective_score(validate(x, ref))[0]
    print(f"# quality: batch {batch_n}×{hw}², full 7-op chain + guards; "
          f"vs tv_mode=ref (eps=2e-4, ≤200 it)")
    print(f"{'cap':>5s} {'max|Δ|':>10s} {'SSIM(vs ref)':>13s} "
          f"{'score Δ':>10s}")
    for cap in caps:
        out = jax.jit(lambda v, _c=cap: chain(v, _c))(x)
        d = float(jnp.max(jnp.abs(out - ref)))
        s = float(jnp.mean(ssim_fn(ref, out)))
        sc = objective_score(validate(x, out))[0]
        dsc = float(jnp.max(jnp.abs(sc - sc_ref)))
        print(f"{cap:5d} {d:10.2e} {s:13.6f} {dsc:10.2e}")


def timing(batch_n: int, hw: int, reps: int) -> None:
    import jax
    import jax.numpy as jnp

    from functools import partial

    from mdx.core import enhance as E
    from mdx.core import metrics as M
    from mdx.core.batching import map_subbatches

    x = jax.device_put(jnp.asarray(_make_batch(batch_n, hw)))
    tiny = jax.jit(lambda v: jnp.sum(v))
    float(tiny(x))
    t0 = time.perf_counter()
    for _ in range(5):
        float(tiny(x))
    rtt = (time.perf_counter() - t0) / 5

    @partial(jax.jit, static_argnames=("s", "n"))
    def fused_loop(v, s, d, n):
        def step(c, dd):
            stats = M.image_stats(c)
            return stats, E.apply_plan(c, s, dd,
                                       niqe_before=stats["niqe"])

        def body(i, carry):
            stats, (enh, flags) = map_subbatches(step, carry, d)
            dep = sum(jnp.sum(a.astype(jnp.float32))
                      for a in stats.values())
            dep = dep + sum(jnp.sum(f.astype(jnp.float32))
                            for f in jax.tree_util.tree_leaves(flags))
            return enh * (1.0 + 1e-12 * dep)
        return jnp.sum(jax.lax.fori_loop(0, n, body, v))

    print(f"# timing: headline program, batch {batch_n}×{hw}², "
          f"reps {reps}, median of 3")
    out = {}
    for mode in ("ref", "fast"):
        static, dyn = _plan(mode)
        float(fused_loop(x, static, dyn, reps))  # compile + warm
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            float(fused_loop(x, static, dyn, reps))
            times.append(time.perf_counter() - t0 - rtt)
        dt = sorted(times)[1]
        ips = batch_n * reps / dt
        out[mode] = ips
        print(f"tv_mode={mode:4s}  {ips:9.1f} img/s/chip "
              f"({dt / reps * 1e3:7.2f} ms/batch)")
    print(json.dumps({"ref_ips": round(out['ref'], 1),
                      "fast_ips": round(out['fast'], 1),
                      "speedup": round(out["fast"] / out["ref"], 3)}))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--quality", action="store_true")
    ap.add_argument("--timing", action="store_true")
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--hw", type=int, default=512)
    ap.add_argument("--reps", type=int, default=10)
    ap.add_argument("--caps", default="10,20,40,80,120",
                    help="comma-separated iteration caps (--quality)")
    args = ap.parse_args()
    if args.quality:
        quality(args.batch, args.hw,
                [int(c) for c in args.caps.split(",")])
    if args.timing:
        timing(args.batch, args.hw, args.reps)
    if not (args.quality or args.timing):
        print("nothing to do: pass --quality and/or --timing",
              file=sys.stderr)


if __name__ == "__main__":
    main()
