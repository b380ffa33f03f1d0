"""Sub-batch knee sweep for the dense plan path on real hardware.

The pixel-based knee in ``mdx/core/batching.py`` (``min(32, max(4,
8.4M px // H·W))``) was measured before the Pallas unsharp flip
(docs/PERF.md "The knee is pixel-based"); the banded kernel changes what
the large-image groups run, so the optimum can move.  This tool re-runs
the original sweep: the FULL plan path (``mdx.core.qa._qa_plan_body`` —
stats + 7-op chain + 3 guards + validation + objective) over explicit
group sizes, with every output chained into the rep-loop data
dependency (tunnel-safe methodology, see docs/PERF.md header).

Usage::

    python tools/sweep_knee.py --batch 16 --hw 2048 --groups whole,8,4,2
"""

from __future__ import annotations

import argparse
import os
import sys
import time

os.environ.setdefault("MDX_COMPILE_CACHE", "/tmp/mdx_jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import _init_watchdog  # noqa: E402

_init_done = _init_watchdog("sweep_knee.py")

from mdx.pipeline.compile_cache import enable as _enable_compile_cache  # noqa: E402

_enable_compile_cache()
_init_done.set()

from bench import _make_batch as make_batch  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--hw", type=int, default=2048)
    ap.add_argument("--groups", type=str, default="whole,8,4,2",
                    help="comma list of group sizes; 'whole' = no grouping")
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from functools import partial

    from mdx.core import enhance as E
    from mdx.core.batching import map_subbatches
    from mdx.core.qa import _qa_plan_body

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

    x = jax.device_put(jnp.asarray(make_batch(args.batch, args.hw)))

    tiny = jax.jit(lambda v: jnp.sum(v))
    float(tiny(x))
    t0 = time.perf_counter()
    for _ in range(5):
        float(tiny(x))
    rtt = (time.perf_counter() - t0) / 5

    body = partial(_qa_plan_body, static=static)

    for gs in args.groups.split(","):
        g = args.batch if gs.strip() == "whole" else int(gs)
        if args.batch % g:
            print(f"g={gs:>5s}  SKIP (does not divide batch)")
            continue

        def run(v, g=g):
            enh, flags, validation, score = map_subbatches(
                body, v, dyn, groups=(g,))
            # chain EVERY output into the dependency (honesty rule)
            leaves = jax.tree_util.tree_leaves((score, flags, validation))
            return jnp.mean(enh) + sum(jnp.sum(a) for a in leaves)

        @jax.jit
        def loop(v, run=run):
            def step(i, carry):
                return carry * (1.0 + 1e-12 * run(carry))
            return jnp.sum(jax.lax.fori_loop(0, args.reps, step, v))

        try:
            float(loop(x))  # compile + warm
        except Exception as e:  # noqa: BLE001
            print(f"g={gs:>5s}  COMPILE/RUN FAILED: "
                  f"{str(e).splitlines()[0][:160]}")
            continue
        best = None
        for _ in range(3):
            t0 = time.perf_counter()
            float(loop(x))
            el = time.perf_counter() - t0 - rtt
            best = el if best is None else min(best, el)
        print(f"g={gs:>5s}  {best / args.reps * 1e3:9.1f} ms/batch"
              f"  ({args.batch / (best / args.reps):6.1f} img/s)")


if __name__ == "__main__":
    main()
