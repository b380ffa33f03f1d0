"""Spatial-path anchors on the real chip (k=1 mesh) — docs/PERF.md numbers.

Measures, with the tunnel-safe methodology (reps chained inside one jit
with a data dependency over EVERY output, scalar fetch, RTT subtracted):

1. the fused spatial metric pass at --hw, and the same pass with the
   order-statistic searches split per source (the pre-fusion program) —
   the A/B for the multi-source search win,
2. the full spatial QA anchor (detect → denoise → noise guard →
   after-metrics + SSIM/PSNR), and
3. the plan-path anchor (5-op qa_plan_spatial chain + 3 safeguards +
   validation + objective).

Usage::

    python tools/bench_spatial.py [--hw 1024] [--reps 5]
"""

from __future__ import annotations

import argparse
import dataclasses
import os
import sys
import time
from functools import partial

# JAX_COMPILATION_CACHE_DIR env is inert in jax 0.9.0; route through the
# TPU-gated compile_cache.enable() after imports instead.
os.environ.setdefault("MDX_COMPILE_CACHE", "/tmp/mdx_jax_cache")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# bound backend init: a wedged TPU tunnel otherwise hangs the tool
# forever before main() (MDX_BENCH_INIT_TIMEOUT, <=0 disables)
from bench import _init_watchdog  # noqa: E402

_init_done = _init_watchdog("bench_spatial.py")

from mdx.pipeline.compile_cache import enable as _enable_compile_cache  # noqa: E402

_enable_compile_cache()
_init_done.set()

import numpy as np


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--hw", type=int, default=1024)
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--only", type=str, default="")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax import shard_map
    from jax.sharding import NamedSharding, PartitionSpec as P

    from mdx.core import enhance as E
    from mdx.ops.quantile import percentiles_exact_sharded
    from mdx.parallel import make_mesh
    from mdx.parallel import spatial as S
    from mdx.parallel._spmd_stats import image_stats_block
    from mdx.parallel.plan_sp import _layout_1d, _qa_plan_block

    mesh = make_mesh(n_data=1, n_space=1, devices=jax.devices()[:1])
    hw = args.hw
    rng = np.random.default_rng(0)
    yy, xx = np.mgrid[0:hw, 0:hw]
    base = 0.35 + 0.3 * np.sin(xx / 37.0) * np.cos(yy / 53.0)
    x = np.clip(base[None] + rng.normal(0, 0.06, (1, hw, hw)),
                0.0, 1.0).astype(np.float32)
    spec = P("data", "space", None)
    x = jax.device_put(jnp.asarray(x), NamedSharding(mesh, spec))

    tiny = jax.jit(lambda v: jnp.sum(v))
    float(tiny(x))
    t0 = time.perf_counter()
    for _ in range(5):
        float(tiny(x))
    rtt = (time.perf_counter() - t0) / 5

    def timeit(name, block, in_specs, out_specs, *extra):
        if args.only and not any(s in name for s in args.only.split(",")):
            return
        prog = shard_map(block, mesh=mesh, in_specs=in_specs,
                         out_specs=out_specs, check_vma=False)

        @jax.jit
        def loop(v, *rest):
            def body(i, carry):
                out = prog(carry, *rest)
                tot = sum(jnp.mean(leaf.astype(jnp.float32))
                          for leaf in jax.tree_util.tree_leaves(out))
                return carry * (1.0 + 1e-12 * tot)
            return jnp.sum(jax.lax.fori_loop(0, args.reps, body, v))

        float(loop(x, *extra))  # compile + warm
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            float(loop(x, *extra))
            best = min(best, time.perf_counter() - t0 - rtt)
        print(f"{name:44s} {best / args.reps * 1e3:8.1f} ms")

    # ---- 1. metric pass: fused vs per-source searches ----
    def _pq_multi_separate(sources):
        k = jax.lax.axis_size("space")
        return [percentiles_exact_sharded(
            v, qs, "space", v[0].size * k if total is None else total,
            weights=w) for v, qs, total, w in sources]

    prims_sep = dataclasses.replace(S._PRIMS, pq_multi=_pq_multi_separate)
    timeit("image_stats (fused multi-search)",
           lambda v: image_stats_block(v, S._PRIMS), spec, P("data"))
    timeit("image_stats (separate searches)",
           lambda v: image_stats_block(v, prims_sep), spec, P("data"))

    # ---- 2. full spatial QA anchor ----
    qa_block = partial(S._qa_block, bilateral_d=5, clahe_tile=0,
                       use_tv=False, use_denoise=True,
                       use_post_denoise=False, use_noise_guard=True)
    scalars = tuple(jnp.float32(v) for v in
                    (0.95, 0.8, 0.5, 0.05, 0.05, 0.0, 0.0, 0.0))
    timeit("qa_spatial (detect+denoise+guard+validate)", qa_block,
           (spec,) + (P(),) * 8,
           (P("data"), P("data"), spec) + (P("data"),) * 5, *scalars)

    # ---- 3. plan-path anchor ----
    ops = ("denoise", "clahe", "gamma", "unsharp", "post_denoise")
    static = E.PlanStatic(ops=ops, tile_size=16, bilateral_d=0,
                          plan_order=ops)
    dyn = E.PlanDynamic(
        clahe_clip_limit=0.02, gamma=0.95, unsharp_radius=1.0,
        unsharp_amount=0.6, post_denoise_strength=0.3,
        bilateral_sigma_color=0.05, bilateral_sigma_space=0.05,
        tv_denoise_weight=0.0, denoise_soft=True)
    dyn_j = E.PlanDynamic(*(jnp.asarray(v) for v in dyn))
    masks = {op: jnp.ones((1,), bool) for op in E.OP_ORDER}
    timeit("qa_plan_spatial (5 ops + 3 guards + score)",
           partial(_qa_plan_block, static=static, lay=_layout_1d()),
           (spec, P(), P("data")),
           (spec, P("data"), P("data"), P("data"), P("data")),
           dyn_j, masks)


if __name__ == "__main__":
    main()
