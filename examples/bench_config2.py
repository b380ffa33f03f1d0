"""BASELINE config 2: batched 2048² CXR — fused denoise → CLAHE →
unsharp on a device batch (spec says 64; round-3 numbers were batch 16,
VERDICT r3 weak #2).

Device-resident measurement with the tunnel-safe methodology (reps
chained inside ONE jit via a data dependency, scalar fetch, RTT
subtracted — docs/PERF.md header): the batch is grouped through the
``mdx/core/batching.py`` pixel knee exactly as the product plan path
groups it, so this measures the shipping configuration at the shipping
group size (2048² → groups of 4).

Usage:  python examples/bench_config2.py [--batch 64] [--hw 2048]
        [--groups 0]   # 0 = product group_limit; N pins a group size
Prints one JSON line: ms/batch + img/s/chip at the measured batch.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

os.environ.setdefault("MDX_COMPILE_CACHE", "/tmp/mdx_jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import _init_watchdog, _make_batch  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--hw", type=int, default=2048)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--groups", type=int, default=0,
                    help="0 = product group_limit(); N pins the group")
    ap.add_argument("--bare", action="store_true",
                    help="time the bare 3-op chain (no safeguards) — the "
                         "chain-cost figure; default times apply_plan, "
                         "the shipping guarded path")
    args = ap.parse_args()

    init_done = _init_watchdog("bench_config2.py")
    from mdx.pipeline.compile_cache import enable as _enable

    _enable()
    import jax
    import jax.numpy as jnp
    from functools import partial

    jax.devices()
    init_done.set()

    from mdx.core import enhance as E
    from mdx.core.batching import group_limit, map_subbatches

    static = E.PlanStatic(ops=("denoise", "clahe", "unsharp"),
                          tile_size=16, bilateral_d=0,
                          plan_order=("denoise", "clahe", "unsharp"))
    dyn = E.PlanDynamic(clahe_clip_limit=0.02, gamma=1.0,
                        unsharp_radius=1.0, unsharp_amount=0.6,
                        post_denoise_strength=0.0,
                        bilateral_sigma_color=0.05,
                        bilateral_sigma_space=0.05,
                        tv_denoise_weight=0.0, denoise_soft=True)

    group = args.groups or group_limit((1, args.hw, args.hw))
    x = jax.device_put(jnp.asarray(_make_batch(args.batch, args.hw)))

    tiny = jax.jit(lambda v: jnp.sum(v))
    float(tiny(x))
    t0 = time.perf_counter()
    for _ in range(5):
        float(tiny(x))
    rtt = (time.perf_counter() - t0) / 5

    @partial(jax.jit, static_argnames=("s", "n", "g"))
    def fused_loop(v, s, d, n, g):
        def chain(c, dd):
            if args.bare:
                import jax.numpy as jnp2

                nimg = c.shape[0]
                masks = {op: jnp2.ones((nimg,), bool) for op in s.ops}
                amount = jnp2.broadcast_to(
                    jnp2.float32(dd.unsharp_amount), (nimg,))
                out = E._run_chain(c, s.order(), s, dd, masks, amount)
                return out, {"none": jnp2.zeros((nimg,), bool)}
            out, flags = E.apply_plan(c, s, dd, niqe_before=None)
            return out, flags

        def body(i, carry):
            out, flags = map_subbatches(chain, carry, d, groups=(g,))
            dep = sum(jnp.sum(f.astype(jnp.float32))
                      for f in jax.tree_util.tree_leaves(flags))
            return out * (1.0 + 1e-12 * dep)
        return jnp.sum(jax.lax.fori_loop(0, n, body, v))

    t0 = time.perf_counter()
    float(fused_loop(x, static, dyn, args.reps, group))  # compile + warm
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    float(fused_loop(x, static, dyn, args.reps, group))
    dt = max(time.perf_counter() - t0 - rtt, 1e-9)
    ms_batch = dt / args.reps * 1e3
    print(json.dumps({
        "config": "2: fused denoise+clahe+unsharp",
        "hw": args.hw, "batch": args.batch, "group": group,
        "ms_per_batch": round(ms_batch, 1),
        "img_per_s_chip": round(args.batch / (ms_batch / 1e3), 1),
        "compile_s_first_call": round(compile_s, 1),
    }))


if __name__ == "__main__":
    main()
