"""Hardware A/B for the BANDED bilateral kernel (>1024² class) — the
lean form of ``profile_pass --ab bilateral`` for big shapes.

profile_pass compiles parity (both lowerings in ONE jit) at the full
timing batch; at 4×2048² that program exceeded a 25-minute tunnel
compile.  Here the three programs compile separately and smaller:

1. parity: max|xla − banded| at batch 1 (the kernel is per-(image,band)
   grid — batch does not change its code paths);
2. timing xla: chained-reps fori_loop at the timing batch;
3. timing banded: same.

Usage: python tools/ab_bilateral_banded.py [--batch 4] [--hw 2048]
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
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--hw", type=int, default=2048)
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--d", type=int, default=5)
    args = ap.parse_args()

    init_done = _init_watchdog("ab_bilateral_banded.py")
    from mdx.pipeline.compile_cache import enable as _enable

    _enable()
    import jax
    import jax.numpy as jnp
    from functools import partial

    jax.devices()
    init_done.set()

    from mdx.ops.bilateral import bilateral
    from mdx.ops.pallas_kernels import bilateral_banded_tpu, tv_band_for

    band = tv_band_for(args.hw)
    sc = jnp.float32(0.05)
    x1 = jax.device_put(jnp.asarray(_make_batch(1, args.hw)))
    x = jax.device_put(jnp.asarray(_make_batch(args.batch, args.hw)))

    t0 = time.perf_counter()
    par = float(jax.jit(
        lambda v: jnp.max(jnp.abs(
            bilateral(v, args.d, sc, sc, impl="xla")
            - bilateral_banded_tpu(v, args.d, sc, sc, band=band))))(x1))
    t_par = time.perf_counter() - t0
    print(f"parity max|xla-banded| = {par:.2e} "
          f"(batch 1, compile+run {t_par:.0f}s)", flush=True)

    tiny = jax.jit(lambda v: jnp.sum(v))
    float(tiny(x))
    t0 = time.perf_counter()
    for _ in range(5):
        float(tiny(x))
    rtt = (time.perf_counter() - t0) / 5

    def timed(fn, name):
        @partial(jax.jit, static_argnames=("n",))
        def loop(v, n):
            def body(i, c):
                return fn(c) * (1.0 - 1e-12 * jnp.float32(i))
            return jnp.sum(jax.lax.fori_loop(0, n, body, v))
        t0 = time.perf_counter()
        float(loop(x, args.reps))
        t_compile = time.perf_counter() - t0
        t0 = time.perf_counter()
        float(loop(x, args.reps))
        dt = max(time.perf_counter() - t0 - rtt, 1e-9)
        ms = dt / args.reps * 1e3
        print(f"{name}: {ms:.2f} ms/batch (compile {t_compile:.0f}s)",
              flush=True)
        return ms

    ms_xla = timed(lambda v: bilateral(v, args.d, sc, sc, impl="xla"),
                   "xla      ")
    ms_pal = timed(lambda v: bilateral_banded_tpu(v, args.d, sc, sc,
                                                  band=band),
                   "banded   ")
    print(json.dumps({
        "shape": f"{args.batch}x{args.hw}^2", "band": band,
        "parity_maxabs": par, "xla_ms": round(ms_xla, 2),
        "banded_ms": round(ms_pal, 2),
        "speedup": round(ms_xla / ms_pal, 2),
    }))


if __name__ == "__main__":
    main()
