"""Hardware timing of the CLAHE formulations at the product shapes.

Times every applicable TPU CLAHE lowering and checks hardware parity
(device-side max-abs-diff vs ``clahe_xla``, scalar fetch) so a Mosaic
miscompile cannot hide behind interpret-mode tests.  Feeds docs/PERF.md.
The gather-remap candidates were deleted after the 2026-08-18 window
measured them as a dead end (real backend rejects multi-vreg
tpu.dynamic_gather; docs/PERF.md).

Formulations (mdx/ops/pallas_kernels.py):

  matmul-whole   _clahe_kernel        — the shipped whole-image kernel
  matmul-banded  _clahe_banded        — the shipped >limit banded kernel

Usage::

    python tools/bench_clahe.py [--reps 10] [--shapes 32x512,4x1024,16x2048]

Tunnel-safe timing: reps chained inside one jitted fori_loop with a data
dependency, scalar-only fetch, per-call RTT subtracted (bench.py method).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

os.environ.setdefault("MDX_COMPILE_CACHE", "/tmp/mdx_jax_cache")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# one synthetic-CXR generator + one init watchdog, shared with the
# headline bench so the two can't drift
from bench import _init_watchdog, _make_batch as make_batch  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=10)
    ap.add_argument("--shapes", type=str, default="32x512,4x1024,16x2048")
    ap.add_argument("--clip", type=float, default=0.02)
    ap.add_argument("--skip-parity", action="store_true",
                    help="skip the clahe_xla hardware parity pass "
                         "(it is slow on TPU at 2048²)")
    ap.add_argument("--sharded-remap", action="store_true",
                    help="also time the sharded-CLAHE remap kernel on "
                         "one shard-sized block per shape (H/8 rows — "
                         "the 8-way 1-D layout), with a synthetic "
                         "halo-extended LUT grid")
    ap.add_argument("--json", action="store_true")
    ap.add_argument("--interpret", action="store_true",
                    help="run the Pallas kernels in interpret mode on the "
                         "CPU backend (tool validation only; timings are "
                         "meaningless)")
    args = ap.parse_args()

    if args.interpret:
        # must precede any jax backend initialisation
        import jax as _jax

        _jax.config.update("jax_platforms", "cpu")

    # this tool is meant to run in the first tunnel window after an
    # outage, when a relapse is most likely — bound backend init exactly
    # as bench.py does (MDX_BENCH_INIT_TIMEOUT, <=0 disables)
    init_done = _init_watchdog("bench_clahe.py")

    # backend-gated: initialises jax, so it must come after argparse
    from mdx.pipeline.compile_cache import enable as _enable_compile_cache

    _enable_compile_cache()

    import jax as _jax_init

    _jax_init.devices()
    init_done.set()

    import jax
    import jax.numpy as jnp

    from mdx.ops import pallas_kernels as PK
    from mdx.ops.clahe import clahe_xla

    results = []

    for spec in args.shapes.split(","):
        n_s, hw_s = spec.strip().split("x")
        n, hw = int(n_s), int(hw_s)
        host = make_batch(n, hw)
        x = jax.device_put(jnp.asarray(host))
        clip = jnp.float32(args.clip)

        tiny = jax.jit(lambda v: jnp.sum(v))
        float(tiny(x))
        t0 = time.perf_counter()
        for _ in range(5):
            float(tiny(x))
        rtt = (time.perf_counter() - t0) / 5

        whole_fits = (hw * hw) <= PK._WHOLE_IMAGE_LIMIT

        interp = bool(args.interpret)

        def banded_matmul(v, c):
            ca = jnp.broadcast_to(jnp.asarray(c, jnp.float32).reshape(-1),
                                  (v.shape[0],))
            return PK._clahe_banded(jnp.clip(v, 0.0, 1.0), ca, 16, 256,
                                    interp)

        def whole_matmul(v, c):
            # clahe_tpu below the size limit == the whole-image kernel
            return PK.clahe_tpu(v, c, 16, 256, interpret=interp)

        cands = {}
        if whole_fits:
            cands["matmul-whole"] = whole_matmul
        cands["matmul-banded"] = banded_matmul

        row = {"shape": spec.strip(), "rtt_ms": rtt * 1e3}

        # hardware parity: device-side max |candidate - clahe_xla|
        if not args.skip_parity:
            @jax.jit
            def _golden(v, c):
                return clahe_xla(v, c, 16, 256)

            g = _golden(x, clip)
            for name, fn in list(cands.items()):
                # a formulation that fails the REAL backend compile
                # (e.g. a Mosaic pass the client-side export check does
                # not run) must not cost the window the other rows —
                # record the failure and drop the candidate
                try:
                    row[f"parity_{name}"] = float(
                        jnp.max(jnp.abs(fn(x, clip) - g)))
                except Exception as e:  # noqa: BLE001
                    row[f"error_{name}"] = str(e).split("\n")[0][:300]
                    del cands[name]
                    if not args.json:
                        print(f"{spec.strip():>10s}  {name:14s} "
                              f"COMPILE/RUN FAILED: {row[f'error_{name}']}")
            del g

        # timing: chained reps, scalar fetch
        for name, fn in cands.items():
            @jax.jit
            def loop(v, c, fn=fn):
                def body(i, carry):
                    out = fn(carry, c)
                    return carry * (1.0 + 1e-12 * jnp.mean(out))
                return jnp.sum(jax.lax.fori_loop(0, args.reps, body, v))

            try:
                float(loop(x, clip))  # compile + warm
            except Exception as e:  # noqa: BLE001
                row.setdefault(f"error_{name}",
                               str(e).split("\n")[0][:300])
                if not args.json:
                    print(f"{spec.strip():>10s}  {name:14s} "
                          f"COMPILE/RUN FAILED: {row[f'error_{name}']}")
                continue
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                float(loop(x, clip))
                best = min(best, time.perf_counter() - t0 - rtt)
            ms = best / args.reps * 1e3
            row[f"ms_{name}"] = ms
            if not args.json:
                par = row.get(f"parity_{name}")
                par_s = f"  maxdiff {par:.2e}" if par is not None else ""
                print(f"{spec.strip():>10s}  {name:14s} {ms:8.2f} ms/batch"
                      f"{par_s}")
        if args.sharded_remap and hw % (8 * 16) == 0:
            # one shard of the 8-way 1-D row layout; LUT grid built by
            # the real sharded-path helper, halo rows synthesised by
            # edge-padding (timing-equivalent to ppermuted neighbours)
            from mdx.parallel.clahe_sp import (
                _local_luts, _remap_ext_pallas,
            )

            hs = hw // 8
            xs = jax.device_put(jnp.asarray(host[:, :hs, :]))
            xp0 = jnp.clip(xs, 0.0, 1.0)
            lut = _local_luts(xp0, clip, 16, 256)
            lut_ext = jnp.pad(lut, ((0, 0), (1, 1), (0, 0), (0, 0)),
                              mode="edge")
            lut_ext = jnp.pad(lut_ext, ((0, 0), (0, 0), (1, 1), (0, 0)),
                              mode="edge")

            remaps = {
                "remap-matmul": lambda v: _remap_ext_pallas(
                    v, lut_ext, 16, 256, interp),
            }
            for name, fn in remaps.items():
                @jax.jit
                def rloop(v, fn=fn):
                    def body(i, carry):
                        out = fn(carry)
                        return carry * (1.0 + 1e-12 * jnp.mean(out))
                    return jnp.sum(jax.lax.fori_loop(0, args.reps, body, v))

                try:
                    float(rloop(xp0))
                except Exception as e:  # noqa: BLE001
                    row[f"error_{name}"] = str(e).split("\n")[0][:300]
                    if not args.json:
                        print(f"{spec.strip():>10s}  {name:14s} "
                              f"COMPILE/RUN FAILED: {row[f'error_{name}']}")
                    continue
                best = float("inf")
                for _ in range(3):
                    t0 = time.perf_counter()
                    float(rloop(xp0))
                    best = min(best, time.perf_counter() - t0 - rtt)
                ms = best / args.reps * 1e3
                row[f"ms_{name}"] = ms
                if not args.json:
                    print(f"{spec.strip():>10s}  {name:14s} {ms:8.2f} "
                          f"ms/shard-block({n}x{hs}x{hw})")

        results.append(row)

    if args.json:
        print(json.dumps(results))


if __name__ == "__main__":
    main()
