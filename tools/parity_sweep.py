"""Real-backend numeric parity sweep for every shipped Pallas path.

The round-4 gather probes proved a silent-wrong-results class on the real
Mosaic backend (`tpu.dynamic_gather` compiles, passes interpret mode and
miscomputes unless src AND idx are each exactly one vreg — docs/PERF.md
probe matrix): interpret-mode parity tests CANNOT certify a kernel, and a
jaxlib/Mosaic upgrade could silently re-open the class on kernels that
were individually checked at flip time.  This tool is the re-runnable
sweep (VERDICT r4 weak #4): one command that computes max|pallas − xla|
ON THE REAL BACKEND for all shipped kernel paths at their dispatch
shapes, prints the matrix for docs/PERF.md, and exits non-zero on any
tolerance breach or compile failure.

Run it once per hardware window and after ANY jaxlib/Mosaic change (the
swept-platform guard in mdx/ops/pallas_kernels.py points here when the
jax version moves).

Usage::

    python tools/parity_sweep.py [--only clahe,tv] [--json]
    python tools/parity_sweep.py --interpret --small   # CPU harness check

``--interpret`` runs the Pallas side in interpret mode (tool-harness
validation on CPU only — it cannot catch the real-backend class, which
is the whole point of the default mode).  ``--small`` shrinks shapes so
interpret mode finishes quickly; banded kernels keep banded dispatch.

Parity scalars are computed device-side inside one jit (both lowerings in
the same program, scalar-only fetch) — tunnel-safe like every bench tool.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

os.environ.setdefault("MDX_COMPILE_CACHE", "/tmp/mdx_jax_cache")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import _init_watchdog  # noqa: E402

_init_done = _init_watchdog("parity_sweep.py")

from mdx.pipeline.compile_cache import enable as _enable_compile_cache  # noqa: E402

_enable_compile_cache()
_init_done.set()

import numpy as np  # noqa: E402

from bench import _make_batch  # noqa: E402


def _rows(small: bool, interpret: bool):
    """(name, shape, builder) rows; builder(x) -> (pallas_out, xla_out).

    Shapes are the ops' real dispatch classes (small mode shrinks them for
    CPU interpret runs but keeps each kernel's whole/banded dispatch).
    """
    import jax.numpy as jnp

    from mdx.ops import filters as F
    from mdx.ops import pallas_kernels as PK
    from mdx.ops.bilateral import bilateral as bilateral_fn
    from mdx.ops.clahe import clahe_xla
    from mdx.ops.tv import tv_chambolle_xla

    wshape = (2, 128, 128) if small else (4, 512, 512)
    w1024 = (2, 128, 128) if small else (2, 1024, 1024)
    bshape = (1, 256, 256) if small else (1, 2048, 2048)
    bband = PK.tv_band_for(bshape[1])
    assert bband, "banded shape must have a dividing band"
    clip = jnp.float32(0.02)
    wgt = jnp.float32(0.05)
    rad, amt = jnp.float32(1.0), jnp.float32(0.6)
    sig = jnp.float32(0.05)
    itv = 40 if small else 200  # small mode: bound interpret-mode cost

    def clahe_pair(v):
        return (PK.clahe_tpu(v, jnp.broadcast_to(clip, (v.shape[0],)),
                             16, 256, interpret=interpret),
                clahe_xla(v, clip, 16, 256))

    def tv_whole(v):
        return (PK.tv_chambolle_tpu(v, wgt, max_iter=itv,
                                    interpret=interpret),
                tv_chambolle_xla(v, wgt, max_iter=itv))

    def tv_banded(v):
        return (PK.tv_chambolle_banded(v, wgt, max_iter=itv, band=bband,
                                       interpret=interpret),
                tv_chambolle_xla(v, wgt, max_iter=itv))

    def unsharp_whole(v):
        return (PK.unsharp_tpu(v, rad, amt, interpret=interpret),
                F.unsharp_mask(v, rad, amt, impl="xla"))

    def unsharp_banded(v):
        return (PK.unsharp_banded_tpu(v, rad, amt, band=bband,
                                      interpret=interpret),
                F.unsharp_mask(v, rad, amt, impl="xla"))

    def bilateral_whole(v):
        return (PK.bilateral_tpu(v, 5, sig, sig, interpret=interpret),
                bilateral_fn(v, 5, sig, sig, impl="xla"))

    def bilateral_banded(v):
        return (PK.bilateral_banded_tpu(v, 5, sig, sig, band=bband,
                                        interpret=interpret),
                bilateral_fn(v, 5, sig, sig, impl="xla"))

    def box_stats(v):
        n = v.shape[0]
        got = PK.box_stats_tpu(v, interpret=interpret)
        lv7s = jnp.sqrt(F.local_variance(v, 7)).reshape(n, -1)
        lv16 = F.local_variance(v, 16).reshape(n, -1)
        want = (jnp.std(lv7s, axis=-1), jnp.mean(lv16, axis=-1),
                jnp.std(lv16, axis=-1))
        return jnp.stack(got), jnp.stack(want)

    # tolerances: the interpret-parity test bounds (tests/test_pallas.py)
    # with headroom for the larger sweep shapes' f32 accumulation order
    return [
        ("clahe:whole", wshape, clahe_pair, 2e-5),
        ("clahe:whole-1024", w1024, clahe_pair, 2e-5),
        ("clahe:banded", bshape, clahe_pair, 2e-5),
        ("tv:whole", wshape, tv_whole, 1e-5),
        ("tv:banded", bshape, tv_banded, 1e-5),
        ("unsharp:whole", wshape, unsharp_whole, 1e-5),
        ("unsharp:banded", bshape, unsharp_banded, 1e-5),
        ("bilateral:whole", w1024, bilateral_whole, 1e-5),
        ("bilateral:banded", bshape, bilateral_banded, 1e-5),
        ("box_stats", wshape, box_stats, 1e-4),
    ]


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--only", default="",
                    help="comma-separated row-name substrings")
    ap.add_argument("--interpret", action="store_true",
                    help="Pallas in interpret mode (CPU harness check — "
                         "NOT a real-backend certification)")
    ap.add_argument("--small", action="store_true",
                    help="tiny shapes (with --interpret on CPU)")
    ap.add_argument("--json", action="store_true",
                    help="emit one JSON summary line after the matrix")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    backend = jax.default_backend()
    kind = jax.devices()[0].device_kind
    if backend != "tpu" and not args.interpret:
        print("parity_sweep: backend is not TPU — the sweep certifies "
              "the REAL backend; use --interpret for a harness check.",
              file=sys.stderr)
        return 2
    mode = "interpret" if args.interpret else "real-backend"
    print(f"# parity sweep: mode={mode} backend={backend} "
          f"device_kind={kind!r} jax={jax.__version__}")

    results = []
    ok = True
    for name, shape, pair, tol in _rows(args.small, args.interpret):
        if args.only and not any(s in name
                                 for s in args.only.split(",")):
            continue
        x = jax.device_put(jnp.asarray(_make_batch(shape[0], shape[1])))

        def diff(v, _pair=pair):
            a, b = _pair(v)
            return jnp.max(jnp.abs(a - b))

        try:
            d = float(jax.jit(diff)(x))
        except Exception as exc:  # noqa: BLE001
            # a shipped path failing the real compile IS a regression
            print(f"{name:20s} {shape[1]}x{shape[2]}x{shape[0]:<3d} "
                  f"COMPILE/RUN FAILED: {str(exc).splitlines()[0][:160]}")
            results.append({"kernel": name, "shape": list(shape),
                            "status": "compile-failed"})
            ok = False
            continue
        passed = bool(np.isfinite(d) and d <= tol)
        ok = ok and passed
        print(f"{name:20s} {shape[1]}x{shape[2]}x{shape[0]:<3d} "
              f"max|Δ| {d:10.3e}  tol {tol:.0e}  "
              f"{'ok' if passed else 'FAIL'}")
        results.append({"kernel": name, "shape": list(shape),
                        "max_abs_diff": d, "tol": tol,
                        "status": "ok" if passed else "fail"})
    if args.json:
        print(json.dumps({"mode": mode, "backend": backend,
                          "device_kind": kind,
                          "jax_version": jax.__version__,
                          "ok": ok, "rows": results}))
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
