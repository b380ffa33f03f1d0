"""Probe the REAL Mosaic backend's capability envelope with tiny kernels.

Round 3's first tunnel window proved that ``jax.export(platforms=["tpu"])``
runs the Pallas->Mosaic MLIR lowering but NOT the backend's
infer-vector-layout / apply-vector-layout passes, which is where three
experimental kernels died (gather CLAHE, fused wavelet, fused stats).
This tool compiles one-op kernels against the live remote-compile helper
(~2 s each) so reformulations are designed against ground truth instead
of guesses.  Results feed docs/PERF.md's "Mosaic limits" list.

Each probe prints ``ok`` or the first line of the backend error.  Run on
the TPU backend; ``--interpret`` exists only to smoke-test the harness.

Usage::

    python tools/probe_mosaic.py [--only substr] [--json]
"""

from __future__ import annotations

import argparse
import functools
import json
import os
import sys

os.environ.setdefault("MDX_BENCH_INIT_TIMEOUT", "120")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_ap = argparse.ArgumentParser()
_ap.add_argument("--only", type=str, default="")
_ap.add_argument("--json", action="store_true")
_ap.add_argument("--interpret", action="store_true",
                 help="harness smoke test on the CPU backend (everything "
                      "passes in interpret mode; capability answers are "
                      "meaningless there)")
_args = _ap.parse_args()

if _args.interpret:
    # must precede backend init; the JAX_PLATFORMS env var cannot
    # override the baked-in TPU plugin (see conftest)
    import jax as _jax_cfg

    _jax_cfg.config.update("jax_platforms", "cpu")

from bench import _init_watchdog  # noqa: E402

_init_done = _init_watchdog("probe_mosaic.py")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
from jax.experimental import pallas as pl  # noqa: E402

jax.devices()
_init_done.set()


def _run(kernel, out_shape, *args, interpret=False):
    fn = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(out_shape, jnp.float32),
        interpret=interpret,
    )
    return np.asarray(jax.jit(fn)(*args))


def _probes(interpret):
    x128 = jnp.arange(8 * 128, dtype=jnp.float32).reshape(8, 128)
    x256 = jnp.arange(16 * 256, dtype=jnp.float32).reshape(16, 256)
    x512 = jnp.arange(256 * 512, dtype=jnp.float32).reshape(256, 512)

    def gather_lanes_within(src_ref, out_ref):
        # per-row gather along lanes, source 128 lanes = 1 vreg
        idx = (127 - jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1))
        out_ref[...] = jnp.take_along_axis(src_ref[...], idx, axis=1)

    def gather_lanes_2vreg(src_ref, out_ref):
        # source 256 lanes = 2 vregs along the gather dim
        idx = (255 - jax.lax.broadcasted_iota(jnp.int32, (16, 256), 1))
        out_ref[...] = jnp.take_along_axis(src_ref[...], idx, axis=1)

    def gather_sublanes_within(src_ref, out_ref):
        # per-lane gather along sublanes, source 8 rows = 1 vreg
        idx = (7 - jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0))
        out_ref[...] = jnp.take_along_axis(src_ref[...], idx, axis=0)

    def gather_sublanes_2vreg(src_ref, out_ref):
        idx = (15 - jax.lax.broadcasted_iota(jnp.int32, (16, 256), 0))
        out_ref[...] = jnp.take_along_axis(src_ref[...], idx, axis=0)

    def gather_lanes_wide_idx(src_ref, out_ref):
        # source 1 vreg along gather dim; INDEX/output span 4 vregs.
        # (the shape CLAHE's hi/lo-split remap needs: table 128 wide,
        # pixel indices wide)
        src = src_ref[...]  # [8, 512]
        idx = jax.lax.broadcasted_iota(jnp.int32, (8, 512), 1) % 128
        out_ref[...] = jnp.take_along_axis(src[:, :128], idx, axis=1)

    def reshape_split_sublanes(src_ref, out_ref):
        v = src_ref[...]  # [256, 512]
        vr = v.reshape(128, 2, 512)
        out_ref[...] = vr[:, 0, :] + vr[:, 1, :]

    def reshape_split_lanes(src_ref, out_ref):
        v = src_ref[...]  # [256, 512] -> the wavelet fwd_cols form
        vr = v.reshape(256, 256, 2)
        out_ref[...] = vr[:, :, 0] + vr[:, :, 1]

    def stack_interleave_lanes(src_ref, out_ref):
        v = src_ref[...]  # [256, 512] -> the wavelet syn_cols form
        a, b = v[:, :256], v[:, 256:]
        out_ref[...] = jnp.stack([a, b], axis=-1).reshape(256, 512)

    def stack_interleave_sublanes(src_ref, out_ref):
        v = src_ref[...]
        a, b = v[:128, :], v[128:, :]
        out_ref[...] = jnp.stack([b, a], axis=1).reshape(256, 512)

    def transpose_2d(src_ref, out_ref):
        out_ref[...] = src_ref[...].T

    def strided_slice_lanes(src_ref, out_ref):
        v = src_ref[...]
        out_ref[...] = v[:, ::2] + v[:, 1::2]

    def transpose_bridge_deint_cols(src_ref, out_ref):
        # column deinterleave via the probe-verified ops only:
        # transpose -> SUBLANE reshape-split -> transpose back
        # (the lane-splitting reshape v.reshape(h, w//2, 2) fails
        # infer-vector-layout on the real backend)
        v = src_ref[...]                     # [256, 512]
        vt = v.T                             # [512, 256]
        vr = vt.reshape(256, 2, 256)
        out_ref[...] = vr[:, 0, :].T + vr[:, 1, :].T

    def transpose_bridge_int_cols(src_ref, out_ref):
        # column interleave via transpose -> SUBLANE stack-interleave ->
        # transpose back (lane stack-interleave fails on the real backend)
        v = src_ref[...]                     # [256, 512]
        a, b = v[:, :256], v[:, 256:]
        st = jnp.stack([a.T, b.T], axis=1).reshape(512, 256)
        out_ref[...] = st.T                  # [256, 512]

    def transpose_small(src_ref, out_ref):
        # deep wavelet levels transpose tiny sub-vreg planes
        v = src_ref[...][:16, :16]           # [16, 16] of [16, 256]
        out_ref[...] = v.T

    def iota_select_matmul(src_ref, out_ref):
        # lane-deinterleave as an MXU matmul against an in-kernel
        # iota-built selection matrix: e = v @ S_e, S_e[j,q] = (j == 2q)
        v = src_ref[...]  # [256, 512]
        j = jax.lax.broadcasted_iota(jnp.int32, (512, 256), 0)
        q = jax.lax.broadcasted_iota(jnp.int32, (512, 256), 1)
        s_e = (j == 2 * q).astype(jnp.float32)
        s_o = (j == 2 * q + 1).astype(jnp.float32)
        e = jnp.dot(v, s_e, preferred_element_type=jnp.float32)
        o = jnp.dot(v, s_o, preferred_element_type=jnp.float32)
        out_ref[...] = e + o

    def split_lut_256_select(src_ref, out_ref):
        # The round-4 CLAHE question (VERDICT r3 weak #6): a 256-entry
        # LUT gathered as TWO single-vreg 128-lane halves + hi-bit
        # select.  Each half stays within one source vreg along the
        # gather dim (the probed-ok shape); the index/output span 4
        # vregs.  If this compiles, the banded split-LUT remap replaces
        # the ~830 ops/px matmul remap.
        lut = src_ref[...]                  # [8, 256] per-row LUTs
        lo, hi = lut[:, :128], lut[:, 128:]
        q = jax.lax.broadcasted_iota(jnp.int32, (8, 512), 1) % 256
        ql = q & 127
        a = jnp.take_along_axis(lo, ql, axis=1)
        b = jnp.take_along_axis(hi, ql, axis=1)
        out_ref[...] = jnp.where(q >= 128, b, a)

    def gather_narrow_idx(src_ref, out_ref):
        # idx SUB-vreg (16 lanes), src one vreg: the banded split-LUT
        # remap's per-tile-column shape.  Output padded to 128 lanes via
        # concat so the out block stays vreg-shaped.
        src = src_ref[...]                     # [8, 128]
        idx = (jax.lax.broadcasted_iota(jnp.int32, (8, 16), 1) * 7) % 128
        g = jnp.take_along_axis(src, idx, axis=1)   # [8, 16]
        out_ref[...] = jnp.concatenate(
            [g] * 8, axis=1)                   # [8, 128]

    def gather_many_sublane_vregs(src_ref, out_ref):
        # src [256, 128]: 32 vregs along SUBLANES, one along lanes
        # (per-row tables differ) — the banded remap's row structure.
        src = src_ref[...]                     # [256, 128] of x512
        idx = (127 - jax.lax.broadcasted_iota(jnp.int32, (256, 128), 1))
        out_ref[...] = jnp.take_along_axis(src, idx, axis=1)

    probes = {
        "gather_narrow_idx_16lane": (
            gather_narrow_idx, (8, 128), (x128,),
            lambda o: np.array_equal(
                o, np.tile(np.asarray(x128)[
                    np.arange(8)[:, None],
                    (np.arange(16)[None, :] * 7) % 128], (1, 8)))),
        "gather_many_sublane_vregs": (
            gather_many_sublane_vregs, (256, 128), (x512[:, :128],),
            lambda o: np.array_equal(
                o, np.asarray(x512[:, :128])[:, ::-1])),
        "split_lut_256_select": (
            split_lut_256_select, (8, 512), (x256[:8],),
            lambda o: np.array_equal(
                o, np.asarray(x256[:8])[
                    np.arange(8)[:, None],
                    np.arange(512)[None, :] % 256])),
        "gather_lanes_within_vreg": (
            gather_lanes_within, (8, 128), (x128,),
            lambda o: np.array_equal(o, np.asarray(x128)[:, ::-1])),
        "gather_lanes_2vreg": (
            gather_lanes_2vreg, (16, 256), (x256,),
            lambda o: np.array_equal(o, np.asarray(x256)[:, ::-1])),
        "gather_sublanes_within_vreg": (
            gather_sublanes_within, (8, 128), (x128,),
            lambda o: np.array_equal(o, np.asarray(x128)[::-1, :])),
        "gather_sublanes_2vreg": (
            gather_sublanes_2vreg, (16, 256), (x256,),
            lambda o: np.array_equal(o, np.asarray(x256)[::-1, :])),
        "gather_lanes_wide_idx_narrow_src": (
            gather_lanes_wide_idx, (8, 512), (x512[:8],),
            lambda o: np.array_equal(
                o, np.asarray(x512[:8])[:, :128][
                    np.arange(8)[:, None],
                    np.arange(512)[None, :] % 128])),
        "reshape_split_sublanes": (
            reshape_split_sublanes, (128, 512), (x512,),
            lambda o: np.allclose(
                o, np.asarray(x512).reshape(128, 2, 512).sum(1))),
        "reshape_split_lanes": (
            reshape_split_lanes, (256, 256), (x512,),
            lambda o: np.allclose(
                o, np.asarray(x512).reshape(256, 256, 2).sum(-1))),
        "stack_interleave_lanes": (
            stack_interleave_lanes, (256, 512), (x512,),
            lambda o: np.allclose(
                o, np.stack([np.asarray(x512)[:, :256],
                             np.asarray(x512)[:, 256:]],
                            axis=-1).reshape(256, 512))),
        "stack_interleave_sublanes": (
            stack_interleave_sublanes, (256, 512), (x512,),
            lambda o: np.allclose(
                o, np.stack([np.asarray(x512)[128:],
                             np.asarray(x512)[:128]],
                            axis=1).reshape(256, 512))),
        "transpose_2d": (
            transpose_2d, (512, 256), (x512,),
            lambda o: np.array_equal(o, np.asarray(x512).T)),
        "strided_slice_lanes": (
            strided_slice_lanes, (256, 256), (x512,),
            lambda o: np.allclose(
                o, np.asarray(x512)[:, ::2] + np.asarray(x512)[:, 1::2])),
        "transpose_bridge_deint_cols": (
            transpose_bridge_deint_cols, (256, 256), (x512,),
            lambda o: np.allclose(
                o, np.asarray(x512)[:, ::2] + np.asarray(x512)[:, 1::2])),
        "transpose_bridge_int_cols": (
            transpose_bridge_int_cols, (256, 512), (x512,),
            lambda o: np.allclose(
                o, np.stack([np.asarray(x512)[:, :256],
                             np.asarray(x512)[:, 256:]],
                            axis=-1).reshape(256, 512))),
        "transpose_small_16x16": (
            transpose_small, (16, 16), (x256,),
            lambda o: np.array_equal(o, np.asarray(x256)[:16, :16].T)),
        "iota_select_matmul_deinterleave": (
            iota_select_matmul, (256, 256), (x512,),
            lambda o: np.allclose(
                o, np.asarray(x512)[:, ::2] + np.asarray(x512)[:, 1::2])),
    }
    return probes


def main() -> None:
    args = _args

    results = {}
    for name, (kernel, out_shape, xs, check) in _probes(
            args.interpret).items():
        if args.only and args.only not in name:
            continue
        try:
            out = _run(kernel, out_shape, *xs, interpret=args.interpret)
            ok = bool(check(out))
            results[name] = "ok" if ok else "WRONG RESULT"
        except Exception as e:  # noqa: BLE001
            msg = str(e)
            for line in msg.splitlines():
                if ("Not implemented" in line or "unsupported" in line
                        or "Unsupported" in line or "NYI" in line
                        or "error:" in line):
                    msg = line.strip()
                    break
            else:
                msg = msg.splitlines()[0] if msg else repr(e)
            results[name] = f"FAIL: {msg[:200]}"
        if not args.json:
            print(f"{name:38s} {results[name]}")
    if args.json:
        print(json.dumps(results))


if __name__ == "__main__":
    main()
