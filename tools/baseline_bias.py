"""Bound the refimpl-float64 baseline's bias vs the REAL reference — offline.

``mdx.refimpl`` (the round-1..3 bench denominator) pins float64, while the
real reference's scikit-image path preserves the float32 input through most
ops and does its DWTs in PyWavelets C.  scikit-image is not installable in
this offline environment, so this tool derives a MEASURED upper bound on
how much faster the real reference could plausibly be:

1. time the full refimpl headline pass (metrics + NIQE + 7-op chain,
   bench.py's exact program) and attribute in-pass wall time to the four
   phases whose reference counterparts could be faster (TV, DWT family,
   bilateral, CLAHE) by wrapping them with timers;
2. measure the float64/float32 cost ratio of the same algorithms at the
   same shapes (TV per-iteration loop, bilateral window loop,
   uniform_filter, 3x3 convolve) — dtype is the dominant bias mechanism;
3. assume every reference-favourable break: TV, bilateral and CLAHE at
   full float32 speed, the DWT family FREE (PyWavelets treated as
   infinitely fast), and the residual phases at the uniform-filter f32
   ratio;
4. bound_factor = refimpl_time / optimistic_reference_time.

``--record`` writes BASELINE_REF.json with
``images_per_sec = refimpl_ips * bound_factor`` (impl
"refimpl-f32-bound") — a defensible LOWER bound on the true headline
ratio, used by bench.py until a real measured number (CI's skimage job,
``tools/bench_reference.py --record``) replaces it.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

from bench import _PLAN_OPS, _PLAN_PARAMS, _make_batch  # noqa: E402
from tools.bench_reference import RECORD_PATH  # noqa: E402


def _best(fn, n=3):
    b = float("inf")
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        b = min(b, time.perf_counter() - t0)
    return b


def _tv32(image, weight, eps=2e-4, max_iter=200):
    """float32 TV-Chambolle, byte-for-byte the refimpl algorithm
    (mdx/refimpl/filters_np.py tv_chambolle) with dtype preserved."""
    img = image
    p = np.zeros((2,) + img.shape, np.float32)
    g = np.zeros_like(p)
    d = np.zeros_like(img)
    e_init = e_prev = 0.0
    out = img
    for i in range(max_iter):
        if i > 0:
            d = -p.sum(0)
            d[1:, :] += p[0, :-1, :]
            d[:, 1:] += p[1, :, :-1]
            out = img + d
        else:
            out = img
        e = float((d * d).sum())
        g[0, :-1, :] = np.diff(out, axis=0)
        g[0, -1, :] = 0
        g[1, :, :-1] = np.diff(out, axis=1)
        g[1, :, -1] = 0
        norm = np.sqrt((g * g).sum(axis=0))[None]
        e += weight * float(norm.sum())
        tau = np.float32(0.25)
        norm = norm * tau / weight + 1
        p = (p - tau * g) / norm
        e /= img.size
        if i == 0:
            e_init = e_prev = e
        else:
            if abs(e_prev - e) < eps * e_init:
                break
            e_prev = e
    return out


def _bilateral32(img, d, sigma_color, sigma_space):
    r = d // 2
    padded = np.pad(img, r, mode="reflect")
    num = np.zeros_like(img)
    den = np.zeros_like(img)
    h, w = img.shape
    for dy in range(-r, r + 1):
        for dx in range(-r, r + 1):
            sh = padded[r + dy:r + dy + h, r + dx:r + dx + w]
            sw = np.float32(np.exp(-(dx * dx + dy * dy)
                                   / (2 * sigma_space ** 2 * d * d)))
            iw = np.exp(-((img - sh) ** 2)
                        / np.float32(2 * sigma_color ** 2))
            wgt = sw * iw
            num += wgt * sh
            den += wgt
    return num / (den + np.float32(1e-10))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--record", action="store_true")
    args = ap.parse_args()

    from mdx.refimpl import filters_np as F
    from mdx.refimpl import pipeline_np as R
    from mdx.refimpl import wavelet_np as W

    img64 = _make_batch(1, args.size)[0].astype(np.float64)
    img32 = img64.astype(np.float32)

    # -- 1. in-pass attribution ------------------------------------------
    acc: dict[str, float] = {}

    def wrap(mod, name, key):
        orig = getattr(mod, name)

        def timed(*a, **k):
            t0 = time.perf_counter()
            try:
                return orig(*a, **k)
            finally:
                acc[key] = acc.get(key, 0.0) + time.perf_counter() - t0
        setattr(mod, name, timed)
        return (mod, name, orig)

    saved = [wrap(W, "estimate_sigma", "dwt"),
             wrap(W, "denoise_wavelet", "dwt"),
             wrap(F, "tv_chambolle", "tv"),
             wrap(F, "clahe", "clahe"),
             wrap(F, "bilateral", "bilateral")]
    try:
        def full():
            acc.clear()
            R.compute_metrics(img64)
            R.compute_niqe(img64)
            R.apply_plan(img64, list(_PLAN_OPS), dict(_PLAN_PARAMS))
        total = _best(full, args.repeats)
        shares = dict(acc)  # from the LAST (fastest-comparable) run
    finally:
        for mod, name, orig in saved:
            setattr(mod, name, orig)

    residual = total - sum(shares.values())

    # -- 2. measured f64/f32 ratios --------------------------------------
    from scipy.ndimage import uniform_filter
    w32 = np.float32(_PLAN_PARAMS["tv_denoise_weight"])
    ratios = {
        "tv": _best(lambda: F.tv_chambolle(
            img64, _PLAN_PARAMS["tv_denoise_weight"]), args.repeats)
        / _best(lambda: _tv32(img32, w32), args.repeats),
        "bilateral": _best(lambda: F.bilateral(img64, 5, 0.05, 0.05),
                           args.repeats)
        / _best(lambda: _bilateral32(img32, 5, 0.05, 0.05), args.repeats),
        "uniform7": _best(lambda: uniform_filter(img64, 7), args.repeats)
        / _best(lambda: uniform_filter(img32, 7), args.repeats),
    }

    # -- 3./4. the reference-favourable bound -----------------------------
    optimistic = (shares.get("tv", 0.0) / ratios["tv"]
                  + shares.get("bilateral", 0.0) / ratios["bilateral"]
                  + shares.get("clahe", 0.0) / ratios["tv"]  # f32 numpy class
                  + 0.0  # DWT family: PyWavelets treated as free
                  + residual / ratios["uniform7"])
    bound_factor = total / optimistic
    refimpl_ips = 1.0 / total

    out = {
        "refimpl_seconds_per_image": total,
        "in_pass_shares_s": shares,
        "residual_s": residual,
        "f64_over_f32_ratios": ratios,
        "optimistic_reference_s": optimistic,
        "bound_factor": round(bound_factor, 3),
        "refimpl_images_per_sec": refimpl_ips,
        "bounded_reference_images_per_sec": refimpl_ips * bound_factor,
    }
    if args.record:
        with open(RECORD_PATH, "w") as f:
            json.dump({
                "impl": "refimpl-f32-bound",
                "images_per_sec": refimpl_ips * bound_factor,
                "seconds_per_image": optimistic,
                "size": args.size,
                "bound_factor": round(bound_factor, 3),
                "measured_with": "tools/baseline_bias.py",
                "note": "upper bound on the real reference's speed "
                        "(f32 TV/bilateral/CLAHE, free PyWavelets); "
                        "replace via tools/bench_reference.py --record "
                        "where scikit-image is installed",
            }, f, indent=1)
        out["recorded"] = RECORD_PATH
    print(json.dumps(out, indent=1, default=float))


if __name__ == "__main__":
    main()
