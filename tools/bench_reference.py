"""Measure the REAL reference's single-image CPU cost — the honest headline
denominator for ``bench.py``'s ``vs_baseline``.

Round-3 verdict: the headline ratio divided by ``mdx.refimpl`` — our own
float64 NumPy re-derivation — not by the actual reference code, whose heavy
ops go through scikit-image / PyWavelets compiled internals.  This tool
closes that gap by timing the SAME measured program (the bench.py headline
pass: 16-metric ``compute_metrics`` + NIQE + the full 7-op plan chain with
all three safeguards, identical plan constants) through three
interchangeable implementations:

  reference  import the reference checkout's ``pipeline.metrics`` /
             ``pipeline.enhancement`` directly and call
             ``apply_enhancements_from_params`` (ref
             pipeline/runner.py:85-153 cost model).  Needs the checkout
             (``MDX_REFERENCE_PATH``, default /root/reference) plus
             scikit-image + PyWavelets + pydantic.
  skimage    self-contained re-expression making the exact library calls
             the reference makes (each cited to its reference call site);
             for CI, where the deps exist but the checkout does not.
  refimpl    ``mdx.refimpl`` float64 NumPy oracle (always available — the
             round-1..3 denominator).

Output: ONE JSON object with per-impl ms/image + images/sec, per-component
timings, and every pairwise ratio.  ``--record`` writes BASELINE_REF.json
at the repo root; ``bench.py`` prefers that measured number (or the
``MDX_BASELINE_IPS`` env var) over a live refimpl measurement and labels
the denominator provenance in its ``baseline_kind`` field.

Usage:
  python tools/bench_reference.py                      # all available impls
  python tools/bench_reference.py --impl skimage --record
  python tools/bench_reference.py --size 512 --repeats 3
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

RECORD_PATH = os.path.join(_REPO, "BASELINE_REF.json")


def _best_of(fn, repeats: int) -> float:
    """Best-of-N wall time in seconds — the most favourable number for the
    reference, i.e. the most conservative vs_baseline for the TPU path."""
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


# --------------------------------------------------------------- refimpl --


def run_refimpl(img32: np.ndarray, repeats: int) -> dict:
    from mdx.refimpl import filters_np as F
    from mdx.refimpl import pipeline_np as R
    from mdx.refimpl import wavelet_np as W

    img = img32.astype(np.float64)

    def full():
        R.compute_metrics(img)
        R.compute_niqe(img)
        R.apply_plan(img, list(_PLAN_OPS), dict(_PLAN_PARAMS))

    comp = {
        "metrics": _best_of(lambda: R.compute_metrics(img), repeats),
        "niqe": _best_of(lambda: R.compute_niqe(img), repeats),
        "estimate_sigma": _best_of(lambda: W.estimate_sigma(img), repeats),
        "denoise_wavelet": _best_of(lambda: W.denoise_wavelet(img), repeats),
        "clahe": _best_of(lambda: F.clahe(img, 0.02, 16), repeats),
        "unsharp": _best_of(lambda: F.unsharp_mask(img, 1.0, 0.6), repeats),
        "bilateral": _best_of(lambda: F.bilateral(img, 5, 0.05, 0.05),
                              repeats),
        "tv": _best_of(lambda: F.tv_chambolle(img, 0.05), repeats),
        "ssim": _best_of(lambda: F.ssim(img, np.clip(img * 0.98, 0, 1)),
                         repeats),
    }
    return {"seconds_per_image": _best_of(full, repeats),
            "components_s": comp, "dtype": "float64"}


# --------------------------------------------------------------- skimage --


def run_skimage(img32: np.ndarray, repeats: int) -> dict:
    """The reference's measured program re-expressed as the library calls it
    makes (scikit-image / SciPy / PyWavelets).  Each step cites the
    reference call site; the hand-written bilateral is the reference's own
    NumPy window loop (re-derived in mdx.refimpl.filters_np.bilateral,
    ref pipeline/enhancement.py:102-143)."""
    from scipy.ndimage import uniform_filter
    from skimage import exposure, filters
    from skimage.metrics import structural_similarity
    from skimage.restoration import (
        denoise_tv_chambolle,
        denoise_wavelet,
        estimate_sigma,
    )

    from mdx.refimpl.filters_np import bilateral as _np_bilateral

    img = img32  # the reference operates on normalised float32 images

    def metrics(x):
        # ref pipeline/metrics.py:42-158 — full 16-metric pass
        sigma = float(estimate_sigma(x, channel_axis=None,
                                     average_sigmas=True))
        lap = filters.laplace(x)
        grad_mag = np.sqrt(filters.sobel_h(x) ** 2 + filters.sobel_v(x) ** 2)
        np.histogram(x.ravel(), bins=256, range=(0.0, 1.0))  # entropy :112
        # edge_density recomputes grad_mag from scratch (:154-158)
        gm2 = np.sqrt(filters.sobel_h(x) ** 2 + filters.sobel_v(x) ** 2)
        float(np.mean(gm2 > 0.1 * gm2.max()))
        np.percentile(x, [5, 25, 75, 95])                    # :70-78
        lm = uniform_filter(x, size=7)                       # :120-129
        lsq = uniform_filter(x ** 2, size=7)
        np.std(np.sqrt(np.maximum(lsq - lm ** 2, 0)))
        thr = float(np.percentile(grad_mag, 90))             # :132-138
        grad_mag[grad_mag >= thr].mean()
        np.histogram(grad_mag.ravel(), bins=128,             # :141-151
                     range=(0.0, float(grad_mag.max()) + 1e-8))
        float(np.var(lap)), float(np.std(x))
        return sigma

    def niqe(x):
        # ref pipeline/metrics.py:187-210
        lm = uniform_filter(x, size=16)
        lsq = uniform_filter(x ** 2, size=16)
        lv = np.maximum(lsq - lm ** 2, 0)
        float(np.std(lv) / (np.mean(lv) + 1e-8))
        lap = np.abs(filters.laplace(x))
        gm = np.sqrt(filters.sobel_h(x) ** 2 + filters.sobel_v(x) ** 2)
        return float(np.mean(lap) / (np.mean(gm) + 1e-8))

    def light_denoise(x, strength):
        # ref pipeline/enhancement.py:80-94
        s = float(estimate_sigma(x, channel_axis=None, average_sigmas=True))
        if s < 0.001:
            return x
        den = denoise_wavelet(x, channel_axis=None, rescale_sigma=True,
                              mode="soft", sigma=s * 0.5)
        return ((1 - strength) * x + strength * den).astype(np.float32)

    p = _PLAN_PARAMS

    def chain_once(x, unsharp_amount):
        # ref pipeline/enhancement.py:270-314 (and the halo re-run :325-353)
        e = denoise_wavelet(x, channel_axis=None, rescale_sigma=True,
                            mode=p["denoise_mode"])
        e = exposure.equalize_adapthist(e, clip_limit=p["clahe_clip_limit"],
                                        kernel_size=p["clahe_tile_size"])
        e = exposure.adjust_gamma(e, gamma=p["gamma"])
        e = filters.unsharp_mask(e, radius=p["unsharp_radius"],
                                 amount=unsharp_amount)
        e = light_denoise(e, p["post_denoise_strength"])
        e = _np_bilateral(e, d=p["bilateral_d"],
                          sigma_color=p["bilateral_sigma_color"],
                          sigma_space=p["bilateral_sigma_space"])
        e = denoise_tv_chambolle(e, weight=p["tv_denoise_weight"],
                                 channel_axis=None)
        return np.clip(e, 0.0, 1.0)

    def apply_plan(x):
        e = chain_once(x, p["unsharp_amount"])
        # halo guard (:319-353): edge_ratio > 1.5 → full re-run, halved amount
        lap = np.abs(filters.laplace(e))
        gm = np.sqrt(filters.sobel_h(e) ** 2 + filters.sobel_v(e) ** 2)
        if float(np.mean(lap) / (np.mean(gm) + 1e-8)) > 1.5:
            e = chain_once(x, p["unsharp_amount"] * 0.5)
        # noise-amplification guard (:55-63, :356-360)
        sb = float(estimate_sigma(x, channel_axis=None, average_sigmas=True))
        sa = float(estimate_sigma(e, channel_axis=None, average_sigmas=True))
        if sb >= 1e-8 and sa > sb * 1.3:
            e = np.clip(light_denoise(e, 0.4), 0.0, 1.0)
        # over-processing guard (:66-72, :363-367)
        if (niqe(e) - niqe(x)) > 0.5:
            e = np.clip(0.6 * e + 0.4 * x, 0.0, 1.0)
        return e.astype(np.float32)

    def full():
        metrics(img)
        niqe(img)
        apply_plan(img)

    comp = {
        "metrics": _best_of(lambda: metrics(img), repeats),
        "niqe": _best_of(lambda: niqe(img), repeats),
        "estimate_sigma": _best_of(
            lambda: estimate_sigma(img, channel_axis=None,
                                   average_sigmas=True), repeats),
        "denoise_wavelet": _best_of(
            lambda: denoise_wavelet(img, channel_axis=None,
                                    rescale_sigma=True, mode="soft"),
            repeats),
        "clahe": _best_of(
            lambda: exposure.equalize_adapthist(img, clip_limit=0.02,
                                                kernel_size=16), repeats),
        "unsharp": _best_of(
            lambda: filters.unsharp_mask(img, radius=1.0, amount=0.6),
            repeats),
        "bilateral": _best_of(
            lambda: _np_bilateral(img, 5, 0.05, 0.05), repeats),
        "tv": _best_of(
            lambda: denoise_tv_chambolle(img, weight=0.05,
                                         channel_axis=None), repeats),
        "ssim": _best_of(
            lambda: structural_similarity(
                img, np.clip(img * 0.98, 0, 1).astype(np.float32),
                data_range=1.0), repeats),
    }
    return {"seconds_per_image": _best_of(full, repeats),
            "components_s": comp, "dtype": "float32-in"}


# ------------------------------------------------------------- reference --


def run_reference(img32: np.ndarray, repeats: int) -> dict:
    """Import and time the actual reference code."""
    ref_path = os.environ.get("MDX_REFERENCE_PATH", "/root/reference")
    if not os.path.isdir(os.path.join(ref_path, "pipeline")):
        raise ImportError(f"reference checkout not found at {ref_path}")
    sys.path.insert(0, ref_path)
    try:
        from pipeline import enhancement as ref_enh
        from pipeline import metrics as ref_met
        from pipeline.schemas import EnhancementParams, EnhancementPlan
    finally:
        sys.path.remove(ref_path)

    plan = EnhancementPlan(
        recommended_ops=list(_PLAN_OPS),
        params=EnhancementParams(**{
            k: v for k, v in _PLAN_PARAMS.items()}),
        rationale="bench", risk_warnings=[])

    def full():
        ref_met.compute_metrics(img32)
        ref_met.compute_niqe_approximation(img32)
        ref_enh.apply_enhancements_from_params(img32, plan)

    comp = {
        "metrics": _best_of(lambda: ref_met.compute_metrics(img32), repeats),
        "niqe": _best_of(
            lambda: ref_met.compute_niqe_approximation(img32), repeats),
        "chain": _best_of(
            lambda: ref_enh.apply_enhancements_from_params(img32, plan),
            repeats),
    }
    return {"seconds_per_image": _best_of(full, repeats),
            "components_s": comp, "dtype": "float32-in",
            "reference_path": ref_path}


# ------------------------------------------------------------------ main --

_IMPLS = {"reference": run_reference, "skimage": run_skimage,
          "refimpl": run_refimpl}


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--impl", choices=[*_IMPLS, "all"], default="all")
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--record", action="store_true",
                    help="write BASELINE_REF.json with the best available "
                         "measured denominator (reference > skimage)")
    args = ap.parse_args()

    img = _make_batch(1, args.size)[0]  # the bench.py synthetic slice
    out: dict = {"size": args.size, "repeats": args.repeats, "impls": {}}
    wanted = list(_IMPLS) if args.impl == "all" else [args.impl]
    for name in wanted:
        try:
            r = _IMPLS[name](img, args.repeats)
            r["images_per_sec"] = 1.0 / r["seconds_per_image"]
            out["impls"][name] = r
        except ImportError as exc:
            out["impls"][name] = {"unavailable": str(exc)}

    ok = {k: v for k, v in out["impls"].items() if "images_per_sec" in v}
    out["ratios"] = {
        f"{a}_over_{b}": round(ok[a]["seconds_per_image"]
                               / ok[b]["seconds_per_image"], 3)
        for a in ok for b in ok if a != b}

    if args.record:
        for pref in ("reference", "skimage"):
            if pref in ok:
                with open(RECORD_PATH, "w") as f:
                    json.dump({
                        "impl": pref,
                        "images_per_sec": ok[pref]["images_per_sec"],
                        "seconds_per_image": ok[pref]["seconds_per_image"],
                        "size": args.size,
                        "measured_with": "tools/bench_reference.py",
                    }, f, indent=1)
                out["recorded"] = RECORD_PATH
                break
        else:
            out["recorded"] = None

    print(json.dumps(out, indent=1, default=float))


if __name__ == "__main__":
    main()
