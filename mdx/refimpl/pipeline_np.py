"""NumPy float64 reference-spec QA pipeline: metrics, detection, enhancement
chain with safeguards, validation, and the tuning objective.

This module is the behavioural specification extracted from the reference
project (`/root/reference/pipeline/{metrics,enhancement}.py`) — every formula
cites its origin — and doubles as the single-image CPU baseline for
``bench.py``.  The TPU path (``mdx.core``) is golden-tested against it.
"""

from __future__ import annotations

from typing import Dict, List, Tuple

import numpy as np

from mdx.refimpl import filters_np as F
from mdx.refimpl import wavelet_np as W

# Detection thresholds (ref pipeline/metrics.py:25-34)
THRESHOLDS = {
    "noise_sigma": 0.08,
    "blur_lap_var": 0.001,
    "low_contrast_std": 0.12,
    "clip_pct": 0.01,
    "ssim": 0.70,
    "psnr": 22.0,
    "quality_improvement": 0.10,
}

METRIC_KEYS = (
    "sigma", "lap_var", "std", "pct_low", "pct_high",
    "entropy", "edge_density", "gradient_mag_mean", "gradient_mag_std",
    "snr_proxy", "cnr_proxy", "laplacian_energy", "histogram_spread",
    "local_contrast_std", "gradient_strength", "gradient_entropy",
)


def compute_metrics(image: np.ndarray) -> Dict[str, float]:
    """The 16 no-reference quality metrics (ref pipeline/metrics.py:42-158)."""
    img = np.asarray(image, np.float64)
    sigma = W.estimate_sigma(img)
    lap = F.laplace(img)
    grad_mag = F.gradient_magnitude(img)

    p05, p25, p75, p90, p95 = np.percentile(img, [5, 25, 75, 90, 95])
    gmax = float(grad_mag.max())
    edge_thr = 0.1 * gmax if gmax > 0 else 0.0

    # local contrast: std of local 7x7 std-devs
    local_std7 = np.sqrt(F.local_variance(img, 7))

    # gradient strength: mean of top-10% gradient magnitudes
    g_thr = float(np.percentile(grad_mag, 90))
    strong = grad_mag[grad_mag >= g_thr]
    gradient_strength = float(strong.mean()) if strong.size else 0.0

    return {
        "sigma": float(sigma),
        "lap_var": float(np.var(lap)),
        "std": float(np.std(img)),
        "pct_low": float(np.mean(img <= 0.01)),
        "pct_high": float(np.mean(img >= 0.99)),
        "entropy": F.shannon_entropy(img, bins=256, hi=1.0),
        "edge_density": float(np.mean(grad_mag > edge_thr)),
        "gradient_mag_mean": float(grad_mag.mean()),
        "gradient_mag_std": float(grad_mag.std()),
        "snr_proxy": float(img.mean() / max(sigma, 1e-8)),
        "cnr_proxy": float((p95 - p05) / max(sigma, 1e-8)),
        "laplacian_energy": float(np.mean(lap * lap)),
        "histogram_spread": float(p75 - p25),
        "local_contrast_std": float(np.std(local_std7)),
        "gradient_strength": gradient_strength,
        "gradient_entropy": F.shannon_entropy(
            grad_mag, bins=128, hi=float(grad_mag.max()) + 1e-8
        ),
    }


def detect_issues(metrics: Dict[str, float]) -> List[str]:
    """Threshold comparison → issue labels (ref pipeline/metrics.py:166-179)."""
    issues = []
    if metrics["sigma"] > THRESHOLDS["noise_sigma"]:
        issues.append("noise")
    if metrics["lap_var"] < THRESHOLDS["blur_lap_var"]:
        issues.append("blur")
    if metrics["std"] < THRESHOLDS["low_contrast_std"]:
        issues.append("low_contrast")
    if metrics["pct_low"] > THRESHOLDS["clip_pct"]:
        issues.append("clipping_low")
    if metrics["pct_high"] > THRESHOLDS["clip_pct"]:
        issues.append("clipping_high")
    return issues


def compute_niqe(image: np.ndarray) -> float:
    """NIQE approximation (ref pipeline/metrics.py:187-210): coefficient of
    variation of 16×16 local variance + 10·max(0, edge_ratio − 1)."""
    img = np.asarray(image, np.float64)
    lv = F.local_variance(img, 16)
    var_of_var = float(lv.std() / (lv.mean() + 1e-8))
    return var_of_var + max(0.0, compute_edge_ratio(img) - 1.0) * 10.0


def compute_edge_ratio(image: np.ndarray) -> float:
    """mean|laplacian| / mean(grad_mag); >1 suggests halos
    (ref pipeline/metrics.py:213-217)."""
    img = np.asarray(image, np.float64)
    return float(
        np.mean(np.abs(F.laplace(img))) / (np.mean(F.gradient_magnitude(img)) + 1e-8)
    )


# ---------------------------------------------------------------------------
# Enhancement chain (ref pipeline/enhancement.py)
# ---------------------------------------------------------------------------

DEFAULT_PARAMS = {
    # ref pipeline/enhancement.py:32-42
    "clahe_clip_limit": 0.015,
    "clahe_tile_size": 16,
    "gamma_brighten": 0.95,
    "gamma_darken": 1.05,
    "unsharp_radius": 0.8,
    "unsharp_amount": 0.5,
    "denoise_wavelet_mode": "soft",
    "post_denoise_strength": 0.3,
}


def light_denoise(image: np.ndarray, strength: float = 0.3) -> np.ndarray:
    """Blend (1−s)·img + s·wavelet_denoise(sigma=σ̂/2); no-op when σ̂<1e-3
    (ref pipeline/enhancement.py:80-94). σ̂ here follows the denoise wavelet
    family (db1 finest HH MAD)."""
    sigma_est = W.estimate_sigma(image)
    if sigma_est < 0.001:
        return np.asarray(image, np.float64)
    den = W.denoise_wavelet(image, sigma=sigma_est * 0.5, mode="soft")
    return (1.0 - strength) * np.asarray(image, np.float64) + strength * den


def apply_op(img: np.ndarray, op: str, p: Dict) -> np.ndarray:
    """One enhancement step; op gating handled by callers."""
    if op == "denoise":
        return W.denoise_wavelet(img, sigma=None, mode=p.get("denoise_mode", "soft"))
    if op == "clahe":
        return F.clahe(img, p["clahe_clip_limit"], int(p["clahe_tile_size"]))
    if op == "gamma":
        return F.adjust_gamma(img, p["gamma"])
    if op == "unsharp":
        return F.unsharp_mask(img, p["unsharp_radius"], p["unsharp_amount"])
    if op == "post_denoise":
        return light_denoise(img, p["post_denoise_strength"])
    if op == "bilateral":
        return F.bilateral(
            img, int(p["bilateral_d"]), p["bilateral_sigma_color"], p["bilateral_sigma_space"]
        )
    if op == "tv_denoise":
        return F.tv_chambolle(img, p["tv_denoise_weight"])
    raise ValueError(f"unknown op {op!r}")


def apply_enhancements(image: np.ndarray, issues: List[str]) -> Tuple[np.ndarray, List[str]]:
    """Issue-driven deterministic chain (ref pipeline/enhancement.py:151-227)."""
    img = np.asarray(image, np.float64)
    out = img.copy()
    ops: List[str] = []
    P = DEFAULT_PARAMS
    if "noise" in issues:
        out = W.denoise_wavelet(out, mode=P["denoise_wavelet_mode"])
        ops.append("Wavelet denoise (pre)")
    if any(i in issues for i in ("low_contrast", "clipping_low", "clipping_high")):
        out = F.clahe(out, P["clahe_clip_limit"], P["clahe_tile_size"])
        ops.append(f"CLAHE (clip={P['clahe_clip_limit']}, tile={P['clahe_tile_size']})")
    if "clipping_low" in issues and "clipping_high" not in issues:
        out = F.adjust_gamma(out, P["gamma_brighten"])
        ops.append(f"Gamma brighten ({P['gamma_brighten']})")
    elif "clipping_high" in issues and "clipping_low" not in issues:
        out = F.adjust_gamma(out, P["gamma_darken"])
        ops.append(f"Gamma darken ({P['gamma_darken']})")
    if "blur" in issues:
        out = F.unsharp_mask(out, P["unsharp_radius"], P["unsharp_amount"])
        ops.append(f"Unsharp mask (r={P['unsharp_radius']}, a={P['unsharp_amount']})")
        if P["post_denoise_strength"] > 0:
            out = light_denoise(out, P["post_denoise_strength"])
            ops.append(f"Light denoise (post, s={P['post_denoise_strength']})")
    out = np.clip(out, 0.0, 1.0)
    if _noise_amplified(img, out):
        out = np.clip(light_denoise(out, 0.4), 0.0, 1.0)
        ops.append("Auto-corrective denoise (noise guard)")
    return out.astype(np.float64), ops


def _noise_amplified(orig, enh, max_ratio: float = 1.3) -> bool:
    """σ_after > 1.3·σ_before (ref pipeline/enhancement.py:55-63)."""
    sb = W.estimate_sigma(orig)
    if sb < 1e-8:
        return False
    return W.estimate_sigma(enh) > sb * max_ratio


def apply_plan(image: np.ndarray, ops: List[str], params: Dict) -> Tuple[np.ndarray, List[str]]:
    """Plan-driven chain + three safeguards (ref pipeline/enhancement.py:235-369).

    ``ops`` gate the fixed-order chain denoise→clahe→gamma→unsharp→
    post_denoise→bilateral→tv_denoise; the halo-safeguard re-run follows the
    *plan order* (a reference quirk preserved deliberately).
    """
    img = np.asarray(image, np.float64)
    ops = [o.lower().strip() for o in ops]
    p = dict(params)
    applied: List[str] = []

    def _chain(x: np.ndarray, unsharp_amount: float, in_plan_order: bool) -> np.ndarray:
        order = ops if in_plan_order else [
            o for o in ("denoise", "clahe", "gamma", "unsharp",
                        "post_denoise", "bilateral", "tv_denoise") if o in ops
        ]
        q = dict(p)
        q["unsharp_amount"] = unsharp_amount
        for op in order:
            if op == "gamma" and abs(q["gamma"] - 1.0) <= 1e-4:
                continue
            if op == "post_denoise" and q["post_denoise_strength"] <= 0:
                continue
            if op == "bilateral" and int(q["bilateral_d"]) <= 0:
                continue
            if op == "tv_denoise" and q["tv_denoise_weight"] <= 0:
                continue
            x = apply_op(x, op, q)
        return x

    out = np.clip(_chain(img, p["unsharp_amount"], in_plan_order=False), 0.0, 1.0)
    for op in ("denoise", "clahe", "gamma", "unsharp", "post_denoise", "bilateral", "tv_denoise"):
        if op in ops:
            applied.append(op)

    # Safeguard 1: halo → re-run full chain with halved unsharp amount
    if "unsharp" in ops and compute_edge_ratio(out) > 1.5:
        out = np.clip(_chain(img, p["unsharp_amount"] * 0.5, in_plan_order=True), 0.0, 1.0)
        applied.append(f"[safeguard] unsharp halved to {p['unsharp_amount'] * 0.5:.2f}")

    # Safeguard 2: noise amplification → corrective light denoise
    if _noise_amplified(img, out):
        out = np.clip(light_denoise(out, 0.4), 0.0, 1.0)
        applied.append("[safeguard] corrective denoise")

    # Safeguard 3: over-processing (NIQE degraded > 0.5) → blend back 40%
    if compute_niqe(out) - compute_niqe(img) > 0.5:
        out = np.clip(0.6 * out + 0.4 * img, 0.0, 1.0)
        applied.append("[safeguard] blend-back 40% original")

    return out, applied


# ---------------------------------------------------------------------------
# Validation + objective (ref pipeline/metrics.py:225-408)
# ---------------------------------------------------------------------------


def compute_validation(original: np.ndarray, enhanced: np.ndarray) -> Dict[str, object]:
    mb = compute_metrics(original)
    ma = compute_metrics(enhanced)
    s = F.ssim(original, enhanced, data_range=1.0)
    p = F.psnr(original, enhanced, data_range=1.0)
    nb, na = compute_niqe(original), compute_niqe(enhanced)
    eps = 1e-8
    contrast_gain = (ma["std"] - mb["std"]) / max(mb["std"], eps)
    sharpness_gain = (ma["lap_var"] - mb["lap_var"]) / max(mb["lap_var"], eps)
    noise_reduction = (mb["sigma"] - ma["sigma"]) / max(mb["sigma"], eps)
    qi = 0.35 * contrast_gain + 0.35 * sharpness_gain + 0.30 * noise_reduction
    meets_ssim = s >= THRESHOLDS["ssim"]
    meets_psnr = p >= THRESHOLDS["psnr"]
    meets_improvement = qi >= THRESHOLDS["quality_improvement"]
    niqe_improved = na <= nb
    passes = (
        (meets_ssim and meets_psnr)
        or (meets_ssim and meets_improvement)
        or (meets_psnr and meets_improvement and niqe_improved)
    )
    return {
        "ssim": float(s),
        "psnr": float(p),
        "quality_improvement": float(qi),
        "meets_ssim": meets_ssim,
        "meets_psnr": meets_psnr,
        "meets_improvement": meets_improvement,
        "passes": passes,
        "niqe_before": nb,
        "niqe_after": na,
        "niqe_improved": niqe_improved,
        "contrast_gain": contrast_gain,
        "sharpness_gain": sharpness_gain,
        "noise_change": -noise_reduction,
        "entropy_before": mb["entropy"], "entropy_after": ma["entropy"],
        "entropy_change": ma["entropy"] - mb["entropy"],
        "snr_before": mb["snr_proxy"], "snr_after": ma["snr_proxy"],
        "snr_change": ma["snr_proxy"] - mb["snr_proxy"],
        "cnr_before": mb["cnr_proxy"], "cnr_after": ma["cnr_proxy"],
        "cnr_change": ma["cnr_proxy"] - mb["cnr_proxy"],
        "edge_density_change": ma["edge_density"] - mb["edge_density"],
        "histogram_spread_change": ma["histogram_spread"] - mb["histogram_spread"],
        "laplacian_energy_before": mb["laplacian_energy"],
        "laplacian_energy_after": ma["laplacian_energy"],
        "edge_ratio": compute_edge_ratio(enhanced),
        "local_contrast_before": mb["local_contrast_std"],
        "local_contrast_after": ma["local_contrast_std"],
        "local_contrast_change": ma["local_contrast_std"] - mb["local_contrast_std"],
        "gradient_strength_before": mb["gradient_strength"],
        "gradient_strength_after": ma["gradient_strength"],
        "gradient_strength_change": ma["gradient_strength"] - mb["gradient_strength"],
        "gradient_entropy_before": mb["gradient_entropy"],
        "gradient_entropy_after": ma["gradient_entropy"],
        "gradient_entropy_change": ma["gradient_entropy"] - mb["gradient_entropy"],
        "metrics_before": mb,
        "metrics_after": ma,
    }


def compute_objective_score(validation: dict) -> Tuple[float, dict]:
    """Scalar tuning objective (ref pipeline/metrics.py:337-408)."""
    v = validation
    contrast_gain = float(v.get("contrast_gain", 0))
    sharpness_gain = float(v.get("sharpness_gain", 0))
    noise_change = float(v.get("noise_change", 0))
    niqe_deg = max(0.0, float(v.get("niqe_after", 0)) - float(v.get("niqe_before", 0)))
    passes = bool(v.get("passes", False))
    halo_pen = max(0.0, float(v.get("edge_ratio", 0)) - 1.0) * 5.0
    ent_pen = max(0.0, abs(float(v.get("entropy_change", 0))) - 0.5) * 2.0
    snr_rwd = max(0.0, min(float(v.get("snr_change", 0)) * 0.1, 0.5))
    hs_rwd = max(0.0, min(float(v.get("histogram_spread_change", 0)) * 0.5, 0.3))
    lc_rwd = max(0.0, min(float(v.get("local_contrast_change", 0)) * 0.3, 0.3))
    gs_rwd = max(0.0, min(float(v.get("gradient_strength_change", 0)) * 0.2, 0.2))
    ge_pen = max(0.0, abs(float(v.get("gradient_entropy_change", 0))) - 0.3) * 1.5
    noise_pen = max(0.0, noise_change)
    score = (
        0.35 * contrast_gain + 0.35 * sharpness_gain - 0.30 * noise_pen
        - 5.0 * niqe_deg - 10.0 * (0 if passes else 1) - halo_pen - ent_pen
        + snr_rwd + hs_rwd + lc_rwd + gs_rwd - ge_pen
    )
    breakdown = {
        "contrast_gain": round(contrast_gain, 4),
        "sharpness_gain": round(sharpness_gain, 4),
        "noise_penalty": round(noise_pen, 4),
        "niqe_degradation": round(niqe_deg, 4),
        "halo_penalty": round(halo_pen, 4),
        "entropy_penalty": round(ent_pen, 4),
        "snr_reward": round(snr_rwd, 4),
        "hs_reward": round(hs_rwd, 4),
        "local_contrast_reward": round(lc_rwd, 4),
        "gradient_strength_reward": round(gs_rwd, 4),
        "gradient_entropy_penalty": round(ge_pen, 4),
        "passes": passes,
    }
    return round(float(score), 4), breakdown
