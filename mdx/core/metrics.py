"""Batched quality metrics (JAX) — the fused 16-metric pass.

Reference contract: ``pipeline/metrics.py:42-217``.  The reference computes
each metric with separate skimage/scipy calls (≥6 full-image convolutions +
2 sorts + 2 histograms per pass); here all 16 metrics, the NIQE
approximation, and the halo edge-ratio come out of one jitted program with
shared intermediates: one Laplacian, one Sobel pair, one 7×7 and one 16×16
windowed-variance, one value sort, one gradient sort, two histograms, one
db2 DWT.
"""

from __future__ import annotations

import jax.numpy as jnp

from mdx.ops import filters as _f
from mdx.ops import hist as _h
from mdx.ops import wavelet as _w

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

ISSUE_ORDER = ("noise", "blur", "low_contrast", "clipping_low", "clipping_high")

METRIC_KEYS = (
    "sigma", "lap_var", "std", "pct_low", "pct_high",
    "entropy", "edge_density", "gradient_mag_mean", "gradient_mag_std",
    "snr_proxy", "cnr_proxy", "laplacian_energy", "histogram_spread",
    "local_contrast_std", "gradient_strength", "gradient_entropy",
)


def compute_edge_ratio(x: jnp.ndarray) -> jnp.ndarray:
    """mean(|laplace|)/mean(grad_mag) per image → [N]
    (ref pipeline/metrics.py:213-217; halo-safeguard input)."""
    n = x.shape[0]
    lap = jnp.mean(jnp.abs(_f.laplace(x)).reshape(n, -1), axis=-1)
    grd = jnp.mean(_f.gradient_magnitude(x).reshape(n, -1), axis=-1)
    return lap / (grd + 1e-8)


def compute_niqe(x: jnp.ndarray) -> jnp.ndarray:
    """NIQE approximation: CoV of 16×16 local variance + 10·max(0,
    edge_ratio−1) per image → [N] (ref pipeline/metrics.py:187-210).

    Shared by image_stats and the enhancement safeguards so the guard
    decisions and the reported niqe cannot drift apart; XLA CSEs the
    repeated Laplacian/Sobel subexpressions inside a fused program.  The
    CoV comes from the same box-stats source as image_stats (Pallas
    kernel on TPU) — mixing sources would break that CSE and compute the
    16×16 local variance twice per image per pass.
    """
    _, m16, s16 = _lv_box_stats(x)
    cov = s16 / (m16 + 1e-8)
    return cov + jnp.maximum(compute_edge_ratio(x) - 1.0, 0.0) * 10.0


def _use_box_kernel(x: jnp.ndarray) -> bool:
    try:
        import jax as _jax

        from mdx.ops.pallas_kernels import box_stats_fits

        return (_jax.default_backend() == "tpu"
                and box_stats_fits(x.shape[1], x.shape[2]))
    except Exception:
        return False


def _lv_box_stats(x: jnp.ndarray):
    """(std(sqrt(lv7)), mean(lv16), std(lv16)) — Pallas whole-image kernel
    on TPU (one VMEM-resident pass for both box pairs + reductions; the
    XLA shift-add lowering streams ~8 intermediates through HBM, 8% of
    VPU roofline, docs/PERF.md), XLA fallback elsewhere / large images."""
    if _use_box_kernel(x):
        from mdx.ops.pallas_kernels import box_stats_tpu

        return box_stats_tpu(x)
    n = x.shape[0]
    lv7s = jnp.sqrt(_f.local_variance(x, 7)).reshape(n, -1)
    lv16 = _f.local_variance(x, 16).reshape(n, -1)
    return (jnp.std(lv7s, axis=-1), jnp.mean(lv16, axis=-1),
            jnp.std(lv16, axis=-1))


def image_stats(x: jnp.ndarray) -> dict[str, jnp.ndarray]:
    """All 16 metrics + ``niqe`` + ``edge_ratio`` per image: [N,H,W] → {[N]}.

    Formulas: ref pipeline/metrics.py:42-158 (metrics), :187-210 (NIQE),
    :213-217 (edge ratio).

    Runs as one multi-phase XLA program (the local-variance stats inside
    dispatch to the box-stats Pallas kernel on TPU).  A one-kernel fused
    Pallas form of the WHOLE pass was built and deleted — it fails the
    real backend and its best compilable ablation loses to this program
    outright (measured dead-end record in docs/PERF.md)."""
    n = x.shape[0]
    flatten = lambda a: a.reshape(n, -1)

    sigma = _w.estimate_sigma(x)
    lap = _f.laplace(x)
    grad = _f.gradient_magnitude(x)

    lap_var = jnp.var(flatten(lap), axis=-1)
    lap_energy = jnp.mean(flatten(lap * lap), axis=-1)
    mean = jnp.mean(flatten(x), axis=-1)
    std = jnp.std(flatten(x), axis=-1)
    pct_low = jnp.mean(flatten(x <= 0.01).astype(x.dtype), axis=-1)
    pct_high = jnp.mean(flatten(x >= 0.99).astype(x.dtype), axis=-1)

    p05, p25, p75, p95 = _h.percentiles(x, [5.0, 25.0, 75.0, 95.0])
    entropy = _h.entropy_from_hist(_h.histogram01(x, 256))

    gmax = jnp.max(flatten(grad), axis=-1)
    edge_thr = jnp.where(gmax > 0, 0.1 * gmax, 0.0)
    edge_density = jnp.mean(
        (flatten(grad) > edge_thr[:, None]).astype(x.dtype), axis=-1)
    gmean = jnp.mean(flatten(grad), axis=-1)
    gstd = jnp.std(flatten(grad), axis=-1)

    sigma_safe = jnp.maximum(sigma, 1e-8)
    snr = mean / sigma_safe
    cnr = (p95 - p05) / sigma_safe

    local_contrast_std, _lv16_mean, _lv16_std = _lv_box_stats(x)

    # gradient strength: mean of grad values ≥ per-image p90
    g90 = _h.percentiles(grad, [90.0])[0]
    strong_mask = flatten(grad) >= g90[:, None]
    cnt = jnp.sum(strong_mask.astype(x.dtype), axis=-1)
    gradient_strength = jnp.where(
        cnt > 0,
        jnp.sum(flatten(grad) * strong_mask, axis=-1) / jnp.maximum(cnt, 1.0),
        0.0,
    )

    gradient_entropy = _h.entropy_from_hist(
        _h.histogram_scaled(grad, 128, gmax + 1e-8))

    # NIQE-approx: CoV of 16×16 local variance + halo penalty
    var_of_var = _lv16_std / (_lv16_mean + 1e-8)
    edge_ratio = jnp.mean(flatten(jnp.abs(lap)), axis=-1) / (gmean + 1e-8)
    niqe = var_of_var + jnp.maximum(edge_ratio - 1.0, 0.0) * 10.0

    return {
        "sigma": sigma,
        "lap_var": lap_var,
        "std": std,
        "pct_low": pct_low,
        "pct_high": pct_high,
        "entropy": entropy,
        "edge_density": edge_density,
        "gradient_mag_mean": gmean,
        "gradient_mag_std": gstd,
        "snr_proxy": snr,
        "cnr_proxy": cnr,
        "laplacian_energy": lap_energy,
        "histogram_spread": p75 - p25,
        "local_contrast_std": local_contrast_std,
        "gradient_strength": gradient_strength,
        "gradient_entropy": gradient_entropy,
        "niqe": niqe,
        "edge_ratio": edge_ratio,
    }


def compute_metrics(x: jnp.ndarray) -> dict[str, jnp.ndarray]:
    """The 16-metric contract only (no NIQE extras): [N,H,W] → {16 × [N]}."""
    s = image_stats(x)
    return {k: s[k] for k in METRIC_KEYS}


def detect_issues(metrics: dict[str, jnp.ndarray]) -> dict[str, jnp.ndarray]:
    """Threshold detection → per-issue bool masks [N]
    (ref pipeline/metrics.py:166-179)."""
    return {
        "noise": metrics["sigma"] > THRESHOLDS["noise_sigma"],
        "blur": metrics["lap_var"] < THRESHOLDS["blur_lap_var"],
        "low_contrast": metrics["std"] < THRESHOLDS["low_contrast_std"],
        "clipping_low": metrics["pct_low"] > THRESHOLDS["clip_pct"],
        "clipping_high": metrics["pct_high"] > THRESHOLDS["clip_pct"],
    }
