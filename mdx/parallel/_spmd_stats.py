"""Shared SPMD metric/verdict formulas for the spatial layers.

The 1-D row-block (:mod:`mdx.parallel.spatial`) and 2-D tile
(:mod:`mdx.parallel.spatial2d`) layers differ ONLY in halo topology and
reduction axes; the metric formulas (ref pipeline/metrics.py:42-217, with
per-formula citations in mdx/core/metrics.py) and the validation verdict
arithmetic (ref pipeline/metrics.py:274-286) are identical.  Each layer
builds a :class:`SpatialPrims` from its own primitives and calls the
single implementations here — one place for the formulas, so the two
layouts cannot drift.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable

import jax.numpy as jnp

from mdx.ops.hist import entropy_from_hist as _entropy_from_hist


@dataclass(frozen=True)
class SpatialPrims:
    """The layout-specific primitive set a spatial layer provides.

    All callables operate on the local shard block [N, Hs, Ws(…)] and
    return globally-reduced values where applicable:

    * ``lap_sobel(x)`` — halo'd (laplacian, sobel_h, sobel_v) triple,
      shift-MAC cores on ONE 1-extended block (mdx/ops/filters.py
      ``laplace_core``/``sobel_*_core``).
    * ``local_variance(x, size)`` — halo'd uniform-window variance.
    * ``pmean(v)`` / ``pvar(v)`` — global per-image mean / (mean, var).
    * ``phist(v, bins, hi)`` — global per-image histogram [N, bins].
    * ``pq(v, qs)`` — exact global percentiles, list of [N].
    * ``pmax_img(v)`` — global per-image max [N].
    * ``psum_img(v)`` — global per-image sum [N].
    * ``sigma(x)`` — distributed wavelet-MAD noise estimate [N].
    * ``mad_source(x)`` — (|HH| subband, static valid count, weights) for
      the MAD median, so the metric pass can fold it into ``pq_multi``.
    * ``pq_multi(sources)`` — fused exact percentiles over several arrays
      in ONE 32-sweep search (one [N, ΣR] count psum per sweep instead of
      one per source); ``sources`` = list of (v, qs, total|None, weights),
      total None ⇒ the full block.  Returns one [len(qs), N] per source.
    """

    lap_sobel: Callable
    local_variance: Callable
    pmean: Callable
    pvar: Callable
    phist: Callable
    pq: Callable
    pmax_img: Callable
    psum_img: Callable
    sigma: Callable
    mad_source: Callable
    pq_multi: Callable


def image_stats_block(x: jnp.ndarray, p: SpatialPrims
                      ) -> dict[str, jnp.ndarray]:
    """Per-shard body of the fused metric pass (runs under shard_map):
    the full 16-metric + niqe + edge_ratio dict of globally-reduced [N]
    vectors (formulas: ref pipeline/metrics.py:42-217)."""
    from mdx.refimpl.wavelet_np import MAD_TO_SIGMA

    lap, gh, gv = p.lap_sobel(x)
    grad = jnp.hypot(gh, gv)

    # ONE fused order-statistic search for every quantile the pass needs —
    # image percentiles, the p90 gradient cut, and the wavelet-MAD median —
    # instead of three independent 32-sweep searches (3× the collectives).
    hh_abs, hh_total, hh_valid = p.mad_source(x)
    (p05, p25, p75, p95), (g90,), (mad_med,) = p.pq_multi([
        (x, [5.0, 25.0, 75.0, 95.0], None, None),
        (grad, [90.0], None, None),
        (hh_abs, [50.0], hh_total, hh_valid),
    ])
    sigma = mad_med * jnp.asarray(MAD_TO_SIGMA, x.dtype)

    _, lap_var = p.pvar(lap)
    lap_energy = p.pmean(lap * lap)
    mean, var = p.pvar(x)
    std = jnp.sqrt(var)
    pct_low = p.pmean((x <= 0.01).astype(x.dtype))
    pct_high = p.pmean((x >= 0.99).astype(x.dtype))

    one = jnp.ones((x.shape[0],), x.dtype)
    entropy = _entropy_from_hist(p.phist(x, 256, one))

    gmax = p.pmax_img(grad)
    edge_thr = jnp.where(gmax > 0, 0.1 * gmax, 0.0)
    edge_density = p.pmean((grad > edge_thr[:, None, None]).astype(x.dtype))
    gmean, gvar = p.pvar(grad)
    gstd = jnp.sqrt(gvar)

    sigma_safe = jnp.maximum(sigma, 1e-8)
    snr = mean / sigma_safe
    cnr = (p95 - p05) / sigma_safe

    lv7 = jnp.sqrt(p.local_variance(x, 7))
    _, lv7_var = p.pvar(lv7)
    local_contrast_std = jnp.sqrt(lv7_var)

    strong = (grad >= g90[:, None, None]).astype(x.dtype)
    cnt = p.psum_img(strong)
    ssum = p.psum_img(grad * strong)
    gradient_strength = jnp.where(cnt > 0, ssum / jnp.maximum(cnt, 1.0), 0.0)

    gradient_entropy = _entropy_from_hist(p.phist(grad, 128, gmax + 1e-8))

    lv16 = p.local_variance(x, 16)
    lv_mean, lv_var = p.pvar(lv16)
    var_of_var = jnp.sqrt(lv_var) / (lv_mean + 1e-8)
    edge_ratio = p.pmean(jnp.abs(lap)) / (gmean + 1e-8)
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


def qa_verdict(before: dict, after: dict, ssim: jnp.ndarray,
               psnr: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """(quality_improvement, passes) from before/after stats + SSIM/PSNR
    — the reference's weighted gains + three-way pass rule
    (ref pipeline/metrics.py:274-286)."""
    from mdx.core.metrics import THRESHOLDS

    eps = 1e-8
    contrast_gain = (after["std"] - before["std"]) / jnp.maximum(
        before["std"], eps)
    sharpness_gain = (after["lap_var"] - before["lap_var"]) / jnp.maximum(
        before["lap_var"], eps)
    noise_reduction = (before["sigma"] - after["sigma"]) / jnp.maximum(
        before["sigma"], eps)
    qi = (0.35 * contrast_gain + 0.35 * sharpness_gain
          + 0.30 * noise_reduction)
    meets_ssim = ssim >= THRESHOLDS["ssim"]
    meets_psnr = psnr >= THRESHOLDS["psnr"]
    meets_improvement = qi >= THRESHOLDS["quality_improvement"]
    niqe_ok = after["niqe"] <= before["niqe"]
    passes = ((meets_ssim & meets_psnr)
              | (meets_ssim & meets_improvement)
              | (meets_psnr & meets_improvement & niqe_ok))
    return qi, passes
