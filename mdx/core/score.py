"""Batched tuning objective (JAX) — ref pipeline/metrics.py:337-408."""

from __future__ import annotations

import jax.numpy as jnp


def objective_score(v: dict[str, jnp.ndarray]) -> tuple[jnp.ndarray, dict[str, jnp.ndarray]]:
    """Scalar score per image (higher = better) + breakdown, all [N]."""
    zero = 0.0
    contrast_gain = v["contrast_gain"]
    sharpness_gain = v["sharpness_gain"]
    noise_pen = jnp.maximum(v["noise_change"], zero)
    niqe_deg = jnp.maximum(v["niqe_after"] - v["niqe_before"], zero)
    passes = v["passes"].astype(jnp.float32)
    halo_pen = jnp.maximum(v["edge_ratio"] - 1.0, zero) * 5.0
    ent_pen = jnp.maximum(jnp.abs(v["entropy_change"]) - 0.5, zero) * 2.0
    snr_rwd = jnp.clip(v["snr_change"] * 0.1, zero, 0.5)
    hs_rwd = jnp.clip(v["histogram_spread_change"] * 0.5, zero, 0.3)
    lc_rwd = jnp.clip(v["local_contrast_change"] * 0.3, zero, 0.3)
    gs_rwd = jnp.clip(v["gradient_strength_change"] * 0.2, zero, 0.2)
    ge_pen = jnp.maximum(jnp.abs(v["gradient_entropy_change"]) - 0.3, zero) * 1.5

    score = (
        0.35 * contrast_gain + 0.35 * sharpness_gain - 0.30 * noise_pen
        - 5.0 * niqe_deg - 10.0 * (1.0 - passes) - halo_pen - ent_pen
        + snr_rwd + hs_rwd + lc_rwd + gs_rwd - ge_pen
    )
    breakdown = {
        "contrast_gain": contrast_gain,
        "sharpness_gain": sharpness_gain,
        "noise_penalty": noise_pen,
        "niqe_degradation": niqe_deg,
        "halo_penalty": halo_pen,
        "entropy_penalty": ent_pen,
        "snr_reward": snr_rwd,
        "hs_reward": hs_rwd,
        "local_contrast_reward": lc_rwd,
        "gradient_strength_reward": gs_rwd,
        "gradient_entropy_penalty": ge_pen,
        "passes": v["passes"],
    }
    return score, breakdown
