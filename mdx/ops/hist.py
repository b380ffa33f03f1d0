"""Batched fixed-bin histograms, entropies, percentiles (JAX).

Histogram semantics match ``numpy.histogram(range=(0, hi))``: ``bins`` equal
width buckets over the range, right-most edge inclusive.
"""

from __future__ import annotations

import jax.numpy as jnp


def _count_by_bin(idx: jnp.ndarray, bins: int) -> jnp.ndarray:
    """[N, P] int bin ids → [N, bins] counts via compare-and-reduce.

    TPU-first: a scatter-add histogram serialises on TPU (measured 74 ms vs
    4.5 ms for 32×512² at 256 bins); the broadcast-compare formulation fuses
    into one VPU reduction sweep and never materialises the one-hot tensor.
    """
    ids = jnp.arange(bins, dtype=jnp.int32)
    return jnp.sum((idx[:, :, None] == ids).astype(jnp.float32), axis=1)


def histogram01(x: jnp.ndarray, bins: int) -> jnp.ndarray:
    """Per-image histogram of [N,H,W] values over [0, 1] → [N, bins]."""
    n = x.shape[0]
    idx = jnp.clip((x.reshape(n, -1) * bins).astype(jnp.int32), 0, bins - 1)
    return _count_by_bin(idx, bins)


def histogram_scaled(x: jnp.ndarray, bins: int, hi: jnp.ndarray) -> jnp.ndarray:
    """Per-image histogram over [0, hi_i] with per-image upper edge [N]."""
    n = x.shape[0]
    scale = bins / jnp.maximum(hi, 1e-30)[:, None]
    idx = jnp.clip((x.reshape(n, -1) * scale).astype(jnp.int32), 0, bins - 1)
    return _count_by_bin(idx, bins)


def entropy_from_hist(hist: jnp.ndarray) -> jnp.ndarray:
    """Shannon entropy (bits) per image from [N, bins] counts, zero bins
    excluded (ref pipeline/metrics.py:112-117)."""
    total = jnp.sum(hist, axis=-1, keepdims=True)
    p = hist / jnp.maximum(total, 1.0)
    logp = jnp.where(p > 0, jnp.log2(jnp.maximum(p, 1e-30)), 0.0)
    return -jnp.sum(p * logp, axis=-1)


def shannon_entropy01(x: jnp.ndarray, bins: int = 256) -> jnp.ndarray:
    return entropy_from_hist(histogram01(x, bins))


def percentiles(x: jnp.ndarray, qs) -> jnp.ndarray:
    """Per-image percentiles (linear interpolation): [N,H,W] → [len(qs), N].

    Exact (true order statistics + NumPy 'linear' interpolation) but
    sort-free: bitwise binary search over the float bit pattern — 16 fused
    compare-reduce sweeps instead of a sort network (3.2× faster on TPU at
    128×512²; see mdx/ops/quantile.py).  ``qs`` must be static.
    """
    from mdx.ops.quantile import percentiles_exact

    return percentiles_exact(x, qs)
