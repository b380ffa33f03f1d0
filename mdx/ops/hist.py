"""Batched fixed-bin histograms, entropies, percentiles (JAX).

Histogram semantics match ``numpy.histogram(range=(0, hi))``: ``bins`` equal
width buckets over the range, right-most edge inclusive.
"""

from __future__ import annotations

import jax.numpy as jnp


def cum_lt_counts(v: jnp.ndarray, edges: jnp.ndarray) -> jnp.ndarray:
    """[N, P] values × interior edges → [N, bins-1] counts of v < edge.

    TPU-first: a scatter-add histogram serialises on TPU (measured 74 ms vs
    4.5 ms for 32×512² at 256 bins), and even the fused one-hot
    ``idx == iota`` compare-reduce costs 19.4 ms at 128×512²/256 bins.
    Counting ``v < edge`` against the ``bins-1`` interior edges and
    differencing the cumulative counts is the same VPU sweep shape but
    2.3× faster (8.3 ms measured) — the float `<` against a broadcast edge
    vector lowers better than integer equality on bin ids.

    ``edges`` is [bins-1] (shared) or [N, bins-1] (per-image).
    """
    if edges.ndim == 1:
        edges = edges[None, None, :]
    else:
        edges = edges[:, None, :]
    return jnp.sum((v[:, :, None] < edges).astype(jnp.float32), axis=1)


def hist_from_cum(c: jnp.ndarray, total: jnp.ndarray) -> jnp.ndarray:
    """[N, bins-1] cumulative counts + [N, 1] totals → [N, bins] histogram."""
    first = c[:, :1]
    mids = c[:, 1:] - c[:, :-1]
    last = total - c[:, -1:]
    return jnp.concatenate([first, mids, last], axis=1)


def histogram01(x: jnp.ndarray, bins: int) -> jnp.ndarray:
    """Per-image histogram of [N,H,W] values over [0, 1] → [N, bins]."""
    n = x.shape[0]
    v = x.reshape(n, -1)
    edges = jnp.arange(1, bins, dtype=jnp.float32) / bins
    c = cum_lt_counts(v, edges)
    return hist_from_cum(c, jnp.full((n, 1), v.shape[1], jnp.float32))


def histogram_scaled(x: jnp.ndarray, bins: int, hi: jnp.ndarray) -> jnp.ndarray:
    """Per-image histogram over [0, hi_i] with per-image upper edge [N]."""
    n = x.shape[0]
    v = x.reshape(n, -1)
    edges = ((jnp.arange(1, bins, dtype=jnp.float32) / bins)[None, :]
             * jnp.maximum(hi, 1e-30)[:, None])
    c = cum_lt_counts(v, edges)
    return hist_from_cum(c, jnp.full((n, 1), v.shape[1], jnp.float32))


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
