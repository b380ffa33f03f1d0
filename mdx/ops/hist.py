"""Batched fixed-bin histograms, entropies, percentiles (JAX).

Histogram semantics match ``numpy.histogram(range=(0, hi))``: ``bins`` equal
width buckets over the range, right-most edge inclusive.

TPU-first formulation: a scatter-add histogram serialises on TPU (measured
74 ms vs 4.5 ms for 32×512² at 256 bins) and even fused compare-reduce
sweeps are VPU-bound (4.9 ms for 255 edges at 32×512²).  Instead the bin
index of every pixel is computed elementwise (floor-multiply plus a
one-step boundary fixup that makes it bit-equivalent to comparing against
the real ``k/bins·hi`` edges), split into a high/low nibble pair, and the
count table comes out of ONE batched [16,P]×[P,16] matmul of the two
one-hot factors — the MXU does the counting.  Measured 0.16 ms for
32×512²/256 bins (31× over the compare-reduce sweep); counts are exact
(0/1 products in bf16, f32 accumulation, integers < 2²⁴).
"""

from __future__ import annotations

import jax.numpy as jnp


def bin_indices(x: jnp.ndarray, bins: int,
                hi: jnp.ndarray | None = None) -> jnp.ndarray:
    """Exact numpy-semantics bin index per value: [N, P] → [N, P] int32.

    Bit-equivalent to comparing against edges ``(k / bins) * hi``: the
    floor-multiply index can be off by one at bin boundaries (float32
    rounding of ``v * (bins / hi)``), so it is fixed up with two compares
    against the SAME edge expressions the compare-reduce formulation used
    (``(k / bins)`` is exact for power-of-two ``bins``; the ``* hi``
    rounding matches).  Out-of-range and right-edge values clamp into the
    first/last bin, matching the cumulative less-than formulation.
    """
    if hi is None:
        idx = jnp.floor(x * jnp.float32(bins))
        idxf = jnp.clip(idx, 0.0, bins - 1.0)
        e_lo = idxf / bins
        e_hi = (idxf + 1.0) / bins
    else:
        # hi: [N] per-image edges for [N, P] data, or a traced scalar
        # broadcast over any shape (the fused stats kernel's per-plane
        # call) — identical arithmetic either way
        hi_s = jnp.maximum(hi, 1e-30).astype(jnp.float32)
        if hi_s.ndim:
            hi_s = hi_s[:, None]
        idx = jnp.floor(x * (jnp.float32(bins) / hi_s))
        idxf = jnp.clip(idx, 0.0, bins - 1.0)
        e_lo = (idxf / bins) * hi_s
        e_hi = ((idxf + 1.0) / bins) * hi_s
    i = idxf - (x < e_lo).astype(jnp.float32) + (x >= e_hi).astype(jnp.float32)
    return jnp.clip(i, 0.0, bins - 1.0).astype(jnp.int32)


def counts_from_indices(idx: jnp.ndarray, bins: int,
                        weights: jnp.ndarray | None = None) -> jnp.ndarray:
    """[N, P] int32 bin indices → [N, bins] f32 counts via one MXU matmul.

    The index splits into a high part (``bins // 16`` values) and a low
    nibble; ``counts[n, h, l] = Σ_p onehot(h_p)·onehot(l_p)`` is a batched
    [nh, P] × [P, 16] matmul.  Optional ``weights`` ([N, P], 0/1) exclude
    padding samples exactly.
    """
    if bins % 16 != 0:
        # fallback: fused compare-reduce over bin ids (small bins only)
        ids = jnp.arange(bins, dtype=jnp.int32)
        oh = (idx[:, :, None] == ids).astype(jnp.float32)
        if weights is not None:
            oh = oh * weights[:, :, None]
        return jnp.sum(oh, axis=1)
    nh = bins // 16
    hi_part = idx >> 4
    lo_part = idx & 15
    ohh = (hi_part[:, :, None] == jnp.arange(nh, dtype=jnp.int32)
           ).astype(jnp.bfloat16)
    ohl = (lo_part[:, :, None] == jnp.arange(16, dtype=jnp.int32)
           ).astype(jnp.bfloat16)
    if weights is not None:
        # weights are 0/1 masks — the product stays exact in bf16
        ohh = ohh * weights[:, :, None].astype(jnp.bfloat16)
    h2 = jnp.einsum("nph,npl->nhl", ohh, ohl,
                    preferred_element_type=jnp.float32)
    return h2.reshape(idx.shape[0], bins)


def counts_from_indices_grouped(idx: jnp.ndarray, bins: int) -> jnp.ndarray:
    """[N, G, P] int32 bin indices → [N, G, bins] f32 counts, one histogram
    per group (tile), via one batched nibble-one-hot einsum.

    Same exact-integer-counts argument as :func:`counts_from_indices`;
    used for per-tile CLAHE histograms (mdx/ops/pallas_kernels.py banded
    path), where it replaces a per-bin Pallas loop (measured 121 → 20 ms
    for 16×2048², t=16, 256 bins).  ``bins`` must be a multiple of 16.
    """
    n, g = idx.shape[0], idx.shape[1]
    nh = bins // 16
    ohh = (idx[..., None] >> 4 == jnp.arange(nh, dtype=jnp.int32)
           ).astype(jnp.bfloat16)
    ohl = ((idx[..., None] & 15) == jnp.arange(16, dtype=jnp.int32)
           ).astype(jnp.bfloat16)
    h2 = jnp.einsum("ngph,ngpl->nghl", ohh, ohl,
                    preferred_element_type=jnp.float32)
    return h2.reshape(n, g, bins)


def histogram01(x: jnp.ndarray, bins: int) -> jnp.ndarray:
    """Per-image histogram of [N,H,W] values over [0, 1] → [N, bins]."""
    n = x.shape[0]
    v = x.reshape(n, -1)
    return counts_from_indices(bin_indices(v, bins), bins)


def histogram_scaled(x: jnp.ndarray, bins: int, hi: jnp.ndarray) -> jnp.ndarray:
    """Per-image histogram over [0, hi_i] with per-image upper edge [N]."""
    n = x.shape[0]
    v = x.reshape(n, -1)
    return counts_from_indices(bin_indices(v, bins, hi), bins)


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
