"""Exact per-image order statistics WITHOUT sorting (JAX, TPU-first).

``jnp.percentile``/``jnp.median`` lower to a full sort; on TPU the fused
QA pass's three exact sorts (value percentiles, gradient p90, wavelet-MAD
median) measured ~40% of total batch-128 time (docs/PERF.md).  This module
finds the exact k-th smallest element by **bitwise binary search over the
IEEE-754 bit pattern**: 16 radix-4 sweeps, each one fused
broadcast-compare-reduce stream of the data (pure HBM bandwidth, a handful
of VPU compare/accumulate ops per element) — no sort network, no
scatter/gather, no data-dependent shapes.

Why it is exact: the map ``f32 -> u32`` below is an order-preserving
bijection on all non-NaN floats, so counting ``mapped < candidate`` is
equivalent to counting ``value < candidate_value``; the greedy bit
construction returns the largest 32-bit integer ``v`` with
``count(u < v) < rank``, which IS the bit pattern of the rank-th smallest
element (count(u < v) <= rank-1 and count(u <= v) >= rank).  Percentiles
then interpolate between two exact order statistics with NumPy's
``linear`` rule — same contract as the sort-based path it replaces
(reference formulas: pipeline/metrics.py:42-109 uses np.percentile;
skimage's wavelet-MAD sigma uses the median).

Precondition: inputs must be NaN-free (everything in the mdx hot path is).
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax

_SIGN = jnp.uint32(0x80000000)


def _to_ordered_u32(x: jnp.ndarray) -> jnp.ndarray:
    """Order-preserving bijection float32 → uint32 (total order, NaN-free).

    Non-negative floats (sign bit 0) map to ``bits | 0x80000000``; negative
    floats map to ``~bits``.  Monotone because IEEE-754 magnitudes compare
    like unsigned integers.  (-0.0 orders just below +0.0; both interpolate
    to the same numeric value.)
    """
    u = lax.bitcast_convert_type(x, jnp.uint32)
    return jnp.where(u & _SIGN == 0, u | _SIGN, ~u)


def _from_ordered_u32(u: jnp.ndarray) -> jnp.ndarray:
    bits = jnp.where(u & _SIGN != 0, u & ~_SIGN, ~u)
    return lax.bitcast_convert_type(bits, jnp.float32)


def _bitsearch(u: jnp.ndarray, ranks: tuple, count_below) -> jnp.ndarray:
    """Shared radix-4 search: 16 sweeps; sweep ``s`` decides bit pair
    (31-2s, 30-2s) by counting elements below the three candidate prefixes
    in ONE fused pass.  ``count_below(cand[N,R,3]) -> int32 [N,R,3]`` is the
    reduction — local for the single-device path, local+``psum`` for the
    sharded path.  Counts accumulate in int32 (M < 2^31)."""
    n = u.shape[0]
    r = jnp.asarray(ranks, jnp.int32)[None, :]          # [1, R]
    ans = jnp.zeros((n, len(ranks)), jnp.uint32)

    def sweep(i, ans):
        b_hi = jnp.uint32(1) << (jnp.uint32(31) - 2 * jnp.uint32(i))
        b_lo = b_hi >> 1
        # candidates for this bit pair: hi, lo, hi|lo  → [N, R, 3]
        cand = jnp.stack([ans | b_hi, ans | b_lo, ans | b_hi | b_lo], -1)
        ok = count_below(cand) < r[..., None]            # predicate per cand
        # greedy: decide hi bit first, then lo bit given hi
        return jnp.where(
            ok[..., 0],
            jnp.where(ok[..., 2], cand[..., 2], cand[..., 0]),
            jnp.where(ok[..., 1], cand[..., 1], ans))

    return lax.fori_loop(0, 16, sweep, ans)


def order_statistics(v: jnp.ndarray, ranks) -> jnp.ndarray:
    """Exact order statistics per row: [N, M] × R static 1-indexed ranks
    → [N, R] (row-wise rank_r-th smallest element, bit-exact vs a sort)."""
    n, m = v.shape
    ranks = tuple(int(r) for r in ranks)
    if not ranks:
        return jnp.zeros((n, 0), jnp.float32)
    if min(ranks) < 1 or max(ranks) > m:
        raise ValueError(f"ranks must be within [1, {m}], got {ranks}")
    u = _to_ordered_u32(v)

    def count_below(cand):
        return jnp.sum(
            (u[:, None, None, :] < cand[..., None]).astype(jnp.int32),
            axis=-1)

    return _from_ordered_u32(_bitsearch(u, ranks, count_below))


def percentiles_exact(x: jnp.ndarray, qs) -> jnp.ndarray:
    """Per-image percentiles (NumPy 'linear' rule) of [N, ...] → [len(qs), N].

    Exact: interpolates between true order statistics found by
    :func:`order_statistics`.  ``qs`` must be static (they are compile-time
    constants everywhere in mdx).  Drop-in for the sort-based
    ``jnp.percentile(flat, qs, axis=-1)``.
    """
    n = x.shape[0]
    flat = x.reshape(n, -1)
    m = flat.shape[1]
    qs = [float(q) for q in qs]
    # ranks (1-indexed) needed for every q, deduped, stable order
    need: dict[int, int] = {}
    plan = []  # (rank_lo_idx, rank_hi_idx, frac)
    for q in qs:
        pos = q / 100.0 * (m - 1)
        k = min(int(pos), m - 1)
        frac = pos - k
        lo, hi = k + 1, min(k + 2, m)
        for rk in (lo, hi):
            if rk not in need:
                need[rk] = len(need)
        plan.append((need[lo], need[hi], frac))
    os_ = order_statistics(flat, tuple(need))            # [N, R]
    out = [os_[:, lo] * (1.0 - f) + os_[:, hi] * f if f else os_[:, lo]
           for lo, hi, f in plan]
    return jnp.stack(out, 0)


def median_rows(flat: jnp.ndarray) -> jnp.ndarray:
    """Exact per-row median of [N, M] → [N] (== jnp.median(flat, axis=-1))."""
    return percentiles_exact(flat, [50.0])[0]


# ---------------------------------------------------------------------------
# Sharded (SPMD) exact order statistics — for use under shard_map
# ---------------------------------------------------------------------------


def _plan(qs, m: int):
    """Static interpolation plan for NumPy's 'linear' rule over m elements:
    deduped 1-indexed ranks + per-q (lo_idx, hi_idx, frac)."""
    need: dict[int, int] = {}
    plan = []
    for q in qs:
        pos = float(q) / 100.0 * (m - 1)
        k = min(int(pos), m - 1)
        frac = pos - k
        lo, hi = k + 1, min(k + 2, m)
        for rk in (lo, hi):
            if rk not in need:
                need[rk] = len(need)
        plan.append((need[lo], need[hi], frac))
    return tuple(need), plan


def percentiles_exact_sharded(v: jnp.ndarray, qs, axis_name: str,
                              total: int,
                              weights: jnp.ndarray | None = None
                              ) -> jnp.ndarray:
    """Exact global per-image percentiles of sharded data, under shard_map.

    The count-below reduction is a local sum + ``lax.psum`` over
    ``axis_name`` — the global result is bit-identical to gathering every
    shard and sorting, with only 16 tiny [N,R,3] collectives total.  This
    replaces the histogram-CDF *estimator* the spatial path used before
    (error ≤ range/4096): distributed order statistics are now exact.

    ``v``: local shard, any shape with leading N.  ``total``: static global
    element count (validity-weighted if ``weights`` given).  ``weights``:
    optional 0/1 mask (broadcastable to v) excluding padding/duplicate
    samples from BOTH the count and the rank space.
    """
    n = v.shape[0]
    flat = v.reshape(n, -1)
    u = _to_ordered_u32(flat)
    if weights is not None:
        w = jnp.broadcast_to(weights, v.shape).reshape(n, -1)
        w = (w > 0).astype(jnp.int32)
    ranks, plan = _plan(qs, int(total))

    def count_below(cand):
        below = (u[:, None, None, :] < cand[..., None]).astype(jnp.int32)
        if weights is not None:
            below = below * w[:, None, None, :]
        return lax.psum(jnp.sum(below, axis=-1), axis_name)

    os_ = _from_ordered_u32(_bitsearch(u, ranks, count_below))
    out = [os_[:, lo] * (1.0 - f) + os_[:, hi] * f if f else os_[:, lo]
           for lo, hi, f in plan]
    return jnp.stack(out, 0)
