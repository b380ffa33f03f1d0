"""Exact per-image order statistics WITHOUT sorting (JAX, TPU-first).

``jnp.percentile``/``jnp.median`` lower to a full sort; on TPU the fused
QA pass's three exact sorts (value percentiles, gradient p90, wavelet-MAD
median) measured ~40% of total batch-128 time (docs/PERF.md).  This module
finds the exact k-th smallest element by **bitwise binary search over the
IEEE-754 bit pattern**: 32 radix-2 sweeps, each one fused
broadcast-compare-reduce stream of the data with ONE compare+accumulate
per element per rank — no sort network, no scatter/gather, no
data-dependent shapes.  The cost is VPU-compare-bound, so the design
minimises total compares: radix-2 beats radix-4 (32·R vs 48·R compares),
and percentile interpolation searches only the LOWER rank of each
(k, k+1) pair — the successor order statistic comes from one extra fused
pass (count(u<=a) + min(u>a), tie-aware) instead of a second search.

Why it is exact: the map ``f32 -> u32`` below is an order-preserving
bijection on all non-NaN floats, so counting ``mapped < candidate`` is
equivalent to counting ``value < candidate_value``; the greedy bit
construction returns the largest 32-bit integer ``v`` with
``count(u < v) < rank``, which IS the bit pattern of the rank-th smallest
element (count(u < v) <= rank-1 and count(u <= v) >= rank).  The
(rank+1)-th equals the rank-th under ties (count(u <= a) >= rank+1),
otherwise the smallest element strictly above it.  Percentiles then
interpolate with NumPy's ``linear`` rule — same contract as the
sort-based path it replaces (reference formulas: pipeline/metrics.py:42-109
uses np.percentile; skimage's wavelet-MAD sigma uses the median).

Precondition: inputs must be NaN-free (everything in the mdx hot path is).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np
from jax import lax

# NumPy scalars, not jnp.uint32 device constants: they inline as
# literals wherever they are traced, and the fused stats Pallas kernel
# reuses _to_ordered_u32/_from_ordered_u32 — a kernel cannot capture
# pre-materialised host constant arrays.
_SIGN = np.uint32(0x80000000)
_UMAX = np.uint32(0xFFFFFFFF)


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
    """Shared radix-2 search: 32 sweeps; sweep ``s`` decides bit (31-s) by
    counting elements below one candidate prefix per rank.
    ``count_below(cand[N,R]) -> int32 [N,R]`` is the reduction — local for
    the single-device path, local+``psum`` for the sharded path.  Counts
    accumulate in int32 (M < 2^31)."""
    n = u.shape[0]
    r = jnp.asarray(ranks, jnp.int32)[None, :]          # [1, R]
    ans = jnp.zeros((n, len(ranks)), jnp.uint32)

    def sweep(i, ans):
        cand = ans | (jnp.uint32(1) << (jnp.uint32(31) - jnp.uint32(i)))
        return jnp.where(count_below(cand) < r, cand, ans)

    return lax.fori_loop(0, 32, sweep, ans)


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
        return jnp.sum((u[:, None, :] < cand[:, :, None]).astype(jnp.int32),
                       axis=-1)

    return _from_ordered_u32(_bitsearch(u, ranks, count_below))


def _plan(qs, m: int):
    """Static interpolation plan for NumPy's 'linear' rule over m elements:
    deduped 1-indexed LOWER ranks + per-q (rank_idx, frac).  The upper
    order statistic of each pair is recovered by the successor pass."""
    need: dict[int, int] = {}
    plan = []
    for q in qs:
        pos = float(q) / 100.0 * (m - 1)
        k = min(int(pos), m - 1)
        frac = pos - k
        lo = k + 1
        if lo not in need:
            need[lo] = len(need)
        plan.append((need[lo], frac))
    return tuple(need), plan


def _interpolate(os_: jnp.ndarray, succ: jnp.ndarray, plan) -> jnp.ndarray:
    out = [os_[:, i] * (1.0 - f) + succ[:, i] * f if f else os_[:, i]
           for i, f in plan]
    return jnp.stack(out, 0)


def percentiles_exact(x: jnp.ndarray, qs) -> jnp.ndarray:
    """Per-image percentiles (NumPy 'linear' rule) of [N, ...] → [len(qs), N].

    Exact: interpolates between true order statistics (searched lower rank
    + tie-aware successor).  ``qs`` must be static (they are compile-time
    constants everywhere in mdx).  Drop-in for the sort-based
    ``jnp.percentile(flat, qs, axis=-1)``.
    """
    n = x.shape[0]
    flat = x.reshape(n, -1)
    u = _to_ordered_u32(flat)
    ranks, plan = _plan(qs, flat.shape[1])
    r = jnp.asarray(ranks, jnp.int32)[None, :]

    def count_below(cand):
        return jnp.sum((u[:, None, :] < cand[:, :, None]).astype(jnp.int32),
                       axis=-1)

    a = _bitsearch(u, ranks, count_below)                # [N, R] mapped
    if any(f for _, f in plan):
        # successor pass: (rank+1)-th = a under ties, else min(u > a).
        le = u[:, None, :] <= a[:, :, None]
        cnt_le = jnp.sum(le.astype(jnp.int32), axis=-1)
        min_above = jnp.min(jnp.where(le, _UMAX, u[:, None, :]), axis=-1)
        succ = _from_ordered_u32(jnp.where(cnt_le >= r + 1, a, min_above))
    else:
        succ = jnp.zeros_like(a, jnp.float32)
    return _interpolate(_from_ordered_u32(a), succ, plan)


def median_rows(flat: jnp.ndarray) -> jnp.ndarray:
    """Exact per-row median of [N, M] → [N] (== jnp.median(flat, axis=-1))."""
    return percentiles_exact(flat, [50.0])[0]


# ---------------------------------------------------------------------------
# Sharded (SPMD) exact order statistics — for use under shard_map
# ---------------------------------------------------------------------------


def percentiles_exact_sharded(v: jnp.ndarray, qs, axis_name: str,
                              total: int,
                              weights: jnp.ndarray | None = None
                              ) -> jnp.ndarray:
    """Exact global per-image percentiles of sharded data, under shard_map.

    The count-below reduction is a local sum + ``lax.psum`` over
    ``axis_name``; the successor pass adds one psum + one ``pmin`` — the
    global result is bit-identical to gathering every shard and sorting,
    with 33 tiny [N,R] collectives total.  This replaces the histogram-CDF
    *estimator* the spatial path used before (error ≤ range/4096):
    distributed order statistics are exact.

    ``v``: local shard, any shape with leading N.  ``total``: static global
    element count (validity-weighted if ``weights`` given).  ``weights``:
    optional 0/1 mask (broadcastable to v) excluding padding/duplicate
    samples from BOTH the count and the rank space.
    """
    n = v.shape[0]
    flat = v.reshape(n, -1)
    u = _to_ordered_u32(flat)
    if weights is not None:
        w = (jnp.broadcast_to(weights, v.shape).reshape(n, -1) > 0)
        wi = w.astype(jnp.int32)
    ranks, plan = _plan(qs, int(total))
    r = jnp.asarray(ranks, jnp.int32)[None, :]

    def count_below(cand):
        below = (u[:, None, :] < cand[:, :, None]).astype(jnp.int32)
        if weights is not None:
            below = below * wi[:, None, :]
        return lax.psum(jnp.sum(below, axis=-1), axis_name)

    a = _bitsearch(u, ranks, count_below)                # [N, R] mapped
    if any(f for _, f in plan):
        le = u[:, None, :] <= a[:, :, None]
        cnt = le.astype(jnp.int32)
        excl = ~le  # elements strictly above a (candidates for successor)
        if weights is not None:
            cnt = cnt * wi[:, None, :]
            excl = excl & w[:, None, :]
        cnt_le = lax.psum(jnp.sum(cnt, axis=-1), axis_name)
        local_min = jnp.min(jnp.where(excl, u[:, None, :], _UMAX), axis=-1)
        min_above = lax.pmin(local_min, axis_name)
        succ = _from_ordered_u32(jnp.where(cnt_le >= r + 1, a, min_above))
    else:
        succ = jnp.zeros_like(a, jnp.float32)
    return _interpolate(_from_ordered_u32(a), succ, plan)


def percentiles_multi_sharded(sources, axis_name) -> list[jnp.ndarray]:
    """Fused exact percentiles over MULTIPLE data sources in ONE search.

    ``sources``: list of ``(v, qs, total, weights)`` — same contract per
    entry as :func:`percentiles_exact_sharded`; all share the leading N.
    Returns one ``[len(qs), N]`` array per source.

    The spatial metric pass needs order statistics of three different
    arrays (the image, the gradient magnitude, the |HH| wavelet subband).
    Run separately, that is 3 × 32 count psums + 3 successor psum/pmin
    pairs of tiny [N, R] tensors — ~100 latency-bound collectives per
    pass.  Every search shares the same 32-sweep control flow, so the
    per-sweep counts of ALL sources concatenate into ONE ``[N, ΣR]``
    psum (and one batched successor psum + pmin): same compares, same
    results bit-for-bit, ~3× fewer collectives on the ICI-latency path.
    """
    n = sources[0][0].shape[0]
    us, ws, plans, spans = [], [], [], []
    all_ranks: list[int] = []
    for v, qs, total, weights in sources:
        flat = v.reshape(n, -1)
        us.append(_to_ordered_u32(flat))
        ws.append(None if weights is None else
                  (jnp.broadcast_to(weights, v.shape).reshape(n, -1) > 0))
        ranks, plan = _plan(qs, int(total))
        plans.append(plan)
        spans.append((len(all_ranks), len(ranks)))
        all_ranks.extend(ranks)
    r_all = jnp.asarray(all_ranks, jnp.int32)[None, :]

    def count_below(cand):                               # cand [N, ΣR]
        parts = []
        for u, w, (off, cnt) in zip(us, ws, spans):
            c = cand[:, off:off + cnt]
            below = (u[:, None, :] < c[:, :, None]).astype(jnp.int32)
            if w is not None:
                below = below * w[:, None, :].astype(jnp.int32)
            parts.append(jnp.sum(below, axis=-1))
        return lax.psum(jnp.concatenate(parts, axis=1), axis_name)

    a = _bitsearch(us[0], tuple(all_ranks), count_below)  # [N, ΣR] mapped

    if any(f for plan in plans for _, f in plan):
        cnt_parts, min_parts = [], []
        for u, w, (off, cnt) in zip(us, ws, spans):
            asrc = a[:, off:off + cnt]
            le = u[:, None, :] <= asrc[:, :, None]
            cle = le.astype(jnp.int32)
            excl = ~le
            if w is not None:
                cle = cle * w[:, None, :].astype(jnp.int32)
                excl = excl & w[:, None, :]
            cnt_parts.append(jnp.sum(cle, axis=-1))
            min_parts.append(jnp.min(
                jnp.where(excl, u[:, None, :], _UMAX), axis=-1))
        cnt_le = lax.psum(jnp.concatenate(cnt_parts, axis=1), axis_name)
        min_above = lax.pmin(jnp.concatenate(min_parts, axis=1), axis_name)
        succ = _from_ordered_u32(jnp.where(cnt_le >= r_all + 1,
                                           a, min_above))
    else:
        succ = jnp.zeros_like(a, jnp.float32)

    af = _from_ordered_u32(a)
    return [_interpolate(af[:, off:off + cnt], succ[:, off:off + cnt], plan)
            for (off, cnt), plan in zip(spans, plans)]
