"""Exactness tests for the sort-free order-statistic search (mdx/ops/quantile).

The bitwise binary search must be BIT-EXACT against a sort for order
statistics, and match numpy.percentile's 'linear' rule for interpolated
quantiles — it replaced ``jnp.percentile``/``jnp.median`` everywhere on the
hot path, so any deviation here would silently shift the golden contract.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from mdx.ops.quantile import order_statistics, percentiles_exact, median_rows

QS = [0.0, 1.0, 5.0, 25.0, 50.0, 75.0, 90.0, 95.0, 99.0, 100.0]


def _cases():
    rng = np.random.default_rng(42)
    return {
        "normal-negatives": rng.normal(0, 1, (4, 1000)).astype(np.float32),
        "uniform-big": rng.uniform(0, 1, (2, 512 * 512)).astype(np.float32),
        "heavy-ties": (np.round(rng.uniform(0, 1, (3, 777)) * 8) / 8
                       ).astype(np.float32),
        "all-equal": np.full((2, 64), 0.25, np.float32),
        "all-zero": np.zeros((2, 64), np.float32),
        "signed-zeros": np.concatenate(
            [np.full((1, 50), -0.0, np.float32),
             np.full((1, 50), 0.0, np.float32)], axis=1),
        "tiny-row": rng.normal(0, 1, (3, 2)).astype(np.float32),
        "huge-dynamic-range": (rng.normal(0, 1, (2, 500)) *
                               10.0 ** rng.integers(-30, 30, (2, 500))
                               ).astype(np.float32),
    }


@pytest.mark.parametrize("name", list(_cases()))
def test_order_statistics_bit_exact_vs_sort(name):
    x = _cases()[name]
    m = x.shape[1]
    ranks = sorted({1, 2, m // 2, max(m - 1, 1), m})
    got = np.asarray(order_statistics(jnp.asarray(x), ranks))
    want = np.sort(x, axis=-1)[:, [r - 1 for r in ranks]]
    # bitwise equality modulo -0.0 == +0.0
    assert np.array_equal(got, want), name


@pytest.mark.parametrize("name", list(_cases()))
def test_percentiles_match_numpy_linear(name):
    x = _cases()[name]
    got = np.asarray(percentiles_exact(jnp.asarray(x), QS))
    want = np.percentile(x.astype(np.float64), QS, axis=-1)
    assert np.allclose(got, want, rtol=1e-6, atol=0), name


def test_percentiles_bit_exact_f32_interpolation():
    """Same float32 arithmetic as interpolating the sorted array directly."""
    rng = np.random.default_rng(7)
    x = rng.uniform(0, 1, (3, 10_001)).astype(np.float32)
    s = np.sort(x, axis=-1)
    m = x.shape[1]
    got = np.asarray(percentiles_exact(jnp.asarray(x), QS))
    for i, q in enumerate(QS):
        pos = q / 100.0 * (m - 1)
        k, frac = int(pos), pos - int(pos)
        want = (s[:, k] * np.float32(1.0 - frac) + s[:, min(k + 1, m - 1)]
                * np.float32(frac)) if frac else s[:, k]
        assert np.array_equal(got[i], want.astype(np.float32)), q


def test_median_even_and_odd():
    rng = np.random.default_rng(3)
    for m in (1000, 1001, 2, 3):
        x = rng.normal(0, 5, (4, m)).astype(np.float32)
        got = np.asarray(median_rows(jnp.asarray(x)))
        want = np.median(x.astype(np.float64), axis=-1)
        assert np.allclose(got, want, rtol=1e-6, atol=1e-7), m


def test_rank_bounds_validated():
    x = jnp.zeros((2, 8), jnp.float32)
    with pytest.raises(ValueError):
        order_statistics(x, [0])
    with pytest.raises(ValueError):
        order_statistics(x, [9])


def test_sharded_bit_exact_vs_gathered_sort():
    """psum-distributed search == sorting the gathered array, bit for bit,
    with and without a validity mask."""
    import jax
    from jax.sharding import Mesh, PartitionSpec as P
    from jax import shard_map
    from mdx.ops.quantile import percentiles_exact_sharded

    devs = np.array(jax.devices()[:8])
    mesh = Mesh(devs, ("space",))
    rng = np.random.default_rng(11)
    x = rng.normal(0, 1, (3, 64, 40)).astype(np.float32)   # [N, H, W]
    w = (rng.uniform(0, 1, (3, 64, 40)) > 0.25).astype(np.float32)
    qs = [5.0, 50.0, 90.0, 95.0]

    def body(xl):
        return percentiles_exact_sharded(xl, qs, "space", 64 * 40)

    got = jax.jit(shard_map(body, mesh=mesh, in_specs=P(None, "space", None),
                            out_specs=P()))(x)
    want = np.percentile(x.reshape(3, -1).astype(np.float64), qs, axis=-1)
    assert np.allclose(np.asarray(got), want, rtol=1e-6)

    total_w = int(w.sum(axis=(1, 2))[0])  # make mask count uniform per image
    w[:] = w[:1]
    def body_w(xl, wl):
        return percentiles_exact_sharded(xl, qs, "space", total_w, weights=wl)

    got_w = jax.jit(shard_map(
        body_w, mesh=mesh, in_specs=(P(None, "space", None),) * 2,
        out_specs=P()))(x, w)
    flat = x.reshape(3, -1)
    want_w = np.stack([
        np.percentile(flat[i][w.reshape(3, -1)[i] > 0].astype(np.float64),
                      qs) for i in range(3)], -1)
    assert np.allclose(np.asarray(got_w), want_w, rtol=1e-6)


def test_jit_and_grad_safe_under_vmapped_batch():
    """Static qs + fori_loop body must trace once and run under jit."""
    import jax

    f = jax.jit(lambda a: percentiles_exact(a, [5.0, 95.0]))
    x = jnp.asarray(np.random.default_rng(0).uniform(0, 1, (4, 4096)),
                    jnp.float32)
    out = f(x)
    assert out.shape == (2, 4)
    want = np.percentile(np.asarray(x), [5.0, 95.0], axis=-1)
    assert np.allclose(np.asarray(out), want, rtol=1e-6)


def test_multi_source_fused_search_bit_exact():
    """percentiles_multi_sharded == one percentiles_exact_sharded per
    source, bit for bit — fusing the count psums into one [N, ΣR]
    collective must not change a single bit (mixed shapes, a weighted
    source, shared control flow)."""
    import jax
    from jax.sharding import Mesh, PartitionSpec as P
    from jax import shard_map
    from mdx.ops.quantile import (
        percentiles_exact_sharded,
        percentiles_multi_sharded,
    )

    devs = np.array(jax.devices()[:8])
    mesh = Mesh(devs, ("space",))
    rng = np.random.default_rng(21)
    a = rng.normal(0, 1, (2, 64, 40)).astype(np.float32)
    b = np.abs(rng.normal(0, 3, (2, 64, 24))).astype(np.float32)
    c = rng.uniform(-5, 5, (2, 64, 16)).astype(np.float32)
    wc = np.zeros((2, 64, 16), np.float32)
    wc[:, ::2, :] = 1.0                       # uniform per-image valid count
    total_c = int(wc[0].sum())
    qa_, qb_, qc_ = [5.0, 25.0, 75.0, 95.0], [90.0], [50.0]

    def fused(al, bl, cl, wl):
        return tuple(percentiles_multi_sharded(
            [(al, qa_, 64 * 40, None), (bl, qb_, 64 * 24, None),
             (cl, qc_, total_c, wl)], "space"))

    def separate(al, bl, cl, wl):
        return (percentiles_exact_sharded(al, qa_, "space", 64 * 40),
                percentiles_exact_sharded(bl, qb_, "space", 64 * 24),
                percentiles_exact_sharded(cl, qc_, "space", total_c,
                                          weights=wl))

    specs = (P(None, "space", None),) * 4
    got = jax.jit(shard_map(fused, mesh=mesh, in_specs=specs,
                            out_specs=(P(),) * 3))(a, b, c, wc)
    want = jax.jit(shard_map(separate, mesh=mesh, in_specs=specs,
                             out_specs=(P(),) * 3))(a, b, c, wc)
    for g, w in zip(got, want):
        np.testing.assert_array_equal(np.asarray(g), np.asarray(w))
