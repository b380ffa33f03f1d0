"""Sharded TV-Chambolle parity tests (mdx/parallel/tv_sp.py): the
distributed dual ascent must match the dense ``tv_chambolle_xla`` —
identical iteration arithmetic, psum'd energies driving an identical
replicated stop — on both the 1-D row-block and 2-D tile layouts."""

from __future__ import annotations

from functools import partial

import numpy as np
import jax.numpy as jnp
import pytest
from jax import shard_map
from jax.sharding import PartitionSpec as P

from mdx.ops.tv import tv_chambolle_xla
from mdx.parallel import make_mesh, make_mesh2d, spatial2d
from mdx.parallel.tv_sp import tv_sharded


def _img(seed=0, h=64, w=64):
    r = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float64)
    base = 0.45 + 0.25 * np.sin(xx / 11.0) * np.cos(yy / 7.0)
    return np.clip(base + r.normal(0, 0.1, (h, w)), 0, 1).astype(np.float32)


@pytest.fixture(scope="module")
def mesh14():
    return make_mesh(n_data=1, n_space=4)


@pytest.fixture(scope="module")
def mesh124():
    return make_mesh2d(n_data=1, n_sy=2, n_sx=4)


class TestTVSharded:
    @pytest.mark.parametrize("weight", [0.03, 0.1])
    def test_1d_matches_dense(self, mesh14, weight):
        x = jnp.stack([jnp.asarray(_img(0)), jnp.asarray(_img(1))])
        w = jnp.asarray([weight, weight * 0.5], jnp.float32)
        fn = shard_map(
            partial(tv_sharded, row_axis="space"),
            mesh=mesh14,
            in_specs=(P("data", "space", None), P()),
            out_specs=P("data", "space", None), check_vma=False)
        got = fn(x, w)
        want = tv_chambolle_xla(x, w)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=1e-5)

    def test_2d_matches_dense(self, mesh124):
        x = jnp.stack([jnp.asarray(_img(2))])
        w = jnp.float32(0.05)
        fn = shard_map(
            partial(tv_sharded, row_axis="sy", col_axis="sx"),
            mesh=mesh124,
            in_specs=(P("data", "sy", "sx"), P()),
            out_specs=P("data", "sy", "sx"), check_vma=False)
        got = fn(x, w)
        want = tv_chambolle_xla(x, jnp.broadcast_to(w, (1,)))
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=1e-5)

    def test_data_rows_with_different_trip_counts(self):
        """Regression: with ≥2 data rows, images converge after different
        iteration counts; the loop's stop flag must stay uniform across
        the WHOLE mesh or the per-iteration ppermutes deadlock (XLA
        rendezvous spans every device running the program — the driver
        dryrun caught a 4-of-8 timeout).  Two very different images on a
        (2 data, 2 sy, 2 sx) mesh must complete AND match dense."""
        mesh = make_mesh2d(n_data=2, n_sy=2, n_sx=2)
        smooth = np.clip(
            0.5 + 0.2 * np.sin(np.mgrid[0:64, 0:64][1] / 21.0), 0, 1
        ).astype(np.float32)
        x = jnp.stack([jnp.asarray(smooth), jnp.asarray(_img(9))])
        w = jnp.asarray([0.01, 0.1], jnp.float32)
        fn = shard_map(
            partial(tv_sharded, row_axis="sy", col_axis="sx"),
            mesh=mesh,
            in_specs=(P("data", "sy", "sx"), P("data")),
            out_specs=P("data", "sy", "sx"), check_vma=False)
        got = fn(x, w)
        want = tv_chambolle_xla(x, w)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=1e-5)

    def test_banded_vs_dense_banded_at_fixed_trips(self, mesh14):
        """The banded-Pallas sharded body (interpret mode) vs the dense
        banded kernel at fixed trip counts.  4 shards × hs=64 = nb=1 per
        shard, so EVERY halo row crosses a shard boundary — the halo
        TRANSPORT is exact (the iteration-0 ``gy`` diffed bit-identical
        when isolated); the residual ±1-ulp tolerance is XLA contracting
        ``gy·gy + gx·gx`` into an FMA differently in the two programs'
        iteration-0 init, which then propagates through the solve."""
        x = jnp.stack([jnp.asarray(_img(0, 256, 128)),
                       jnp.asarray(_img(1, 256, 128))])
        w = jnp.asarray([0.06, 0.03], jnp.float32)
        from mdx.ops.pallas_kernels import tv_chambolle_banded
        fn = shard_map(
            partial(tv_sharded, row_axis="space", banded=True,
                    interpret=True, eps=0.0, max_iter=9),
            mesh=mesh14,
            in_specs=(P("data", "space", None), P()),
            out_specs=P("data", "space", None), check_vma=False)
        got = fn(x, w)
        want = tv_chambolle_banded(x, w, eps=0.0, max_iter=9, band=64,
                                   interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=3e-7)

    def test_banded_convergence_matches_dense(self, mesh14):
        """With the real stop test and per-image divergent trip counts,
        the banded sharded solve matches the dense XLA solve."""
        x = jnp.stack([jnp.asarray(_img(4, 256, 128)),
                       jnp.asarray(_img(5, 256, 128))])
        w = jnp.asarray([0.08, 0.02], jnp.float32)
        fn = shard_map(
            partial(tv_sharded, row_axis="space", banded=True,
                    interpret=True, max_iter=60),
            mesh=mesh14,
            in_specs=(P("data", "space", None), P()),
            out_specs=P("data", "space", None), check_vma=False)
        got = fn(x, w)
        want = tv_chambolle_xla(x, w, max_iter=60)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=1e-5)

    def test_banded_data_rows_divergent_trips(self):
        """Deadlock regression for the banded body: its per-iteration
        ppermutes rendezvous over the whole mesh, so the stop flag must
        stay uniform across the data axis too (psum over ALL axes)."""
        mesh = make_mesh(n_data=2, n_space=2)
        smooth = np.clip(
            0.5 + 0.2 * np.sin(np.mgrid[0:128, 0:128][1] / 21.0), 0, 1
        ).astype(np.float32)
        x = jnp.stack([jnp.asarray(smooth),
                       jnp.asarray(_img(9, 128, 128))])
        w = jnp.asarray([0.01, 0.1], jnp.float32)
        fn = shard_map(
            partial(tv_sharded, row_axis="space", banded=True,
                    interpret=True, max_iter=60),
            mesh=mesh,
            in_specs=(P("data", "space", None), P("data")),
            out_specs=P("data", "space", None), check_vma=False)
        got = fn(x, w)
        want = tv_chambolle_xla(x, w, max_iter=60)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=1e-5)

    def test_qa2d_with_full_optional_chain(self, mesh124):
        """qa_spatial2d with CLAHE + bilateral + TV — the whole optional
        chain in one SPMD program."""
        x = jnp.stack([jnp.asarray(_img(3))])
        out = spatial2d.qa_spatial2d(
            x, mesh124, bilateral_d=5, clahe_clip_limit=0.02,
            tv_weight=0.05)
        assert out["enhanced"].shape == (1, 64, 64)
        # TV must actually smooth vs the no-TV chain
        out2 = spatial2d.qa_spatial2d(
            x, mesh124, bilateral_d=5, clahe_clip_limit=0.02)
        tvd = np.asarray(out["enhanced"])
        ntv = np.asarray(out2["enhanced"])
        def tv_energy(a):
            return (np.abs(np.diff(a, axis=1)).sum()
                    + np.abs(np.diff(a, axis=2)).sum())
        assert tv_energy(tvd) < tv_energy(ntv)
