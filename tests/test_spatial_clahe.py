"""Sharded-CLAHE parity tests (mdx/parallel/clahe_sp.py) on the virtual
8-device mesh: the tile grid mapped onto shards must reproduce the dense
op exactly (same integer histograms, same clip/CDF arithmetic, and the
halo-extended virtual-tile bilinear formula equals skimage's clamped
formula — see the module docstring's exactness argument)."""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp
import pytest

from mdx.ops.clahe import clahe_xla
from mdx.parallel import make_mesh, make_mesh2d, spatial, spatial2d


def _img(seed=0, h=64, w=64):
    r = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float64)
    base = 0.4 + 0.25 * np.sin(xx / 9.0) * np.cos(yy / 13.0)
    return np.clip(base + r.normal(0, 0.08, (h, w)), 0, 1).astype(np.float32)


@pytest.fixture(scope="module")
def mesh14():
    return make_mesh(n_data=1, n_space=4)


@pytest.fixture(scope="module")
def mesh122():
    return make_mesh2d(n_data=1, n_sy=2, n_sx=2)


class TestClaheSharded1D:
    @pytest.mark.parametrize("tile", [8, 16])
    def test_matches_dense(self, mesh14, tile):
        """Row-block-sharded CLAHE == dense XLA CLAHE (t divides the
        per-shard rows: 64/4 = 16)."""
        from functools import partial

        from jax import shard_map
        from jax.sharding import PartitionSpec as P

        from mdx.parallel.clahe_sp import clahe_sharded

        x = jnp.stack([jnp.asarray(_img(0)), jnp.asarray(_img(1))])
        clip = jnp.asarray([0.02, 0.05], jnp.float32)
        fn = shard_map(
            partial(clahe_sharded, tile_size=tile, row_axis="space"),
            mesh=mesh14,
            in_specs=(P("data", "space", None), P()),
            out_specs=P("data", "space", None), check_vma=False)
        got = fn(x, clip)
        want = clahe_xla(x, clip, tile_size=tile)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=2e-6)

    def test_enhance_chain_with_clahe(self, mesh14):
        """enhance_spatial(clahe_clip_limit=...) == dense clahe → gamma →
        unsharp on the same stack."""
        from mdx.ops import filters as F

        x = jnp.stack([jnp.asarray(_img(2))])
        got = spatial.enhance_spatial(
            x, mesh14, gamma=0.9, unsharp_radius=1.0, unsharp_amount=0.6,
            clahe_clip_limit=0.02)
        y = clahe_xla(jnp.clip(x, 0, 1), jnp.float32(0.02), tile_size=16)
        y = jnp.power(jnp.maximum(y, 0.0), jnp.float32(0.9))
        want = jnp.clip(
            F.unsharp_mask(y, jnp.float32(1.0), jnp.float32(0.6)), 0.0, 1.0)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=1e-5)

    def test_bad_tile_rejected(self, mesh14):
        x = jnp.stack([jnp.asarray(_img(0))])
        with pytest.raises(ValueError, match="multiples of tile_size"):
            spatial.enhance_spatial(x, mesh14, clahe_clip_limit=0.02,
                                    clahe_tile_size=12)


class TestClaheSharded2D:
    def test_matches_dense(self, mesh122):
        """2-D tile-grid CLAHE (LUT halos over BOTH mesh axes, corners via
        the two-phase exchange) == dense XLA CLAHE."""
        from functools import partial

        from jax import shard_map
        from jax.sharding import PartitionSpec as P

        from mdx.parallel.clahe_sp import clahe_sharded

        x = jnp.stack([jnp.asarray(_img(3)), jnp.asarray(_img(4))])
        clip = jnp.asarray([0.02, 0.03], jnp.float32)
        fn = shard_map(
            partial(clahe_sharded, tile_size=16, row_axis="sy",
                    col_axis="sx"),
            mesh=mesh122,
            in_specs=(P("data", "sy", "sx"), P()),
            out_specs=P("data", "sy", "sx"), check_vma=False)
        got = fn(x, clip)
        want = clahe_xla(x, clip, tile_size=16)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=2e-6)

    def test_qa_with_clahe(self, mesh122):
        out = spatial2d.qa_spatial2d(
            jnp.stack([jnp.asarray(_img(5))]), mesh122, bilateral_d=5,
            clahe_clip_limit=0.02)
        assert out["enhanced"].shape == (1, 64, 64)
        assert 0.0 <= float(out["ssim"][0]) <= 1.0
        # CLAHE must actually change the output vs the no-CLAHE chain
        out2 = spatial2d.qa_spatial2d(
            jnp.stack([jnp.asarray(_img(5))]), mesh122, bilateral_d=5)
        assert not np.allclose(np.asarray(out["enhanced"]),
                               np.asarray(out2["enhanced"]))


class TestPallasRemapParity:
    def test_interpret_kernel_matches_xla(self):
        """The banded Pallas remap against a halo-extended LUT grid
        (interpret mode) == the XLA virtual-tile gather remap."""
        from mdx.parallel.clahe_sp import (
            _local_luts, _remap_ext_pallas, _remap_ext_xla,
        )

        x = jnp.stack([jnp.asarray(_img(6, 32, 64))])
        xp = jnp.clip(x, 0, 1)
        lut = _local_luts(xp, jnp.float32(0.02), 16, 256)
        lut_ext = jnp.pad(lut, ((0, 0), (1, 1), (0, 0), (0, 0)),
                          mode="edge")
        lut_ext = jnp.pad(lut_ext, ((0, 0), (0, 0), (1, 1), (0, 0)),
                          mode="edge")
        a = _remap_ext_xla(xp, lut_ext, 16, 256)
        b = _remap_ext_pallas(xp, lut_ext, 16, 256, interpret=True)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-6)
