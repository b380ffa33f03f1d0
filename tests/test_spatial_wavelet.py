"""Sharded wavelet-denoise parity tests (mdx/parallel/wavelet_sp.py):
per-shard db1 transforms + coarse-level gather must match the dense
``denoise_wavelet`` — fine levels are bit-exact block transforms, coarse
levels run the literal dense code replicated, thresholds differ only by
psum summation order."""

from __future__ import annotations

from functools import partial

import numpy as np
import jax.numpy as jnp
import pytest
from jax import shard_map
from jax.sharding import PartitionSpec as P

from mdx.ops.wavelet import denoise_wavelet
from mdx.parallel import make_mesh, make_mesh2d, spatial, spatial2d


def _img(seed=0, h=64, w=64):
    r = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float64)
    base = 0.45 + 0.25 * np.sin(xx / 11.0) * np.cos(yy / 7.0)
    return np.clip(base + r.normal(0, 0.12, (h, w)), 0, 1).astype(np.float32)


@pytest.fixture(scope="module")
def mesh14():
    return make_mesh(n_data=1, n_space=4)


@pytest.fixture(scope="module")
def mesh124():
    return make_mesh2d(n_data=1, n_sy=2, n_sx=4)


def _run_sharded_1d(mesh, x, **kw):
    from mdx.parallel.wavelet_sp import denoise_wavelet_sharded

    fn = shard_map(
        partial(denoise_wavelet_sharded, row_axis="space", **kw),
        mesh=mesh, in_specs=(P("data", "space", None),),
        out_specs=P("data", "space", None), check_vma=False)
    return fn(x)


def _run_sharded_2d(mesh, x, **kw):
    from mdx.parallel.wavelet_sp import denoise_wavelet_sharded

    fn = shard_map(
        partial(denoise_wavelet_sharded, row_axis="sy", col_axis="sx",
                **kw),
        mesh=mesh, in_specs=(P("data", "sy", "sx"),),
        out_specs=P("data", "sy", "sx"), check_vma=False)
    return fn(x)


class TestDenoiseSharded:
    def test_1d_estimated_sigma(self, mesh14):
        """Default call (sigma estimated on-device) vs dense — exercises
        the exact distributed HH median + psum'd thresholds."""
        x = jnp.stack([jnp.asarray(_img(0)), jnp.asarray(_img(1))])
        got = _run_sharded_1d(mesh14, x)
        want = denoise_wavelet(x)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=2e-5)

    def test_1d_given_sigma_hard(self, mesh14):
        x = jnp.stack([jnp.asarray(_img(2))])
        got = _run_sharded_1d(mesh14, x, sigma=jnp.float32(0.08),
                              mode="hard")
        want = denoise_wavelet(x, sigma=jnp.float32(0.08), mode="hard")
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=2e-5)

    def test_2d_estimated_sigma(self, mesh124):
        x = jnp.stack([jnp.asarray(_img(3))])
        got = _run_sharded_2d(mesh124, x)
        want = denoise_wavelet(x)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=2e-5)

    def test_deep_levels_gather(self, mesh14):
        """Force more levels than the shard extent supports locally
        (16 rows/shard → j_local=4) so the coarse-gather path runs."""
        x = jnp.stack([jnp.asarray(_img(4))])
        got = _run_sharded_1d(mesh14, x, wavelet_levels=5)
        want = denoise_wavelet(x, wavelet_levels=5)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=2e-5)

    def test_light_denoise(self, mesh14):
        from mdx.core.enhance import light_denoise
        from mdx.parallel.wavelet_sp import light_denoise_sharded
        from mdx.parallel.spatial import estimate_sigma_spatial

        x = jnp.stack([jnp.asarray(_img(5))])

        def block(xb):
            return light_denoise_sharded(
                xb, jnp.float32(0.3), estimate_sigma_spatial(xb), "space")

        fn = shard_map(block, mesh=mesh14,
                       in_specs=(P("data", "space", None),),
                       out_specs=P("data", "space", None), check_vma=False)
        got = fn(x)
        want = light_denoise(x, jnp.float32(0.3))
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=2e-5)


class TestFullChainSharded:
    def test_enhance_full_chain_1d(self, mesh14):
        """All seven reference ops sharded in one program vs the dense
        equivalents applied in the same order."""
        from mdx.ops import filters as F
        from mdx.ops.bilateral import bilateral as dense_bilateral
        from mdx.ops.clahe import clahe_xla
        from mdx.ops.tv import tv_chambolle_xla
        from mdx.core.enhance import light_denoise

        x = jnp.stack([jnp.asarray(_img(6))])
        got = spatial.enhance_spatial(
            x, mesh14, gamma=0.95, unsharp_radius=1.0, unsharp_amount=0.5,
            bilateral_d=5, clahe_clip_limit=0.02, tv_weight=0.05,
            denoise=True, post_denoise_strength=0.3)

        y = jnp.clip(denoise_wavelet(x), 0.0, 1.0)
        y = clahe_xla(jnp.clip(y, 0, 1), jnp.float32(0.02), tile_size=16)
        y = jnp.power(jnp.maximum(y, 0.0), jnp.float32(0.95))
        y = jnp.clip(F.unsharp_mask(y, jnp.float32(1.0), jnp.float32(0.5)),
                     0.0, 1.0)
        y = light_denoise(y, jnp.float32(0.3))
        y = dense_bilateral(jnp.clip(y, 0, 1), 5, jnp.full((1,), 0.05),
                            jnp.full((1,), 0.05))
        y = tv_chambolle_xla(jnp.clip(y, 0, 1), jnp.float32(0.05))
        want = jnp.clip(y, 0.0, 1.0)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=5e-5)

    def test_qa2d_full_chain(self, mesh124):
        out = spatial2d.qa_spatial2d(
            jnp.stack([jnp.asarray(_img(7))]), mesh124, bilateral_d=5,
            clahe_clip_limit=0.02, tv_weight=0.05, denoise=True,
            post_denoise_strength=0.3)
        assert out["enhanced"].shape == (1, 64, 64)
        assert np.isfinite(float(out["ssim"][0]))
