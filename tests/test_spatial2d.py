"""2-D tile-sharding parity tests on the virtual 8-device CPU mesh.

Mirrors the 1-D row-block suite (tests/test_parallel.py TestSpatial*):
every tile-sharded program must match the single-chip fused program —
moment/stencil metrics via two-axis psum, order statistics via the exact
two-axis distributed bitwise search, stencils via two-phase halo exchange
(corners ride the column phase).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp
import pytest

from mdx.core import metrics as M
from mdx.parallel import make_mesh2d, spatial2d


def _stack(*imgs):
    return jnp.stack([jnp.asarray(i, jnp.float32) for i in imgs])


@pytest.fixture(scope="module")
def mesh222():
    """2 data × 2 sy × 2 sx — all three axes active."""
    return make_mesh2d(n_data=2, n_sy=2, n_sx=2)


@pytest.fixture(scope="module")
def mesh124():
    """1 data × 2 sy × 4 sx — asymmetric tile grid (16-col shards)."""
    return make_mesh2d(n_data=1, n_sy=2, n_sx=4)


class TestMesh2D:
    def test_shapes(self, mesh222, mesh124):
        assert mesh222.shape == {"data": 2, "sy": 2, "sx": 2}
        assert mesh124.shape == {"data": 1, "sy": 2, "sx": 4}

    def test_too_many_devices(self):
        with pytest.raises(ValueError):
            make_mesh2d(n_data=4, n_sy=4, n_sx=4)


_ALL_KEYS = ("lap_var", "std", "pct_low", "pct_high", "entropy",
             "edge_density", "gradient_mag_mean", "gradient_mag_std",
             "laplacian_energy", "local_contrast_std", "gradient_entropy",
             "niqe", "edge_ratio", "sigma", "snr_proxy", "cnr_proxy",
             "histogram_spread", "gradient_strength")


class TestStats2D:
    @pytest.mark.parametrize("meshname", ["mesh222", "mesh124"])
    def test_matches_single_chip(self, request, meshname, noisy_image,
                                 clean_image):
        mesh = request.getfixturevalue(meshname)
        x = _stack(noisy_image, clean_image)
        got = spatial2d.image_stats_spatial2d(x, mesh)
        ref = M.image_stats(x)
        for k in _ALL_KEYS:
            np.testing.assert_allclose(
                np.asarray(got[k]), np.asarray(ref[k]), rtol=1e-4,
                err_msg=k)

    def test_detection_agrees(self, mesh222, noisy_image,
                              low_contrast_image):
        x = _stack(noisy_image, low_contrast_image)
        got = spatial2d.image_stats_spatial2d(x, mesh222)
        ref = M.image_stats(x)
        for k, v in M.detect_issues(got).items():
            np.testing.assert_array_equal(
                np.asarray(v), np.asarray(M.detect_issues(ref)[k]),
                err_msg=k)

    def test_odd_cols_rejected(self, mesh124, noisy_image):
        x = _stack(noisy_image)[:, :, :60]  # 60 cols / 4 shards = 15, odd
        with pytest.raises(ValueError, match="W=60"):
            spatial2d.image_stats_spatial2d(x, mesh124)

    def test_odd_rows_rejected(self, mesh124, noisy_image):
        x = _stack(noisy_image)[:, :60, :]  # 60 rows / 2 shards = 30 even;
        x = x[:, :44, :]                    # 44/2 = 22 even but use odd:
        x = x[:, :42, :]                    # 42/2 = 21 rows per shard, odd
        with pytest.raises(ValueError, match="H=42"):
            spatial2d.image_stats_spatial2d(x, mesh124)


class TestEnhance2D:
    def test_matches_dense(self, mesh222, noisy_image):
        from mdx.ops import filters as F
        x = _stack(noisy_image, noisy_image)
        got = spatial2d.enhance_spatial2d(
            x, mesh222, gamma=0.9, unsharp_radius=1.0, unsharp_amount=0.6)
        y = jnp.power(jnp.maximum(x, 0.0), jnp.float32(0.9))
        want = jnp.clip(
            F.unsharp_mask(y, jnp.float32(1.0), jnp.float32(0.6)), 0.0, 1.0)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=1e-5)

    def test_bilateral_matches_dense(self, mesh124, noisy_image):
        from mdx.ops.bilateral import bilateral as dense_bilateral
        x = _stack(noisy_image)
        got = spatial2d.enhance_spatial2d(
            x, mesh124, gamma=1.0, unsharp_radius=0.8, unsharp_amount=0.0,
            bilateral_d=5, bilateral_sigma_color=0.08,
            bilateral_sigma_space=0.08)
        want = jnp.clip(dense_bilateral(
            jnp.clip(x, 0, 1), 5, jnp.full((1,), 0.08),
            jnp.full((1,), 0.08)), 0.0, 1.0)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=1e-5)

    def test_too_few_cols_rejected(self, mesh124, noisy_image):
        x = _stack(noisy_image)[:, :, :32]  # 8 cols/shard < halo 16
        with pytest.raises(ValueError, match="cols"):
            spatial2d.enhance_spatial2d(x, mesh124)


class TestQA2D:
    def test_qa_end_to_end(self, mesh222, noisy_image):
        from mdx.ops.ssim import psnr as dense_psnr, ssim as dense_ssim
        x = _stack(noisy_image, noisy_image)
        out = spatial2d.qa_spatial2d(x, mesh222, bilateral_d=5)
        assert out["enhanced"].shape == x.shape
        assert bool(out["issues"]["noise"][0])
        enh = jnp.asarray(np.asarray(out["enhanced"]))
        np.testing.assert_allclose(np.asarray(out["ssim"]),
                                   np.asarray(dense_ssim(x, enh)), atol=1e-4)
        np.testing.assert_allclose(np.asarray(out["psnr"]),
                                   np.asarray(dense_psnr(x, enh)), rtol=1e-4)

    def test_matches_1d_row_blocks(self, mesh124, noisy_image):
        """2-D with sx=4, sy=2 must agree with the 1-D row-block layer on
        the same content (both are exact vs the dense program)."""
        from mdx.parallel import make_mesh, spatial
        x = _stack(noisy_image, noisy_image)
        out2 = spatial2d.qa_spatial2d(x, mesh124, bilateral_d=5)
        mesh1 = make_mesh(n_data=2, n_space=4)
        out1 = spatial.qa_spatial(x, mesh1, bilateral_d=5)
        np.testing.assert_allclose(np.asarray(out2["ssim"]),
                                   np.asarray(out1["ssim"]), atol=1e-5)
        np.testing.assert_allclose(np.asarray(out2["enhanced"]),
                                   np.asarray(out1["enhanced"]), atol=1e-5)
        for k in _ALL_KEYS:
            np.testing.assert_allclose(
                np.asarray(out2["stats_before"][k]),
                np.asarray(out1["stats_before"][k]), rtol=1e-4, err_msg=k)
