"""Multi-chip sharding tests on the virtual 8-device CPU mesh.

The TPU-world analog of "test multi-node without a real cluster"
(SURVEY.md §4): an 8-device mesh is simulated with
``--xla_force_host_platform_device_count=8`` (set in conftest.py), and the
sharded programs are checked for numeric parity with the single-chip fused
programs of mdx.core.
"""

from __future__ import annotations

import jax
import numpy as np
import jax.numpy as jnp
import pytest

from mdx.core import metrics as M
from mdx.core import qa
from mdx.parallel import (
    make_mesh,
    pad_batch,
    qa_deterministic_sharded,
    spatial,
)
from mdx.parallel.mesh import divisible_batch


def _stack(*imgs):
    return jnp.stack([jnp.asarray(i, jnp.float32) for i in imgs])


@pytest.fixture(scope="module")
def mesh8():
    return make_mesh(n_data=8, n_space=1)


@pytest.fixture(scope="module")
def mesh24():
    return make_mesh(n_data=2, n_space=4)


class TestMesh:
    def test_shapes(self, mesh8, mesh24):
        assert mesh8.shape == {"data": 8, "space": 1}
        assert mesh24.shape == {"data": 2, "space": 4}

    def test_too_many_devices(self):
        with pytest.raises(ValueError):
            make_mesh(n_data=64, n_space=4)

    def test_divisible_batch(self, mesh8):
        assert divisible_batch(1, mesh8) == 8
        assert divisible_batch(8, mesh8) == 8
        assert divisible_batch(9, mesh8) == 16


class TestBatchSharding:
    def test_pad_batch(self, mesh8, noisy_image):
        x = _stack(noisy_image, noisy_image, noisy_image)
        xp, n = pad_batch(x, mesh8)
        assert xp.shape[0] == 8 and n == 3
        np.testing.assert_array_equal(np.asarray(xp[7]), np.asarray(xp[2]))

    def test_qa_parity_with_single_chip(self, mesh8, noisy_image,
                                        low_contrast_image):
        """The sharded program must produce the same numbers as the
        single-device fused program (same XLA graph, different layout)."""
        x = _stack(noisy_image, low_contrast_image)
        (enh_s, stats_s, *_), n = qa_deterministic_sharded(x, mesh8)
        enh, stats, *_ = qa.qa_deterministic(x)
        np.testing.assert_allclose(np.asarray(enh_s[:n]), np.asarray(enh),
                                   atol=1e-5)
        for k in M.METRIC_KEYS:
            np.testing.assert_allclose(np.asarray(stats_s[k][:n]),
                                       np.asarray(stats[k]), rtol=1e-5)


class TestSpatialSharding:
    def test_metric_parity(self, mesh24, noisy_image, clean_image):
        """Row-block-sharded metric pass vs the unsharded fused pass.

        Moment/stencil metrics reduce via psum; order statistics (sigma,
        cnr, snr, histogram_spread, gradient_strength) use the EXACT
        psum-distributed bitwise order-statistic search — everything holds
        the same tight tolerance now (residual is conv summation order)."""
        x = _stack(noisy_image, clean_image)
        got = spatial.image_stats_spatial(x, mesh24)
        ref = M.image_stats(x)

        for k in ("lap_var", "std", "pct_low", "pct_high", "entropy",
                  "edge_density", "gradient_mag_mean", "gradient_mag_std",
                  "laplacian_energy", "local_contrast_std",
                  "gradient_entropy", "niqe", "edge_ratio", "sigma",
                  "snr_proxy", "cnr_proxy", "histogram_spread",
                  "gradient_strength"):
            np.testing.assert_allclose(
                np.asarray(got[k]), np.asarray(ref[k]), rtol=1e-4,
                err_msg=k)

    def test_detection_agrees(self, mesh24, noisy_image, low_contrast_image):
        x = _stack(noisy_image, low_contrast_image)
        got = spatial.image_stats_spatial(x, mesh24)
        ref = M.image_stats(x)
        for k, v in M.detect_issues(got).items():
            np.testing.assert_array_equal(np.asarray(v),
                                          np.asarray(M.detect_issues(ref)[k]),
                                          err_msg=k)

    def test_uneven_rows_rejected(self, mesh24, noisy_image):
        x = _stack(noisy_image)[:, :60, :]  # 60 rows: 15 per shard → odd
        with pytest.raises(ValueError):
            spatial.image_stats_spatial(x, mesh24)

    def test_enhance_spatial_matches_dense(self, mesh24, noisy_image):
        """Spatial gamma+unsharp vs the same ops on the unsharded array."""
        from mdx.ops import filters as F
        x = _stack(noisy_image, noisy_image)
        got = spatial.enhance_spatial(x, mesh24, gamma=0.9,
                                      unsharp_radius=1.0, unsharp_amount=0.6)
        y = jnp.power(jnp.maximum(x, 0.0), jnp.float32(0.9))
        want = jnp.clip(F.unsharp_mask(y, jnp.float32(1.0), jnp.float32(0.6)),
                        0.0, 1.0)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=1e-5)


class TestSpatialBilateral:
    def test_bilateral_matches_dense(self, mesh24, noisy_image):
        from mdx.ops.bilateral import bilateral as dense_bilateral

        x = _stack(noisy_image, noisy_image)
        got = spatial.enhance_spatial(
            x, mesh24, gamma=1.0, unsharp_radius=0.8, unsharp_amount=0.0,
            bilateral_d=5, bilateral_sigma_color=0.08,
            bilateral_sigma_space=0.08)
        want = jnp.clip(dense_bilateral(
            jnp.clip(x, 0, 1), 5, jnp.full((2,), 0.08),
            jnp.full((2,), 0.08)), 0.0, 1.0)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=1e-5)


class TestSpatialQA:
    def test_qa_spatial_end_to_end(self, mesh24, noisy_image):
        from mdx.ops.ssim import psnr as dense_psnr, ssim as dense_ssim

        x = _stack(noisy_image, noisy_image)
        out = spatial.qa_spatial(x, mesh24, bilateral_d=5)
        assert out["enhanced"].shape == x.shape
        assert bool(out["issues"]["noise"][0])
        # SSIM/PSNR must match the dense computation on the same pair
        enh = jnp.asarray(np.asarray(out["enhanced"]))
        np.testing.assert_allclose(np.asarray(out["ssim"]),
                                   np.asarray(dense_ssim(x, enh)), atol=1e-4)
        np.testing.assert_allclose(np.asarray(out["psnr"]),
                                   np.asarray(dense_psnr(x, enh)), rtol=1e-4)


class TestHaloGuards:
    def test_too_few_rows_per_shard_rejected(self, mesh24, noisy_image):
        x = _stack(noisy_image)[:, :8 * 4, :]  # 8 rows per shard < halo 16
        with pytest.raises(ValueError, match="rows"):
            spatial.enhance_spatial(x, mesh24)
        with pytest.raises(ValueError):
            spatial.image_stats_spatial(x, mesh24)
