"""Golden tests: JAX device ops (mdx.ops) vs the NumPy float64 spec
(mdx.refimpl), on the synthetic conftest fixtures.

Tolerances document the float32-on-TPU vs float64-on-host drift policy
(SURVEY.md §7 hard-part 4): elementwise ops agree to ~1e-5; multi-pass /
reduction-heavy ops to ~1e-3 relative.
"""

import numpy as np
import pytest
import jax.numpy as jnp

import mdx.ops as ops
from mdx.refimpl import filters_np as F
from mdx.refimpl import pipeline_np as P
from mdx.refimpl import wavelet_np as W


def _b(img):
    """[H,W] numpy → [1,H,W] jnp float32."""
    return jnp.asarray(np.asarray(img, np.float32)[None])


@pytest.fixture()
def images(clean_image, noisy_image, low_contrast_image, clipped_image):
    return {
        "clean": clean_image, "noisy": noisy_image,
        "low_contrast": low_contrast_image, "clipped": clipped_image,
    }


class TestStencils:
    def test_laplace(self, images):
        for img in images.values():
            got = np.asarray(ops.laplace(_b(img))[0])
            np.testing.assert_allclose(got, F.laplace(img), atol=2e-6)

    def test_sobel(self, images):
        for img in images.values():
            np.testing.assert_allclose(
                np.asarray(ops.sobel_h(_b(img))[0]), F.sobel_h(img), atol=2e-6)
            np.testing.assert_allclose(
                np.asarray(ops.sobel_v(_b(img))[0]), F.sobel_v(img), atol=2e-6)
            np.testing.assert_allclose(
                np.asarray(ops.gradient_magnitude(_b(img))[0]),
                F.gradient_magnitude(img), atol=2e-6)

    @pytest.mark.parametrize("size", [7, 16])
    def test_box_filter(self, images, size):
        for img in images.values():
            np.testing.assert_allclose(
                np.asarray(ops.box_filter(_b(img), size)[0]),
                F.box_filter(img, size), atol=3e-6)

    @pytest.mark.parametrize("size", [7, 16])
    def test_local_variance(self, images, size):
        for img in images.values():
            np.testing.assert_allclose(
                np.asarray(ops.local_variance(_b(img), size)[0]),
                F.local_variance(img, size), atol=3e-6)


class TestGaussianUnsharpGamma:
    @pytest.mark.parametrize("sigma", [0.2, 0.8, 1.7, 3.0])
    def test_gaussian_blur(self, noisy_image, sigma):
        got = np.asarray(ops.gaussian_blur(_b(noisy_image), sigma)[0])
        np.testing.assert_allclose(got, F.gaussian_blur(noisy_image, sigma),
                                   atol=1e-5)

    def test_gaussian_per_image_sigma(self, noisy_image, clean_image):
        batch = jnp.stack([jnp.asarray(noisy_image), jnp.asarray(clean_image)])
        got = np.asarray(ops.gaussian_blur(batch, jnp.asarray([0.5, 2.0])))
        np.testing.assert_allclose(got[0], F.gaussian_blur(noisy_image, 0.5), atol=1e-5)
        np.testing.assert_allclose(got[1], F.gaussian_blur(clean_image, 2.0), atol=1e-5)

    def test_gaussian_batch_dispatch_agrees(self, noisy_image):
        # gaussian_blur lowers via unrolled shift-MACs at n<=16 and the
        # batch-as-channels grouped conv above (docs/PERF.md round 3);
        # the same image must blur identically through both branches.
        rng = np.random.default_rng(7)
        batch = np.clip(
            noisy_image[None] + rng.normal(0, 0.05, (20,) + noisy_image.shape),
            0.0, 1.0).astype(np.float32)
        sigmas = np.linspace(0.4, 2.5, 20).astype(np.float32)
        via_conv = np.asarray(
            ops.gaussian_blur(jnp.asarray(batch), jnp.asarray(sigmas)))
        via_macs = np.asarray(
            ops.gaussian_blur(jnp.asarray(batch[:16]), jnp.asarray(sigmas[:16])))
        np.testing.assert_allclose(via_conv[:16], via_macs, atol=2e-6)

    def test_unsharp(self, clean_image):
        got = np.asarray(ops.unsharp_mask(_b(clean_image), 0.8, 0.5)[0])
        np.testing.assert_allclose(got, F.unsharp_mask(clean_image, 0.8, 0.5),
                                   atol=1e-5)

    @pytest.mark.parametrize("gamma", [0.6, 0.95, 1.05, 1.5])
    def test_gamma(self, images, gamma):
        for img in images.values():
            np.testing.assert_allclose(
                np.asarray(ops.adjust_gamma(_b(img), gamma)[0]),
                F.adjust_gamma(img, gamma), atol=1e-5)


class TestWavelets:
    @pytest.mark.parametrize("wavelet", ["db1", "db2"])
    def test_dwt_matches_refimpl(self, noisy_image, wavelet):
        ll, (lh, hl, hh) = ops.dwt2(_b(noisy_image), wavelet)
        rll, (rlh, rhl, rhh) = W.dwt2(np.asarray(noisy_image, np.float64), wavelet)
        np.testing.assert_allclose(np.asarray(ll[0]), rll, atol=1e-5)
        np.testing.assert_allclose(np.asarray(lh[0]), rlh, atol=1e-5)
        np.testing.assert_allclose(np.asarray(hl[0]), rhl, atol=1e-5)
        np.testing.assert_allclose(np.asarray(hh[0]), rhh, atol=1e-5)

    @pytest.mark.parametrize("wavelet", ["db1", "db2"])
    @pytest.mark.parametrize("shape", [(64, 64), (33, 47)])
    def test_reconstruction(self, rng, wavelet, shape):
        x = rng.normal(size=(2,) + shape).astype(np.float32)
        ll, det = ops.dwt2(jnp.asarray(x), wavelet)
        got = np.asarray(ops.idwt2(ll, det, wavelet, shape))
        np.testing.assert_allclose(got, x, atol=1e-5)

    def test_estimate_sigma(self, images):
        for name, img in images.items():
            got = float(ops.estimate_sigma(_b(img))[0])
            want = W.estimate_sigma(img)
            assert got == pytest.approx(want, abs=2e-5), name

    def test_denoise_wavelet(self, noisy_image):
        got = np.asarray(ops.denoise_wavelet(_b(noisy_image))[0])
        want = W.denoise_wavelet(noisy_image)
        np.testing.assert_allclose(got, want, atol=5e-5)

    def test_denoise_wavelet_sigma_given_hard(self, noisy_image):
        got = np.asarray(ops.denoise_wavelet(_b(noisy_image), sigma=0.05,
                                             mode="hard")[0])
        want = W.denoise_wavelet(noisy_image, sigma=0.05, mode="hard")
        np.testing.assert_allclose(got, want, atol=5e-5)


class TestHistEntropy:
    def test_histogram01(self, images):
        for img in images.values():
            got = np.asarray(ops.histogram01(_b(img), 256)[0])
            want, _ = np.histogram(np.asarray(img, np.float32).ravel(),
                                   bins=256, range=(0.0, 1.0))
            # binning at exact bin edges may differ by float32 rounding
            assert np.abs(got - want).sum() <= 2

    def test_histogram_edge_exactness(self):
        """The MXU index path must be BIT-equivalent to comparing against
        the real ``(k/bins)*hi`` edges — adversarial values exactly at
        edges and ±1 ulp around them, for the [0,1] and per-image-scaled
        variants."""
        bins = 256
        k = np.arange(1, bins, dtype=np.float32)
        edges = k / bins
        vals = np.concatenate([
            edges, np.nextafter(edges, 0.0), np.nextafter(edges, 1.0),
            [0.0, 1.0, np.nextafter(np.float32(1.0), np.float32(0.0))],
        ]).astype(np.float32)
        v = jnp.asarray(vals[None])

        def compare_hist(v, bins, edges_row):
            c = np.sum(np.asarray(v)[0][:, None]
                       < edges_row[None, :], axis=0).astype(np.float32)
            first = c[:1]
            mids = c[1:] - c[:-1]
            last = v.shape[1] - c[-1:]
            return np.concatenate([first, mids, last])

        got = np.asarray(ops.histogram01(v.reshape(1, 1, -1), bins)[0])
        want = compare_hist(v, bins, edges)
        np.testing.assert_array_equal(got, want)

        for hi in (0.37, 1.0, 3.1e-3, 812.5):
            hi32 = np.float32(max(hi, 1e-30))
            sc_edges = (k / bins) * hi32
            sc_vals = np.concatenate([
                sc_edges, np.nextafter(sc_edges, 0.0),
                np.nextafter(sc_edges, np.float32(np.inf)),
                [0.0, hi32],
            ]).astype(np.float32)
            sv = jnp.asarray(sc_vals[None])
            got = np.asarray(ops.histogram_scaled(
                sv.reshape(1, 1, -1), bins, jnp.asarray([hi], jnp.float32))[0])
            want = compare_hist(sv, bins, sc_edges)
            np.testing.assert_array_equal(got, want, err_msg=f"hi={hi}")

    def test_entropy(self, images):
        for img in images.values():
            got = float(ops.shannon_entropy01(_b(img))[0])
            assert got == pytest.approx(F.shannon_entropy(np.asarray(img, np.float32)),
                                        abs=1e-3)

    def test_percentiles(self, images):
        for img in images.values():
            got = np.asarray(ops.percentiles(_b(img), [5.0, 25.0, 75.0, 90.0, 95.0]))[:, 0]
            want = np.percentile(np.asarray(img, np.float32), [5, 25, 75, 90, 95])
            np.testing.assert_allclose(got, want, atol=1e-6)


class TestEnhanceOps:
    def test_clahe_matches_refimpl(self, low_contrast_image, clipped_image):
        for img in (low_contrast_image, clipped_image):
            got = np.asarray(ops.clahe(_b(img), 0.015, 16)[0])
            want = F.clahe(img, 0.015, 16)
            np.testing.assert_allclose(got, want, atol=1e-4)

    def test_clahe_odd_shape(self, rng):
        img = rng.uniform(0, 1, (61, 47)).astype(np.float32)
        got = np.asarray(ops.clahe(_b(img), 0.02, 16)[0])
        want = F.clahe(img, 0.02, 16)
        assert got.shape == (61, 47)
        np.testing.assert_allclose(got, want, atol=1e-4)

    @pytest.mark.parametrize("d", [3, 5, 9])
    def test_bilateral(self, noisy_image, d):
        got = np.asarray(ops.bilateral(_b(noisy_image), d, 0.05, 0.05)[0])
        want = F.bilateral(noisy_image, d, 0.05, 0.05)
        np.testing.assert_allclose(got, want, atol=1e-5)

    def test_tv_chambolle(self, noisy_image):
        got = np.asarray(ops.tv_chambolle(_b(noisy_image), 0.1)[0])
        want = F.tv_chambolle(np.asarray(noisy_image, np.float64), 0.1)
        np.testing.assert_allclose(got, want, atol=2e-4)

    def test_ssim_psnr(self, clean_image, noisy_image):
        a, b = _b(clean_image), _b(noisy_image)
        assert float(ops.ssim(a, b)[0]) == pytest.approx(
            F.ssim(clean_image, noisy_image), abs=1e-4)
        assert float(ops.psnr(a, b)[0]) == pytest.approx(
            F.psnr(clean_image, noisy_image), abs=1e-3)
        assert float(ops.ssim(a, a)[0]) == pytest.approx(1.0, abs=1e-6)


class TestOddSizes:
    """Clinical images have arbitrary dims — ops must stay golden on odd,
    non-square shapes (DWT stride-2 phases, CLAHE padding, SSIM crops)."""

    def test_metrics_odd_shape(self, rng):
        img = np.clip(rng.normal(0.5, 0.12, (61, 67)), 0, 1).astype(np.float32)
        from mdx.core.metrics import compute_metrics
        from mdx.refimpl.pipeline_np import compute_metrics as ref_metrics

        got = compute_metrics(jnp.asarray(img)[None])
        want = ref_metrics(np.asarray(img, np.float64))
        for k, v in want.items():
            g = float(np.asarray(got[k])[0])
            assert g == pytest.approx(v, rel=5e-3, abs=5e-4), k

    def test_denoise_wavelet_odd_shape(self, rng):
        img = np.clip(rng.normal(0.5, 0.1, (45, 53)), 0, 1).astype(np.float32)
        from mdx.ops.wavelet import denoise_wavelet
        from mdx.refimpl.wavelet_np import denoise_wavelet as ref_dw

        got = np.asarray(denoise_wavelet(jnp.asarray(img)[None])[0])
        want = ref_dw(np.asarray(img, np.float64))
        np.testing.assert_allclose(got, want, atol=5e-5)

    def test_full_chain_odd_shape(self, rng):
        img = np.clip(rng.normal(0.5, 0.15, (73, 41)), 0, 1).astype(np.float32)
        from mdx.core.enhance import apply_plan
        from mdx.pipeline.schemas import EnhancementPlan

        plan = EnhancementPlan(
            recommended_ops=["denoise", "clahe", "gamma", "unsharp"],
            params={"clahe_clip_limit": 0.02, "gamma": 0.95,
                    "unsharp_amount": 0.6})
        static, dyn = plan.to_static_dynamic()
        out, flags = apply_plan(jnp.asarray(img)[None], static, dyn)
        o = np.asarray(out[0])
        assert o.shape == img.shape
        assert np.isfinite(o).all() and o.min() >= 0 and o.max() <= 1
