"""Cross-validate mdx/refimpl against the ACTUAL libraries the reference
pipeline calls (scikit-image, PyWavelets, pydicom).

The golden chain is JAX ops → mdx/refimpl (bit-level contract, pinned in
tests/test_ops_golden.py).  This file closes the remaining seam: refimpl →
skimage/pywt, the libraries whose behaviour IS the reference's numeric
truth (ref pipeline/metrics.py:15-17,47-62, enhancement.py:14-15,169-205,
270-312).

These packages are not in the TPU bench image, so every class is gated on
``importorskip`` — CI installs scikit-image/PyWavelets/pydicom and runs
them for real.

Tolerance tiers (pinned per op below):

* EXACT (rtol ≤1e-9): ops that are identical formulas by construction —
  laplace, sobel gradient magnitude, adjust_gamma, unsharp_mask, SSIM,
  PSNR, PSNR/SSIM crops, wavelet-MAD sigma, BayesShrink denoise, TV.
* STATISTICAL: CLAHE.  skimage's equalize_adapthist centres its tile grid
  (pads by kernel//2 on both sides) and works on a 2^14-level uint
  quantisation with iterative excess redistribution; mdx's canonical CLAHE
  end-pads the grid and redistributes in one pass.  Outputs agree closely
  in the interior but not bit-wise; the pinned contract is distributional
  (mean |Δ|, correlation, contrast direction).
"""

from __future__ import annotations

import numpy as np
import pytest

from mdx.refimpl import filters_np as F
from mdx.refimpl import pipeline_np as P
from mdx.refimpl import wavelet_np as W


def _noisy(seed=0, shape=(96, 96), sigma=0.08):
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:shape[0], 0:shape[1]].astype(np.float64)
    yy /= shape[0] - 1
    xx /= shape[1] - 1
    img = 0.45 + 0.25 * np.sin(6 * xx) * np.cos(4 * yy) + 0.15 * xx
    img = img + rng.normal(0.0, sigma, shape)
    return np.clip(img, 0.0, 1.0)


def _structured(seed=1, shape=(96, 96)):
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:shape[0], 0:shape[1]].astype(np.float64)
    img = ((xx // 12 + yy // 12) % 2) * 0.5 + 0.25
    img += rng.normal(0, 0.01, shape)
    return np.clip(img, 0.0, 1.0)


# ---------------------------------------------------------------------------
# PyWavelets
# ---------------------------------------------------------------------------


class TestPyWavelets:
    @pytest.mark.parametrize("wavelet", ["db1", "db2"])
    @pytest.mark.parametrize("shape", [(64, 64), (65, 63), (33, 47)])
    def test_dwt2_coefficients(self, wavelet, shape):
        """Approx band exact; detail bands exact in magnitude.

        The reference pipeline only observes detail coefficients through
        |·| (MAD sigma, ref pipeline/metrics.py:47) and odd shrinkage
        functions (BayesShrink soft/hard), so a high-pass filter SIGN
        convention is unobservable behaviour; magnitudes and the approx
        band must match pywt's symmetric mode exactly.
        """
        pywt = pytest.importorskip("pywt")
        img = _noisy(shape=shape)
        ll, (lh, hl, hh) = W.dwt2(img, wavelet)
        coeffs = pywt.dwtn(img, wavelet, mode="symmetric")
        np.testing.assert_allclose(ll, coeffs["aa"], rtol=1e-9, atol=1e-12)
        for ours, key in ((lh, "ad"), (hl, "da"), (hh, "dd")):
            np.testing.assert_allclose(
                np.abs(ours), np.abs(coeffs[key]), rtol=1e-9, atol=1e-12,
                err_msg=f"band {key}")

    def test_max_level(self):
        pywt = pytest.importorskip("pywt")
        for n in (8, 16, 31, 64, 100, 257):
            for w in ("db1", "db2"):
                assert W.max_level((n, n + 5), w) == pywt.dwt_max_level(
                    n, w), (n, w)


# ---------------------------------------------------------------------------
# skimage.restoration — sigma estimate + wavelet denoise + TV
# ---------------------------------------------------------------------------


class TestRestoration:
    def test_estimate_sigma(self):
        restoration = pytest.importorskip("skimage.restoration")
        img = _noisy(seed=3, sigma=0.1)
        ours = W.estimate_sigma(img)
        # ref pipeline/metrics.py:47
        theirs = float(restoration.estimate_sigma(
            img, channel_axis=None, average_sigmas=True))
        np.testing.assert_allclose(ours, theirs, rtol=1e-9)

    @pytest.mark.parametrize("mode", ["soft", "hard"])
    def test_denoise_wavelet(self, mode):
        restoration = pytest.importorskip("skimage.restoration")
        img = _noisy(seed=4, sigma=0.12)
        ours = W.denoise_wavelet(img, mode=mode)
        # ref pipeline/enhancement.py:169-174
        theirs = restoration.denoise_wavelet(
            img, channel_axis=None, rescale_sigma=True, mode=mode)
        np.testing.assert_allclose(ours, theirs, rtol=1e-6, atol=1e-9)

    def test_denoise_tv_chambolle(self):
        restoration = pytest.importorskip("skimage.restoration")
        img = _noisy(seed=5, sigma=0.1)
        for weight in (0.05, 0.1, 0.2):
            ours = F.tv_chambolle(img, weight=weight)
            # ref pipeline/enhancement.py:311
            theirs = restoration.denoise_tv_chambolle(
                img, weight=weight, channel_axis=None)
            np.testing.assert_allclose(ours, theirs, rtol=1e-6, atol=1e-8,
                                       err_msg=f"weight={weight}")


# ---------------------------------------------------------------------------
# skimage.metrics — SSIM / PSNR
# ---------------------------------------------------------------------------


class TestMetrics:
    def test_ssim(self):
        metrics = pytest.importorskip("skimage.metrics")
        a = _noisy(seed=6)
        b = np.clip(a + np.random.default_rng(7).normal(0, 0.03, a.shape),
                    0, 1)
        ours = F.ssim(a, b, data_range=1.0)
        # ref pipeline/metrics.py:232
        theirs = float(metrics.structural_similarity(a, b, data_range=1.0))
        np.testing.assert_allclose(ours, theirs, rtol=1e-9)

    def test_psnr(self):
        metrics = pytest.importorskip("skimage.metrics")
        a = _noisy(seed=8)
        b = np.clip(a + 0.01, 0, 1)
        ours = F.psnr(a, b, data_range=1.0)
        # ref pipeline/metrics.py:233
        theirs = float(metrics.peak_signal_noise_ratio(a, b, data_range=1.0))
        np.testing.assert_allclose(ours, theirs, rtol=1e-10)


# ---------------------------------------------------------------------------
# skimage.filters / exposure — stencils, gamma, unsharp, CLAHE
# ---------------------------------------------------------------------------


class TestFilters:
    def test_laplace(self):
        filters = pytest.importorskip("skimage.filters")
        img = _noisy(seed=9)
        # ref pipeline/metrics.py:48
        np.testing.assert_allclose(F.laplace(img), filters.laplace(img),
                                   rtol=1e-9, atol=1e-12)

    def test_sobel_gradient_magnitude(self):
        filters = pytest.importorskip("skimage.filters")
        img = _noisy(seed=10)
        # ref pipeline/metrics.py:62 — the pipeline only consumes the
        # magnitude; sign conventions (convolve vs correlate) cancel here.
        theirs = np.sqrt(filters.sobel_h(img) ** 2
                         + filters.sobel_v(img) ** 2)
        np.testing.assert_allclose(F.gradient_magnitude(img), theirs,
                                   rtol=1e-9, atol=1e-12)

    def test_adjust_gamma(self):
        exposure = pytest.importorskip("skimage.exposure")
        img = _noisy(seed=11)
        for g in (0.5, 0.85, 1.2, 2.0):
            # ref pipeline/enhancement.py:194-197
            np.testing.assert_allclose(
                F.adjust_gamma(img, g), exposure.adjust_gamma(img, gamma=g),
                rtol=1e-10, err_msg=f"gamma={g}")

    def test_unsharp_mask(self):
        filters = pytest.importorskip("skimage.filters")
        img = _noisy(seed=12)
        for radius, amount in ((1.0, 0.5), (1.5, 1.0), (2.0, 1.5)):
            # ref pipeline/enhancement.py:202-205
            theirs = filters.unsharp_mask(img, radius=radius, amount=amount)
            np.testing.assert_allclose(
                F.unsharp_mask(img, radius, amount), theirs,
                rtol=1e-8, atol=1e-10, err_msg=f"r={radius} a={amount}")

    def test_clahe_statistical(self):
        """CLAHE: pinned DISTRIBUTIONAL contract vs equalize_adapthist.

        skimage centres its tile grid (pad kernel//2 both sides, 2^14-level
        quantisation, iterative excess redistribution); mdx's canonical
        CLAHE end-pads and redistributes in one pass — bit parity is not
        expected, close agreement is (ref pipeline/enhancement.py:183-187).
        """
        exposure = pytest.importorskip("skimage.exposure")
        img = _structured(seed=13, shape=(128, 128))
        ours = F.clahe(img, clip_limit=0.015, tile_size=16)
        theirs = exposure.equalize_adapthist(
            img, clip_limit=0.015, kernel_size=16)
        delta = np.abs(ours - theirs)
        assert delta.mean() < 0.03, f"mean |Δ| = {delta.mean():.4f}"
        assert np.percentile(delta, 99) < 0.15, (
            f"p99 |Δ| = {np.percentile(delta, 99):.4f}")
        corr = np.corrcoef(ours.ravel(), theirs.ravel())[0, 1]
        assert corr > 0.98, f"corr = {corr:.4f}"
        # both must push contrast the same direction
        assert np.sign(ours.std() - img.std()) == np.sign(
            theirs.std() - img.std())


# ---------------------------------------------------------------------------
# End-to-end: the 16-metric block against a skimage-built oracle
# ---------------------------------------------------------------------------


class TestPipelineMetricsCrossCheck:
    def test_compute_metrics_key_values(self):
        filters = pytest.importorskip("skimage.filters")
        restoration = pytest.importorskip("skimage.restoration")
        img = _noisy(seed=14, sigma=0.09)
        m = P.compute_metrics(img)
        sigma = float(restoration.estimate_sigma(
            img, channel_axis=None, average_sigmas=True))
        np.testing.assert_allclose(m["sigma"], sigma, rtol=1e-9)
        np.testing.assert_allclose(
            m["lap_var"], float(filters.laplace(img).var()), rtol=1e-9)
        np.testing.assert_allclose(
            m["snr_proxy"], float(img.mean() / max(sigma, 1e-8)), rtol=1e-9)


# ---------------------------------------------------------------------------
# pydicom — our writer's uncompressed output decodes identically
# ---------------------------------------------------------------------------


class TestPydicom:
    def test_writer_fields_and_pixels(self, tmp_path):
        pydicom = pytest.importorskip("pydicom")
        from mdx.io.dicom_write import write_dicom

        pix = (np.random.default_rng(15).integers(0, 4096, (64, 64))
               ).astype(np.uint16)
        p = str(tmp_path / "w.dcm")
        write_dicom(p, pix, modality="CT", body_part="CHEST",
                    rescale_slope=1.0, rescale_intercept=-1024.0,
                    window_center=40.0, window_width=400.0)
        ds = pydicom.dcmread(p)
        np.testing.assert_array_equal(ds.pixel_array, pix)
        assert ds.Modality == "CT"
        assert ds.Rows == 64 and ds.Columns == 64
        assert float(ds.RescaleIntercept) == -1024.0
        assert float(ds.WindowWidth) == 400.0
