"""Sanity tests for the NumPy reference-spec (mdx.refimpl).

These validate the spec itself: wavelet perfect reconstruction, noise-sigma
recovery, metric contract (16 keys, finite), detection thresholds, chain
invariants (shape/range), and safeguard behaviour — mirroring the reference
tests (reference tests/test_metrics.py, test_detection.py, test_pipeline.py).
"""

import numpy as np
import pytest

from mdx.refimpl import filters_np as F
from mdx.refimpl import pipeline_np as P
from mdx.refimpl import wavelet_np as W


class TestWavelets:
    @pytest.mark.parametrize("wavelet", ["db1", "db2"])
    @pytest.mark.parametrize("shape", [(8, 8), (9, 7), (64, 64), (33, 15)])
    def test_perfect_reconstruction(self, wavelet, shape, rng):
        x = rng.normal(size=shape)
        ll, det = W.dwt2(x, wavelet)
        np.testing.assert_allclose(W.idwt2(ll, det, wavelet, shape), x, atol=1e-10)

    def test_multilevel_reconstruction(self, rng):
        x = rng.normal(size=(64, 64))
        ll, dets, shapes = W.wavedec2(x, "db1", 4)
        np.testing.assert_allclose(W.waverec2(ll, dets, shapes, "db1"), x, atol=1e-10)

    @pytest.mark.parametrize("sigma", [0.05, 0.1, 0.2])
    def test_sigma_recovery(self, sigma, rng):
        noise = rng.normal(0, sigma, size=(256, 256))
        assert abs(W.estimate_sigma(noise) - sigma) / sigma < 0.05

    def test_sigma_smooth_image_near_zero(self):
        yy, xx = np.mgrid[0:64, 0:64]
        assert W.estimate_sigma(xx / 63.0) < 1e-6

    def test_denoise_reduces_noise(self, rng):
        clean = np.tile(np.linspace(0.2, 0.8, 128), (128, 1))
        noisy = clean + rng.normal(0, 0.1, clean.shape)
        den = W.denoise_wavelet(noisy)
        assert np.mean((den - clean) ** 2) < np.mean((noisy - clean) ** 2)


class TestMetrics:
    def test_sixteen_keys_finite(self, clean_image):
        m = P.compute_metrics(clean_image)
        assert set(m) == set(P.METRIC_KEYS) and len(m) == 16
        assert all(np.isfinite(v) for v in m.values())

    def test_noise_monotonicity(self, clean_image, noisy_image):
        m_clean = P.compute_metrics(clean_image)
        m_noisy = P.compute_metrics(noisy_image)
        assert m_noisy["sigma"] > m_clean["sigma"]
        assert m_clean["snr_proxy"] > m_noisy["snr_proxy"]

    def test_detection_fixture_dicts(self, no_issue_metrics, all_issue_metrics):
        assert P.detect_issues(no_issue_metrics) == []
        assert set(P.detect_issues(all_issue_metrics)) == {
            "noise", "blur", "low_contrast", "clipping_low", "clipping_high"
        }

    def test_detection_on_images(self, noisy_image, low_contrast_image, clipped_image):
        assert "noise" in P.detect_issues(P.compute_metrics(noisy_image))
        assert "low_contrast" in P.detect_issues(P.compute_metrics(low_contrast_image))
        issues = P.detect_issues(P.compute_metrics(clipped_image))
        assert "clipping_low" in issues and "clipping_high" in issues

    def test_ssim_identical_is_one(self, clean_image):
        assert F.ssim(clean_image, clean_image) == pytest.approx(1.0, abs=1e-7)

    def test_psnr_identical_is_inf(self, clean_image):
        assert np.isinf(F.psnr(clean_image, clean_image))

    def test_edge_ratio_positive(self, clean_image):
        assert P.compute_edge_ratio(clean_image) > 0

    def test_validation_identity(self, clean_image):
        v = P.compute_validation(clean_image, clean_image.copy())
        assert v["ssim"] == pytest.approx(1.0, abs=1e-7)
        assert v["quality_improvement"] == pytest.approx(0.0, abs=1e-6)
        assert v["meets_ssim"] and v["passes"]

    def test_objective_score_types(self, clean_image, noisy_image):
        v = P.compute_validation(noisy_image, W.denoise_wavelet(noisy_image))
        score, breakdown = P.compute_objective_score(v)
        assert isinstance(score, float) and isinstance(breakdown, dict)
        assert "halo_penalty" in breakdown


class TestEnhancement:
    def test_no_issues_noop(self, clean_image):
        out, ops = P.apply_enhancements(clean_image, [])
        np.testing.assert_allclose(out, np.asarray(clean_image, np.float64), atol=1e-12)

    def test_output_invariants(self, noisy_image):
        out, ops = P.apply_enhancements(noisy_image, ["noise", "low_contrast"])
        assert out.shape == noisy_image.shape
        assert out.min() >= 0.0 and out.max() <= 1.0
        assert len(ops) >= 2

    def test_denoise_lowers_sigma(self, noisy_image):
        out, _ = P.apply_enhancements(noisy_image, ["noise"])
        assert W.estimate_sigma(out) < W.estimate_sigma(noisy_image)

    def test_plan_chain_runs_all_seven_ops(self, noisy_image, valid_plan_dict):
        params = dict(valid_plan_dict["params"])
        params["bilateral_d"] = 5
        params["tv_denoise_weight"] = 0.05
        ops = ["denoise", "clahe", "gamma", "unsharp", "post_denoise", "bilateral", "tv_denoise"]
        out, applied = P.apply_plan(noisy_image, ops, params)
        assert out.shape == noisy_image.shape
        assert 0.0 <= out.min() and out.max() <= 1.0
        # gamma==1.0 is skipped internally but op list is recorded as planned
        assert "clahe" in applied

    def test_clahe_improves_low_contrast(self, low_contrast_image):
        out = F.clahe(low_contrast_image, 0.015, 16)
        assert out.std() > np.asarray(low_contrast_image).std()

    def test_gamma_directionality(self, clean_image):
        bright = F.adjust_gamma(clean_image, 0.8)
        dark = F.adjust_gamma(clean_image, 1.2)
        assert bright.mean() > clean_image.mean() > dark.mean()

    def test_bilateral_smooths_noise_keeps_edges(self, rng):
        step = np.zeros((64, 64)) + 0.2
        step[:, 32:] = 0.8
        noisy = np.clip(step + rng.normal(0, 0.05, step.shape), 0, 1)
        out = F.bilateral(noisy, d=5, sigma_color=0.1, sigma_space=0.1)
        assert out[:, :28].std() < noisy[:, :28].std()
        assert abs(out[:, 40:].mean() - 0.8) < 0.05

    def test_tv_denoise_reduces_variation(self, noisy_image):
        out = F.tv_chambolle(np.asarray(noisy_image, np.float64), weight=0.1)
        tv = lambda im: np.abs(np.diff(im, axis=0)).sum() + np.abs(np.diff(im, axis=1)).sum()
        assert tv(out) < tv(np.asarray(noisy_image, np.float64))

    def test_unsharp_increases_sharpness(self, clean_image):
        out = F.unsharp_mask(np.asarray(clean_image, np.float64), 1.0, 1.0)
        assert np.var(F.laplace(out)) > np.var(F.laplace(clean_image))
