"""Tests for the fused core (mdx.core): metric parity with the NumPy spec,
detection logic, enhancement-chain parity, validation + objective parity,
and batching/vectorised-plan semantics.
"""

import numpy as np
import pytest
import jax.numpy as jnp

from mdx.core import enhance as E
from mdx.core import metrics as M
from mdx.core import qa
from mdx.core.score import objective_score
from mdx.core.validate import validate
from mdx.refimpl import pipeline_np as P

# per-metric absolute tolerances for f32 device vs f64 host
_ATOL = {
    "sigma": 5e-5, "lap_var": 5e-6, "std": 1e-5, "pct_low": 1e-6,
    "pct_high": 1e-6, "entropy": 2e-3, "edge_density": 1e-4,
    "gradient_mag_mean": 1e-5, "gradient_mag_std": 1e-5,
    "laplacian_energy": 1e-5, "histogram_spread": 1e-5,
    "local_contrast_std": 1e-5, "gradient_strength": 1e-4,
    "gradient_entropy": 5e-3,
}
_RTOL = {"snr_proxy": 2e-3, "cnr_proxy": 2e-3}


def _b(*imgs):
    return jnp.stack([jnp.asarray(np.asarray(i, np.float32)) for i in imgs])


class TestFusedMetrics:
    def test_metric_parity(self, clean_image, noisy_image, low_contrast_image,
                           clipped_image):
        imgs = [clean_image, noisy_image, low_contrast_image, clipped_image]
        got = M.compute_metrics(_b(*imgs))
        assert set(got) == set(M.METRIC_KEYS)
        for i, img in enumerate(imgs):
            want = P.compute_metrics(img)
            for k in M.METRIC_KEYS:
                g = float(got[k][i])
                if k in _RTOL:
                    assert g == pytest.approx(want[k], rel=_RTOL[k]), (k, i)
                else:
                    assert g == pytest.approx(want[k], abs=_ATOL[k]), (k, i)

    def test_niqe_edge_ratio_parity(self, noisy_image, clean_image):
        s = M.image_stats(_b(noisy_image, clean_image))
        for i, img in enumerate([noisy_image, clean_image]):
            assert float(s["niqe"][i]) == pytest.approx(P.compute_niqe(img), abs=5e-4)
            assert float(s["edge_ratio"][i]) == pytest.approx(
                P.compute_edge_ratio(img), abs=1e-4)

    def test_detection_masks(self, noisy_image, low_contrast_image, clipped_image,
                             clean_image):
        imgs = [noisy_image, low_contrast_image, clipped_image, clean_image]
        stats, issues = qa.detect(_b(*imgs))
        ref_issues = [P.detect_issues(P.compute_metrics(i)) for i in imgs]
        for i, want in enumerate(ref_issues):
            got = [k for k in M.ISSUE_ORDER if bool(issues[k][i])]
            assert got == want, i


class TestEnhancement:
    def test_issue_driven_parity(self, noisy_image, low_contrast_image,
                                 clipped_image, clean_image):
        imgs = [noisy_image, low_contrast_image, clipped_image, clean_image]
        x = _b(*imgs)
        stats, issues = qa.detect(x)
        out, flags = E.apply_issue_driven(x, issues)
        for i, img in enumerate(imgs):
            ref_issues = P.detect_issues(P.compute_metrics(img))
            want, _ = P.apply_enhancements(img, ref_issues)
            got = np.asarray(out[i], np.float64)
            np.testing.assert_allclose(got, want, atol=2e-4,
                                       err_msg=f"image {i} issues={ref_issues}")

    def test_plan_parity_full_chain(self, noisy_image):
        params = {
            "clahe_clip_limit": 0.02, "clahe_tile_size": 16, "gamma": 0.9,
            "unsharp_radius": 1.0, "unsharp_amount": 0.8, "denoise_mode": "soft",
            "post_denoise_strength": 0.3, "bilateral_d": 5,
            "bilateral_sigma_color": 0.05, "bilateral_sigma_space": 0.05,
            "tv_denoise_weight": 0.05,
        }
        ops = ["denoise", "clahe", "gamma", "unsharp", "post_denoise",
               "bilateral", "tv_denoise"]
        want, _ = P.apply_plan(noisy_image, ops, params)

        static = E.PlanStatic(ops=tuple(ops), tile_size=16, bilateral_d=5,
                              plan_order=tuple(ops))
        dyn = E.PlanDynamic(
            clahe_clip_limit=0.02, gamma=0.9, unsharp_radius=1.0,
            unsharp_amount=0.8, post_denoise_strength=0.3,
            bilateral_sigma_color=0.05, bilateral_sigma_space=0.05,
            tv_denoise_weight=0.05, denoise_soft=True)
        out, flags = E.apply_plan(_b(noisy_image), static, dyn)
        np.testing.assert_allclose(np.asarray(out[0], np.float64), want, atol=5e-4)

    def test_plan_no_ops_is_identity(self, clean_image):
        static = E.PlanStatic(ops=(), tile_size=16, bilateral_d=0)
        out, _ = E.apply_plan(_b(clean_image), static, E.PlanDynamic())
        np.testing.assert_allclose(np.asarray(out[0]),
                                   np.asarray(clean_image, np.float32), atol=1e-7)

    def test_vectorised_candidate_plans(self, noisy_image):
        """One image × K candidate params in a single batched call."""
        k = 4
        x = jnp.broadcast_to(jnp.asarray(noisy_image)[None], (k,) + noisy_image.shape)
        static = E.PlanStatic(ops=("clahe", "gamma"), tile_size=16)
        gammas = jnp.asarray([0.7, 0.9, 1.1, 1.3])
        dyn = E.PlanDynamic(gamma=gammas, clahe_clip_limit=jnp.full((k,), 0.015))
        out, _, val, score = qa.qa_plan(x, static, dyn)
        # different gammas → different outputs and scores
        means = np.asarray(out.mean(axis=(1, 2)))
        assert len(np.unique(np.round(means, 6))) == k
        assert np.asarray(score).shape == (k,)


class TestValidationScore:
    def test_validation_parity(self, noisy_image):
        enhanced, _ = P.apply_enhancements(noisy_image, ["noise"])
        want = P.compute_validation(noisy_image, enhanced)
        got = validate(_b(noisy_image), _b(enhanced.astype(np.float32)))
        assert float(got["ssim"][0]) == pytest.approx(want["ssim"], abs=1e-4)
        assert float(got["psnr"][0]) == pytest.approx(want["psnr"], abs=1e-2)
        assert float(got["quality_improvement"][0]) == pytest.approx(
            want["quality_improvement"], abs=1e-3)
        assert bool(got["passes"][0]) == want["passes"]
        assert float(got["niqe_after"][0]) == pytest.approx(want["niqe_after"], abs=1e-3)

    def test_objective_parity(self, noisy_image):
        enhanced, _ = P.apply_enhancements(noisy_image, ["noise"])
        want_score, want_bd = P.compute_objective_score(
            P.compute_validation(noisy_image, enhanced))
        got_v = validate(_b(noisy_image), _b(enhanced.astype(np.float32)))
        got_score, got_bd = objective_score(got_v)
        assert float(got_score[0]) == pytest.approx(want_score, abs=5e-3)
        for k in ("halo_penalty", "snr_reward", "niqe_degradation"):
            assert float(got_bd[k][0]) == pytest.approx(want_bd[k], abs=5e-3)

    def test_qa_deterministic_end_to_end(self, noisy_image, clean_image):
        x = _b(noisy_image, clean_image)
        enhanced, stats, issues, flags, validation, score = qa.qa_deterministic(x)
        # clean image has no issues → unchanged
        np.testing.assert_allclose(np.asarray(enhanced[1]),
                                   np.asarray(clean_image, np.float32), atol=1e-7)
        # noisy image got denoised
        assert float(stats["sigma"][0]) > float(
            M.image_stats(enhanced[:1])["sigma"][0])
        assert np.asarray(score).shape == (2,)


class TestSubBatching:
    def test_grouped_matches_whole(self):
        """qa_deterministic's internal ≤32-image grouping
        (mdx/core/batching.py) is semantically the identity: a batch that
        triggers grouping (N=48 → groups of 16) must match the ungrouped
        body leaf-for-leaf."""
        import jax

        from mdx.core import qa

        rng = np.random.default_rng(3)
        x = jnp.asarray(np.clip(rng.normal(0.5, 0.15, (48, 64, 64)),
                                0, 1), jnp.float32)
        grouped = qa.qa_deterministic(x)
        whole = jax.jit(qa._qa_deterministic_body)(x)
        for g, w in zip(jax.tree_util.tree_leaves(grouped),
                        jax.tree_util.tree_leaves(whole)):
            # identical math; tolerance covers XLA reduction-order noise
            np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                       rtol=1e-5, atol=1e-5)

    def test_per_image_args_split_with_rows(self):
        """[N] parameter leaves (per-image plans) must split with the rows
        — shared-closure misalignment would mix plans across groups."""
        from mdx.core import enhance as E
        from mdx.core import qa

        rng = np.random.default_rng(4)
        x = jnp.asarray(np.clip(rng.normal(0.5, 0.1, (48, 32, 32)),
                                0, 1), jnp.float32)
        static = E.PlanStatic(ops=("gamma",), tile_size=16, bilateral_d=0,
                              plan_order=("gamma",))
        gammas = np.linspace(0.6, 1.6, 48).astype(np.float32)
        dyn = E.PlanDynamic(gamma=jnp.asarray(gammas),
                            tv_denoise_weight=0.0)
        enh, _, _, _ = qa.qa_plan(x, static, dyn)
        want = np.asarray(x) ** gammas[:, None, None]
        np.testing.assert_allclose(np.asarray(enh), want, atol=1e-5)


class TestTvMode:
    """Opt-in relaxed-parity TV (MDX_TV_MODE=fast / PlanStatic.tv_mode):
    defaults stay reference parity; fast caps the Chambolle iterations
    (mdx/ops/tv.py TV_MODES; measured curve in docs/PERF.md)."""

    def test_mode_table_and_validation(self):
        from mdx.ops.tv import TV_MODES, tv_mode_params

        assert tv_mode_params("ref") == (2e-4, 200)  # reference semantics
        eps, it = tv_mode_params("fast")
        assert it < 200
        assert set(TV_MODES) == {"ref", "fast"}
        with pytest.raises(ValueError, match="tv_mode"):
            tv_mode_params("fas")

    def test_fast_is_the_capped_solve(self, noisy_image):
        """The fast chain output IS tv_chambolle at the capped iteration
        count (mechanism test — the curve lives in docs/PERF.md)."""
        from mdx.ops.tv import tv_chambolle, tv_mode_params

        x = _b(noisy_image)
        w = jnp.float32(0.1)
        dyn = E.PlanDynamic(tv_denoise_weight=w)
        outs = {}
        for mode in ("ref", "fast"):
            static = E.PlanStatic(ops=("tv_denoise",),
                                  plan_order=("tv_denoise",),
                                  tv_mode=mode)
            out, _ = E.apply_plan(x, static, dyn)
            eps, it = tv_mode_params(mode)
            want = tv_chambolle(x, jnp.maximum(jnp.broadcast_to(
                w, (1,)), 1e-6), eps=eps, max_iter=it)
            np.testing.assert_allclose(np.asarray(out), np.asarray(want),
                                       atol=1e-6, err_msg=mode)
            outs[mode] = np.asarray(out)
        # heavy noise at w=0.1 needs >40 iterations: fast must actually
        # differ from ref (the cap bound), while staying close to it
        dmax = np.abs(outs["ref"] - outs["fast"]).max()
        assert 0 < dmax < 0.05

    def test_plan_lowering_env_and_arg(self, monkeypatch):
        from mdx.pipeline.schemas import EnhancementPlan

        plan = EnhancementPlan(recommended_ops=["tv_denoise"])
        monkeypatch.delenv("MDX_TV_MODE", raising=False)
        static, _ = plan.to_static_dynamic()
        assert static.tv_mode == "ref"  # default is full parity
        monkeypatch.setenv("MDX_TV_MODE", "fast")
        static, _ = plan.to_static_dynamic()
        assert static.tv_mode == "fast"
        # explicit argument wins over the env
        static, _ = plan.to_static_dynamic(tv_mode="ref")
        assert static.tv_mode == "ref"
        monkeypatch.setenv("MDX_TV_MODE", "bogus")
        with pytest.raises(ValueError, match="MDX_TV_MODE"):
            plan.to_static_dynamic()
