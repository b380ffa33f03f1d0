"""Plan-driven spatial QA parity (mdx/parallel/plan_sp.py): the sharded
apply_plan + all three safeguards + full validation + objective score
must match the dense ``mdx.core.qa.qa_plan`` on the same stack."""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp
import pytest

from mdx.core import enhance as E
from mdx.core import qa
from mdx.parallel import make_mesh, make_mesh2d
from mdx.parallel.plan_sp import qa_plan_spatial


def _img(seed=0, h=64, w=64, noise=0.1):
    r = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float64)
    base = 0.45 + 0.25 * np.sin(xx / 11.0) * np.cos(yy / 7.0)
    return np.clip(base + r.normal(0, noise, (h, w)), 0, 1).astype(np.float32)


_FULL = E.PlanStatic(
    ops=("denoise", "clahe", "gamma", "unsharp", "post_denoise",
         "bilateral", "tv_denoise"),
    tile_size=16, bilateral_d=5,
    plan_order=("denoise", "clahe", "gamma", "unsharp", "post_denoise",
                "bilateral", "tv_denoise"))
_DYN = E.PlanDynamic(
    clahe_clip_limit=0.02, gamma=0.95, unsharp_radius=1.0,
    unsharp_amount=0.6, post_denoise_strength=0.3,
    bilateral_sigma_color=0.05, bilateral_sigma_space=0.05,
    tv_denoise_weight=0.05, denoise_soft=True)


def _assert_matches_dense(out, x, static, dyn, atol_img=1e-4):
    want_enh, want_flags, want_val, want_score = qa.qa_plan(x, static, dyn)
    np.testing.assert_allclose(np.asarray(out["enhanced"]),
                               np.asarray(want_enh), atol=atol_img)
    for k in ("halo", "noise_amp", "over_processed"):
        np.testing.assert_array_equal(
            np.asarray(out["flags"][k]), np.asarray(want_flags[k]),
            err_msg=k)
    for k in ("ssim", "psnr", "quality_improvement"):
        np.testing.assert_allclose(
            np.asarray(out["validation"][k]), np.asarray(want_val[k]),
            atol=2e-4, err_msg=k)
    np.testing.assert_array_equal(np.asarray(out["validation"]["passes"]),
                                  np.asarray(want_val["passes"]))
    np.testing.assert_allclose(np.asarray(out["score"]),
                               np.asarray(want_score), atol=1e-3)


class TestPlanSpatial:
    def test_full_plan_1d(self):
        mesh = make_mesh(n_data=1, n_space=4)
        x = jnp.stack([jnp.asarray(_img(0))])
        out = qa_plan_spatial(x, mesh, _FULL, _DYN)
        _assert_matches_dense(out, x, _FULL, _DYN)

    def test_full_plan_2d(self):
        mesh = make_mesh2d(n_data=1, n_sy=2, n_sx=2)
        x = jnp.stack([jnp.asarray(_img(1))])
        out = qa_plan_spatial(x, mesh, _FULL, _DYN)
        _assert_matches_dense(out, x, _FULL, _DYN)

    def test_halo_guard_trips_identically(self):
        """Aggressive unsharp on noisy content — whatever the guards
        decide, sharded and dense must decide it identically."""
        static = E.PlanStatic(ops=("unsharp",), tile_size=16,
                              bilateral_d=0, plan_order=("unsharp",))
        dyn = E.PlanDynamic(unsharp_radius=1.5, unsharp_amount=2.0,
                            tv_denoise_weight=0.0)
        mesh = make_mesh2d(n_data=1, n_sy=2, n_sx=2)
        x = jnp.stack([jnp.asarray(_img(2, noise=0.18))])
        out = qa_plan_spatial(x, mesh, static, dyn)
        _assert_matches_dense(out, x, static, dyn)

    def test_halo_guard_with_prefix_ops(self):
        """Guard trip with pre-unsharp ops in the chain — exercises the
        sharded prefix-reuse re-run (denoise/CLAHE not recomputed inside
        the guard branch) against the dense path."""
        static = E.PlanStatic(
            ops=("clahe", "gamma", "unsharp"), tile_size=16,
            bilateral_d=0, plan_order=("clahe", "gamma", "unsharp"))
        dyn = E.PlanDynamic(clahe_clip_limit=0.05, gamma=1.05,
                            unsharp_radius=1.5, unsharp_amount=2.2,
                            tv_denoise_weight=0.0)
        mesh = make_mesh(n_data=1, n_space=4)
        x = jnp.stack([jnp.asarray(_img(5, noise=0.18))])
        out = qa_plan_spatial(x, mesh, static, dyn)
        _assert_matches_dense(out, x, static, dyn)

    def test_masks_and_data_rows(self):
        """Two data rows with different masks/content — the guard conds'
        psum'd predicates keep every device on the same branch (no
        rendezvous deadlock), and outputs still match dense."""
        static = E.PlanStatic(
            ops=("clahe", "gamma", "unsharp"), tile_size=16,
            bilateral_d=0, plan_order=("clahe", "gamma", "unsharp"))
        dyn = E.PlanDynamic(clahe_clip_limit=0.03, gamma=1.1,
                            unsharp_amount=0.8, unsharp_radius=1.0,
                            tv_denoise_weight=0.0)
        mesh = make_mesh2d(n_data=2, n_sy=2, n_sx=2)
        x = jnp.stack([jnp.asarray(_img(3, noise=0.02)),
                       jnp.asarray(_img(4, noise=0.15))])
        masks = {"gamma": jnp.asarray([True, False])}
        out = qa_plan_spatial(x, mesh, static, dyn, masks=masks)
        want_enh, want_flags = E.apply_plan(x, static, dyn, masks=masks)
        np.testing.assert_allclose(np.asarray(out["enhanced"]),
                                   np.asarray(want_enh), atol=1e-4)
        for k in ("halo", "noise_amp", "over_processed"):
            np.testing.assert_array_equal(np.asarray(out["flags"][k]),
                                          np.asarray(want_flags[k]),
                                          err_msg=k)


class TestAutotuneSpatial:
    def test_matches_dense_autotune(self):
        """The sequential spatial sweep must pick the same candidate with
        the same scores as the dense K-lane sweep."""
        from mdx.core.tuning import autotune as dense_autotune
        from mdx.parallel.plan_sp import autotune_spatial

        img = _img(8, noise=0.14)
        issues = ["noise", "low_contrast"]
        mesh = make_mesh2d(n_data=1, n_sy=2, n_sx=2)
        plan_sp, enh_sp, recs_sp = autotune_spatial(img, issues, mesh)
        plan_d, enh_d, recs_d = dense_autotune(img, issues)
        assert len(recs_sp) == len(recs_d)
        for a, b in zip(recs_sp, recs_d):
            np.testing.assert_allclose(a.score, b.score, atol=2e-3)
            assert a.chosen == b.chosen
        assert plan_sp.params.gamma == plan_d.params.gamma
        assert (plan_sp.params.clahe_clip_limit
                == plan_d.params.clahe_clip_limit)
        np.testing.assert_allclose(enh_sp, enh_d, atol=1e-4)
