"""Randomised plan parity: the jitted chain must match the NumPy float64
spec for arbitrary in-bounds parameter combinations, not just the defaults
(guards the PlanStatic/PlanDynamic lowering against drift)."""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp
import pytest

from mdx.core.enhance import apply_plan
from mdx.pipeline.schemas import PARAM_BOUNDS, EnhancementPlan
from mdx.refimpl import pipeline_np as R

# Two static op-sets (jit cache keys) × several dynamic draws each: dynamic
# parameter changes must not need recompilation and must stay golden.
OP_SETS = [
    ("denoise", "clahe", "gamma", "unsharp", "post_denoise"),
    ("clahe", "gamma", "unsharp", "bilateral", "tv_denoise"),
]


def _random_params(rng) -> dict:
    p = {}
    for key, (lo, hi) in PARAM_BOUNDS.items():
        if key == "clahe_tile_size":
            p[key] = 16  # static (jit cache key) — held fixed per op-set
        elif key == "bilateral_d":
            p[key] = 5
        else:
            p[key] = float(rng.uniform(lo, hi))
    p["denoise_mode"] = "soft" if rng.random() < 0.5 else "hard"
    # keep TV weight small: the fixed-point solve accumulates f32-vs-f64
    # drift at large weights (documented float policy)
    p["tv_denoise_weight"] = float(rng.uniform(0.0, 0.05))
    return p


@pytest.mark.parametrize("ops", OP_SETS, ids=["core5", "optional5"])
@pytest.mark.parametrize("seed", [1, 2, 3])
def test_random_plan_parity(ops, seed, noisy_image):
    rng = np.random.default_rng(seed)
    params = _random_params(rng)

    plan = EnhancementPlan(recommended_ops=list(ops), params=params)
    static, dyn = plan.to_static_dynamic()
    got, flags = apply_plan(jnp.asarray(noisy_image, jnp.float32)[None],
                            static, dyn)
    got = np.asarray(got[0], np.float64)

    want, applied = R.apply_plan(np.asarray(noisy_image, np.float64),
                                 list(ops), params)

    assert got.shape == want.shape
    assert np.isfinite(got).all()
    assert got.min() >= 0.0 and got.max() <= 1.0
    np.testing.assert_allclose(got, want, atol=2e-3)


def test_dynamic_params_share_compilation(noisy_image):
    """Two different dynamic draws on the same op-set must not recompile
    (PlanDynamic is traced — the framework's central design rule)."""
    import jax

    ops = OP_SETS[0]
    rng = np.random.default_rng(0)
    x = jnp.asarray(noisy_image, jnp.float32)[None]

    from mdx.core import qa

    before = qa.qa_plan._cache_size()
    for _ in range(3):
        plan = EnhancementPlan(recommended_ops=list(ops),
                               params=_random_params(rng))
        static, dyn = plan.to_static_dynamic()
        qa.qa_plan(x, static, dyn)
    after = qa.qa_plan._cache_size()
    assert after - before <= 1
