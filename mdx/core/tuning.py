"""On-device plan autotuning: a candidate sweep as ONE compiled program.

BASELINE config 4 asks for the iterative detect→enhance→validate tuning
loop fully on-device per iteration.  The reference can only tune via its
LLM loop — one plan per round-trip, ≈3 full-image passes per iteration
(SURVEY.md §3.2).  mdx's enhancement chain takes *per-image* parameter
vectors (mdx/core/enhance.py PlanDynamic), so K candidate plans evaluate
simultaneously: broadcast the image to K lanes, give every lane its own
continuous parameters, and one ``qa_plan`` launch returns K objective
scores.  A whole tuning sweep costs one XLA program — no LLM, no host
round-trips, no recompilation between candidates.

The GenAI tuning agent remains available for semantic steering; this is
the deterministic, latency-free alternative (CLI ``--autotune``).
"""

from __future__ import annotations

from typing import Any

import numpy as np

from mdx.pipeline.schemas import EnhancementParams, EnhancementPlan, IterationRecord
from mdx.ops.tv import resolve_tv_mode


# Conservative-to-assertive grid over the parameters that move the
# objective most (clip limit, sharpening, gamma); denoise/post-denoise
# strengths ride along per issue profile.
_CLIP_GRID = (0.005, 0.015, 0.03)
_UNSHARP_GRID = (0.3, 0.6, 1.0)
_GAMMA_GRID = (0.9, 1.0, 1.1)


def candidate_grid(issues: list[str]) -> list[dict[str, Any]]:
    """Issue-aware candidate parameter sets (≤27 lanes)."""
    noisy = "noise" in issues
    blur = "blur" in issues
    dark = "clipping_low" in issues and "clipping_high" not in issues
    bright = "clipping_high" in issues and "clipping_low" not in issues

    gammas = _GAMMA_GRID
    if dark:
        gammas = (0.85, 0.95, 1.0)
    elif bright:
        gammas = (1.0, 1.05, 1.15)

    out = []
    for clip in _CLIP_GRID:
        for amount in _UNSHARP_GRID if blur else (_UNSHARP_GRID[0],):
            for gamma in gammas:
                out.append(dict(
                    clahe_clip_limit=clip,
                    gamma=gamma,
                    unsharp_radius=1.0 if blur else 0.8,
                    unsharp_amount=amount,
                    post_denoise_strength=0.4 if noisy else 0.2,
                    bilateral_sigma_color=0.05,
                    bilateral_sigma_space=0.05,
                    tv_denoise_weight=0.0,
                    denoise_soft=True,
                ))
    return out


def autotune(
    image: np.ndarray,
    issues: list[str],
    *,
    ops: tuple[str, ...] = ("denoise", "clahe", "gamma", "unsharp",
                            "post_denoise"),
    tile_size: int = 16,
) -> tuple[EnhancementPlan, np.ndarray, list[IterationRecord]]:
    """Sweep the candidate grid in one device program; return the best
    plan, its enhanced image, and per-candidate IterationRecords.

    ``image``: [H, W] float32 in [0,1].
    """
    import jax.numpy as jnp

    from mdx.core import qa
    from mdx.core.enhance import PlanDynamic, PlanStatic

    cands = candidate_grid(issues)
    k = len(cands)
    x = jnp.broadcast_to(jnp.asarray(image, jnp.float32)[None],
                         (k,) + image.shape)

    def vec(key, dtype=np.float32):
        return jnp.asarray(np.array([c[key] for c in cands], dtype))

    static = PlanStatic(ops=ops, tile_size=tile_size, bilateral_d=0,
                        tv_mode=resolve_tv_mode(),
                        plan_order=ops)
    dyn = PlanDynamic(
        clahe_clip_limit=vec("clahe_clip_limit"),
        gamma=vec("gamma"),
        unsharp_radius=vec("unsharp_radius"),
        unsharp_amount=vec("unsharp_amount"),
        post_denoise_strength=vec("post_denoise_strength"),
        bilateral_sigma_color=vec("bilateral_sigma_color"),
        bilateral_sigma_space=vec("bilateral_sigma_space"),
        tv_denoise_weight=vec("tv_denoise_weight"),
        denoise_soft=vec("denoise_soft", bool),
    )
    enhanced, _flags, validation, score = qa.qa_plan(x, static, dyn)
    scores = np.asarray(score)
    ssim = np.asarray(validation["ssim"])
    psnr = np.asarray(validation["psnr"])
    qi = np.asarray(validation["quality_improvement"])
    plans, records, best = plan_records(
        cands, ops, tile_size, scores, ssim, psnr, qi,
        best_rationale=("best of on-device autotune sweep "
                        f"({k} candidates, one compiled program)"))
    return plans[best], np.asarray(enhanced[best]), records


def plan_records(cands, ops, tile_size, scores, ssim, psnr, qi,
                 best_rationale: str):
    """Candidate dicts + per-candidate metrics → (EnhancementPlans,
    IterationRecords, best index) — shared by the dense lane sweep and the
    spatial sequential sweep (mdx/parallel/plan_sp.py)."""
    best = int(np.argmax(scores))
    records = []
    plans = []
    for i, c in enumerate(cands):
        plan = EnhancementPlan(
            recommended_ops=list(ops),
            params=EnhancementParams(
                clahe_clip_limit=float(c["clahe_clip_limit"]),
                clahe_tile_size=tile_size,
                gamma=float(c["gamma"]),
                unsharp_radius=float(c["unsharp_radius"]),
                unsharp_amount=float(c["unsharp_amount"]),
                post_denoise_strength=float(c["post_denoise_strength"]),
                denoise_mode="soft"),
            rationale=("on-device autotune sweep candidate"
                       if i != best else best_rationale))
        plans.append(plan)
        records.append(IterationRecord(
            iteration=i + 1, plan=plan, score=round(float(scores[i]), 4),
            metrics={"ssim": round(float(ssim[i]), 4),
                     "psnr": round(float(psnr[i]), 2),
                     "quality_improvement": round(float(qi[i]), 4)},
            chosen=(i == best)))
    return plans, records, best


def autotune_batch(
    images: np.ndarray,
    issues_per_image: list[list[str]],
    *,
    ops: tuple[str, ...] = ("denoise", "clahe", "gamma", "unsharp",
                            "post_denoise"),
    tile_size: int = 16,
) -> tuple[list[EnhancementPlan], np.ndarray, np.ndarray]:
    """Per-frame autotune over a whole [N,H,W] stack in ONE device program.

    Every frame is broadcast across the same K-candidate grid (the union
    grid of the batch's issues) as an [N·K] lane stack; per-frame argmax
    picks each frame's best plan.  Returns (best plan per frame,
    enhanced [N,H,W], scores [N,K]).
    """
    import jax.numpy as jnp

    from mdx.core import qa
    from mdx.core.enhance import PlanDynamic, PlanStatic

    union_issues = sorted({i for iss in issues_per_image for i in iss})
    cands = candidate_grid(union_issues)
    k = len(cands)
    n = images.shape[0]

    x = jnp.repeat(jnp.asarray(images, jnp.float32), k, axis=0)  # [N·K,H,W]

    def vec(key, dtype=np.float32):
        per_img = np.array([c[key] for c in cands], dtype)
        return jnp.asarray(np.tile(per_img, n))

    static = PlanStatic(ops=ops, tile_size=tile_size, bilateral_d=0,
                        tv_mode=resolve_tv_mode(),
                        plan_order=ops)
    dyn = PlanDynamic(
        clahe_clip_limit=vec("clahe_clip_limit"),
        gamma=vec("gamma"),
        unsharp_radius=vec("unsharp_radius"),
        unsharp_amount=vec("unsharp_amount"),
        post_denoise_strength=vec("post_denoise_strength"),
        bilateral_sigma_color=vec("bilateral_sigma_color"),
        bilateral_sigma_space=vec("bilateral_sigma_space"),
        tv_denoise_weight=vec("tv_denoise_weight"),
        denoise_soft=vec("denoise_soft", bool),
    )
    enhanced, _flags, _validation, score = qa.qa_plan(x, static, dyn)
    scores = np.asarray(score).reshape(n, k)
    best = np.argmax(scores, axis=1)                     # [N]
    picked = np.asarray(enhanced).reshape((n, k) + images.shape[1:])[
        np.arange(n), best]

    plans = []
    for i in range(n):
        c = cands[int(best[i])]
        plans.append(EnhancementPlan(
            recommended_ops=list(ops),
            params=EnhancementParams(
                clahe_clip_limit=float(c["clahe_clip_limit"]),
                clahe_tile_size=tile_size,
                gamma=float(c["gamma"]),
                unsharp_radius=float(c["unsharp_radius"]),
                unsharp_amount=float(c["unsharp_amount"]),
                post_denoise_strength=float(c["post_denoise_strength"]),
                denoise_mode="soft"),
            rationale=(f"best of per-frame autotune sweep ({k} candidates, "
                       "one device program for the whole batch)")))
    return plans, picked, scores
