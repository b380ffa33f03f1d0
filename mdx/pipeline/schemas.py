"""Pydantic contracts for planning, iteration tracking and explainability.

Reference contract: pipeline/schemas.py:16-181.  All models are
JSON-serialisable and contain no pixel data or PHI.  Adds
``to_static_dynamic()`` — the lowering from an LLM-facing plan to the
(compile-time, traced) pair consumed by the fused device chain.
"""

from __future__ import annotations

from typing import Optional

from pydantic import BaseModel, Field

# Safety clamps applied before execution (ref pipeline/schemas.py:16-28)
PARAM_BOUNDS: dict[str, tuple[float, float]] = {
    "clahe_clip_limit": (0.002, 0.08),
    "clahe_tile_size": (4, 48),
    "gamma": (0.6, 1.5),
    "unsharp_radius": (0.2, 3.0),
    "unsharp_amount": (0.03, 2.5),
    "post_denoise_strength": (0.0, 0.8),
    "bilateral_d": (0, 13),
    "bilateral_sigma_color": (0.005, 0.20),
    "bilateral_sigma_space": (0.005, 0.20),
    "tv_denoise_weight": (0.0, 0.15),
}

VALID_OPS = ("denoise", "clahe", "gamma", "unsharp", "post_denoise",
             "bilateral", "tv_denoise")


def clamp(value: float, key: str) -> float:
    lo, hi = PARAM_BOUNDS.get(key, (value, value))
    return max(lo, min(hi, value))


class EnhancementParams(BaseModel):
    """Tunable enhancement parameters; clamped to ``PARAM_BOUNDS`` before
    execution (ref pipeline/schemas.py:36-84)."""

    clahe_clip_limit: float = Field(
        default=0.015, description="CLAHE clip limit (0.002-0.08). Lower = gentler.")
    clahe_tile_size: int = Field(
        default=16, description="CLAHE tile size in pixels (4-48). Larger = smoother.")
    gamma: float = Field(
        default=1.0,
        description="Gamma correction. <1 brightens shadows, >1 darkens highlights (0.6-1.5).")
    unsharp_radius: float = Field(
        default=0.8, description="Unsharp-mask Gaussian radius (0.2-3.0). Smaller = less halo.")
    unsharp_amount: float = Field(
        default=0.5, description="Unsharp-mask strength (0.03-2.5). Lower = gentler.")
    denoise_mode: str = Field(
        default="soft", description="Wavelet denoise thresholding mode: 'soft' or 'hard'.")
    post_denoise_strength: float = Field(
        default=0.3, description="Post-sharpening denoise blend factor (0.0-0.8). 0 = off.")
    bilateral_d: int = Field(
        default=0, description="Bilateral filter diameter (0=disabled, 3-13).")
    bilateral_sigma_color: float = Field(
        default=0.05, description="Bilateral sigma for intensity (0.005-0.20).")
    bilateral_sigma_space: float = Field(
        default=0.05, description="Bilateral sigma for spatial distance (0.005-0.20).")
    tv_denoise_weight: float = Field(
        default=0.0, description="Total-variation denoise weight (0.0=disabled, 0.01-0.15).")

    def clamped(self) -> "EnhancementParams":
        """Return a copy with every numeric field clamped to PARAM_BOUNDS and
        the denoise mode coerced to soft on invalid input (the double-clamp
        policy of the reference: enhancement.py:249-263 + tools.py:56-69)."""
        return EnhancementParams(
            clahe_clip_limit=clamp(self.clahe_clip_limit, "clahe_clip_limit"),
            clahe_tile_size=int(clamp(self.clahe_tile_size, "clahe_tile_size")),
            gamma=clamp(self.gamma, "gamma"),
            unsharp_radius=clamp(self.unsharp_radius, "unsharp_radius"),
            unsharp_amount=clamp(self.unsharp_amount, "unsharp_amount"),
            denoise_mode=self.denoise_mode if self.denoise_mode in ("soft", "hard") else "soft",
            post_denoise_strength=clamp(self.post_denoise_strength, "post_denoise_strength"),
            bilateral_d=int(clamp(self.bilateral_d, "bilateral_d")),
            bilateral_sigma_color=clamp(self.bilateral_sigma_color, "bilateral_sigma_color"),
            bilateral_sigma_space=clamp(self.bilateral_sigma_space, "bilateral_sigma_space"),
            tv_denoise_weight=clamp(self.tv_denoise_weight, "tv_denoise_weight"),
        )


class EnhancementPlan(BaseModel):
    """Structured output of the Planner agent (ref pipeline/schemas.py:87-116)."""

    recommended_ops: list[str] = Field(
        description="Ordered list of operations to apply. Valid values: "
                    "'denoise', 'clahe', 'gamma', 'unsharp', 'post_denoise', "
                    "'bilateral', 'tv_denoise'.")
    params: EnhancementParams = Field(default_factory=EnhancementParams)
    risk_warnings: list[str] = Field(default_factory=list)
    rationale: str = Field(default="")
    safety: str = Field(default="")
    stop_reason: Optional[str] = Field(
        default=None,
        description="If non-null, no enhancement is needed and this explains why.")

    def normalized_ops(self) -> list[str]:
        return [o.lower().strip() for o in self.recommended_ops
                if o.lower().strip() in VALID_OPS]

    def to_static_dynamic(self, tv_mode: str | None = None):
        """Lower to the fused device chain's (PlanStatic, PlanDynamic) pair.

        Static part: which ops run, CLAHE tile size, bilateral diameter, the
        plan op order (for the halo-safeguard re-run), and the TV solve
        mode.  Dynamic part: all continuous parameters, clamped.

        ``tv_mode``: "ref" (reference parity, the default) or "fast" (the
        opt-in relaxed-parity iteration cap, mdx/ops/tv.py); ``None``
        falls back to the ``MDX_TV_MODE`` env knob.  Validated here so a
        typo'd env var fails loudly at lowering, not silently at dispatch.
        """
        from mdx.core.enhance import PlanDynamic, PlanStatic
        from mdx.ops.tv import resolve_tv_mode

        tv_mode = resolve_tv_mode(tv_mode)
        p = self.params.clamped()
        ops = tuple(self.normalized_ops())
        static = PlanStatic(
            ops=ops,
            tile_size=p.clahe_tile_size,
            bilateral_d=p.bilateral_d if "bilateral" in ops else 0,
            plan_order=ops,
            tv_mode=tv_mode,
        )
        dyn = PlanDynamic(
            clahe_clip_limit=p.clahe_clip_limit,
            gamma=p.gamma,
            unsharp_radius=p.unsharp_radius,
            unsharp_amount=p.unsharp_amount,
            post_denoise_strength=p.post_denoise_strength,
            bilateral_sigma_color=p.bilateral_sigma_color,
            bilateral_sigma_space=p.bilateral_sigma_space,
            tv_denoise_weight=p.tv_denoise_weight,
            denoise_soft=(p.denoise_mode == "soft"),
        )
        return static, dyn


class IterationRecord(BaseModel):
    """One tuning-loop iteration (ref pipeline/schemas.py:119-127)."""

    iteration: int
    plan: EnhancementPlan
    metrics: dict[str, float] = Field(default_factory=dict)
    score: float = 0.0
    chosen: bool = False


class ExplainabilityReport(BaseModel):
    """Clinician-friendly explanation (ref pipeline/schemas.py:129-168)."""

    detected_issues: str
    corrective_measures: str
    enhancement_applied: str
    validation_outcome: str
    limitations: str
    image_summary: str = ""
    actionable_suggestions: list[str] = Field(default_factory=list)
    next_steps: list[str] = Field(default_factory=list)


class GenAIContext(BaseModel):
    """Non-PHI context passed to the LLM agents (ref pipeline/schemas.py:171-181)."""

    metrics: dict[str, float] = Field(default_factory=dict)
    issues: list[str] = Field(default_factory=list)
    thresholds: dict[str, float] = Field(default_factory=dict)
    metadata: dict[str, str] = Field(default_factory=dict)
    image_id: str = Field(default="original",
                          description="In-memory image store key. Never sent to LLM.")
