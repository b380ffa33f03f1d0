"""Deterministic (non-LLM) agents — ref pipeline/core_agents.py.

The five-agent flow (detect → recommend → enhance → validate → report) keeps
the reference's interfaces and PASS/WARN/FAIL semantics, but the numeric
work of detection, enhancement and validation executes as *one fused device
program* (:func:`mdx.core.qa.qa_deterministic`) instead of five separate
full-image passes.  ``QAEngine.run_deterministic`` is the batched entry the
agents (and the bench harness) share.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, List

import numpy as np
import jax.numpy as jnp

from mdx.core import qa
from mdx.core.metrics import ISSUE_ORDER, METRIC_KEYS
from mdx.io.report import build_markdown_report


@dataclass
class DetectionResult:
    metrics: Dict[str, float]
    issues: List[str]


@dataclass
class RecommendationResult:
    recommendations: List[str]
    mapping: Dict[str, str]


@dataclass
class EnhancementResult:
    image: np.ndarray
    applied_ops: List[str]
    metrics: Dict[str, float]


@dataclass
class ValidationResult:
    ssim: float
    psnr: float
    quality_improvement: float
    meets_ssim: bool
    meets_psnr: bool
    meets_improvement: bool
    passes: bool
    status: str
    notes: List[str]
    niqe_before: float = 0.0
    niqe_after: float = 0.0
    niqe_improved: bool = True
    contrast_gain: float = 0.0
    sharpness_gain: float = 0.0
    noise_change: float = 0.0


def _scalar(v) -> float:
    return float(np.asarray(v).reshape(-1)[0])


def _metrics_dict(stats: dict, i: int = 0) -> Dict[str, float]:
    return {k: _scalar(stats[k][i]) for k in METRIC_KEYS}


# Human-readable op labels for the issue-driven chain, mirroring the
# reference's applied_ops strings (pipeline/enhancement.py:151-227).
def issue_op_labels(issues: List[str], flags: dict, i: int = 0) -> List[str]:
    from mdx.core.enhance import DETERMINISTIC_DEFAULTS as P
    ops: List[str] = []
    if "noise" in issues:
        ops.append("Wavelet denoise (pre)")
    if any(k in issues for k in ("low_contrast", "clipping_low", "clipping_high")):
        ops.append(f"CLAHE (clip={P['clahe_clip_limit']}, tile={P['clahe_tile_size']})")
    if "clipping_low" in issues and "clipping_high" not in issues:
        ops.append(f"Gamma brighten ({P['gamma_brighten']})")
    elif "clipping_high" in issues and "clipping_low" not in issues:
        ops.append(f"Gamma darken ({P['gamma_darken']})")
    if "blur" in issues:
        ops.append(f"Unsharp mask (r={P['unsharp_radius']}, a={P['unsharp_amount']})")
        ops.append(f"Light denoise (post, s={P['post_denoise_strength']})")
    if bool(np.asarray(flags.get("noise_amp", False)).reshape(-1)[i]):
        ops.append("Auto-corrective denoise (noise guard)")
    return ops


class QualityDetectionAgent:
    """Fused 16-metric pass + threshold detection (ref core_agents.py:61-65)."""

    def run(self, image: np.ndarray) -> DetectionResult:
        stats, issues = qa.detect(jnp.asarray(image, jnp.float32)[None])
        issue_list = [k for k in ISSUE_ORDER if bool(issues[k][0])]
        return DetectionResult(metrics=_metrics_dict(stats), issues=issue_list)


class RecommendationAgent:
    """Issue → textual action map (ref core_agents.py:68-89)."""

    ISSUE_TO_ACTION = {
        "noise": "Apply wavelet denoising to reduce noise.",
        "low_contrast": "Apply CLAHE to improve contrast.",
        "blur": "Apply unsharp masking to improve sharpness.",
        "clipping_low": "Apply CLAHE and mild gamma correction to lift shadows.",
        "clipping_high": "Apply CLAHE and mild gamma correction to reduce highlights.",
    }

    def run(self, detection: DetectionResult) -> RecommendationResult:
        if not detection.issues:
            return RecommendationResult(
                recommendations=["No issues detected. Enhancement not required."],
                mapping={})
        mapping = {i: self.ISSUE_TO_ACTION.get(i, "Review manually.")
                   for i in detection.issues}
        return RecommendationResult(recommendations=list(mapping.values()),
                                    mapping=mapping)


class EnhancementAgent:
    """Issue-driven enhancement on device (ref core_agents.py:92-102)."""

    def run(self, image: np.ndarray,
            recommendations: RecommendationResult) -> EnhancementResult:
        issues = list(recommendations.mapping.keys())
        x = jnp.asarray(image, jnp.float32)[None]
        stats, issue_masks = qa.detect(x)
        from mdx.core.enhance import apply_issue_driven
        out, flags = apply_issue_driven(x, issue_masks)
        from mdx.core.metrics import compute_metrics
        after = compute_metrics(out)
        return EnhancementResult(
            image=np.asarray(out[0]),
            applied_ops=issue_op_labels(issues, flags),
            metrics={k: _scalar(after[k]) for k in METRIC_KEYS})


def build_validation_result(v: dict, issues: List[str], i: int = 0) -> ValidationResult:
    """Batched validation dict → per-image ValidationResult with the
    reference's PASS/WARN/FAIL + notes logic (core_agents.py:105-161)."""
    g = lambda k: _scalar(v[k][i]) if hasattr(v[k], "__getitem__") else _scalar(v[k])
    b = lambda k: bool(np.asarray(v[k]).reshape(-1)[i])

    notes: List[str] = []
    passes = b("passes")
    meets_improvement = b("meets_improvement")
    if not issues:
        notes.append("No issues detected; enhancement not required.")
        passes = b("meets_ssim") and b("meets_psnr")
        meets_improvement = True
    status = "PASS" if passes else "FAIL"
    if status == "FAIL" and g("quality_improvement") > 0:
        status = "WARN"
        notes.append("Some improvement observed, but thresholds not fully met.")
    if b("niqe_improved"):
        notes.append("Naturalness preserved (NIQE-approx stable or improved).")
    else:
        notes.append("Warning: Naturalness may be degraded (possible over-processing).")
    if g("noise_change") > 0.5:
        notes.append(f"Note: Noise increased by {g('noise_change') * 100:.1f}% "
                     f"(sharpening side-effect).")
    return ValidationResult(
        ssim=g("ssim"), psnr=g("psnr"),
        quality_improvement=g("quality_improvement"),
        meets_ssim=b("meets_ssim"), meets_psnr=b("meets_psnr"),
        meets_improvement=meets_improvement, passes=passes, status=status,
        notes=notes, niqe_before=g("niqe_before"), niqe_after=g("niqe_after"),
        niqe_improved=b("niqe_improved"), contrast_gain=g("contrast_gain"),
        sharpness_gain=g("sharpness_gain"), noise_change=g("noise_change"))


class ValidationAgent:
    """Full-reference validation on device (ref core_agents.py:105-161)."""

    def run(self, original: np.ndarray, enhanced: np.ndarray,
            detection: DetectionResult) -> ValidationResult:
        from mdx.core.validate import validate
        v = validate(jnp.asarray(original, jnp.float32)[None],
                     jnp.asarray(enhanced, jnp.float32)[None])
        return build_validation_result(v, detection.issues)


class ReportAgent:
    def run(self, context: Dict[str, object]) -> str:
        return build_markdown_report(context)
