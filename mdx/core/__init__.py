"""Fused numeric core (L2): batched metrics, enhancement, validation.

This package is the TPU-native replacement for the reference's
``pipeline/metrics.py`` + ``pipeline/enhancement.py``.  Where the reference
re-runs ~5 independent full-image passes per QA run (SURVEY.md §3.1), each
entry point here compiles to a *single* XLA program over a batched
``[N, H, W]`` array:

* :func:`mdx.core.metrics.image_stats` — all 16 metrics + NIQE + edge-ratio
  with shared intermediates (one Laplacian, one Sobel pair, one sort).
* :func:`mdx.core.enhance.apply_plan` — the 7-op chain, parameterised by
  traced per-image params, with the three safeguards as on-device
  conditionals.
* :func:`mdx.core.validate.validate` — before/after stats + SSIM/PSNR +
  pass logic.
* :func:`mdx.core.qa` — fused end-to-end steps (detect→enhance→validate)
  used by the runner, the tuning loop, and the benchmarks.
"""

from mdx.core.metrics import image_stats, compute_metrics, detect_issues, ISSUE_ORDER
from mdx.core.enhance import PlanStatic, PlanDynamic, apply_plan, apply_issue_driven
from mdx.core.validate import validate
from mdx.core.score import objective_score
from mdx.core import qa

__all__ = [
    "image_stats", "compute_metrics", "detect_issues", "ISSUE_ORDER",
    "PlanStatic", "PlanDynamic", "apply_plan", "apply_issue_driven",
    "validate", "objective_score", "qa",
]
