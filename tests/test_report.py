"""Markdown report + visuals tests (ref pipeline/dicom_io.py:99-445).

The reference's report builder is exercised only implicitly by its E2E
test; here the GenAI sections (plan, iteration table, prompts,
explainability) are asserted directly.
"""

from __future__ import annotations

import os

import numpy as np
import pytest

from mdx.io.report import build_markdown_report
from mdx.io.visuals import save_single_image, save_visuals
from mdx.pipeline.agents import build_validation_result
from mdx.pipeline.schemas import (
    EnhancementPlan,
    ExplainabilityReport,
    IterationRecord,
)


@pytest.fixture()
def base_context(noisy_image):
    import jax.numpy as jnp

    from mdx.core.validate import validate

    v = validate(jnp.asarray(noisy_image, jnp.float32)[None],
                 jnp.asarray(np.clip(noisy_image * 0.9 + 0.05, 0, 1),
                             jnp.float32)[None])
    validation = build_validation_result(v, ["noise"])
    return {
        "run_id": "abc123def456",
        "input_path": "/tmp/x.dcm",
        "metadata": {"Modality": "CT", "BodyPartExamined": "CHEST"},
        "issues": ["noise"],
        "recommendations": ["Apply wavelet denoising"],
        "applied_ops": ["denoise"],
        "metrics_before": {"sigma": 0.15, "std": 0.2},
        "metrics_after": {"sigma": 0.05, "std": 0.21},
        "validation": validation,
        "visuals": {},
        "notes": validation.notes,
    }


class TestDeterministicReport:
    def test_structure(self, base_context):
        md = build_markdown_report(base_context)
        assert md.startswith("# 🧪")
        assert "Modality" in md and "CT" in md
        assert "noise" in md
        assert "SSIM" in md and "PSNR" in md
        assert "Noise σ" in md

    def test_no_issue_report(self, base_context):
        base_context["issues"] = []
        base_context["applied_ops"] = []
        md = build_markdown_report(base_context)
        assert "# 🧪" in md


class TestGenAIReport:
    def test_genai_sections(self, base_context, valid_plan_dict):
        plan = EnhancementPlan.model_validate(valid_plan_dict)
        base_context.update({
            "genai_plan": plan,
            "genai_iterations": [IterationRecord(
                iteration=1, plan=plan, score=1.5, chosen=True)],
            "genai_model": "gpt-5-mini",
            "genai_max_iters": 4,
            "genai_llm_calls": 6,
            "genai_prompts": {"planner": "PLANNER PROMPT TEXT"},
            "genai_explainability": ExplainabilityReport(
                detected_issues="noise was found",
                corrective_measures="denoise chosen",
                enhancement_applied="wavelet ran",
                validation_outcome="passed",
                limitations="not for diagnosis",
                image_summary="CT chest",
                actionable_suggestions=["tune clip"],
                next_steps=["review"]),
        })
        md = build_markdown_report(base_context)
        assert "gpt-5-mini" in md
        assert "1.5" in md           # iteration score table
        assert "not for diagnosis" in md
        assert "denoise chosen" in md

    def test_iteration_table_rendered(self, base_context, valid_plan_dict):
        plan = EnhancementPlan.model_validate(valid_plan_dict)
        base_context["genai_plan"] = plan
        base_context["genai_iterations"] = [
            IterationRecord(iteration=i + 1, plan=plan,
                            score=float(i), chosen=(i == 2))
            for i in range(3)]
        md = build_markdown_report(base_context)
        # all three iterations appear
        assert md.count("| 1 |") + md.count("| 2 |") + md.count("| 3 |") >= 3


class TestVisuals:
    def test_save_visuals(self, noisy_image, tmp_path):
        out = save_visuals(noisy_image, np.clip(noisy_image * 0.9, 0, 1),
                           str(tmp_path), "case")
        assert os.path.isfile(out["before_after"])
        assert out["before_after"].endswith(".png")

    def test_save_single_image(self, noisy_image, tmp_path):
        p = save_single_image(noisy_image, str(tmp_path / "one.png"))
        assert os.path.isfile(p)
