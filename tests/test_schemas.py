"""Plan/params schema contract tests (ref tests/test_schemas.py):
defaults within bounds, JSON round-trip, required-field rejection,
PARAM_BOUNDS keyset and lo<hi, plus the mdx-only device-plan lowering."""

from __future__ import annotations

import json

import pytest
from pydantic import ValidationError

from mdx.pipeline.schemas import (
    PARAM_BOUNDS,
    VALID_OPS,
    EnhancementParams,
    EnhancementPlan,
    ExplainabilityReport,
    IterationRecord,
    clamp,
)


class TestParamBounds:
    def test_keyset_is_the_ten_tunables(self):
        assert set(PARAM_BOUNDS) == {
            "clahe_clip_limit", "clahe_tile_size", "gamma", "unsharp_radius",
            "unsharp_amount", "post_denoise_strength", "bilateral_d",
            "bilateral_sigma_color", "bilateral_sigma_space",
            "tv_denoise_weight"}

    def test_bounds_ordered(self):
        for key, (lo, hi) in PARAM_BOUNDS.items():
            assert lo < hi, key

    def test_clamp(self):
        lo, hi = PARAM_BOUNDS["gamma"]
        assert clamp(-100.0, "gamma") == lo
        assert clamp(100.0, "gamma") == hi
        assert clamp((lo + hi) / 2, "gamma") == (lo + hi) / 2


class TestEnhancementParams:
    def test_defaults_within_bounds(self):
        p = EnhancementParams()
        for key, (lo, hi) in PARAM_BOUNDS.items():
            v = getattr(p, key)
            assert lo <= v <= hi, key

    def test_clamped_copy(self):
        p = EnhancementParams(clahe_clip_limit=5.0, unsharp_amount=99.0)
        c = p.clamped()
        assert c.clahe_clip_limit == PARAM_BOUNDS["clahe_clip_limit"][1]
        assert c.unsharp_amount == PARAM_BOUNDS["unsharp_amount"][1]
        # original untouched
        assert p.clahe_clip_limit == 5.0


class TestEnhancementPlan:
    def test_json_round_trip(self, valid_plan_dict):
        plan = EnhancementPlan.model_validate(valid_plan_dict)
        again = EnhancementPlan.model_validate_json(plan.model_dump_json())
        assert again == plan

    def test_required_field_rejected(self):
        with pytest.raises(ValidationError):
            EnhancementPlan.model_validate({})

    def test_normalized_ops_filters_invalid(self):
        plan = EnhancementPlan(recommended_ops=["DENOISE", " clahe ",
                                                "sorcery"])
        assert plan.normalized_ops() == ["denoise", "clahe"]
        assert set(VALID_OPS) >= set(plan.normalized_ops())

    def test_to_static_dynamic_lowering(self, valid_plan_dict):
        plan = EnhancementPlan.model_validate(valid_plan_dict)
        static, dyn = plan.to_static_dynamic()
        assert static.ops == ("denoise", "clahe", "unsharp")
        assert static.bilateral_d == 0  # bilateral not in ops
        assert float(dyn.clahe_clip_limit) == pytest.approx(0.02)

    def test_stop_reason_plan(self):
        plan = EnhancementPlan(recommended_ops=[], stop_reason="fine as-is")
        assert plan.normalized_ops() == []
        assert plan.stop_reason == "fine as-is"


class TestOtherSchemas:
    def test_iteration_record(self, valid_plan_dict):
        rec = IterationRecord(
            iteration=1,
            plan=EnhancementPlan.model_validate(valid_plan_dict),
            score=1.25, chosen=True)
        data = json.loads(rec.model_dump_json())
        assert data["iteration"] == 1 and data["chosen"] is True

    def test_explainability_requires_core_fields(self):
        with pytest.raises(ValidationError):
            ExplainabilityReport.model_validate({"detected_issues": "x"})
        rep = ExplainabilityReport(
            detected_issues="a", corrective_measures="b",
            enhancement_applied="c", validation_outcome="d",
            limitations="e")
        assert rep.actionable_suggestions == []
