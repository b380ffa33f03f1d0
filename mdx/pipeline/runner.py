"""Unified pipeline runner — single entry point for CLI and the API server.

Ref pipeline/runner.py: ``run_pipeline()`` encapsulates
load → detect → enhance → validate → report → artifacts → DB.

Differences by design:
* detection + enhancement + validation execute as one fused device program
  (:func:`mdx.core.qa.qa_deterministic`) instead of ≈5 host passes;
* ``run_id`` is an explicit parameter (no process-global monkey-patching —
  the reference's benign id race, backend/pipeline_runner.py:75-89, is
  designed out);
* batch/series execution (:func:`run_pipeline_batch`) shards all frames of
  a multi-frame series across the device mesh instead of discarding them.
"""

from __future__ import annotations

import logging
import os
from typing import Any

import numpy as np
import jax.numpy as jnp

from mdx.core import qa
from mdx.core.metrics import ISSUE_ORDER, METRIC_KEYS
from mdx.io import build_markdown_report, load_dicom, normalize_image, save_visuals
from mdx.pipeline import storage
from mdx.pipeline.agents import (
    DetectionResult,
    RecommendationAgent,
    _metrics_dict,
    build_validation_result,
    issue_op_labels,
)
from mdx.pipeline.trace import AgentTraceLogger

logger = logging.getLogger(__name__)


def run_pipeline(
    input_path: str,
    output_dir: str = "outputs",
    *,
    genai: bool = False,
    model: str | None = None,
    max_iters: int = 4,
    plan_only: bool = False,
    save_artifacts: bool = True,
    no_show: bool = True,
    run_id: str | None = None,
    autotune: bool = False,
) -> dict[str, Any]:
    """Run the full medical imaging QA pipeline on one DICOM file.

    Same signature/behaviour as the reference entry point
    (pipeline/runner.py:33-117), plus an explicit optional ``run_id`` and
    the mdx-only ``autotune`` mode (LLM-free on-device parameter sweep,
    mdx/core/tuning.py).
    """
    from mdx.pipeline.compile_cache import enable as _enable_compile_cache
    _enable_compile_cache()
    storage.init_db()
    run_id = run_id or storage.generate_run_id()
    base_name = os.path.splitext(os.path.basename(input_path))[0]

    image_raw, metadata = load_dicom(input_path)
    image = normalize_image(image_raw)

    if autotune:
        return _run_autotune_path(
            run_id=run_id, image=image, metadata=metadata,
            input_path=input_path, output_dir=output_dir,
            base_name=base_name, save_artifacts=save_artifacts)
    if genai:
        return _run_genai_path(
            run_id=run_id, image=image, metadata=metadata, model=model,
            max_iters=max_iters, plan_only=plan_only, input_path=input_path,
            output_dir=output_dir, base_name=base_name,
            save_artifacts=save_artifacts)
    return _run_deterministic_path(
        run_id=run_id, image=image, metadata=metadata, input_path=input_path,
        output_dir=output_dir, base_name=base_name,
        save_artifacts=save_artifacts)


def _run_deterministic_path(
    *, run_id, image, metadata, input_path, output_dir, base_name,
    save_artifacts,
) -> dict[str, Any]:
    import jax

    from mdx.pipeline.profiler import maybe_profile, phase_timer

    trace = AgentTraceLogger()
    x = jnp.asarray(image, jnp.float32)[None]
    with maybe_profile("qa_deterministic"), \
            phase_timer(trace, "device_qa",
                        sync=lambda: jax.block_until_ready(enhanced_dev)):
        enhanced_dev, stats, issue_masks, flags, validation_dev, _score = (
            qa.qa_deterministic(x))

    issues = [k for k in ISSUE_ORDER if bool(issue_masks[k][0])]
    metrics_before = _metrics_dict(stats)
    recommendations = RecommendationAgent().run(
        DetectionResult(issues=issues, metrics=metrics_before))

    if issues:
        enhanced_image = np.asarray(enhanced_dev[0])
        applied_ops = issue_op_labels(issues, flags)
        metrics_after = {k: float(np.asarray(validation_dev["metrics_after"][k])[0])
                         for k in METRIC_KEYS}
    else:
        enhanced_image = image
        applied_ops = []
        metrics_after = metrics_before

    validation = build_validation_result(validation_dev, issues)

    visuals: dict[str, str] = {}
    report_path = ""
    before_after_path = ""
    if save_artifacts:
        os.makedirs(output_dir, exist_ok=True)
        visuals = save_visuals(image, enhanced_image, output_dir, base_name)
        before_after_path = visuals.get("before_after", "")

    context: dict[str, Any] = {
        "run_id": run_id,
        "input_path": input_path,
        "metadata": metadata,
        "issues": issues,
        "recommendations": recommendations.recommendations,
        "applied_ops": applied_ops,
        "metrics_before": metrics_before,
        "metrics_after": metrics_after,
        "validation": validation,
        "visuals": visuals,
        "notes": validation.notes,
        "enhanced_image": enhanced_image,
        "original_image": image,
    }
    context["report_md"] = build_markdown_report(context)

    if save_artifacts:
        report_path = os.path.join(output_dir, f"{base_name}_report.md")
        with open(report_path, "w", encoding="utf-8") as f:
            f.write(context["report_md"])
        context["report_path"] = report_path
        _persist_run(
            run_id=run_id, input_filename=os.path.basename(input_path),
            metadata=metadata, issues=issues, metrics_before=metrics_before,
            metrics_after=metrics_after, plan_json="", validation=validation,
            applied_ops=applied_ops, explainability={},
            report_path=report_path, before_after_path=before_after_path,
            agent_logs=trace.to_list(), status=validation.status)
    return context


def _run_autotune_path(
    *, run_id, image, metadata, input_path, output_dir, base_name,
    save_artifacts,
) -> dict[str, Any]:
    """LLM-free tuning: detect → one-program candidate sweep → validate."""
    import jax

    from mdx.core.tuning import autotune as _autotune
    from mdx.core.validate import validate as _validate
    from mdx.pipeline.profiler import phase_timer

    trace = AgentTraceLogger()
    x = jnp.asarray(image, jnp.float32)[None]
    stats, issue_masks = qa.detect(x)
    issues = [k for k in ISSUE_ORDER if bool(issue_masks[k][0])]
    metrics_before = _metrics_dict(stats)

    with phase_timer(trace, "autotune_sweep"):
        best_plan, enhanced_image, records = _autotune(image, issues)
        jax.block_until_ready(enhanced_image) if hasattr(
            enhanced_image, "block_until_ready") else None
    trace.log_info("autotune",
                   f"{len(records)} candidates in one device program; "
                   f"best score {max(r.score for r in records):.4f}")

    vdev = _validate(x, jnp.asarray(enhanced_image, jnp.float32)[None])
    validation = build_validation_result(vdev, issues)
    metrics_after = {k: float(np.asarray(vdev["metrics_after"][k])[0])
                     for k in METRIC_KEYS}

    visuals: dict[str, str] = {}
    report_path = ""
    before_after_path = ""
    if save_artifacts:
        os.makedirs(output_dir, exist_ok=True)
        visuals = save_visuals(image, enhanced_image, output_dir, base_name)
        before_after_path = visuals.get("before_after", "")

    context: dict[str, Any] = {
        "run_id": run_id,
        "input_path": input_path,
        "metadata": metadata,
        "issues": issues,
        "recommendations": [best_plan.rationale],
        "applied_ops": best_plan.normalized_ops(),
        "metrics_before": metrics_before,
        "metrics_after": metrics_after,
        "validation": validation,
        "visuals": visuals,
        "notes": validation.notes,
        "enhanced_image": enhanced_image,
        "original_image": image,
        "genai_plan": best_plan,
        "genai_iterations": records,
        "genai_model": "on-device autotune",
        "autotune": True,
    }
    context["report_md"] = build_markdown_report(context)

    if save_artifacts:
        report_path = os.path.join(output_dir, f"{base_name}_report.md")
        with open(report_path, "w", encoding="utf-8") as f:
            f.write(context["report_md"])
        context["report_path"] = report_path
        _persist_run(
            run_id=run_id, input_filename=os.path.basename(input_path),
            metadata=metadata, issues=issues, metrics_before=metrics_before,
            metrics_after=metrics_after,
            plan_json=best_plan.model_dump_json(indent=2),
            validation=validation, applied_ops=best_plan.normalized_ops(),
            explainability={}, report_path=report_path,
            before_after_path=before_after_path,
            agent_logs=trace.to_list(), status=validation.status,
            genai_model="on-device autotune")
    return context


def _run_genai_path(
    *, run_id, image, metadata, model, max_iters, plan_only, input_path,
    output_dir, base_name, save_artifacts,
) -> dict[str, Any]:
    from mdx.genai.orchestrator import run_genai_pipeline

    trace_logger = AgentTraceLogger()
    stats, issue_masks = qa.detect(jnp.asarray(image, jnp.float32)[None])
    issues = [k for k in ISSUE_ORDER if bool(issue_masks[k][0])]
    metrics_before = _metrics_dict(stats)

    result = run_genai_pipeline(
        image=image, metadata=metadata, issues=issues, metrics=metrics_before,
        model=model, max_iters=max_iters, plan_only=plan_only,
        trace_logger=trace_logger)

    if result.fell_back_to_deterministic:
        logger.warning("GenAI pipeline failed (%s) — deterministic fallback.",
                       result.error)
        ctx = _run_deterministic_path(
            run_id=run_id, image=image, metadata=metadata,
            input_path=input_path, output_dir=output_dir,
            base_name=base_name, save_artifacts=save_artifacts)
        ctx["genai_error"] = result.error
        ctx["genai_fell_back"] = True
        return ctx

    if result.plan_only and result.plan:
        return {"run_id": run_id, "plan_only": True, "plan": result.plan,
                "stop_reason": result.plan.stop_reason}

    enhanced_image = (result.enhanced_image if result.enhanced_image is not None
                      else image)
    metrics_after = result.enhanced_metrics or metrics_before

    from mdx.core.validate import validate as _validate
    vdev = _validate(jnp.asarray(image, jnp.float32)[None],
                     jnp.asarray(enhanced_image, jnp.float32)[None])
    validation = build_validation_result(vdev, issues)

    visuals: dict[str, str] = {}
    report_path = ""
    before_after_path = ""
    if save_artifacts:
        os.makedirs(output_dir, exist_ok=True)
        visuals = save_visuals(image, enhanced_image, output_dir, base_name)
        before_after_path = visuals.get("before_after", "")

    recommendations_text: list[str] = []
    if result.best_plan:
        if result.best_plan.rationale:
            recommendations_text.append(result.best_plan.rationale)
        recommendations_text.extend(f"⚠️ {w}" for w in result.best_plan.risk_warnings)
    if not recommendations_text:
        recommendations_text = RecommendationAgent().run(
            DetectionResult(issues=issues,
                            metrics=metrics_before)).recommendations

    context: dict[str, Any] = {
        "run_id": run_id,
        "input_path": input_path,
        "metadata": metadata,
        "issues": issues,
        "recommendations": recommendations_text,
        "applied_ops": result.applied_ops,
        "metrics_before": metrics_before,
        "metrics_after": metrics_after,
        "validation": validation,
        "visuals": visuals,
        "notes": validation.notes,
        "enhanced_image": enhanced_image,
        "original_image": image,
        "genai_plan": result.best_plan,
        "genai_iterations": result.iterations,
        "genai_model": result.model_name,
        "genai_max_iters": max_iters,
        "genai_llm_calls": result.llm_call_count,
        "genai_prompts": result.prompts_used,
        "genai_explainability": result.explainability,
        "agent_traces": result.agent_traces,
    }
    context["report_md"] = build_markdown_report(context)

    if save_artifacts:
        report_path = os.path.join(output_dir, f"{base_name}_report.md")
        with open(report_path, "w", encoding="utf-8") as f:
            f.write(context["report_md"])
        context["report_path"] = report_path

        expl_dict: dict[str, Any] = {}
        if result.explainability is not None:
            try:
                expl_dict = result.explainability.model_dump()
            except Exception:
                expl_dict = {"text": str(result.explainability)}
        plan_json_str = (result.best_plan.model_dump_json(indent=2)
                         if result.best_plan else "")
        _persist_run(
            run_id=run_id, input_filename=os.path.basename(input_path),
            metadata=metadata, issues=issues, metrics_before=metrics_before,
            metrics_after=metrics_after, plan_json=plan_json_str,
            validation=validation, applied_ops=result.applied_ops,
            explainability=expl_dict, report_path=report_path,
            before_after_path=before_after_path,
            agent_logs=result.agent_traces, status=validation.status,
            genai_model=result.model_name or "",
            genai_llm_calls=result.llm_call_count)
    return context


def _persist_run(*, run_id, input_filename, metadata, issues, metrics_before,
                 metrics_after, plan_json, validation, applied_ops,
                 explainability, report_path, before_after_path, agent_logs,
                 status="completed", genai_model="", genai_llm_calls=0) -> None:
    val_dict: dict[str, Any] = {}
    if hasattr(validation, "__dict__"):
        val_dict = {k: v for k, v in validation.__dict__.items()
                    if not k.startswith("_")}
    elif isinstance(validation, dict):
        val_dict = validation
    try:
        storage.save_run(
            run_id=run_id, input_filename=input_filename,
            metadata_summary=metadata, issues=issues,
            metrics_before=metrics_before, metrics_after=metrics_after,
            plan_json=plan_json, validation=val_dict, applied_ops=applied_ops,
            explainability=(explainability if isinstance(explainability, dict)
                            else {"text": str(explainability)}),
            report_path=report_path, before_after_path=before_after_path,
            agent_logs=agent_logs, status=status, genai_model=genai_model,
            genai_llm_calls=genai_llm_calls)
        logger.info("Run %s persisted to DB.", run_id)
    except Exception as exc:
        logger.error("Failed to persist run %s: %s", run_id, exc)
