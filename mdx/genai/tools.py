"""LLM function tools + opaque-ID image store (ref pipeline/tools.py).

PHI firewall: the LLM only ever receives string image handles and numeric
metric summaries — pixels never leave the process (ref pipeline/tools.py:29
"never exposed to LLM").

TPU-first difference from the reference: each tool call is one fused XLA
program launch — ``tool_apply_enhancement`` runs the whole 7-op chain +
safeguards + post-metrics as a single device program
(:func:`mdx.core.qa.enhance_only` + metrics), and ``tool_validate`` is one
fused before/after validation pass, instead of the reference's ~3 separate
full-image sweeps per tuning iteration (SURVEY.md §3.2).
"""

from __future__ import annotations

import json
import logging
import threading
import uuid
from typing import Any

import numpy as np

from mdx.pipeline.schemas import PARAM_BOUNDS, EnhancementPlan

logger = logging.getLogger(__name__)

# The store is THREAD-LOCAL: the run executor (mdx/serve/executor.py) and
# the legacy UI run up to MDX_MAX_CONCURRENT_RUNS GenAI pipelines on
# parallel worker threads, each of which registers its image under the
# fixed key "original".  A process-global dict would let run B overwrite
# run A's pixels (enhancing the wrong patient's image) and let whichever
# run finishes first clear the other's store mid-tuning.
_STORE_TLS = threading.local()


def _store() -> dict[str, np.ndarray]:
    store = getattr(_STORE_TLS, "images", None)
    if store is None:
        store = {}
        _STORE_TLS.images = store
    return store


def register_image(image: np.ndarray, name: str | None = None) -> str:
    key = name or f"img_{uuid.uuid4().hex[:8]}"
    _store()[key] = np.array(image, copy=True)
    return key


def get_image(image_id: str) -> np.ndarray:
    store = _store()
    if image_id not in store:
        raise KeyError(f"Image '{image_id}' not found in store.")
    return store[image_id]


def clear_image_store() -> None:
    _store().clear()


def clamp_plan(plan: EnhancementPlan) -> EnhancementPlan:
    """Clamp every numeric parameter to PARAM_BOUNDS and normalise the
    denoise mode — never trust the LLM (ref pipeline/tools.py:56-69; the
    same clamp runs again inside the device chain lowering,
    mdx/pipeline/schemas.py to_static_dynamic: clamp twice by design)."""
    p = plan.params.model_copy()
    for field_name, (lo, hi) in PARAM_BOUNDS.items():
        val = getattr(p, field_name, None)
        if isinstance(val, (int, float)):
            setattr(p, field_name, type(val)(max(lo, min(hi, val))))
    if p.denoise_mode not in ("soft", "hard"):
        p.denoise_mode = "soft"
    return plan.model_copy(update={"params": p})


def _to_float_dict(d: dict[str, Any], i: int = 0) -> dict[str, float]:
    out = {}
    for k, v in d.items():
        if isinstance(v, dict):
            continue
        arr = np.asarray(v)
        val = arr.reshape(-1)[i] if arr.ndim else arr[()]
        out[k] = bool(val) if arr.dtype == np.bool_ else round(float(val), 6)
    return out


# ---------------------------------------------------------------------------
# The four tools.  Each returns a JSON string (the LLM-facing contract).
# ---------------------------------------------------------------------------


def tool_get_metrics(image_id: str) -> str:
    """Compute the 16 quality metrics for a stored image → JSON."""
    try:
        import jax.numpy as jnp

        from mdx.core.metrics import METRIC_KEYS, image_stats

        stats = image_stats(jnp.asarray(get_image(image_id),
                                        jnp.float32)[None])
        return json.dumps({k: round(float(np.asarray(stats[k])[0]), 6)
                           for k in METRIC_KEYS})
    except Exception as exc:
        return json.dumps({"error": str(exc)})


def tool_apply_enhancement(image_id: str, plan_json: str) -> str:
    """Apply a (clamped) plan on-device; store result → JSON with
    enhanced_image_id, applied_ops, metrics."""
    try:
        import jax.numpy as jnp

        from mdx.core.metrics import METRIC_KEYS, image_stats
        from mdx.core.qa import enhance_only

        image = get_image(image_id)
        plan = clamp_plan(EnhancementPlan.model_validate_json(plan_json))
        static, dyn = plan.to_static_dynamic()
        x = jnp.asarray(image, jnp.float32)[None]
        enhanced, flags = enhance_only(x, static, dyn)
        enhanced_np = np.asarray(enhanced[0])
        enhanced_id = register_image(enhanced_np,
                                     f"enhanced_{uuid.uuid4().hex[:6]}")
        applied = list(static.ops)
        for guard in ("halo", "noise_amp", "over_processed"):
            if bool(np.asarray(flags[guard])[0]):
                applied.append(f"[safeguard] {guard}")
        metrics = image_stats(jnp.asarray(enhanced_np, jnp.float32)[None])
        return json.dumps({
            "enhanced_image_id": enhanced_id,
            "applied_ops": applied,
            "metrics": {k: round(float(np.asarray(metrics[k])[0]), 6)
                        for k in METRIC_KEYS},
        })
    except Exception as exc:
        logger.exception("tool_apply_enhancement failed")
        return json.dumps({"error": str(exc)})


def tool_validate(original_id: str, enhanced_id: str) -> str:
    """Fused before/after validation → JSON (nested metric dicts stripped,
    ref pipeline/tools.py:140-146)."""
    try:
        import jax.numpy as jnp

        from mdx.core.validate import validate

        original = get_image(original_id)
        enhanced = get_image(enhanced_id)
        v = validate(jnp.asarray(original, jnp.float32)[None],
                     jnp.asarray(enhanced, jnp.float32)[None])
        return json.dumps(_to_float_dict(v))
    except Exception as exc:
        logger.exception("tool_validate failed")
        return json.dumps({"error": str(exc)})


def tool_score_plan(validation_json: str) -> str:
    """Scalar objective score from a validation dict → JSON."""
    try:
        from mdx.core.score import objective_score

        v = json.loads(validation_json)
        if "error" in v:
            return json.dumps({"score": -100.0, "breakdown": {},
                               "error": v["error"]})
        score, breakdown = objective_score(
            {k: np.float32(val) if not isinstance(val, bool) else np.bool_(val)
             for k, val in v.items()})
        return json.dumps({
            "score": round(float(np.asarray(score)), 4),
            "breakdown": {k: round(float(np.asarray(b)), 4)
                          for k, b in breakdown.items()},
        })
    except Exception as exc:
        return json.dumps({"score": -100.0, "error": str(exc)})


# OpenAI tool schemas for the agent loop ------------------------------------

TOOL_SCHEMAS = {
    "tool_get_metrics": {
        "type": "function",
        "function": {
            "name": "tool_get_metrics",
            "description": "Compute quality metrics for a stored image.",
            "parameters": {
                "type": "object",
                "properties": {"image_id": {"type": "string"}},
                "required": ["image_id"],
            },
        },
    },
    "tool_apply_enhancement": {
        "type": "function",
        "function": {
            "name": "tool_apply_enhancement",
            "description": "Apply an EnhancementPlan JSON to a stored image;"
                           " returns the enhanced image id and its metrics.",
            "parameters": {
                "type": "object",
                "properties": {
                    "image_id": {"type": "string"},
                    "plan_json": {"type": "string"},
                },
                "required": ["image_id", "plan_json"],
            },
        },
    },
    "tool_validate": {
        "type": "function",
        "function": {
            "name": "tool_validate",
            "description": "Validate an enhanced image against the original"
                           " (SSIM, PSNR, NIQE, quality gains).",
            "parameters": {
                "type": "object",
                "properties": {
                    "original_id": {"type": "string"},
                    "enhanced_id": {"type": "string"},
                },
                "required": ["original_id", "enhanced_id"],
            },
        },
    },
    "tool_score_plan": {
        "type": "function",
        "function": {
            "name": "tool_score_plan",
            "description": "Scalar objective score (higher = better) from a"
                           " validation JSON.",
            "parameters": {
                "type": "object",
                "properties": {"validation_json": {"type": "string"}},
                "required": ["validation_json"],
            },
        },
    },
}

TOOL_IMPLS = {
    "tool_get_metrics": tool_get_metrics,
    "tool_apply_enhancement": tool_apply_enhancement,
    "tool_validate": tool_validate,
    "tool_score_plan": tool_score_plan,
}
