"""Fused end-to-end QA steps — the framework's flagship compiled programs.

Each function here is one ``jax.jit``-compiled program over a batched
``[N, H, W]`` array, replacing whole multi-pass host loops of the reference
(SURVEY.md §3.1-3.2):

* :func:`detect` — fused 16-metric pass + threshold issue masks.
* :func:`qa_deterministic` — detect → issue-driven enhance → validate →
  objective, i.e. the reference's entire 5-agent numeric flow
  (core_agents.py:61-161) in one device program.
* :func:`qa_plan` — plan-driven enhance → validate → objective: one GenAI
  tuning iteration (BASELINE.json config 4) fully on device.  Because plan
  parameters are traced per-image vectors, a *batch of candidate plans* for
  the same image — or one plan across a batch of slices — costs one call.

Static plan structure (ops set, tile size, bilateral diameter) keys the jit
cache; everything else is data.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from mdx.core import enhance as E
from mdx.core import metrics as M
from mdx.core.batching import map_subbatches
from mdx.core.validate import validate as _validate
from mdx.core.score import objective_score


def _detect_body(x: jnp.ndarray):
    stats = M.image_stats(x)
    return stats, M.detect_issues(stats)


@jax.jit
def detect(x: jnp.ndarray):
    """[N,H,W] → (stats dict incl. 16 metrics, issue masks)."""
    return map_subbatches(_detect_body, x)


def _qa_deterministic_body(x: jnp.ndarray):
    stats = M.image_stats(x)
    issues = M.detect_issues(stats)
    enhanced, flags = E.apply_issue_driven(x, issues)
    any_issue = jnp.stack([issues[k] for k in M.ISSUE_ORDER]).any(axis=0)
    # reference semantics: no issues → image passes through unchanged
    enhanced = jnp.where(any_issue[:, None, None], enhanced, x)
    validation = _validate(x, enhanced, stats_before=stats)
    score, breakdown = objective_score(validation)
    return enhanced, stats, issues, flags, validation, score


@jax.jit
def qa_deterministic(x: jnp.ndarray):
    """Full deterministic QA: one compiled program.

    Returns (enhanced, stats_before, issues, flags, validation, score).
    Internally re-runs the fused pass over ≤32-image groups — XLA's
    fusion degrades super-linearly past that batch (mdx/core/batching.py).
    """
    return map_subbatches(_qa_deterministic_body, x)


def _qa_plan_body(x, dyn, *, static):
    # one metric pass on x, shared by the over-processing guard and the
    # validation before-stats (Pallas custom-calls don't CSE across uses)
    stats = M.image_stats(x)
    enhanced, flags = E.apply_plan(x, static, dyn,
                                   niqe_before=stats["niqe"])
    validation = _validate(x, enhanced, stats_before=stats)
    score, _ = objective_score(validation)
    return enhanced, flags, validation, score


@partial(jax.jit, static_argnames=("static",))
def qa_plan(x: jnp.ndarray, static: E.PlanStatic, dyn: E.PlanDynamic):
    """One plan-driven tuning iteration fully on device.

    Returns (enhanced, guard flags, validation, score).
    """
    return map_subbatches(partial(_qa_plan_body, static=static), x, dyn)


@partial(jax.jit, static_argnames=("static",))
def enhance_only(x: jnp.ndarray, static: E.PlanStatic, dyn: E.PlanDynamic):
    """Plan-driven enhancement without validation (apply-tool path)."""
    return E.apply_plan(x, static, dyn)
