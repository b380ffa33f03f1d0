"""Batched 7-op enhancement chain with on-device safeguards (JAX).

Reference contract: ``pipeline/enhancement.py`` —
issue-driven chain :151-227, plan-driven chain :235-369, safeguards
:50-72,319-367, light denoise :80-94.

TPU-first design:

* **Static vs dynamic split.**  Which ops run (``PlanStatic.ops``), the
  CLAHE tile size, the bilateral diameter and the wavelet are *static* (part
  of the jit cache key: a handful of compiled variants).  Every continuous
  parameter (``PlanDynamic``) is a traced scalar or per-image ``[N]`` vector
  — tuning iterations with new parameters never recompile.
* **Per-image gating.**  Each op takes an optional ``[N]`` bool mask and the
  result is ``jnp.where``-selected, so one compiled program serves a batch
  whose images need different subsets of ops (the deterministic issue path)
  or carry different candidate plans (the vectorised tuning loop).
* **Safeguards as whole-batch conditionals.**  The halo re-run and the
  noise-amplification fix execute under ``lax.cond(jnp.any(mask), ...)`` —
  when no image in the batch trips a guard, the extra work is skipped at
  runtime; when some do, the re-computation happens once for the batch and
  is blended per-image.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import NamedTuple

import jax.numpy as jnp
from jax import lax

from mdx.ops.bilateral import bilateral as _bilateral
from mdx.ops.clahe import clahe as _clahe
from mdx.ops import filters as _f
from mdx.ops.tv import tv_chambolle as _tv_chambolle
from mdx.ops import wavelet as _w

OP_ORDER = ("denoise", "clahe", "gamma", "unsharp", "post_denoise",
            "bilateral", "tv_denoise")


@dataclass(frozen=True)
class PlanStatic:
    """Static (compile-time) part of an enhancement plan."""
    ops: tuple[str, ...] = OP_ORDER
    tile_size: int = 16
    bilateral_d: int = 0
    # halo re-run order: the reference re-applies ops in *plan order*
    # (pipeline/enhancement.py:326-351); keep the plan's op order here.
    plan_order: tuple[str, ...] | None = None
    # TV solve mode: "ref" = reference parity (default), "fast" =
    # relaxed-parity iteration cap (mdx/ops/tv.py TV_MODES; opt-in via
    # MDX_TV_MODE at plan lowering).  Static → part of the jit cache key.
    tv_mode: str = "ref"

    def order(self) -> tuple[str, ...]:
        return self.plan_order if self.plan_order is not None else tuple(
            o for o in OP_ORDER if o in self.ops)


class PlanDynamic(NamedTuple):
    """Traced plan parameters; scalars or per-image [N] vectors."""
    clahe_clip_limit: jnp.ndarray = 0.015
    gamma: jnp.ndarray = 1.0
    unsharp_radius: jnp.ndarray = 0.8
    unsharp_amount: jnp.ndarray = 0.5
    post_denoise_strength: jnp.ndarray = 0.3
    bilateral_sigma_color: jnp.ndarray = 0.05
    bilateral_sigma_space: jnp.ndarray = 0.05
    tv_denoise_weight: jnp.ndarray = 0.0
    denoise_soft: jnp.ndarray = True  # per-image soft/hard select


def _as_n(v, n, dtype=jnp.float32):
    return jnp.broadcast_to(jnp.asarray(v, dtype), (n,))


def _sel(mask, a, b):
    return jnp.where(mask[:, None, None], a, b)


def light_denoise(x: jnp.ndarray, strength: jnp.ndarray) -> jnp.ndarray:
    """(1−s)·x + s·wavelet_denoise(x, σ=σ̂/2); no-op where σ̂ < 1e-3
    (ref pipeline/enhancement.py:80-94)."""
    n = x.shape[0]
    strength = _as_n(strength, n, x.dtype)
    sigma_est = _w.estimate_sigma(x)
    den = _w.denoise_wavelet(x, sigma=sigma_est * 0.5, mode="soft")
    blended = (1.0 - strength)[:, None, None] * x + strength[:, None, None] * den
    return _sel(sigma_est < 0.001, x, blended)


def _run_chain(
    x: jnp.ndarray,
    order: tuple[str, ...],
    static: PlanStatic,
    dyn: PlanDynamic,
    masks: dict[str, jnp.ndarray],
    unsharp_amount: jnp.ndarray,
) -> jnp.ndarray:
    """Apply the (statically selected) ops in ``order`` with per-image masks."""
    n = x.shape[0]
    out = x
    for op in order:
        if op not in static.ops:
            continue
        m = masks[op]
        if op == "denoise":
            y = _w.denoise_wavelet(out, sigma=None,
                                   soft_mask=_as_n(dyn.denoise_soft, n, bool))
        elif op == "clahe":
            y = _clahe(out, _as_n(dyn.clahe_clip_limit, n), static.tile_size)
        elif op == "gamma":
            g = _as_n(dyn.gamma, n)
            m = jnp.logical_and(m, jnp.abs(g - 1.0) > 1e-4)
            y = _f.adjust_gamma(out, g)
        elif op == "unsharp":
            y = _f.unsharp_mask(out, _as_n(dyn.unsharp_radius, n),
                                _as_n(unsharp_amount, n))
        elif op == "post_denoise":
            s = _as_n(dyn.post_denoise_strength, n)
            m = jnp.logical_and(m, s > 0)
            y = light_denoise(out, s)
        elif op == "bilateral":
            if static.bilateral_d <= 0:
                continue
            y = _bilateral(out, static.bilateral_d,
                              _as_n(dyn.bilateral_sigma_color, n),
                              _as_n(dyn.bilateral_sigma_space, n))
        elif op == "tv_denoise":
            from mdx.ops.tv import tv_mode_params

            w = _as_n(dyn.tv_denoise_weight, n)
            m = jnp.logical_and(m, w > 0)
            tv_eps, tv_iter = tv_mode_params(static.tv_mode)
            y = _tv_chambolle(out, jnp.maximum(w, 1e-6),
                              eps=tv_eps, max_iter=tv_iter)
        else:
            raise ValueError(f"unknown op {op!r}")
        out = _sel(m, y, out)
    return out


# Safeguard formulas shared with the metric pass (single source of truth —
# a tweak to the NIQE approximation must move the guards and the reported
# niqe together).
from mdx.core.metrics import compute_edge_ratio as _edge_ratio  # noqa: E402
from mdx.core.metrics import compute_niqe as _niqe  # noqa: E402


def apply_plan(
    x: jnp.ndarray,
    static: PlanStatic,
    dyn: PlanDynamic,
    masks: dict[str, jnp.ndarray] | None = None,
    niqe_before: jnp.ndarray | None = None,
) -> tuple[jnp.ndarray, dict[str, jnp.ndarray]]:
    """Plan-driven chain + 3 safeguards (ref pipeline/enhancement.py:235-369).

    Returns (enhanced [N,H,W], guard flags {halo, noise_amp, over_processed}
    as [N] bools for reporting).  ``niqe_before``: precomputed
    ``compute_niqe(x)`` (e.g. ``stats["niqe"]`` from the metric pass) —
    callers that already ran image_stats pass it to avoid re-running the
    box-stats kernel on x (Pallas custom-calls are opaque to XLA CSE).
    """
    n = x.shape[0]
    if masks is None:
        masks = {}
    masks = {op: _as_n(masks.get(op, True), n, bool) for op in OP_ORDER}
    fixed_order = tuple(o for o in OP_ORDER if o in static.ops)

    # Split the chain at 'unsharp': when the halo re-run order equals the
    # fixed order (true for the deterministic path and any plan listing ops
    # in pipeline order), the ops before unsharp are a pure function of the
    # ORIGINAL image and identical in both runs — the re-run can resume from
    # the cached prefix instead of repeating denoise/CLAHE/gamma
    # (bit-identical to the reference's full re-run from x,
    # ref pipeline/enhancement.py:326-353).
    rerun_order = static.order()
    u_at = fixed_order.index("unsharp") if "unsharp" in fixed_order else -1
    prefix_reusable = (u_at >= 0
                       and rerun_order[:u_at + 1] == fixed_order[:u_at + 1])

    if prefix_reusable:
        pre = _run_chain(x, fixed_order[:u_at], static, dyn, masks,
                         dyn.unsharp_amount)
        suffix = fixed_order[u_at:]
        out = jnp.clip(_run_chain(pre, suffix, static, dyn, masks,
                                  dyn.unsharp_amount), 0.0, 1.0)
    else:
        pre = x
        suffix = fixed_order
        out = jnp.clip(_run_chain(x, fixed_order, static, dyn, masks,
                                  dyn.unsharp_amount), 0.0, 1.0)

    # Safeguard 1: halo → re-run the chain (in plan order) with halved amount
    if "unsharp" in static.ops:
        halo = jnp.logical_and(_edge_ratio(out) > 1.5, masks["unsharp"])

        def _rerun(operand):
            x0, prev = operand
            if prefix_reusable:
                # resume from the shared prefix; only unsharp onwards redoes
                redo = _run_chain(x0, suffix, static, dyn, masks,
                                  _as_n(dyn.unsharp_amount, n) * 0.5)
            else:
                redo = _run_chain(x0, rerun_order, static, dyn, masks,
                                  _as_n(dyn.unsharp_amount, n) * 0.5)
            return _sel(halo, jnp.clip(redo, 0.0, 1.0), prev)

        out = lax.cond(jnp.any(halo), _rerun, lambda o: o[1],
                       (pre if prefix_reusable else x, out))
    else:
        halo = jnp.zeros((n,), bool)

    # Safeguard 2: noise amplification → corrective light denoise
    sigma_before = _w.estimate_sigma(x)
    sigma_after = _w.estimate_sigma(out)
    noise_amp = jnp.logical_and(sigma_before >= 1e-8,
                                sigma_after > sigma_before * 1.3)

    def _fix_noise(prev):
        return _sel(noise_amp, jnp.clip(light_denoise(prev, 0.4), 0.0, 1.0), prev)

    out = lax.cond(jnp.any(noise_amp), _fix_noise, lambda o: o, out)

    # Safeguard 3: over-processing (NIQE degraded > 0.5) → blend back 40%
    if niqe_before is None:
        niqe_before = _niqe(x)
    over = (_niqe(out) - niqe_before) > 0.5
    out = _sel(over, jnp.clip(0.6 * out + 0.4 * x, 0.0, 1.0), out)

    return out, {"halo": halo, "noise_amp": noise_amp, "over_processed": over}


# Deterministic defaults (ref pipeline/enhancement.py:32-42)
DETERMINISTIC_DEFAULTS = dict(
    clahe_clip_limit=0.015, clahe_tile_size=16,
    gamma_brighten=0.95, gamma_darken=1.05,
    unsharp_radius=0.8, unsharp_amount=0.5,
    post_denoise_strength=0.3,
)


def apply_issue_driven(
    x: jnp.ndarray, issues: dict[str, jnp.ndarray]
) -> tuple[jnp.ndarray, dict[str, jnp.ndarray]]:
    """Issue-driven deterministic chain (ref pipeline/enhancement.py:151-227).

    ``issues`` are per-image bool masks from :func:`mdx.core.metrics.detect_issues`.
    Only the noise-amplification guard applies on this path (reference parity).
    Returns (enhanced, {op masks + guard flags}).
    """
    n = x.shape[0]
    P = DETERMINISTIC_DEFAULTS
    noise = issues["noise"]
    blur = issues["blur"]
    needs_contrast = issues["low_contrast"] | issues["clipping_low"] | issues["clipping_high"]
    brighten = issues["clipping_low"] & ~issues["clipping_high"]
    darken = issues["clipping_high"] & ~issues["clipping_low"]
    gamma = jnp.where(brighten, P["gamma_brighten"],
                      jnp.where(darken, P["gamma_darken"], 1.0)).astype(x.dtype)

    static = PlanStatic(ops=("denoise", "clahe", "gamma", "unsharp", "post_denoise"),
                        tile_size=P["clahe_tile_size"])
    dyn = PlanDynamic(
        clahe_clip_limit=P["clahe_clip_limit"],
        gamma=gamma,
        unsharp_radius=P["unsharp_radius"],
        unsharp_amount=P["unsharp_amount"],
        post_denoise_strength=P["post_denoise_strength"],
    )
    masks = {
        "denoise": noise,
        "clahe": needs_contrast,
        "gamma": brighten | darken,
        "unsharp": blur,
        "post_denoise": blur,
        "bilateral": jnp.zeros((n,), bool),
        "tv_denoise": jnp.zeros((n,), bool),
    }
    out = jnp.clip(_run_chain(x, static.order(), static, dyn, masks,
                              dyn.unsharp_amount), 0.0, 1.0)

    sigma_before = _w.estimate_sigma(x)
    sigma_after = _w.estimate_sigma(out)
    noise_amp = jnp.logical_and(sigma_before >= 1e-8,
                                sigma_after > sigma_before * 1.3)

    def _fix_noise(prev):
        return _sel(noise_amp, jnp.clip(light_denoise(prev, 0.4), 0.0, 1.0), prev)

    out = lax.cond(jnp.any(noise_amp), _fix_noise, lambda o: o, out)
    flags = dict(masks)
    flags["noise_amp"] = noise_amp
    return out, flags
