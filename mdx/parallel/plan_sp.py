"""Plan-driven spatial QA: ``apply_plan`` + all three safeguards, sharded.

Mirrors the dense plan path (mdx/core/enhance.py apply_plan =
ref pipeline/enhancement.py:235-369) on the 1-D row-block or 2-D tile
mesh: the statically-selected op chain with per-image masks, then

1. **halo** — edge_ratio(out) > 1.5 & unsharp applied → re-run the chain
   in plan order with ``unsharp_amount × 0.5`` (full re-run from the
   original, bit-identical to the reference's),
2. **noise amplification** — σ_after > 1.3·σ_before → corrective
   ``light_denoise(0.4)``,
3. **over-processing** — NIQE degraded > 0.5 → blend back 40 % original,

followed by the full ~30-field validation
(``mdx.core.validate.validation_from_stats`` on the sharded stats) and
the tuning objective — i.e. one GenAI/autotune tuning iteration
(BASELINE config 4) for a slice too large for one chip.

SPMD safety: the dense guards' ``lax.cond(jnp.any(mask), …)`` predicates
become **psum'd global flags over the spatial AND data axes** before the
cond — the guard branches contain collectives (the re-run chain, the
corrective denoise), so every device of the launched program must take
the same branch (see mdx/parallel/tv_sp.py for the deadlock this
prevents; CLAUDE.md "uniform collective trip counts").
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import lru_cache, partial
from typing import Callable

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from mdx.core.enhance import OP_ORDER, PlanDynamic, PlanStatic, _as_n
from mdx.core.score import objective_score
from mdx.core.validate import validation_from_stats
from mdx.ops.filters import adjust_gamma
from mdx.parallel._spmd_stats import (
    SpatialPrims,
    image_stats_block as _shared_image_stats,
)
from mdx.parallel.clahe_sp import clahe_sharded
from mdx.parallel.tv_sp import tv_sharded
from mdx.ops.tv import resolve_tv_mode
from mdx.parallel.wavelet_sp import (
    denoise_wavelet_sharded,
    light_denoise_sharded,
)


@dataclass(frozen=True)
class Layout:
    """One spatial layout's primitive bundle (built by _layout_1d/_2d)."""

    row_axis: str
    col_axis: str | None
    prims: SpatialPrims
    blur: Callable        # (x, sigma) → Gaussian blur, skimage 'nearest'
    bilateral: Callable   # (x, d, sigma_color, sigma_space)
    ssim: Callable
    psnr: Callable

    @property
    def all_axes(self) -> tuple[str, ...]:
        sp = (self.row_axis,) if self.col_axis is None else (
            self.row_axis, self.col_axis)
        return sp + ("data",)


def _layout_1d() -> Layout:
    from mdx.parallel import spatial as m

    return Layout("space", None, m._PRIMS, m._gaussian_blur_halo,
                  m._bilateral_halo, m._ssim_block, m._psnr_block)


def _layout_2d() -> Layout:
    from mdx.parallel import spatial2d as m

    return Layout("sy", "sx", m._PRIMS, m._gaussian_blur_halo,
                  m._bilateral_halo, m._ssim_block, m._psnr_block)


def _edge_ratio_sp(x: jnp.ndarray, p: SpatialPrims) -> jnp.ndarray:
    """mean(|laplace|)/mean(grad_mag) on the tile grid → [N]
    (ref pipeline/metrics.py:213-217; halo-safeguard input)."""
    lap, gh, gv = p.lap_sobel(x)
    lap = p.pmean(jnp.abs(lap))
    grd = p.pmean(jnp.hypot(gh, gv))
    return lap / (grd + 1e-8)


def _niqe_sp(x: jnp.ndarray, p: SpatialPrims) -> jnp.ndarray:
    """NIQE approximation on the tile grid → [N]
    (ref pipeline/metrics.py:187-210; over-processing-safeguard input)."""
    lv = p.local_variance(x, 16)
    m, v = p.pvar(lv)
    cov = jnp.sqrt(v) / (m + 1e-8)
    return cov + jnp.maximum(_edge_ratio_sp(x, p) - 1.0, 0.0) * 10.0


def _run_chain_sp(x, order, static: PlanStatic, dyn: PlanDynamic, masks,
                  unsharp_amount, lay: Layout) -> jnp.ndarray:
    """The dense ``_run_chain`` (ref pipeline/enhancement.py:249-314) with
    every op replaced by its sharded equivalent; per-image masks select."""
    n = x.shape[0]
    out = x
    for op in order:
        if op not in static.ops:
            continue
        m = masks[op]
        if op == "denoise":
            y = denoise_wavelet_sharded(
                out, lay.row_axis, lay.col_axis, sigma=None,
                soft_mask=_as_n(dyn.denoise_soft, n, bool))
        elif op == "clahe":
            y = clahe_sharded(out, _as_n(dyn.clahe_clip_limit, n),
                              int(static.tile_size), lay.row_axis,
                              lay.col_axis)
        elif op == "gamma":
            g = _as_n(dyn.gamma, n)
            m = jnp.logical_and(m, jnp.abs(g - 1.0) > 1e-4)
            y = adjust_gamma(out, g)
        elif op == "unsharp":
            amt = _as_n(unsharp_amount, n)[:, None, None]
            y = jnp.clip(
                out + (out - lay.blur(out, dyn.unsharp_radius)) * amt,
                0.0, 1.0)
        elif op == "post_denoise":
            s = _as_n(dyn.post_denoise_strength, n)
            m = jnp.logical_and(m, s > 0)
            y = light_denoise_sharded(out, s, lay.prims.sigma(out),
                                      lay.row_axis, lay.col_axis)
        elif op == "bilateral":
            if static.bilateral_d <= 0:
                continue
            y = lay.bilateral(out, static.bilateral_d,
                              _as_n(dyn.bilateral_sigma_color, n),
                              _as_n(dyn.bilateral_sigma_space, n))
        elif op == "tv_denoise":
            w = _as_n(dyn.tv_denoise_weight, n)
            m = jnp.logical_and(m, w > 0)
            y = tv_sharded(out, jnp.maximum(w, 1e-6), lay.row_axis,
                           lay.col_axis)
        else:
            raise ValueError(f"unknown op {op!r}")
        out = jnp.where(m[:, None, None], y, out)
    return out


def apply_plan_sp(x, static: PlanStatic, dyn: PlanDynamic, masks,
                  lay: Layout):
    """Sharded plan chain + 3 safeguards → (enhanced, guard flags)."""
    n = x.shape[0]
    fixed_order = tuple(o for o in OP_ORDER if o in static.ops)
    rerun_order = static.order()

    # Prefix-reuse, as in the dense path (mdx/core/enhance.py apply_plan):
    # when the halo re-run order equals the fixed order up to 'unsharp',
    # the pre-unsharp ops are a pure function of the original image and
    # identical in both runs — the (expensive, collective-bearing) sharded
    # denoise/CLAHE need not repeat inside the guard branch.
    u_at = fixed_order.index("unsharp") if "unsharp" in fixed_order else -1
    prefix_reusable = (u_at >= 0
                       and rerun_order[:u_at + 1] == fixed_order[:u_at + 1])
    if prefix_reusable:
        pre = _run_chain_sp(x, fixed_order[:u_at], static, dyn, masks,
                            dyn.unsharp_amount, lay)
        suffix = fixed_order[u_at:]
        out = jnp.clip(_run_chain_sp(pre, suffix, static, dyn, masks,
                                     dyn.unsharp_amount, lay), 0.0, 1.0)
    else:
        pre = x
        suffix = fixed_order
        out = jnp.clip(_run_chain_sp(x, fixed_order, static, dyn, masks,
                                     dyn.unsharp_amount, lay), 0.0, 1.0)

    # Safeguard 1: halo → re-run with halved amount, resuming from the
    # shared prefix when possible (uniform cond: the re-run chain
    # contains collectives)
    if "unsharp" in static.ops:
        halo = jnp.logical_and(_edge_ratio_sp(out, lay.prims) > 1.5,
                               masks["unsharp"])
        pred = lax.psum(jnp.any(halo).astype(jnp.int32), lay.all_axes) > 0

        def _rerun(prev):
            if prefix_reusable:
                redo = _run_chain_sp(pre, suffix, static, dyn, masks,
                                     _as_n(dyn.unsharp_amount, n) * 0.5,
                                     lay)
            else:
                redo = _run_chain_sp(x, rerun_order, static, dyn, masks,
                                     _as_n(dyn.unsharp_amount, n) * 0.5,
                                     lay)
            return jnp.where(halo[:, None, None],
                             jnp.clip(redo, 0.0, 1.0), prev)

        out = lax.cond(pred, _rerun, lambda o: o, out)
    else:
        halo = jnp.zeros((n,), bool)

    # Safeguard 2: noise amplification → corrective light denoise
    sigma_before = lay.prims.sigma(x)
    sigma_after = lay.prims.sigma(out)
    noise_amp = jnp.logical_and(sigma_before >= 1e-8,
                                sigma_after > sigma_before * 1.3)
    pred2 = lax.psum(jnp.any(noise_amp).astype(jnp.int32),
                     lay.all_axes) > 0

    def _fix_noise(prev):
        fixed = jnp.clip(light_denoise_sharded(
            prev, jnp.float32(0.4), lay.prims.sigma(prev),
            lay.row_axis, lay.col_axis), 0.0, 1.0)
        return jnp.where(noise_amp[:, None, None], fixed, prev)

    out = lax.cond(pred2, _fix_noise, lambda o: o, out)

    # Safeguard 3: over-processing → blend back 40 % original (pointwise;
    # the NIQE inputs are computed unconditionally, as in the dense path)
    over = (_niqe_sp(out, lay.prims) - _niqe_sp(x, lay.prims)) > 0.5
    out = jnp.where(over[:, None, None],
                    jnp.clip(0.6 * out + 0.4 * x, 0.0, 1.0), out)

    return out, {"halo": halo, "noise_amp": noise_amp,
                 "over_processed": over}


def _qa_plan_block(xb, dyn: PlanDynamic, masks, *, static: PlanStatic,
                   lay: Layout):
    before = _shared_image_stats(xb, lay.prims)
    enhanced, flags = apply_plan_sp(xb, static, dyn, masks, lay)
    after = _shared_image_stats(enhanced, lay.prims)
    s = lay.ssim(xb, enhanced)
    p = lay.psnr(xb, enhanced)
    validation = validation_from_stats(before, after, s, p)
    score, _ = objective_score(validation)
    return enhanced, before, validation, score, flags


@lru_cache(maxsize=16)
def _plan_program(mesh: Mesh, static: PlanStatic):
    two_d = "sx" in mesh.shape
    lay = _layout_2d() if two_d else _layout_1d()
    spatial_spec = (P("data", "sy", "sx") if two_d
                    else P("data", "space", None))
    return jax.jit(shard_map(
        partial(_qa_plan_block, static=static, lay=lay),
        mesh=mesh,
        in_specs=(spatial_spec, P(), P("data")),
        out_specs=(spatial_spec, P("data"), P("data"), P("data"),
                   P("data")),
        check_vma=False))


def qa_plan_spatial(
    x: jnp.ndarray,
    mesh: Mesh,
    static: PlanStatic,
    dyn: PlanDynamic,
    masks: dict | None = None,
) -> dict:
    """One plan-driven QA/tuning iteration on a spatially-sharded slice:
    sharded apply_plan (all 7 ops + 3 safeguards) → full validation dict →
    objective score.  The spatial counterpart of ``mdx.core.qa.qa_plan``;
    plan parameters must be scalars (one plan per call — candidate-lane
    sweeps stay on the batch path)."""
    n = x.shape[0]
    if "sx" in mesh.shape:
        from mdx.parallel.spatial2d import _check_clahe_tiles, _check_tiles

        _check_tiles(x, mesh)
        if "clahe" in static.ops:
            _check_clahe_tiles(x, mesh, int(static.tile_size))
        spec = P("data", "sy", "sx")
    else:
        from mdx.parallel.spatial import (
            _MIN_ROWS_PER_SHARD,
            _check_clahe_tiles,
        )

        k = mesh.shape["space"]
        if x.shape[1] % k or (x.shape[1] // k) % 2 \
                or x.shape[1] // k < _MIN_ROWS_PER_SHARD:
            raise ValueError(
                f"H={x.shape[1]} must split into even blocks of "
                f"≥{_MIN_ROWS_PER_SHARD} rows over {k} 'space' shards")
        if "clahe" in static.ops:
            _check_clahe_tiles(x, mesh, int(static.tile_size))
        spec = P("data", "space", None)

    dyn_j = PlanDynamic(*(jnp.asarray(v) for v in dyn))
    masks = masks or {}
    masks_j = {op: jnp.broadcast_to(jnp.asarray(masks.get(op, True), bool),
                                    (n,)) for op in OP_ORDER}
    x = jax.device_put(x, NamedSharding(mesh, spec))
    enhanced, before, validation, score, flags = _plan_program(
        mesh, static)(x, dyn_j, masks_j)
    return {
        "enhanced": enhanced,
        "stats_before": before,
        "validation": validation,
        "score": score,
        "flags": flags,
    }


def autotune_spatial(
    image,
    issues: list[str],
    mesh: Mesh,
    *,
    ops: tuple[str, ...] = ("denoise", "clahe", "gamma", "unsharp",
                            "post_denoise"),
    tile_size: int = 16,
):
    """LLM-free autotune for ONE huge slice on the spatial mesh: the
    issue-aware candidate grid (mdx/core/tuning.py) swept as K sequential
    ``qa_plan_spatial`` calls that share ONE compiled program (the plan
    parameters are traced, so only the first candidate compiles).  The
    lane-broadcast trick of the dense sweep would multiply per-shard
    memory by K — for slices that needed spatial sharding in the first
    place, sequential reuse is the right trade.  Returns
    (best EnhancementPlan, enhanced [H, W] np.ndarray, IterationRecords),
    the same contract as ``mdx.core.tuning.autotune``."""
    import numpy as np

    from mdx.core.tuning import candidate_grid, plan_records

    cands = candidate_grid(issues)
    x = jnp.asarray(image, jnp.float32)[None]
    static = PlanStatic(ops=ops, tile_size=tile_size, bilateral_d=0,
                        tv_mode=resolve_tv_mode(),
                        plan_order=ops)
    scores, ssims, psnrs, qis = [], [], [], []
    best_i, best_score, best_enhanced = -1, -np.inf, None
    for c in cands:
        dyn = PlanDynamic(
            clahe_clip_limit=c["clahe_clip_limit"], gamma=c["gamma"],
            unsharp_radius=c["unsharp_radius"],
            unsharp_amount=c["unsharp_amount"],
            post_denoise_strength=c["post_denoise_strength"],
            bilateral_sigma_color=c["bilateral_sigma_color"],
            bilateral_sigma_space=c["bilateral_sigma_space"],
            tv_denoise_weight=c["tv_denoise_weight"],
            denoise_soft=bool(c["denoise_soft"]))
        out = qa_plan_spatial(x, mesh, static, dyn)
        sc = float(np.asarray(out["score"])[0])
        scores.append(sc)
        ssims.append(float(np.asarray(out["validation"]["ssim"])[0]))
        psnrs.append(float(np.asarray(out["validation"]["psnr"])[0]))
        qis.append(float(np.asarray(
            out["validation"]["quality_improvement"])[0]))
        if sc > best_score:
            best_i, best_score = len(scores) - 1, sc
            best_enhanced = out["enhanced"]  # device ref; fetched once below
    plans, records, best = plan_records(
        cands, ops, tile_size, np.asarray(scores), np.asarray(ssims),
        np.asarray(psnrs), np.asarray(qis),
        best_rationale=("best of spatially-sharded autotune sweep "
                        f"({len(cands)} candidates, one compiled "
                        "program reused)"))
    assert best == best_i
    return plans[best], np.asarray(best_enhanced)[0], records
