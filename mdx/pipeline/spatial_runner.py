"""Spatial-QA runner: one very large slice sharded across the device mesh.

Product surface for :mod:`mdx.parallel.spatial` / ``spatial2d`` (CLI
``--spatial``): a single huge slice (2048²+ CXR, stitched pathology tile)
is laid out over every available chip — 2-D row×col tiles when the device
count and slice extents allow, 1-D row blocks otherwise — and runs the
spatial QA step (detect → halo-local gamma/unsharp/bilateral enhancement →
distributed SSIM/PSNR validation + the reference's three-way pass rule,
ref pipeline/metrics.py:282-286) as one SPMD program.

This chain is the halo-local subset (globally-coupled wavelet denoise and
CLAHE stay on the batch-sharded path — see mdx/parallel/spatial.py); the
report says so explicitly rather than pretending full-chain parity.
"""

from __future__ import annotations

import logging
import os
from typing import Any

import numpy as np

from mdx.pipeline import storage
from mdx.ops.tv import resolve_tv_mode

logger = logging.getLogger(__name__)


def choose_layout(h: int, w: int, n_devices: int,
                  min_per_shard: int = 16) -> tuple[int, int]:
    """Pick the (sy, sx) tile grid for an H×W slice on ``n_devices`` chips.

    Prefers the most devices usable, then the most square grid (squarer
    tiles → shorter halo perimeter per shard).  Constraints per axis:
    extent divides evenly, per-shard extent even (stride-2 wavelet phase)
    and ≥ ``min_per_shard`` (widest stencil halo).  (1, 1) always works.
    """
    best = (1, 1)
    best_key = (1, 0)
    for used in range(n_devices, 0, -1):
        for sy in range(1, used + 1):
            if used % sy:
                continue
            sx = used // sy
            ok = True
            for extent, k in ((h, sy), (w, sx)):
                per = extent // k
                if extent % k or per % 2 or per < min_per_shard:
                    ok = False
                    break
            if not ok:
                continue
            key = (used, -abs(sy - sx))
            if key > best_key:
                best_key = key
                best = (sy, sx)
        if best_key[0] == used:
            break
    return best


def build_spatial_mesh(h: int, w: int, n_devices: int | None = None):
    """Mesh for one H×W slice: ``choose_layout`` over the visible devices
    (2-D ``(1, sy, sx)`` tiles when the extents allow, else 1-D row
    blocks).  Shared by the runner and the cache primer so both compile
    against the same topology."""
    import jax

    if n_devices is None:
        n_devices = len(jax.devices())
    sy, sx = choose_layout(h, w, n_devices)
    if sx > 1:
        from mdx.parallel import make_mesh2d

        return make_mesh2d(n_data=1, n_sy=sy, n_sx=sx)
    from mdx.parallel import make_mesh

    return make_mesh(n_data=1, n_space=sy)


def spatial_fns(mesh):
    """(qa_fn, stats_fn, layout dict) for a 1-D or 2-D spatial mesh."""
    if "sx" in mesh.shape:
        from mdx.parallel import spatial2d as sp_mod

        return (sp_mod.qa_spatial2d, sp_mod.image_stats_spatial2d,
                {"sy": mesh.shape["sy"], "sx": mesh.shape["sx"]})
    from mdx.parallel import spatial as sp_mod

    return (sp_mod.qa_spatial, sp_mod.image_stats_spatial,
            {"space": mesh.shape["space"]})


def issue_driven_kwargs(
    flags: dict[str, bool], h: int, w: int, ky: int, kx: int,
) -> tuple[dict[str, Any], list[str]]:
    """The reference's deterministic issue→op mapping (ref
    pipeline/enhancement.py:151-227) lowered to the sharded QA chain's
    static gates.  Returns (qa_fn kwargs, applied op names).  The kwargs
    are the jit cache key's static part — the primer must build them
    through this same function or it compiles a different program."""
    from mdx.core.enhance import DETERMINISTIC_DEFAULTS as PD

    needs_contrast = (flags["low_contrast"] | flags["clipping_low"]
                      | flags["clipping_high"])
    brighten = flags["clipping_low"] and not flags["clipping_high"]
    darken = flags["clipping_high"] and not flags["clipping_low"]
    t = int(PD["clahe_tile_size"])
    clahe_aligned = (h // ky) % t == 0 and (w // kx) % t == 0
    applied_ops: list[str] = []
    kw: dict[str, Any] = dict(
        bilateral_d=0, gamma=1.0, unsharp_amount=0.0,
        unsharp_radius=PD["unsharp_radius"], noise_guard=True)
    if flags["noise"]:
        kw["denoise"] = True
        applied_ops.append("denoise")
    if needs_contrast and clahe_aligned:
        kw["clahe_clip_limit"] = PD["clahe_clip_limit"]
        applied_ops.append("clahe")
    if brighten or darken:
        kw["gamma"] = PD["gamma_brighten"] if brighten else PD["gamma_darken"]
        applied_ops.append("gamma")
    if flags["blur"]:
        kw["unsharp_amount"] = PD["unsharp_amount"]
        kw["post_denoise_strength"] = PD["post_denoise_strength"]
        applied_ops += ["unsharp", "post_denoise"]
    return kw, applied_ops


def run_pipeline_spatial(
    input_path: str,
    output_dir: str = "outputs",
    *,
    save_artifacts: bool = True,
    mesh=None,
    window: bool = False,
    autotune: bool = False,
) -> dict[str, Any]:
    """QA one (large) DICOM slice spatially sharded across the mesh,
    with the reference's DETERMINISTIC issue-driven decisions
    (ref pipeline/enhancement.py:151-227 = mdx.core.enhance
    apply_issue_driven): detect → map issues to ops with the conservative
    defaults (noise→denoise, contrast/clipping→CLAHE, one-sided
    clipping→gamma 0.95/1.05, blur→unsharp+post_denoise) → sharded
    enhancement with the noise-amplification safeguard → distributed
    SSIM/PSNR validation.  Every selected op runs sharded (the _sp
    modules), so a huge slice gets the same decisions and numerics as the
    single-chip deterministic path.

    With ``mesh=None`` a mesh over all visible devices is built with the
    layout from :func:`choose_layout`; pass an explicit ``(data, sy, sx)``
    or ``(data, space)`` mesh to pin it.  Returns a context dict with the
    stats, validation verdict, markdown report, and the mesh layout used.
    """
    from mdx.core.enhance import DETERMINISTIC_DEFAULTS as PD
    from mdx.core.metrics import ISSUE_ORDER, METRIC_KEYS, detect_issues
    from mdx.io import load_dicom, normalize_image
    from mdx.pipeline.compile_cache import enable as _enable_compile_cache

    _enable_compile_cache()
    storage.init_db()
    img, meta = load_dicom(input_path, window=window)
    frame = (np.asarray(img, np.float32) if window
             else normalize_image(img))
    h, w = frame.shape
    x = frame[None]

    if mesh is None:
        mesh = build_spatial_mesh(h, w)
    qa_fn, stats_fn, layout = spatial_fns(mesh)
    ky, kx = ((layout["sy"], layout["sx"]) if "sx" in layout
              else (layout["space"], 1))

    # Phase 1: sharded detect → host-side issue→op mapping (N=1 slice, so
    # the per-image masks of the dense path become static op gates).
    det_stats = stats_fn(x, mesh)
    issue_masks = detect_issues(det_stats)
    flags = {k: bool(np.asarray(issue_masks[k])[0]) for k in ISSUE_ORDER}
    t = int(PD["clahe_tile_size"])
    clahe_aligned = (h // ky) % t == 0 and (w // kx) % t == 0
    kw, applied_ops = issue_driven_kwargs(flags, h, w, ky, kx)

    # Phase 2: sharded enhancement + safeguards + validation — either the
    # issue-driven deterministic chain, or (--autotune) the candidate
    # sweep on the plan path with all three safeguards.
    best_plan = None
    records = []
    if autotune:
        from mdx.core.enhance import PlanDynamic, PlanStatic
        from mdx.parallel.plan_sp import autotune_spatial, qa_plan_spatial

        issues_list = [k for k in ISSUE_ORDER if flags[k]]
        ops = tuple(o for o in ("denoise", "clahe", "gamma", "unsharp",
                                "post_denoise")
                    if o != "clahe" or clahe_aligned)
        best_plan, _enh, records = autotune_spatial(
            frame, issues_list, mesh, ops=ops, tile_size=t)
        p = best_plan.params
        static = PlanStatic(ops=ops, tile_size=t, bilateral_d=0,
                            tv_mode=resolve_tv_mode(),
                            plan_order=ops)
        dyn = PlanDynamic(
            clahe_clip_limit=p.clahe_clip_limit, gamma=p.gamma,
            unsharp_radius=p.unsharp_radius,
            unsharp_amount=p.unsharp_amount,
            post_denoise_strength=p.post_denoise_strength,
            tv_denoise_weight=0.0)
        pout = qa_plan_spatial(x, mesh, static, dyn)
        out = {
            "stats_before": pout["stats_before"],
            "stats_after": pout["validation"]["metrics_after"],
            "issues": issue_masks,
            "ssim": pout["validation"]["ssim"],
            "psnr": pout["validation"]["psnr"],
            "quality_improvement":
                pout["validation"]["quality_improvement"],
            "passes": pout["validation"]["passes"],
            "noise_amp_guard": pout["flags"]["noise_amp"],
            "enhanced": pout["enhanced"],
        }
        applied_ops = list(best_plan.recommended_ops)
    else:
        out = qa_fn(x, mesh, **kw)

    stats = {k: float(np.asarray(out["stats_before"][k])[0])
             for k in METRIC_KEYS}
    stats_after = {k: float(np.asarray(out["stats_after"][k])[0])
                   for k in METRIC_KEYS}
    issues = [k for k in ISSUE_ORDER
              if bool(np.asarray(out["issues"][k])[0])]
    validation = {
        "ssim": float(np.asarray(out["ssim"])[0]),
        "psnr": float(np.asarray(out["psnr"])[0]),
        "quality_improvement": float(
            np.asarray(out["quality_improvement"])[0]),
        "passes": bool(np.asarray(out["passes"])[0]),
    }
    noise_amp_tripped = bool(np.asarray(out["noise_amp_guard"])[0])

    label = os.path.basename(input_path)
    lines = [
        "# mdx spatial QA report", "",
        f"Input: **{label}** ({h}×{w})",
        f"Mesh layout: {layout} "
        f"({'2-D row×col tiles' if 'sx' in layout else '1-D row blocks'})",
        "",
        f"Issues detected: {', '.join(issues) or '—'}",
        (f"Applied (autotune sweep, {len(records)} candidates on one "
         f"reused program): {', '.join(applied_ops) or '—'}"
         if autotune else
         f"Applied (issue-driven, reference defaults): "
         f"{', '.join(applied_ops) or '— (pass-through)'}")
        + (" · noise-amp guard tripped" if noise_amp_tripped else ""),
        "",
        "| metric | before | after |", "|---|---|---|",
    ]
    for k in METRIC_KEYS:
        lines.append(f"| {k} | {stats[k]:.5f} | {stats_after[k]:.5f} |")
    lines += [
        "",
        f"SSIM {validation['ssim']:.4f} · PSNR {validation['psnr']:.2f} · "
        f"quality improvement {validation['quality_improvement']:.4f} → "
        f"**{'PASS' if validation['passes'] else 'FAIL'}**",
        "",
        ("_Every applied op ran spatially sharded "
         "(mdx/parallel/{plan_sp,wavelet_sp,clahe_sp,tv_sp}.py) on the "
         "plan path with all three reference safeguards; the winning "
         "plan and per-candidate records are persisted._" if autotune else
         "_Every applied op ran spatially sharded "
         "(mdx/parallel/{wavelet_sp,clahe_sp,tv_sp,spatial*}.py) with the "
         "reference's deterministic issue→op mapping and "
         "noise-amplification safeguard._"),
    ]
    report_md = "\n".join(lines)

    run_id = storage.generate_run_id()
    report_path = ""
    if save_artifacts:
        os.makedirs(output_dir, exist_ok=True)
        report_path = os.path.join(
            output_dir, f"{os.path.splitext(label)[0]}_spatial_report.md")
        with open(report_path, "w", encoding="utf-8") as f:
            f.write(report_md)
        try:
            storage.save_run(
                run_id=run_id, input_filename=label,
                metadata_summary=meta, issues=issues,
                metrics_before=stats, metrics_after=stats_after,
                plan_json=(best_plan.model_dump_json()
                           if best_plan is not None else ""),
                validation=validation,
                applied_ops=applied_ops,
                explainability={}, report_path=report_path,
                before_after_path="", agent_logs=[], status="completed")
        except Exception as exc:
            logger.error("Persist failed for %s: %s", run_id, exc)

    return {
        "spatial": True,
        "run_id": run_id,
        "shape": [h, w],
        "mesh": layout,
        "issues": issues,
        "applied_ops": applied_ops,
        "noise_amp_guard": noise_amp_tripped,
        "plan": best_plan,
        "iterations": records,
        "enhanced": np.asarray(out["enhanced"])[0],
        "metrics": stats,
        "metrics_after": stats_after,
        "validation": validation,
        "report_md": report_md,
        "report_path": report_path,
    }
