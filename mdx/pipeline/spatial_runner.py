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


def run_pipeline_spatial(
    input_path: str,
    output_dir: str = "outputs",
    *,
    save_artifacts: bool = True,
    mesh=None,
    bilateral_d: int = 5,
    window: bool = False,
) -> dict[str, Any]:
    """QA one (large) DICOM slice spatially sharded across the mesh.

    With ``mesh=None`` a mesh over all visible devices is built with the
    layout from :func:`choose_layout`; pass an explicit ``(data, sy, sx)``
    or ``(data, space)`` mesh to pin it.  Returns a context dict with the
    stats, validation verdict, markdown report, and the mesh layout used.
    """
    import jax

    from mdx.core.metrics import ISSUE_ORDER, METRIC_KEYS
    from mdx.io import load_dicom, normalize_image

    storage.init_db()
    img, meta = load_dicom(input_path, window=window)
    frame = (np.asarray(img, np.float32) if window
             else normalize_image(img))
    h, w = frame.shape
    x = frame[None]

    if mesh is None:
        sy, sx = choose_layout(h, w, len(jax.devices()))
        if sx > 1:
            from mdx.parallel import make_mesh2d
            mesh = make_mesh2d(n_data=1, n_sy=sy, n_sx=sx)
        else:
            from mdx.parallel import make_mesh
            mesh = make_mesh(n_data=1, n_space=sy)

    # Sharded CLAHE (exact — mdx/parallel/clahe_sp.py) joins the chain
    # whenever the per-shard extents are tile-size multiples.
    t = 16
    if "sx" in mesh.shape:
        ky, kx = mesh.shape["sy"], mesh.shape["sx"]
        clahe_ok = (h // ky) % t == 0 and (w // kx) % t == 0
    else:
        clahe_ok = (h // mesh.shape["space"]) % t == 0 and w % t == 0
    clahe_clip = 0.02 if clahe_ok else None

    if "sx" in mesh.shape:
        from mdx.parallel import spatial2d
        out = spatial2d.qa_spatial2d(x, mesh, bilateral_d=bilateral_d,
                                     clahe_clip_limit=clahe_clip)
        layout = {"sy": mesh.shape["sy"], "sx": mesh.shape["sx"]}
    else:
        from mdx.parallel import spatial
        out = spatial.qa_spatial(x, mesh, bilateral_d=bilateral_d,
                                 clahe_clip_limit=clahe_clip)
        layout = {"space": mesh.shape["space"]}

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

    label = os.path.basename(input_path)
    lines = [
        "# mdx spatial QA report", "",
        f"Input: **{label}** ({h}×{w})",
        f"Mesh layout: {layout} "
        f"({'2-D row×col tiles' if 'sx' in layout else '1-D row blocks'})",
        "",
        f"Issues detected: {', '.join(issues) or '—'}",
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
        ("_Spatial chain: CLAHE → gamma → unsharp → bilateral (CLAHE "
         "sharded exactly over the tile grid; wavelet denoise runs on the "
         "batch-sharded path)._" if clahe_clip is not None else
         "_Spatial chain: gamma → unsharp → bilateral (extents not "
         "tile-aligned for sharded CLAHE; wavelet denoise and CLAHE run "
         "on the batch-sharded path)._"),
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
                plan_json="", validation=validation,
                applied_ops=((["clahe"] if clahe_clip is not None else [])
                             + ["gamma", "unsharp", "bilateral"]),
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
        "metrics": stats,
        "metrics_after": stats_after,
        "validation": validation,
        "report_md": report_md,
        "report_path": report_path,
    }
