"""Batch / series runner: QA every frame on the device mesh.

mdx extension over the reference, which reduces a multi-frame series to its
middle slice (ref pipeline/dicom_io.py:60-81) and runs one file per Python
invocation.  Here:

* a multi-frame DICOM becomes an ``[F, H, W]`` stack,
* a directory of DICOMs becomes an ``[N, H, W]`` stack (bucketed by shape
  to avoid recompilation storms — BASELINE.json config 5),
* each stack is sharded over the mesh ``data`` axis and runs the fused
  detect→enhance→validate program once per bucket,
* results are persisted per frame with frame-indexed run ids, making a
  crashed batch restartable at slice granularity (SURVEY.md §5
  checkpoint/resume note).
"""

from __future__ import annotations

import logging
import os
from typing import Any

import numpy as np

from mdx.io import load_dicom, load_series, normalize_image
from mdx.pipeline import storage

logger = logging.getLogger(__name__)


def _collect_inputs(input_path: str, window: bool = False
                    ) -> list[tuple[str, np.ndarray, dict]]:
    """Return [(label, [F,H,W] stack, metadata)] for a file or directory,
    decoded + normalised on the host (the autotune path).

    Directory decode runs on a host thread pool (the pipeline-parallel
    ingest of SURVEY.md §2.9 row 3 — decode overlaps decode; the
    device-overlap half lives in mdx/parallel/stream.py)."""
    out = []
    if os.path.isdir(input_path):
        from concurrent.futures import ThreadPoolExecutor

        names = sorted(
            n for n in os.listdir(input_path)
            if os.path.splitext(n)[1].lower() in (".dcm", ".dicom"))

        def _one(name: str):
            try:
                img, meta = load_dicom(os.path.join(input_path, name),
                                       window=window)
                return (name, img[None], meta)
            except Exception as exc:
                logger.warning("Skipping %s: %s", name, exc)
                return None

        with ThreadPoolExecutor(max_workers=8) as pool:
            out = [r for r in pool.map(_one, names) if r is not None]
    else:
        stack, meta = load_series(input_path, window=window)
        label = os.path.basename(input_path)
        out.append((label, stack, meta))
    return out


def _collect_inputs_raw(input_path: str, window: bool = False
                        ) -> list[tuple[str, np.ndarray, dict | None, dict]]:
    """[(label, frames, ingest descriptor | None, metadata)] keeping raw
    integer pixels for device-side normalisation (mdx/ops/ingest.py) —
    2–4× fewer host→device bytes on the upload-bound batch paths.
    Descriptor None ⇒ frames are host-normalised float32 (RGB/float pixel
    fallback)."""
    from mdx.io.dicom import load_frames_raw

    out = []
    if os.path.isdir(input_path):
        from concurrent.futures import ThreadPoolExecutor

        names = sorted(
            n for n in os.listdir(input_path)
            if os.path.splitext(n)[1].lower() in (".dcm", ".dicom"))

        def _one(name: str):
            try:
                frames, desc, meta = load_frames_raw(
                    os.path.join(input_path, name), window=window)
                if frames.shape[0] > 1:
                    # directory entries contribute one frame each (the
                    # reference's middle-slice reduction, dicom_io.py:60-81);
                    # the descriptor keeps whole-stack scalars, matching the
                    # host path's stack-wide MONO1 pivot
                    frames = frames[frames.shape[0] // 2][None]
                return (name, frames, desc, meta)
            except Exception as exc:
                logger.warning("Skipping %s: %s", name, exc)
                return None

        with ThreadPoolExecutor(max_workers=8) as pool:
            out = [r for r in pool.map(_one, names) if r is not None]
    else:
        frames, desc, meta = load_frames_raw(input_path, window=window)
        out.append((os.path.basename(input_path), frames, desc, meta))
    return out


def _buckets(items: list[tuple[str, np.ndarray, dict]],
             window: bool = False):
    """Group frames by (H, W) so each bucket compiles once.

    Windowed frames are already in [0,1] with the diagnostic range mapped
    by the VOI window — min-max re-normalising would stretch it back."""
    by_shape: dict[tuple[int, int], list] = {}
    for label, stack, meta in items:
        for f in range(stack.shape[0]):
            frame = (np.asarray(stack[f], np.float32) if window
                     else normalize_image(stack[f]))
            key = frame.shape
            by_shape.setdefault(key, []).append((label, f, frame, meta))
    return by_shape


def _buckets_raw(items, window: bool = False):
    """Group frames by (H, W, dtype) — raw integer frames keep their
    stored dtype (normalised on device), float32 fallbacks behave as
    :func:`_buckets`.  Entries: (label, frame_idx, frame, meta, desc)."""
    by_shape: dict[tuple[int, int, str], list] = {}
    for label, stack, desc, meta in items:
        for f in range(stack.shape[0]):
            frame = stack[f]
            if desc is None:
                frame = (np.asarray(frame, np.float32) if window
                         else normalize_image(frame))
            key = frame.shape + (str(frame.dtype),)
            by_shape.setdefault(key, []).append((label, f, frame, meta,
                                                 desc))
    return by_shape


def _completed_frames() -> set[str]:
    """input_filename keys (``label#frameN``) of already-completed runs —
    the resume index for restartable batch jobs (SURVEY.md §5: batch jobs
    restartable at slice granularity)."""
    try:
        return {r["input_filename"] for r in storage.list_runs(limit=100000)
                if r.get("status") == "completed"
                and "#frame" in r.get("input_filename", "")}
    except Exception:
        return set()


_PACK_JIT = None


def _packed_stack(rows):
    """One jitted cast+stack → [K, N] float32.  Jitting matters twice over
    a remote-TPU tunnel: the ~29 casts+stack launch as ONE program instead
    of ~29 separate dispatches (~40 ms each), and collection later needs a
    single host fetch instead of ~28 per-array round trips."""
    global _PACK_JIT
    if _PACK_JIT is None:
        import jax
        import jax.numpy as jnp

        _PACK_JIT = jax.jit(
            lambda rs: jnp.stack([r.astype(jnp.float32) for r in rs]))
    return _PACK_JIT(tuple(rows))


def _pack_outputs(out):
    """Pack everything the collection path reads into ONE device array.

    ``out`` is the qa_deterministic-shaped tuple; the result is a
    [18+5+5, N] float32 stack (metrics, issue masks, ssim/psnr/qi/passes/
    score), produced by one jitted program so a chunk costs one dispatch +
    one fetch end-to-end (measured: the per-array fetches were the
    dominant warm-path cost of BASELINE configs 3/5)."""
    from mdx.core.metrics import ISSUE_ORDER, METRIC_KEYS

    _enhanced, stats, issues, _flags, validation, score = out
    rows = [stats[k] for k in METRIC_KEYS]
    rows += [issues[k] for k in ISSUE_ORDER]
    rows += [validation[k]
             for k in ("ssim", "psnr", "quality_improvement", "passes")]
    rows.append(score)
    return _packed_stack(rows)


def _collect(frames, packed_np, h, w, results, save_artifacts):
    """Materialise per-frame records + DB rows for one device chunk from
    the packed [K, N] fetch (row order: _pack_outputs)."""
    from mdx.core.metrics import ISSUE_ORDER, METRIC_KEYS

    nm = len(METRIC_KEYS)
    ni = len(ISSUE_ORDER)
    db_rows = []
    for i, (label, fidx, _frame, meta, _desc) in enumerate(frames):
        col = packed_np[:, i]
        frame_issues = [k for j, k in enumerate(ISSUE_ORDER)
                        if bool(col[nm + j])]
        run_id = storage.generate_run_id()
        rec = {
            "run_id": run_id,
            "source": label,
            "frame": fidx,
            "shape": [h, w],
            "issues": frame_issues,
            "metrics": {k: float(col[j]) for j, k in enumerate(METRIC_KEYS)},
            "ssim": float(col[nm + ni]),
            "psnr": float(col[nm + ni + 1]),
            "quality_improvement": float(col[nm + ni + 2]),
            "passed": bool(col[nm + ni + 3]),
            "objective_score": float(col[nm + ni + 4]),
        }
        results.append(rec)
        if save_artifacts:
            db_rows.append({
                "run_id": run_id,
                "input_filename": f"{label}#frame{fidx}",
                "metadata_summary": meta, "issues": frame_issues,
                "metrics_before": rec["metrics"], "metrics_after": {},
                "plan_json": "", "validation": {
                    "ssim": rec["ssim"], "psnr": rec["psnr"],
                    "quality_improvement": rec["quality_improvement"],
                    "passes": rec["passed"]},
                "applied_ops": [], "explainability": {}, "report_path": "",
                "before_after_path": "", "agent_logs": [],
                "status": "completed"})
    if db_rows:
        try:
            storage.save_runs_bulk(db_rows)
        except Exception as exc:
            logger.error("Bulk persist failed for %d frames of %sx%s: %s",
                         len(db_rows), h, w, exc)


def _autotune_chunk(x: np.ndarray):
    """Per-frame autotune for one chunk; returns the qa_deterministic-shaped
    tuple so the collection path is shared."""
    import jax.numpy as jnp

    from mdx.core import qa
    from mdx.core.metrics import ISSUE_ORDER
    from mdx.core.score import objective_score
    from mdx.core.tuning import autotune_batch
    from mdx.core.validate import validate as _validate

    xj = jnp.asarray(x, jnp.float32)
    stats, issue_masks = qa.detect(xj)
    issues_np = {k: np.asarray(v) for k, v in issue_masks.items()}
    issues_per_image = [
        [k for k in ISSUE_ORDER if bool(issues_np[k][i])]
        for i in range(x.shape[0])]
    # cap the sweep's lane count (frames × candidates) per launch — a
    # 64-frame chunk × up to 27 candidates would otherwise build a ~1.7k
    # lane single-device stack
    union = sorted({i for iss in issues_per_image for i in iss})
    from mdx.core.tuning import candidate_grid

    k_cands = max(len(candidate_grid(union)), 1)
    sub_n = max(128 // k_cands, 1)
    enhanced_parts = []
    for s in range(0, x.shape[0], sub_n):
        _plans, enh, _scores = autotune_batch(
            x[s:s + sub_n], issues_per_image[s:s + sub_n])
        enhanced_parts.append(enh)
    enhanced = np.concatenate(enhanced_parts, axis=0)
    validation = _validate(xj, jnp.asarray(enhanced, jnp.float32),
                           stats_before=stats)
    score, _ = objective_score(validation)
    flags = {}
    return enhanced, stats, issue_masks, flags, validation, score


_RAW_QA_JIT: dict[bool, Any] = {}


def _raw_qa_program(window: bool):
    """One fused jitted program per windowing mode: raw integer frames +
    per-frame scalars → device normalisation (mdx/ops/ingest.py) →
    qa_deterministic.  Only the stored bytes cross the host→device link
    (the upload was the dominant warm cost of configs 3/5, docs/PERF.md)."""
    fn = _RAW_QA_JIT.get(window)
    if fn is None:
        import jax

        from mdx.core import qa
        from mdx.ops.ingest import normalize_ingest

        @jax.jit
        def fn(raw, slope, intercept, mono1, gmax, use_w, wlo, wden,
               nlo, nhi):
            x = normalize_ingest(raw, slope, intercept, mono1, gmax,
                                 use_w, wlo, wden, nlo, nhi,
                                 per_frame_minmax=not window)
            return qa.qa_deterministic(x)

        _RAW_QA_JIT[window] = fn
    return fn


def _ingest_params(descs: list[dict], window: bool, n_pad: int):
    """Per-frame [n_pad] float32 scalar vectors for normalize_ingest from
    the per-file descriptors (padding replicates the last frame)."""
    f32 = np.float32

    def build(fn):
        vals = [fn(d) for d in descs]
        vals += [vals[-1]] * (n_pad - len(vals))
        return np.asarray(vals, f32)

    def wparams(d):
        if not window or d["window"] is None:
            return (0.0, 0.0, 1.0)
        wc, ww = d["window"]
        width = max(float(ww), 1.0 + 1e-6)
        lo = float(wc) - 0.5 - (width - 1.0) / 2.0
        return (1.0, f32(lo), f32(width - 1.0))

    def nbounds(d):
        # windowless-fallback bounds over the whole stack, in the space
        # AFTER the MONO1 inversion (z = gmax - v has bounds [0, gmax-gmin])
        if d["mono1"]:
            return (0.0, float(f32(d["gmax"]) - f32(d["gmin"])))
        return (d["gmin"], d["gmax"])

    return (build(lambda d: d["slope"]),
            build(lambda d: d["intercept"]),
            build(lambda d: 1.0 if d["mono1"] else 0.0),
            build(lambda d: d["gmax"]),
            build(lambda d: wparams(d)[0]),
            build(lambda d: wparams(d)[1]),
            build(lambda d: wparams(d)[2]),
            build(lambda d: nbounds(d)[0]),
            build(lambda d: nbounds(d)[1]))


def run_pipeline_batch(
    input_path: str,
    output_dir: str = "outputs",
    *,
    save_artifacts: bool = True,
    mesh=None,
    resume: bool = False,
    window: bool = False,
    autotune: bool = False,
) -> dict[str, Any]:
    """QA all frames of a series / directory, sharded across the mesh.

    ``window=True`` applies each sample's stored DICOM VOI window
    (per-sample windowing for mixed-modality streams, BASELINE config 5)
    before QA instead of relying on min-max normalisation alone.

    ``autotune=True`` sweeps the candidate parameter grid per frame in one
    vectorized device program (mdx/core/tuning.py) and applies each
    frame's best plan instead of the fixed issue-driven defaults.

    With ``resume=True`` frames whose ``label#frameN`` key already has a
    completed run in the DB are skipped — a crashed batch restarts at
    slice granularity instead of from zero.

    Returns a summary context with per-frame statuses and metric digests.
    """
    import jax.numpy as jnp

    from mdx.core import qa
    from mdx.parallel import make_mesh, pad_batch
    from mdx.parallel.mesh import data_sharding
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    from mdx.pipeline.compile_cache import enable as _enable_compile_cache
    _enable_compile_cache()
    storage.init_db()
    if mesh is None:
        mesh = make_mesh()

    if autotune:
        # autotune consumes host-normalised frames (its sweep runs from
        # numpy); the raw-upload path applies to the deterministic QA flow
        items = _collect_inputs(input_path, window=window)
        buckets = {
            (h, w, "float32"): [(lb, fi, fr, m, None) for lb, fi, fr, m
                                in v]
            for (h, w), v in _buckets(items, window=window).items()}
    else:
        raw_items = _collect_inputs_raw(input_path, window=window)
        items = raw_items
        buckets = _buckets_raw(raw_items, window=window)
    if not items:
        raise RuntimeError(f"No DICOM inputs found at {input_path}")

    done = _completed_frames() if resume else set()

    if save_artifacts:
        os.makedirs(output_dir, exist_ok=True)

    # Device sub-batch size: a multiple of the data axis large enough to
    # saturate the chips but bounded, so a 10k-slice series never
    # materialises as one giant device array.  jax's async dispatch
    # overlaps the host-side staging of chunk t+1 with chunk t's compute.
    d = mesh.shape["data"]
    chunk_n = max(-(-64 // d) * d, d)

    skipped = 0
    results: list[dict[str, Any]] = []
    for (h, w, _kind), frames in sorted(buckets.items()):
        if done:
            kept = [f for f in frames
                    if f"{f[0]}#frame{f[1]}" not in done]
            skipped += len(frames) - len(kept)
            frames = kept
            if not frames:
                continue
        def _submit(chunk):
            if autotune:
                x = np.stack([f[2] for f in chunk]).astype(np.float32)
                return (chunk, len(chunk), _pack_outputs(_autotune_chunk(x)))
            x = np.stack([f[2] for f in chunk])
            xp, n_valid = pad_batch(jnp.asarray(x), mesh)
            xp = jax.device_put(xp, data_sharding(mesh))
            if chunk[0][4] is not None:
                # raw integer frames: upload stored bytes, normalise
                # on device (2–4× fewer bytes over the link)
                params = _ingest_params([f[4] for f in chunk], window,
                                        xp.shape[0])
                vec = NamedSharding(mesh, P("data"))
                params = tuple(jax.device_put(p, vec) for p in params)
                out = _raw_qa_program(window)(xp, *params)
            else:
                out = qa.qa_deterministic(xp)
            # keep only what collection reads, packed into one device
            # array — dropping the [chunk,H,W] enhanced stack bounds device
            # memory to ~2 chunks in flight, and the single packed fetch
            # replaces ~28 per-array tunnel round trips
            return (chunk, n_valid, _pack_outputs(out))

        def _drain(entry):
            frames_c, n_valid, packed = entry
            packed_np = np.asarray(packed)[:, :n_valid]
            _collect(frames_c, packed_np, h, w, results, save_artifacts)

        # double-buffer: chunk t+1's host staging + dispatch overlaps
        # chunk t's device compute, while at most 2 chunks stay resident
        pending = None
        for start in range(0, len(frames), chunk_n):
            entry = _submit(frames[start:start + chunk_n])
            if pending is not None:
                _drain(pending)
            pending = entry
        if pending is not None:
            _drain(pending)
    n_pass = sum(1 for r in results if r["passed"])
    summary_lines = [
        "# mdx batch QA report", "",
        f"Frames processed: **{len(results)}** "
        f"(validation pass: {n_pass}/{len(results)})", "",
        "| source | frame | issues | ssim | psnr | score |",
        "|---|---|---|---|---|---|",
    ]
    for r in results:
        summary_lines.append(
            f"| {r['source']} | {r['frame']} | "
            f"{', '.join(r['issues']) or '—'} | {r['ssim']:.4f} | "
            f"{r['psnr']:.2f} | {r['objective_score']:.4f} |")
    report_md = "\n".join(summary_lines)

    if save_artifacts:
        path = os.path.join(output_dir, "batch_report.md")
        with open(path, "w", encoding="utf-8") as f:
            f.write(report_md)

    return {
        "batch": True,
        "frames": results,
        "skipped": skipped,
        "report_md": report_md,
        "mesh": dict(mesh.shape),
    }
