"""End-to-end demo: synthesise a small DICOM study set, run every mdx mode.

    python examples/demo.py [--outdir /tmp/mdx_demo]

Generates four synthetic DICOMs (noisy CT, low-contrast, clipped, a
12-bit multi-frame phantom), runs the deterministic single-file pipeline,
the mesh-sharded batch pipeline, and prints per-run digests.  Everything
is offline — no API keys, no network.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--outdir", default="/tmp/mdx_demo")
    args = ap.parse_args()

    os.environ.setdefault("MDX_DB_PATH", os.path.join(args.outdir, "demo.db"))
    os.makedirs(args.outdir, exist_ok=True)

    import matplotlib

    matplotlib.use("Agg")

    from mdx.io.dicom_write import write_synthetic_dicom
    from mdx.pipeline.batch_runner import run_pipeline_batch
    from mdx.pipeline.runner import run_pipeline

    study_dir = os.path.join(args.outdir, "study")
    os.makedirs(study_dir, exist_ok=True)
    for kind in ("noisy", "low_contrast", "clipped"):
        write_synthetic_dicom(os.path.join(study_dir, f"{kind}.dcm"),
                              kind=kind, size=256)
    volume = os.path.join(args.outdir, "phantom.dcm")
    write_synthetic_dicom(volume, kind="phantom", size=256, frames=4)

    print("== deterministic single-file run " + "=" * 30)
    ctx = run_pipeline(
        input_path=os.path.join(study_dir, "noisy.dcm"),
        output_dir=os.path.join(args.outdir, "out"), no_show=True)
    print(f"run {ctx['run_id']}: issues={ctx['issues']} "
          f"ops={ctx['applied_ops']} "
          f"ssim={ctx['validation'].ssim:.3f} status={ctx['validation'].status}")

    print("\n== mesh batch over the study directory " + "=" * 24)
    batch = run_pipeline_batch(
        input_path=study_dir, output_dir=os.path.join(args.outdir, "out"))
    for f in batch["frames"]:
        print(f"  {f['source']:18s} issues={','.join(f['issues']) or '—':24s}"
              f" score={f['objective_score']:+.3f} passed={f['passed']}")

    print("\n== multi-frame series (all 4 frames QA'd, not just the middle) ==")
    series = run_pipeline_batch(
        input_path=volume, output_dir=os.path.join(args.outdir, "out"))
    for f in series["frames"]:
        print(f"  frame {f['frame']}: sigma={f['metrics']['sigma']:.4f} "
              f"entropy={f['metrics']['entropy']:.2f}")

    print(f"\nArtifacts in {args.outdir}/out — reports, before/after PNGs, "
          f"SQLite at $MDX_DB_PATH.")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
