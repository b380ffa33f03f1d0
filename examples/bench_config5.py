"""BASELINE config 5: mixed-modality stream (CT/CXR/US, 8/12/16-bit,
multiple shapes) with per-sample VOI windowing + scoring.

Builds a synthetic 64-file directory —

* 24× US   uint8   256²  (no stored window → min-max normalisation path)
* 24× CT   int16   512²  12-bit with rescale −1024 + W/L 40/400
* 16× CXR  uint16 1024²  MONOCHROME1 with W/L 0.5/0.8 (in rescaled units)

— and runs it end-to-end through ``run_pipeline_batch(window=True)``:
from-scratch DICOM decode (incl. per-sample windowing), shape bucketing,
fused QA per bucket, per-frame SQLite rows.  Prints cold (compile) and
warm timings plus the bucket count (= fused-program compiles per run).

Usage:  python examples/bench_config5.py  [--dir DIR] [--keep]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mdx.io.dicom_write import write_dicom  # noqa: E402


def make_stream(d: str) -> int:
    rng = np.random.default_rng(0)
    yy, xx = np.mgrid[0:512, 0:512].astype(np.float64) / 511.0
    n = 0
    for i in range(24):  # US: 8-bit, speckle-like
        img = 0.35 + 0.25 * np.sin(9 * xx[:256, :256]) + rng.normal(
            0, 0.12, (256, 256))
        write_dicom(os.path.join(d, f"us_{i:02d}.dcm"),
                    (np.clip(img, 0, 1) * 255).astype(np.uint8),
                    modality="US", body_part="ABDOMEN",
                    study_description="mixed-stream US")
        n += 1
    for i in range(24):  # CT: 12-bit signed HU with rescale + stored window
        r = np.hypot(yy - 0.5, xx - 0.5)
        hu = np.where(r < 0.4, 40 + 60 * np.cos(10 * r), -1000.0)
        hu = hu + rng.normal(0, 20, (512, 512))
        stored = np.clip(hu + 1024, 0, 4095).astype(np.int16)
        write_dicom(os.path.join(d, f"ct_{i:02d}.dcm"), stored,
                    modality="CT", body_part="CHEST",
                    study_description="mixed-stream CT",
                    rescale_slope=1.0, rescale_intercept=-1024.0,
                    window_center=40.0, window_width=400.0, signed=True)
        n += 1
    big_y, big_x = np.mgrid[0:1024, 0:1024].astype(np.float64) / 1023.0
    for i in range(16):  # CXR: 16-bit MONOCHROME1 with stored window
        img = 0.5 + 0.3 * np.exp(-((big_x - 0.5) ** 2
                                   + (big_y - 0.45) ** 2) / 0.08)
        img = np.clip(img + rng.normal(0, 0.05, (1024, 1024)), 0, 1)
        write_dicom(os.path.join(d, f"cxr_{i:02d}.dcm"),
                    (img * 65535).astype(np.uint16),
                    modality="CR", body_part="CHEST",
                    study_description="mixed-stream CXR",
                    photometric="MONOCHROME1",
                    window_center=0.5 * 65535, window_width=0.8 * 65535)
        n += 1
    return n


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--dir", default=None, help="stream dir (default: tmp)")
    ap.add_argument("--keep", action="store_true")
    args = ap.parse_args()

    d = args.dir or tempfile.mkdtemp(prefix="mdx_cfg5_")
    out = tempfile.mkdtemp(prefix="mdx_cfg5_out_")
    try:
        # bound backend init (wedged-tunnel guard; compiles stay
        # unbounded).  MDX_BENCH_INIT_TIMEOUT, <=0 disables.
        from bench import _init_watchdog

        _init_done = _init_watchdog("bench_config5.py")
        import jax

        jax.devices()
        _init_done.set()

        n = make_stream(d)
        from mdx.pipeline.batch_runner import run_pipeline_batch

        t0 = time.perf_counter()
        ctx = run_pipeline_batch(d, output_dir=out, save_artifacts=False,
                                 window=True)
        cold = time.perf_counter() - t0

        t0 = time.perf_counter()
        ctx = run_pipeline_batch(d, output_dir=out, save_artifacts=False,
                                 window=True)
        warm = time.perf_counter() - t0

        rows = ctx["frames"]
        frames = len(rows)
        buckets = sorted({tuple(r["shape"]) for r in rows})
        print(json.dumps({
            "config": 5,
            "files": n,
            "frames": frames,
            "cold_s": round(cold, 2),
            "warm_s": round(warm, 2),
            "warm_frames_per_s": round(frames / warm, 1),
            "buckets": buckets,
            "validation_pass": sum(1 for r in rows if r["passed"]),
        }))
    finally:
        shutil.rmtree(out, ignore_errors=True)
        if not args.keep and args.dir is None:
            shutil.rmtree(d, ignore_errors=True)


if __name__ == "__main__":
    main()
