"""BASELINE config 3: whole-series batch — one 64-frame 512² multi-frame
DICOM end-to-end through ``run_pipeline_batch`` (decode, normalisation,
fused QA, per-frame SQLite rows).  Prints cold (compile) and warm
timings; warm is the median of --reps runs.

Usage:  python examples/bench_config3.py  [--frames 64] [--size 512]
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mdx.io.dicom_write import write_synthetic_dicom  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=64)
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--reps", type=int, default=5)
    args = ap.parse_args()

    d = tempfile.mkdtemp(prefix="mdx_cfg3_")
    out = tempfile.mkdtemp(prefix="mdx_cfg3_out_")
    try:
        # bound backend init (wedged-tunnel guard; compiles stay
        # unbounded).  MDX_BENCH_INIT_TIMEOUT, <=0 disables.
        from bench import _init_watchdog

        _init_done = _init_watchdog("bench_config3.py")
        import jax

        jax.devices()
        _init_done.set()

        path = os.path.join(d, "series.dcm")
        write_synthetic_dicom(path, kind="phantom", size=args.size,
                              frames=args.frames)
        from mdx.pipeline.batch_runner import run_pipeline_batch

        t0 = time.perf_counter()
        run_pipeline_batch(path, output_dir=out, save_artifacts=False)
        cold = time.perf_counter() - t0

        warms = []
        for _ in range(args.reps):
            t0 = time.perf_counter()
            ctx = run_pipeline_batch(path, output_dir=out,
                                     save_artifacts=False)
            warms.append(time.perf_counter() - t0)
        warm = statistics.median(warms)
        frames = len(ctx["frames"])
        print(json.dumps({
            "config": 3,
            "frames": frames,
            "cold_s": round(cold, 2),
            "warm_s": round(warm, 3),
            "warm_spread_s": [round(min(warms), 3), round(max(warms), 3)],
            "warm_frames_per_s": round(frames / warm, 1),
            "validation_pass": sum(1 for r in ctx["frames"] if r["passed"]),
        }))
    finally:
        import shutil

        shutil.rmtree(out, ignore_errors=True)
        shutil.rmtree(d, ignore_errors=True)


if __name__ == "__main__":
    main()
