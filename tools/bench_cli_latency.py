"""Config-1 product latency: the warm end-to-end CLI run, with its
host/device split (VERDICT r3 weak #3 — the most quotable product figure).

Measures, on the real TPU through the tunnel:

1. **Process latency** — ``python main.py --input x.dcm --output ...
   --no-show`` as a subprocess with a warm persistent compile cache:
   what a user actually waits, interpreter + imports + backend init
   included.  (First-call compile cost is bench-host/PERF.md territory;
   the cache makes the subprocess number reproducible.)
2. **Warm pipeline latency** — in-process ``run_pipeline`` repeats
   (median of N) split into host decode / device QA / report+persist,
   using the runner's own ``device_qa`` phase-timing trace events plus
   explicit decode timing.

Inputs: the same 512² phantom written as Explicit-LE, RLE, JPEG-LL and
JPEG-LS — so the table also quotes the native codecs' share of product
latency.  One JSON object on stdout; paste into docs/PERF.md.

Usage: python tools/bench_cli_latency.py [--size 512] [--reps 5]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import tempfile
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

os.environ.setdefault("MDX_COMPILE_CACHE", "/tmp/mdx_jax_cache")
os.environ.setdefault("MDX_BENCH_INIT_TIMEOUT", "600")

from bench import _init_watchdog  # noqa: E402


def _write_inputs(d: str, size: int) -> dict[str, str]:
    import numpy as np

    from mdx.io.dicom import (TS_EXPLICIT_LE, TS_JPEG_LL_SV1, TS_JPEG_LS,
                              TS_RLE)
    from mdx.io.dicom_write import write_dicom

    rng = np.random.default_rng(0)
    yy, xx = np.mgrid[0:size, 0:size]
    img = np.clip(2048 + 800 * np.sin(xx / 37.0) * np.cos(yy / 53.0)
                  + rng.normal(0, 30, (size, size)), 0, 4095
                  ).astype(np.uint16)
    out = {}
    for name, ts in (("explicit_le", TS_EXPLICIT_LE), ("rle", TS_RLE),
                     ("jpeg_ll", TS_JPEG_LL_SV1), ("jpeg_ls", TS_JPEG_LS)):
        p = os.path.join(d, f"{name}.dcm")
        write_dicom(p, img, transfer_syntax=ts, rescale_slope=1.0,
                    rescale_intercept=-1024.0, window_center=40.0,
                    window_width=400.0)
        out[name] = p
    return out


def _subprocess_run(path: str, outdir: str) -> float:
    t0 = time.perf_counter()
    subprocess.run(
        [sys.executable, os.path.join(_REPO, "main.py"), "--input", path,
         "--output", outdir, "--no-show"],
        check=True, capture_output=True, timeout=1200,
        env={**os.environ, "MDX_DB_PATH": os.path.join(outdir, "runs.db")})
    return (time.perf_counter() - t0) * 1000.0


def _inprocess_runs(path: str, outdir: str, reps: int) -> dict:
    import statistics

    from mdx.io.dicom import load_dicom
    from mdx.pipeline import storage
    from mdx.pipeline.runner import run_pipeline

    decode_ms, total_ms, device_ms = [], [], []
    for i in range(reps + 1):  # first rep warms; dropped
        t0 = time.perf_counter()
        load_dicom(path)
        t_dec = (time.perf_counter() - t0) * 1000.0
        t0 = time.perf_counter()
        ctx = run_pipeline(input_path=path, output_dir=outdir,
                           no_show=True)
        t_tot = (time.perf_counter() - t0) * 1000.0
        run = storage.get_run(ctx["run_id"])
        dq = [e for e in run["agent_logs"]
              if e.get("event") == "device_timing"
              and e.get("phase") == "device_qa"]
        # trace detail format: "<wall:.2f> ms[ on <device>]"
        t_dev = float(dq[0]["detail"].split("ms")[0]) if dq else -1.0
        if i == 0:
            continue
        decode_ms.append(t_dec)
        total_ms.append(t_tot)
        device_ms.append(t_dev)
    med = statistics.median
    out = {
        "decode_ms": round(med(decode_ms), 2),
        "pipeline_total_ms": round(med(total_ms), 2),
        "device_qa_ms": round(med(device_ms), 2),
    }
    out["report_persist_other_ms"] = round(
        out["pipeline_total_ms"] - out["device_qa_ms"], 2)
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--skip-subprocess", action="store_true")
    args = ap.parse_args()

    init_done = _init_watchdog("bench_cli_latency.py")
    from mdx.pipeline.compile_cache import enable as _enable

    _enable()
    import jax

    jax.devices()
    init_done.set()

    d = tempfile.mkdtemp(prefix="mdx_cli_bench_")
    os.environ["MDX_DB_PATH"] = os.path.join(d, "runs.db")
    inputs = _write_inputs(d, args.size)
    result: dict = {"size": args.size, "reps": args.reps, "inputs": {}}
    for name, path in inputs.items():
        outdir = os.path.join(d, "out_" + name)
        entry = _inprocess_runs(path, outdir, args.reps)
        if not args.skip_subprocess:
            _subprocess_run(path, outdir)  # warm the subprocess's cache
            entry["subprocess_warm_ms"] = round(
                _subprocess_run(path, outdir), 1)
        result["inputs"][name] = entry
    print(json.dumps(result, indent=1))


if __name__ == "__main__":
    main()
