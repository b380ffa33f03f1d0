"""One-command capture of the queued hardware A/B checklist.

TPU tunnel windows are scarce (the round-3 outage blocked five built,
export-verified alternative lowerings — docs/PERF.md lever entries).
When the tunnel returns, this tool runs the ENTIRE measurement half of
the first-tunnel-window checklist (.claude/skills/verify/SKILL.md) in
order, teeing every child's output into a timestamped directory with a
machine-readable summary, so one command banks all the numbers even if
the window closes mid-sequence:

  1. probe    — bounded ``jax.devices()`` (abort early if still down)
  2. clahe    — ``bench_clahe.py --sharded-remap --json``
  3. ab512    — ``profile_pass.py --ab unsharp,bilateral,wavelet
                 --ab-only`` at 32x512^2
  4. ab1024   — same at 4x1024^2
  5. ab2048   — same at 16x2048^2 (banded unsharp class; bilateral
                 skips itself)
  6. bench    — ``bench.py`` x3 serial (same-build noise is +/-1.4%)
  7. config3  — ``examples/bench_config3.py``

The DECISIONS stay manual: flip the ``_AUTO_*`` policies in
mdx/ops/pallas_kernels.py per the winners, then re-run bench.py and
record movements in docs/PERF.md (each lever entry has the procedure).

Every child inherits the backend-init watchdog (MDX_BENCH_INIT_TIMEOUT,
defaulted here to 900 s): a tunnel relapse mid-sequence exits 2 and the
sequence stops instead of hanging.

Usage::

    python tools/tunnel_window.py [--out DIR] [--only probe,clahe,...]
    python tools/tunnel_window.py --plan     # print the step plan (JSON)
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_AB = "unsharp,bilateral,wavelet"

# (name, argv, timeout_s).  Cold compiles through the tunnel run many
# minutes (config-5-class programs measured ~22 min) — timeouts are
# generous; killing a remote compile mid-flight can wedge the tunnel
# (verify skill gotchas), so they are a last resort only.
STEPS: list[tuple[str, list[str], int]] = [
    ("probe", [sys.executable, "-c",
               "import jax; print(jax.devices())"], 120),
    ("clahe", [sys.executable, "tools/bench_clahe.py",
               "--sharded-remap", "--json"], 3600),
    ("ab512", [sys.executable, "tools/profile_pass.py",
               "--ab", _AB, "--ab-only"], 3600),
    ("ab1024", [sys.executable, "tools/profile_pass.py",
                "--ab", _AB, "--ab-only", "--batch", "4",
                "--hw", "1024"], 3600),
    ("ab2048", [sys.executable, "tools/profile_pass.py",
                "--ab", _AB, "--ab-only", "--batch", "16",
                "--hw", "2048"], 3600),
    ("bench", [sys.executable, "bench.py"], 3600),
    ("bench2", [sys.executable, "bench.py"], 1800),
    ("bench3", [sys.executable, "bench.py"], 1800),
    ("config3", [sys.executable, "examples/bench_config3.py"], 3600),
]

_FLIP_REMINDER = """\
Measurement done — the flips are manual:
  * unsharp/bilateral/wavelet: flip _AUTO_*_PALLAS on wins from
             the ab* steps (check the parity rows FIRST)
then re-run bench.py (>=3 serial, median) and record movements in
docs/PERF.md lever entries + README's table."""


def run_steps(only: set[str] | None, out_dir: str,
              runner=subprocess.run) -> dict:
    """Run the step sequence, teeing outputs under ``out_dir``.

    Stops on exit code 2 (a child's init watchdog fired — tunnel
    relapse) or a failed probe; other failures record and continue.
    Returns the summary dict (also written to summary.json)."""
    os.makedirs(out_dir, exist_ok=True)
    env = dict(os.environ)
    env.setdefault("MDX_BENCH_INIT_TIMEOUT", "900")
    summary: dict = {"started": time.strftime("%Y-%m-%dT%H:%M:%S"),
                     "steps": {}}
    for name, argv, timeout in STEPS:
        if only is not None and name not in only:
            continue
        log_path = os.path.join(out_dir, f"{name}.log")
        t0 = time.time()
        try:
            proc = runner(argv, cwd=REPO, env=env, timeout=timeout,
                          capture_output=True, text=True)
            rc: int | str = proc.returncode
            out = proc.stdout
            err = proc.stderr
        except subprocess.TimeoutExpired as exc:
            rc = "timeout"
            out = (exc.stdout or b"").decode() if isinstance(
                exc.stdout, bytes) else (exc.stdout or "")
            err = (exc.stderr or b"").decode() if isinstance(
                exc.stderr, bytes) else (exc.stderr or "")
        with open(log_path, "w") as fh:
            fh.write(out)
            if err:
                fh.write("\n--- stderr ---\n" + err)
        dt = round(time.time() - t0, 1)
        summary["steps"][name] = {"rc": rc, "seconds": dt,
                                  "log": log_path}
        print(f"[tunnel_window] {name}: rc={rc} ({dt}s) -> {log_path}",
              flush=True)
        if rc == 2:
            summary["aborted"] = f"{name} exit 2 (init watchdog: tunnel down)"
            print(f"[tunnel_window] ABORT: {summary['aborted']}",
                  flush=True)
            break
        if name == "probe" and rc != 0:
            summary["aborted"] = "probe failed: tunnel still down"
            print(f"[tunnel_window] ABORT: {summary['aborted']}",
                  flush=True)
            break
    with open(os.path.join(out_dir, "summary.json"), "w") as fh:
        json.dump(summary, fh, indent=1)
    return summary


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="",
                    help="output dir (default tunnel_window/<timestamp>)")
    ap.add_argument("--only", default="",
                    help="comma-separated step names to run")
    ap.add_argument("--plan", action="store_true",
                    help="print the step plan as JSON and exit (smoke "
                         "surface: flag wiring is suite-tested)")
    args = ap.parse_args()

    if args.plan:
        print(json.dumps([{"name": n, "argv": a, "timeout": t}
                          for n, a, t in STEPS], indent=1))
        return 0

    out_dir = args.out or os.path.join(
        REPO, "tunnel_window", time.strftime("%Y%m%d-%H%M%S"))
    only = set(args.only.split(",")) if args.only else None
    summary = run_steps(only, out_dir)
    if "aborted" in summary:
        return 2
    print(_FLIP_REMINDER)
    return 0


if __name__ == "__main__":
    sys.exit(main())
