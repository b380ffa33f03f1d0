"""Smoke tests for the tunnel-window bench/profile tools.

These tools are the first thing run when a scarce TPU-tunnel window
opens (the lowering A/Bs in .claude/skills/verify/SKILL.md); import or
API rot in them burns the window.  Each test drives the tool end-to-end
in a subprocess on the CPU backend at tiny shapes (interpret-mode
kernels where applicable) — timings are meaningless, the wiring and
parity plumbing are what is asserted.

Subprocesses are needed because the tools configure the jax platform
themselves; the env var JAX_PLATFORMS cannot override the baked-in TPU
plugin, so each wrapper forces CPU via jax.config before runpy.
"""

from __future__ import annotations

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run_tool(path: str, argv: list[str], timeout: int = 300) -> str:
    script = (
        "import jax; jax.config.update('jax_platforms', 'cpu')\n"
        "import runpy, sys\n"
        f"sys.argv = {[os.path.basename(path)] + argv!r}\n"
        f"runpy.run_path({os.path.join(REPO, path)!r}, run_name='__main__')\n"
    )
    env = dict(os.environ, MDX_BENCH_INIT_TIMEOUT="0")  # CPU init is instant
    out = subprocess.run([sys.executable, "-c", script], cwd=REPO, env=env,
                         capture_output=True, text=True, timeout=timeout)
    assert out.returncode == 0, out.stderr[-2000:]
    return out.stdout


def test_bench_clahe_interpret_smoke():
    stdout = _run_tool("tools/bench_clahe.py",
                       ["--interpret", "--reps", "1", "--shapes", "1x128",
                        "--sharded-remap", "--json"])
    import json

    rows = json.loads(stdout.strip().splitlines()[-1])
    row = rows[0]
    # both matmul formulations timed, parity scalars tiny, sharded remap ran
    for k in ("ms_matmul-whole", "ms_matmul-banded", "ms_remap-matmul"):
        assert k in row, row.keys()
    for k, v in row.items():
        if k.startswith("parity_"):
            assert v < 1e-4, (k, v)


def test_profile_pass_ab_only_smoke():
    stdout = _run_tool("tools/profile_pass.py",
                       ["--batch", "1", "--hw", "64", "--reps", "1",
                        "--ab", "unsharp,bilateral,wavelet",
                        "--ab-only"])
    lines = stdout.strip().splitlines()
    # three parity rows + six timing rows, no regular profile blocks
    for op in ("unsharp", "bilateral", "wavelet"):
        assert any(f"{op} parity" in ln for ln in lines), lines
        assert any(ln.startswith(f"{op}:xla") for ln in lines), lines
        assert any(ln.startswith(f"{op}:pallas") for ln in lines), lines
    assert not any(ln.startswith("image_stats") for ln in lines), lines
    # parity scalars are tiny (interpret lowerings are the same math)
    for ln in lines:
        if "parity" in ln:
            assert float(ln.split()[-1]) < 1e-4, ln


def test_bench_spatial_smoke():
    stdout = _run_tool("tools/bench_spatial.py",
                       ["--hw", "128", "--reps", "1", "--only", "stats"])
    assert "image_stats" in stdout


def test_tunnel_window_plan_contract():
    """The tunnel-window orchestrator's step plan stays aligned with the
    verify-skill checklist: probe first, all five A/B surfaces, three
    serial bench reps, config-3 anchor — flag rot here would burn a
    scarce tunnel window."""
    out = subprocess.run([sys.executable, "tools/tunnel_window.py",
                          "--plan"], cwd=REPO, capture_output=True,
                         text=True, timeout=60)
    assert out.returncode == 0, out.stderr[-500:]
    import json

    steps = {s["name"]: s for s in json.loads(out.stdout)}
    assert list(steps)[0] == "probe"
    assert "--sharded-remap" in steps["clahe"]["argv"]
    for ab in ("ab512", "ab1024", "ab2048"):
        argv = steps[ab]["argv"]
        assert "unsharp,bilateral,wavelet" in argv
        assert "--ab-only" in argv
    assert steps["ab2048"]["argv"][-2:] == ["--hw", "2048"]
    assert sum(1 for n in steps if n.startswith("bench")) == 3
    assert "config3" in steps


def test_tunnel_window_abort_on_watchdog(tmp_path):
    """A child exiting 2 (init watchdog: tunnel relapse) stops the
    sequence and records the abort in summary.json."""
    sys.path.insert(0, os.path.join(REPO, "tools"))
    try:
        import tunnel_window as TW
    finally:
        sys.path.pop(0)

    calls = []

    class _P:
        def __init__(self, rc):
            self.returncode = rc
            self.stdout = "out"
            self.stderr = ""

    def fake_run(argv, **kw):
        calls.append(argv)
        # probe ok, first real step hits the watchdog
        return _P(0 if len(calls) == 1 else 2)

    summary = TW.run_steps(None, str(tmp_path), runner=fake_run)
    assert len(calls) == 2          # probe + clahe, then stop
    assert "watchdog" in summary["aborted"]
    assert (tmp_path / "summary.json").exists()
    assert (tmp_path / "probe.log").read_text() == "out"
