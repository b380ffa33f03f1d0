"""Round-4 benchmark tooling: the baseline-denominator machinery.

The headline's ``vs_baseline`` denominator now flows through three
cooperating pieces (tools/bench_reference.py, tools/baseline_bias.py,
bench.py::_resolve_baseline).  These tests pin the seams: resolution
precedence and provenance labels, the reference-measurement harness's
refimpl mode, and the bias-bound arithmetic — all at tiny sizes on CPU.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

import numpy as np
import pytest

_REPO = os.path.join(os.path.dirname(__file__), "..")
sys.path.insert(0, os.path.abspath(_REPO))

import bench  # noqa: E402


class TestResolveBaseline:
    def test_env_wins(self, monkeypatch):
        monkeypatch.setenv("MDX_BASELINE_IPS", "3.5")
        val, kind = bench._resolve_baseline(bench._make_batch(1, 64))
        assert val == 3.5
        assert "MDX_BASELINE_IPS" in kind

    def test_committed_record_is_used_and_labelled(self, monkeypatch,
                                                   tmp_path):
        monkeypatch.delenv("MDX_BASELINE_IPS", raising=False)
        rec = tmp_path / "BASELINE_REF.json"
        rec.write_text(json.dumps({
            "impl": "refimpl-f32-bound", "images_per_sec": 2.5}))
        monkeypatch.setattr(bench, "_BASELINE_REF", str(rec))
        val, kind = bench._resolve_baseline(bench._make_batch(1, 64))
        assert val == 2.5
        assert "upper bound" in kind  # bound provenance is explicit

    def test_measured_reference_label(self, monkeypatch, tmp_path):
        monkeypatch.delenv("MDX_BASELINE_IPS", raising=False)
        rec = tmp_path / "BASELINE_REF.json"
        rec.write_text(json.dumps({
            "impl": "skimage", "images_per_sec": 4.0}))
        monkeypatch.setattr(bench, "_BASELINE_REF", str(rec))
        _, kind = bench._resolve_baseline(bench._make_batch(1, 64))
        assert "measured reference" in kind

    def test_committed_record_matches_live_tool(self):
        """The checked-in BASELINE_REF.json must stay structurally valid
        for bench.py (it IS the shipping denominator)."""
        path = os.path.join(_REPO, "BASELINE_REF.json")
        with open(path) as f:
            rec = json.load(f)
        assert rec["images_per_sec"] > 0
        assert rec["impl"] in ("reference", "skimage", "refimpl-f32-bound")


class TestBenchReferenceTool:
    def test_refimpl_mode_runs(self):
        out = subprocess.run(
            [sys.executable, os.path.join(_REPO, "tools",
                                          "bench_reference.py"),
             "--impl", "refimpl", "--size", "64", "--repeats", "1"],
            capture_output=True, text=True, timeout=300, check=True)
        data = json.loads(out.stdout)
        r = data["impls"]["refimpl"]
        assert r["images_per_sec"] > 0
        assert set(r["components_s"]) >= {"metrics", "niqe", "tv",
                                          "bilateral", "clahe"}

    def test_unavailable_impls_degrade(self):
        """Where scikit-image is absent the reference/skimage rows say
        so instead of crashing (CI has the deps; this env does not)."""
        out = subprocess.run(
            [sys.executable, os.path.join(_REPO, "tools",
                                          "bench_reference.py"),
             "--impl", "all", "--size", "64", "--repeats", "1"],
            capture_output=True, text=True, timeout=300, check=True)
        data = json.loads(out.stdout)
        for name in ("reference", "skimage"):
            entry = data["impls"][name]
            assert "images_per_sec" in entry or "unavailable" in entry


class TestBaselineBias:
    def test_bound_factor_sane(self, tmp_path):
        out = subprocess.run(
            [sys.executable, os.path.join(_REPO, "tools",
                                          "baseline_bias.py"),
             "--size", "64", "--repeats", "1"],
            capture_output=True, text=True, timeout=300, check=True)
        data = json.loads(out.stdout)
        # the bound must favour the reference (>1) but stay physical
        assert 1.0 < data["bound_factor"] < 10.0
        assert data["bounded_reference_images_per_sec"] > \
            data["refimpl_images_per_sec"]
        # dtype ratios measured, not assumed
        for k in ("tv", "bilateral", "uniform7"):
            assert data["f64_over_f32_ratios"][k] > 0.5


class TestVpuUtilAggregate:
    def test_formula(self):
        # vpu_util = ips · px · ops/px / peak — pin against the constants
        ips = 1000.0
        want = ips * 512 * 512 * bench._EST_OPS_PER_PX / bench._VPU_PEAK_OPS
        assert 0.2 < want < 0.4  # at 1000 img/s the pass is ~27% of peak

    def test_prefers_compiler_counted_flops(self):
        # with XLA cost-analysis flops available, the measured number
        # wins and the kind says so; None/0 falls back to the estimate
        util, kind = bench._vpu_util(1000.0, 1.0e9)
        assert kind == "xla-cost-analysis"
        assert abs(util - 1000.0 * 1.0e9 / bench._VPU_PEAK_OPS) < 1e-12
        for bad in (None, 0.0):
            util, kind = bench._vpu_util(1000.0, bad)
            assert kind == "analytic-estimate"
            assert util == pytest.approx(
                1000.0 * 512 * 512 * bench._EST_OPS_PER_PX
                / bench._VPU_PEAK_OPS)


class TestConfig2Tool:
    def test_cpu_smoke_bare_and_guarded(self):
        env = {**os.environ, "JAX_PLATFORMS": ""}
        for extra in ([], ["--bare"]):
            out = subprocess.run(
                [sys.executable, "-c",
                 "import jax; jax.config.update('jax_platforms','cpu');"
                 "import sys, runpy;"
                 f"sys.argv=['b','--batch','4','--hw','32','--reps','1']"
                 f"{'+[\"--bare\"]' if extra else ''};"
                 "runpy.run_path('examples/bench_config2.py',"
                 "run_name='__main__')"],
                capture_output=True, text=True, timeout=600, check=True,
                cwd=_REPO, env=env)
            data = json.loads(out.stdout.strip().splitlines()[-1])
            assert data["img_per_s_chip"] > 0
