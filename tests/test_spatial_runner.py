"""Spatial-QA runner (CLI --spatial) tests on the virtual 8-device mesh."""

from __future__ import annotations

import numpy as np
import pytest

from mdx.io.dicom_write import write_synthetic_dicom
from mdx.pipeline.spatial_runner import choose_layout, run_pipeline_spatial


@pytest.fixture(autouse=True)
def _db(tmp_path, monkeypatch):
    monkeypatch.setenv("MDX_DB_PATH", str(tmp_path / "sp.db"))


class TestChooseLayout:
    def test_prefers_square_full_mesh(self):
        # 128×128 on 8 chips: (2,4)/(4,2) beat (1,8)/(8,1) on squareness
        sy, sx = choose_layout(128, 128, 8)
        assert sy * sx == 8 and {sy, sx} == {2, 4}

    def test_narrow_image_limits_cols(self):
        # W=32 can take at most 2 column shards (16-col floor)
        sy, sx = choose_layout(256, 32, 8)
        assert sx <= 2 and sy * sx == 8

    def test_tiny_image_single_shard(self):
        assert choose_layout(16, 16, 8) == (1, 1)

    def test_odd_extent_skipped(self):
        # 34/2=17 odd per-shard rows break the stride-2 phase → that axis
        # stays unsharded
        sy, sx = choose_layout(34, 128, 2)
        assert sy == 1

    def test_single_device(self):
        assert choose_layout(2048, 2048, 1) == (1, 1)


class TestSpatialRunnerE2E:
    def test_end_to_end(self, tmp_path):
        p = str(tmp_path / "big.dcm")
        write_synthetic_dicom(p, kind="noisy", size=128)
        ctx = run_pipeline_spatial(p, output_dir=str(tmp_path / "out"))
        assert ctx["spatial"] and ctx["shape"] == [128, 128]
        # 8 virtual CPU devices → the 2-D tile layout
        assert ctx["mesh"] in ({"sy": 2, "sx": 4}, {"sy": 4, "sx": 2})
        assert "noise" in ctx["issues"]
        assert "denoise" in ctx["applied_ops"]
        assert "# mdx spatial QA report" in ctx["report_md"]
        assert 0.0 <= ctx["validation"]["ssim"] <= 1.0
        # run persisted and readable through the storage DAO
        from mdx.pipeline import storage
        row = storage.get_run(ctx["run_id"])
        assert row is not None and row["status"] == "completed"
        assert row["metrics_before"]["sigma"] == ctx["metrics"]["sigma"]

    def test_matches_dense_metrics(self, tmp_path):
        """The runner's detected metrics must match the single-chip fused
        pass on the same decoded slice."""
        import jax.numpy as jnp

        from mdx.core import metrics as M
        from mdx.io import load_dicom, normalize_image

        p = str(tmp_path / "b.dcm")
        write_synthetic_dicom(p, kind="noisy", size=128)
        ctx = run_pipeline_spatial(p, output_dir=str(tmp_path / "out"))
        img, _ = load_dicom(p)
        x = jnp.asarray(normalize_image(img)[None])
        ref = M.image_stats(x)
        for k, v in ctx["metrics"].items():
            np.testing.assert_allclose(v, float(np.asarray(ref[k])[0]),
                                       rtol=1e-4, err_msg=k)

    def test_matches_dense_deterministic_path(self, tmp_path):
        """The sharded issue-driven chain must reproduce the single-chip
        deterministic QA (same issue→op mapping, same conservative
        defaults, same noise-amp guard) on the same decoded slice."""
        import jax.numpy as jnp

        from mdx.core import qa
        from mdx.io import load_dicom, normalize_image

        p = str(tmp_path / "d.dcm")
        write_synthetic_dicom(p, kind="noisy", size=128)
        ctx = run_pipeline_spatial(p, output_dir=str(tmp_path / "out"))
        img, _ = load_dicom(p)
        x = jnp.asarray(normalize_image(img)[None])
        enhanced, _stats, _issues, flags, validation, _score = (
            qa.qa_deterministic(x))
        np.testing.assert_allclose(ctx["enhanced"],
                                   np.asarray(enhanced)[0], atol=1e-4)
        assert ctx["noise_amp_guard"] == bool(
            np.asarray(flags["noise_amp"])[0])
        np.testing.assert_allclose(
            ctx["validation"]["ssim"],
            float(np.asarray(validation["ssim"])[0]), atol=1e-4)

    def test_autotune_mode(self, tmp_path):
        """--spatial --autotune: candidate sweep on the sharded plan path,
        persisting the winning plan + iteration records."""
        p = str(tmp_path / "a.dcm")
        write_synthetic_dicom(p, kind="noisy", size=128)
        ctx = run_pipeline_spatial(p, output_dir=str(tmp_path / "out"),
                                   autotune=True)
        assert ctx["plan"] is not None
        assert len(ctx["iterations"]) >= 3
        assert sum(1 for r in ctx["iterations"] if r.chosen) == 1
        assert "autotune sweep" in ctx["report_md"]
        from mdx.pipeline import storage
        row = storage.get_run(ctx["run_id"])
        assert row["plan_json"]  # winning plan persisted

    def test_cli_flag(self, tmp_path, capsys):
        import main as cli

        p = str(tmp_path / "c.dcm")
        write_synthetic_dicom(p, kind="noisy", size=128)
        rc = cli.main(["--input", p, "--output", str(tmp_path / "out"),
                       "--spatial", "--no-show"])
        assert rc == 0
        assert "spatial QA report" in capsys.readouterr().out
