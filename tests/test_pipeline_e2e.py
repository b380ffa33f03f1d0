"""End-to-end pipeline + CLI + batch tests (ref tests/test_pipeline.py
full 5-agent E2E smoke) — exercising mdx's real entry points on synthetic
DICOM files written by our own writer."""

from __future__ import annotations

import os

import numpy as np
import pytest

from mdx.io.dicom_write import write_synthetic_dicom


@pytest.fixture(autouse=True)
def _db(tmp_path, monkeypatch):
    monkeypatch.setenv("MDX_DB_PATH", str(tmp_path / "e2e.db"))


class TestDicomRoundTrip:
    def test_write_read_16bit(self, tmp_path):
        from mdx.io import load_dicom

        p = str(tmp_path / "a.dcm")
        write_synthetic_dicom(p, kind="noisy", size=64)
        img, meta = load_dicom(p)
        assert img.shape == (64, 64) and img.dtype == np.float32
        assert meta["Modality"] == "CT"

    def test_monochrome1_inverts(self, tmp_path):
        from mdx.io import load_dicom

        grad = (np.linspace(0, 1, 64 * 64).reshape(64, 64) * 65535
                ).astype(np.uint16)
        from mdx.io.dicom_write import write_dicom

        p1 = str(tmp_path / "m2.dcm")
        p2 = str(tmp_path / "m1.dcm")
        write_dicom(p1, grad, photometric="MONOCHROME2")
        write_dicom(p2, grad, photometric="MONOCHROME1")
        a, _ = load_dicom(p1)
        b, _ = load_dicom(p2)
        # MONOCHROME1 = inverted grayscale
        np.testing.assert_allclose(a + b, np.full_like(a, a.max()),
                                   atol=1e-2)

    def test_rescale_applied(self, tmp_path):
        from mdx.io import load_dicom

        from mdx.io.dicom_write import write_dicom

        pix = np.full((32, 32), 2048, np.uint16)
        pix[0, 0] = 0
        p = str(tmp_path / "ct.dcm")
        write_dicom(p, pix, rescale_slope=1.0, rescale_intercept=-1024.0)
        img, _ = load_dicom(p)
        # after rescale the data spans [-1024, 1024] → normalisation later
        assert img.min() == -1024.0 and img.max() == 1024.0

    def test_multiframe_series(self, tmp_path):
        from mdx.io import load_dicom, load_series

        p = str(tmp_path / "vol.dcm")
        write_synthetic_dicom(p, kind="phantom", size=32, frames=5)
        stack, _ = load_series(p)
        assert stack.shape == (5, 32, 32)
        # single-slice path keeps reference middle-frame behaviour
        mid, _ = load_dicom(p)
        np.testing.assert_allclose(mid, stack[2])


class TestRunnerE2E:
    def test_deterministic_run(self, tmp_path):
        from mdx.pipeline.runner import run_pipeline

        p = str(tmp_path / "noisy.dcm")
        write_synthetic_dicom(p, kind="noisy", size=64)
        ctx = run_pipeline(input_path=p, output_dir=str(tmp_path / "out"),
                           no_show=True)
        assert "noise" in ctx["issues"]
        assert ctx["report_md"].startswith("# ")
        assert "Wavelet denoise" in " ".join(ctx["applied_ops"])
        assert os.path.isfile(ctx["report_path"])
        assert ctx["enhanced_image"].shape == (64, 64)
        # persisted
        from mdx.pipeline import storage

        assert storage.get_run(ctx["run_id"])["status"] in (
            "completed", "PASS", "WARN", "FAIL")

    def test_clean_image_no_ops(self, tmp_path):
        from mdx.pipeline.runner import run_pipeline

        p = str(tmp_path / "clean.dcm")
        # full-range gradient + light noise → no issues
        rng = np.random.default_rng(42)
        img = np.linspace(0.1, 0.9, 64 * 64).reshape(64, 64)
        img = np.clip(img + rng.normal(0, 0.01, img.shape), 0, 1)
        from mdx.io.dicom_write import write_dicom

        write_dicom(str(tmp_path / "clean.dcm"),
                    (img * 65535).astype(np.uint16))
        ctx = run_pipeline(input_path=str(tmp_path / "clean.dcm"),
                           output_dir=str(tmp_path / "out"), no_show=True)
        assert ctx["issues"] == []
        assert ctx["applied_ops"] == []
        np.testing.assert_allclose(ctx["enhanced_image"],
                                   ctx["original_image"])


class TestCLI:
    def test_cli_deterministic(self, tmp_path, capsys):
        import main as cli

        p = str(tmp_path / "n.dcm")
        write_synthetic_dicom(p, kind="noisy", size=64)
        rc = cli.main(["--input", p, "--output", str(tmp_path / "out"),
                       "--no-show"])
        assert rc == 0
        out = capsys.readouterr().out
        assert "# " in out and "noise" in out

    def test_cli_missing_file(self, tmp_path, capsys):
        import main as cli

        rc = cli.main(["--input", str(tmp_path / "missing.dcm"),
                       "--no-show"])
        assert rc == 1

    def test_cli_loads_dotenv(self, tmp_path):
        # Ref main.py:7-11 loads .env before anything; mdx does it on
        # `import main` (via mdx.serve.config).  Import-time effect, so
        # exercise it in a subprocess with the .env in its cwd.
        import subprocess
        import sys

        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        (tmp_path / ".env").write_text("MDX_TEST_DOTENV=from-dotenv\n")
        env = {**os.environ, "PYTHONPATH": repo}
        env.pop("MDX_TEST_DOTENV", None)
        out = subprocess.run(
            [sys.executable, "-c",
             "import main, os; print(os.environ.get('MDX_TEST_DOTENV'))"],
            cwd=tmp_path, env=env, capture_output=True, text=True,
            timeout=120)
        assert out.returncode == 0, out.stderr
        assert out.stdout.strip() == "from-dotenv"


class TestBatchRunner:
    def test_multiframe_batch(self, tmp_path):
        from mdx.pipeline.batch_runner import run_pipeline_batch

        p = str(tmp_path / "vol.dcm")
        write_synthetic_dicom(p, kind="phantom", size=64, frames=3)
        ctx = run_pipeline_batch(input_path=p,
                                 output_dir=str(tmp_path / "out"))
        assert ctx["batch"] and len(ctx["frames"]) == 3
        assert all(f["shape"] == [64, 64] for f in ctx["frames"])
        assert os.path.isfile(os.path.join(tmp_path, "out",
                                           "batch_report.md"))

    def test_directory_batch(self, tmp_path):
        from mdx.pipeline.batch_runner import run_pipeline_batch

        d = tmp_path / "series"
        d.mkdir()
        for i, kind in enumerate(["noisy", "low_contrast"]):
            write_synthetic_dicom(str(d / f"{i}.dcm"), kind=kind, size=64)
        ctx = run_pipeline_batch(input_path=str(d),
                                 output_dir=str(tmp_path / "out"))
        assert len(ctx["frames"]) == 2
        issues = {f["source"]: f["issues"] for f in ctx["frames"]}
        assert "noise" in issues["0.dcm"]


class TestBatchResume:
    def test_resume_skips_completed_frames(self, tmp_path):
        from mdx.pipeline.batch_runner import run_pipeline_batch

        p = str(tmp_path / "vol.dcm")
        write_synthetic_dicom(p, kind="phantom", size=64, frames=3)
        first = run_pipeline_batch(input_path=p,
                                   output_dir=str(tmp_path / "out"))
        assert len(first["frames"]) == 3 and first["skipped"] == 0
        second = run_pipeline_batch(input_path=p,
                                    output_dir=str(tmp_path / "out"),
                                    resume=True)
        assert second["skipped"] == 3 and second["frames"] == []


class TestWindowing:
    def test_voi_window_applied(self, tmp_path):
        """Config 5: per-sample VOI windowing on 12-bit CT-like data."""
        from mdx.io import load_dicom
        from mdx.io.dicom_write import write_dicom
        from mdx.io.normalize import window_level

        pix = np.arange(0, 4096, dtype=np.uint16).reshape(64, 64)
        p = str(tmp_path / "w.dcm")
        write_dicom(p, pix, rescale_slope=1.0, rescale_intercept=-1024.0,
                    window_center=40.0, window_width=400.0)
        raw, _ = load_dicom(p)                       # no window: HU values
        assert raw.min() == -1024.0
        win, _ = load_dicom(p, window=True)          # windowed → [0,1]
        assert win.min() >= 0.0 and win.max() <= 1.0
        want = window_level(raw, 40.0, 400.0)
        np.testing.assert_allclose(win, want, atol=1e-6)
        # soft-tissue window saturates the extremes
        assert float(win[0, 0]) == 0.0 and float(win[-1, -1]) == 1.0

    def test_window_absent_falls_back_to_normalize(self, tmp_path):
        """window=True on a file with no stored VOI window must still
        deliver [0,1] data (min-max fallback) — raw modality-scale
        intensities would silently break every QA threshold."""
        from mdx.io import load_dicom, normalize_image

        p = str(tmp_path / "nw.dcm")
        write_synthetic_dicom(p, kind="noisy", size=32)
        a, _ = load_dicom(p)
        b, _ = load_dicom(p, window=True)
        np.testing.assert_allclose(b, normalize_image(a), atol=1e-6)

    def test_mono1_window_order(self, tmp_path):
        """VOI window applies BEFORE MONOCHROME1 inversion (DICOM PS3.14):
        the stored window selects the pre-inversion intensity range."""
        from mdx.io import load_dicom
        from mdx.io.dicom_write import write_dicom
        from mdx.io.normalize import window_level

        pix = np.arange(0, 4096, dtype=np.uint16).reshape(64, 64)
        p = str(tmp_path / "m1w.dcm")
        write_dicom(p, pix, photometric="MONOCHROME1",
                    window_center=2000.0, window_width=1000.0)
        img, _ = load_dicom(p, window=True)
        want = 1.0 - window_level(pix.astype(np.float32), 2000.0, 1000.0)
        np.testing.assert_allclose(img, want, atol=1e-6)

    def test_batch_with_windowing(self, tmp_path):
        from mdx.io.dicom_write import write_dicom
        from mdx.pipeline.batch_runner import run_pipeline_batch

        rng = np.random.default_rng(0)
        pix = rng.integers(0, 4096, (64, 64)).astype(np.uint16)
        d = tmp_path / "mix"
        d.mkdir()
        write_dicom(str(d / "ct.dcm"), pix, rescale_slope=1.0,
                    rescale_intercept=-1024.0, window_center=40.0,
                    window_width=400.0)
        ctx = run_pipeline_batch(input_path=str(d),
                                 output_dir=str(tmp_path / "out"),
                                 window=True)
        assert len(ctx["frames"]) == 1


class TestAutotune:
    def test_autotune_run(self, tmp_path):
        from mdx.pipeline.runner import run_pipeline

        p = str(tmp_path / "noisy.dcm")
        write_synthetic_dicom(p, kind="noisy", size=64)
        ctx = run_pipeline(input_path=p, output_dir=str(tmp_path / "out"),
                           autotune=True, no_show=True)
        assert ctx["autotune"]
        assert len(ctx["genai_iterations"]) >= 9
        assert sum(1 for r in ctx["genai_iterations"] if r.chosen) == 1
        best = max(ctx["genai_iterations"], key=lambda r: r.score)
        assert best.chosen
        assert ctx["enhanced_image"].shape == (64, 64)
        # the iteration table lands in the report
        assert "on-device autotune" in ctx["report_md"] or \
            ctx["genai_model"] == "on-device autotune"

    def test_autotune_cli(self, tmp_path, capsys):
        import main as cli

        p = str(tmp_path / "n.dcm")
        write_synthetic_dicom(p, kind="noisy", size=64)
        rc = cli.main(["--input", p, "--output", str(tmp_path / "out"),
                       "--no-show", "--autotune"])
        assert rc == 0


class TestImplicitVR:
    def test_read_implicit_vr_little_endian(self, tmp_path):
        """The reader must handle Implicit VR LE (the writer only emits
        Explicit LE, so this file is crafted by hand)."""
        import struct

        from mdx.io.dicom import TS_IMPLICIT_LE
        from mdx.io import load_dicom

        def el_implicit(group, elem, value: bytes) -> bytes:
            if len(value) % 2:
                value += b"\x00"
            return struct.pack("<HHI", group, elem, len(value)) + value

        rows = cols = 16
        pix = (np.linspace(0, 65535, rows * cols).astype(np.uint16)
               .reshape(rows, cols))
        body = b"".join([
            el_implicit(0x0008, 0x0060, b"CT"),
            el_implicit(0x0028, 0x0002, struct.pack("<H", 1)),
            el_implicit(0x0028, 0x0004, b"MONOCHROME2 "),
            el_implicit(0x0028, 0x0010, struct.pack("<H", rows)),
            el_implicit(0x0028, 0x0011, struct.pack("<H", cols)),
            el_implicit(0x0028, 0x0100, struct.pack("<H", 16)),
            el_implicit(0x0028, 0x0101, struct.pack("<H", 16)),
            el_implicit(0x0028, 0x0103, struct.pack("<H", 0)),
            el_implicit(0x7FE0, 0x0010, pix.tobytes()),
        ])

        # file meta is always explicit VR LE
        def el_explicit(group, elem, vr: bytes, value: bytes) -> bytes:
            if len(value) % 2:
                value += b"\x00"
            return struct.pack("<HH2sH", group, elem, vr, len(value)) + value

        meta_elements = el_explicit(0x0002, 0x0010, b"UI",
                                    TS_IMPLICIT_LE.encode())
        meta = el_explicit(0x0002, 0x0000, b"UL",
                           struct.pack("<I", len(meta_elements)))
        p = tmp_path / "implicit.dcm"
        p.write_bytes(b"\x00" * 128 + b"DICM" + meta + meta_elements + body)

        img, metadata = load_dicom(str(p))
        assert img.shape == (16, 16)
        assert metadata["Modality"] == "CT"
        np.testing.assert_allclose(img[0, 0], 0.0)
        np.testing.assert_allclose(img[-1, -1], 65535.0)


class TestAutotuneBatch:
    def test_per_frame_best_plans(self, noisy_image, low_contrast_image):
        from mdx.core.tuning import autotune, autotune_batch

        imgs = np.stack([noisy_image, low_contrast_image])
        plans, enhanced, scores = autotune_batch(
            imgs, [["noise"], ["low_contrast"]])
        assert len(plans) == 2 and enhanced.shape == imgs.shape
        assert scores.shape[0] == 2
        # each frame's pick is its own argmax
        for i in range(2):
            assert scores[i].max() == scores[i][np.argmax(scores[i])]
        # parity with the single-image sweep on the union grid
        single_plan, single_img, recs = autotune(
            noisy_image, ["noise", "low_contrast"])
        np.testing.assert_allclose(enhanced[0], single_img, atol=1e-5)
        assert plans[0].params.clahe_clip_limit == \
            single_plan.params.clahe_clip_limit

    def test_batch_autotune_mode(self, tmp_path):
        from mdx.pipeline.batch_runner import run_pipeline_batch

        p = str(tmp_path / "vol.dcm")
        write_synthetic_dicom(p, kind="noisy", size=64, frames=2)
        ctx = run_pipeline_batch(input_path=p,
                                 output_dir=str(tmp_path / "out"),
                                 autotune=True)
        assert len(ctx["frames"]) == 2
        assert all(np.isfinite(f["objective_score"]) for f in ctx["frames"])
