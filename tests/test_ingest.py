"""Device-side ingest parity (mdx/ops/ingest.py + load_frames_raw): raw
integer frames normalised on device must match the host pixel pipeline
(_pixels + normalize_image / window_level) to f32-FMA tolerance, across
dtypes, rescale, MONOCHROME1, stored/missing windows, both batch modes."""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp
import pytest

from mdx.io.dicom import load_frames_raw
from mdx.io import load_series, normalize_image
from mdx.io.dicom_write import write_dicom, write_synthetic_dicom
from mdx.ops.ingest import normalize_ingest
from mdx.pipeline.batch_runner import _ingest_params

ATOL = 2e-6


def _cases(tmp_path):
    rng = np.random.default_rng(7)
    cases = []

    p = str(tmp_path / "u8_plain.dcm")  # US-like: uint8, no window
    write_dicom(p, (rng.uniform(0, 255, (2, 48, 40))).astype(np.uint8),
                modality="US")
    cases.append(p)

    p = str(tmp_path / "ct_win.dcm")    # CT: int16, rescale + stored window
    write_dicom(p, rng.integers(0, 4096, (3, 40, 48)).astype(np.int16),
                modality="CT", rescale_slope=1.0, rescale_intercept=-1024.0,
                window_center=40.0, window_width=400.0, signed=True)
    cases.append(p)

    p = str(tmp_path / "mono1_win.dcm")  # CXR-like: uint16 MONO1 + window
    write_dicom(p, rng.integers(0, 65535, (2, 32, 32)).astype(np.uint16),
                modality="CR", photometric="MONOCHROME1",
                window_center=30000.0, window_width=50000.0)
    cases.append(p)

    p = str(tmp_path / "mono1_nowin.dcm")  # MONO1 without stored window
    write_dicom(p, rng.integers(100, 4000, (2, 32, 40)).astype(np.uint16),
                modality="CR", photometric="MONOCHROME1")
    cases.append(p)

    p = str(tmp_path / "slope.dcm")     # fractional rescale slope
    write_dicom(p, rng.integers(0, 1000, (1, 32, 32)).astype(np.uint16),
                modality="PT", rescale_slope=0.75, rescale_intercept=12.5)
    cases.append(p)

    return cases


@pytest.mark.parametrize("window", [False, True])
def test_device_ingest_matches_host(tmp_path, window):
    for path in _cases(tmp_path):
        raw, desc, _ = load_frames_raw(path, window=window)
        assert desc is not None, path
        n = raw.shape[0]
        params = _ingest_params([desc] * n, window, n)
        got = np.asarray(normalize_ingest(
            jnp.asarray(raw), *map(jnp.asarray, params),
            per_frame_minmax=not window))

        stack, _ = load_series(path, window=window)
        want = np.stack([
            np.asarray(stack[f], np.float32) if window
            else normalize_image(stack[f]) for f in range(n)])
        np.testing.assert_allclose(got, want, atol=ATOL, err_msg=(
            f"{path} window={window}"))
        assert got.min() >= 0.0 and got.max() <= 1.0


def test_rgb_falls_back_to_host_path(tmp_path):
    """Non-integer-grayscale pixels take the float32 fallback."""
    p = str(tmp_path / "gray.dcm")
    write_synthetic_dicom(p, kind="noisy", size=32)
    raw, desc, _ = load_frames_raw(p)
    assert desc is not None and raw.dtype == np.uint16


def test_batch_runner_raw_path_matches_host(tmp_path, monkeypatch):
    """End-to-end: run_pipeline_batch through the raw-upload path must
    produce the same per-frame metrics/scores as the host-normalised
    path (descriptor forced to None)."""
    import mdx.pipeline.batch_runner as br

    monkeypatch.setenv("MDX_DB_PATH", str(tmp_path / "db.sqlite"))
    p = str(tmp_path / "vol.dcm")
    write_synthetic_dicom(p, kind="phantom", size=64, frames=4)

    raw_ctx = br.run_pipeline_batch(
        input_path=p, output_dir=str(tmp_path / "o1"), save_artifacts=False)

    orig = br._collect_inputs_raw

    def host_only(input_path, window=False):
        items = br._collect_inputs(input_path, window=window)
        return [(lb, np.asarray(st, np.float32), None, m)
                for lb, st, m in items]

    monkeypatch.setattr(br, "_collect_inputs_raw", host_only)
    host_ctx = br.run_pipeline_batch(
        input_path=p, output_dir=str(tmp_path / "o2"), save_artifacts=False)
    monkeypatch.setattr(br, "_collect_inputs_raw", orig)

    assert len(raw_ctx["frames"]) == len(host_ctx["frames"]) == 4
    for a, b in zip(raw_ctx["frames"], host_ctx["frames"]):
        assert a["issues"] == b["issues"]
        assert a["passed"] == b["passed"]
        np.testing.assert_allclose(a["objective_score"],
                                   b["objective_score"], atol=1e-3)
        for k in a["metrics"]:
            np.testing.assert_allclose(a["metrics"][k], b["metrics"][k],
                                       rtol=2e-3, atol=2e-4, err_msg=k)
