"""Native ingest kernel tests (native/mdxio.cpp via mdx/io/native.py).

Skipped when the toolchain cannot build the library (CI without g++).
"""

from __future__ import annotations

import numpy as np
import pytest

native = pytest.importorskip("mdx.io.native")

if not native.available():
    pytest.skip("native library unavailable", allow_module_level=True)


class TestRescale:
    @pytest.mark.parametrize("dtype", [np.uint8, np.int8, np.uint16,
                                       np.int16, np.uint32, np.int32])
    def test_rescale_matches_numpy(self, dtype):
        rng = np.random.default_rng(0)
        info = np.iinfo(dtype)
        src = rng.integers(info.min, info.max, (64, 64),
                           endpoint=True).astype(dtype)
        got = native.rescale_f32(src, 1.5, -100.0)
        want = src.astype(np.float32) * np.float32(1.5) + np.float32(-100.0)
        np.testing.assert_allclose(got, want, rtol=1e-6)

    def test_big_endian_input(self):
        src = np.arange(0, 4096, dtype=np.uint16).reshape(64, 64)
        be = src.astype(np.dtype(np.uint16).newbyteorder(">"))
        got = native.rescale_f32(be, 1.0, 0.0)
        np.testing.assert_allclose(got, src.astype(np.float32))


class TestNormalize:
    def test_fused_matches_reference(self):
        rng = np.random.default_rng(1)
        src = rng.integers(0, 4096, (128, 128)).astype(np.uint16)
        got = native.rescale_normalize(src, 1.0, -1024.0, False)
        x = src.astype(np.float32) - 1024.0
        want = (x - x.min()) / (x.max() - x.min())
        np.testing.assert_allclose(got, want, atol=1e-6)
        assert got.dtype == np.float32

    def test_monochrome1_inversion(self):
        src = np.arange(0, 256, dtype=np.uint8).reshape(16, 16)
        got = native.rescale_normalize(src, 1.0, 0.0, True)
        x = src.astype(np.float32)
        want = (x.max() - x) / (x.max() - x.min())
        np.testing.assert_allclose(got, want, atol=1e-6)

    def test_constant_image_zeros(self):
        src = np.full((32, 32), 7, np.uint16)
        got = native.rescale_normalize(src, 1.0, 0.0, False)
        np.testing.assert_array_equal(got, np.zeros((32, 32), np.float32))

    def test_normalize01(self):
        x = np.random.default_rng(2).normal(0, 10, (64, 64)).astype(np.float32)
        got = native.normalize01(x)
        want = (x - x.min()) / (x.max() - x.min())
        np.testing.assert_allclose(got, want, atol=1e-6)
