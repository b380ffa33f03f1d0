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


class TestPackBits:
    """Native PackBits codecs must be bit-identical to the pure-Python
    reference loops in mdx/io/rle.py (which remain the fallback)."""

    def _cases(self):
        rng = np.random.default_rng(42)
        cases = [b"", b"\x00", b"ab", b"aaa", b"a" * 1000,
                 bytes(range(256)) * 3]
        for trial in range(60):
            kind = trial % 4
            n = int(rng.integers(0, 2500))
            if kind == 0:
                cases.append(rng.integers(0, 256, n,
                                          dtype=np.uint8).tobytes())
            elif kind == 1:  # long runs
                cases.append(b"".join(
                    bytes([v]) * int(rng.integers(1, 300))
                    for v in rng.integers(0, 4, max(1, n // 50),
                                          dtype=np.uint8)))
            elif kind == 2:  # short runs (Python's worst case)
                cases.append(rng.integers(0, 2, n,
                                          dtype=np.uint8).tobytes())
            else:
                cases.append((bytes(range(256)) * (n // 256 + 1))[:n])
        return cases

    def test_encode_bit_identical(self):
        from mdx.io import rle

        for b in self._cases():
            assert native.packbits_encode(b) == rle._packbits_encode_py(b)

    def test_decode_roundtrip_bit_identical(self):
        from mdx.io import rle

        for b in self._cases():
            enc = rle._packbits_encode_py(b)
            rc, got = native.packbits_decode(enc, len(b))
            assert rc == len(b)
            assert got == b
            assert got == rle._packbits_decode_py(enc, len(b))

    def test_error_taxonomy_matches_python(self):
        """The dispatching rle.packbits_decode raises the same RleError
        messages whether the native or the Python loop hit the fault."""
        from mdx.io import rle

        for bad, exp in [(b"\x05ab", 10),    # truncated literal
                         (b"\xfe", 10),      # truncated replicate
                         (b"\x00a", 10)]:    # short stream
            with pytest.raises(rle.RleError) as nat_err:
                rle.packbits_decode(bad, exp)
            with pytest.raises(rle.RleError) as py_err:
                rle._packbits_decode_py(bad, exp)
            assert str(nat_err.value) == str(py_err.value)

    def test_noop_control_and_padding(self):
        from mdx.io import rle

        # 128 no-op control bytes interleaved; trailing pad ignored
        enc = b"\x80" + rle._packbits_encode_py(b"xyz") + b"\x80\x00"
        rc, got = native.packbits_decode(enc, 3)
        assert rc == 3 and got == b"xyz"

    def test_frame_roundtrip_uses_native(self, monkeypatch):
        """decode_frame/encode_frame round-trip through the native path
        and match a forced-Python round-trip byte for byte."""
        from mdx.io import rle

        rng = np.random.default_rng(7)
        img = (rng.random((96, 80)) * 65535).astype(np.uint16)
        frag_native = rle.encode_frame(img)
        monkeypatch.setattr(native, "packbits_encode",
                            lambda *_: (_ for _ in ()).throw(
                                native.NativeUnavailable("off")))
        frag_py = rle.encode_frame(img)
        assert frag_native == frag_py
        out = rle.decode_frame(frag_native, 96, 80, 1, 2)
        np.testing.assert_array_equal(out.reshape(96, 80), img)


class TestStaleLibrary:
    def test_stale_library_degrades_to_python(self, monkeypatch):
        """A pre-existing libmdxio.so missing the current symbols (older
        source revision, no toolchain) must surface as NativeUnavailable
        — NOT AttributeError — so every caller's fallback engages."""
        from mdx.io import rle

        class _Stale:
            def __getattr__(self, name):
                raise AttributeError(f"undefined symbol: {name}")

        monkeypatch.setattr(native, "_lib", None)
        monkeypatch.setattr(native, "_build_failed", False)
        monkeypatch.setattr(native.ctypes, "CDLL", lambda p: _Stale())
        with pytest.raises(native.NativeUnavailable, match="stale"):
            native._load()
        # the dispatching codec falls back to the Python loop
        enc = rle._packbits_encode_py(b"hello world" * 10)
        assert rle.packbits_decode(enc, 110) == b"hello world" * 10
