"""JPEG Lossless (ITU-T T.81 process 14) transfer syntaxes.

The reference cannot decode these at all — plain pydicom needs a plugin
its requirements.txt does not install (ref pipeline/dicom_io.py:29-45) —
so ``mdx.io.jpegll`` is a documented extension.  Contract tested here:

* codec round-trips are exact for every predictor (1-7), precision,
  point transform, restart interval and component count;
* the native entropy decoder (``mdxio_jpegll_diffs``) is bit-identical
  to the pure-Python oracle (``_scan_diffs_py``);
* a JPEG-LL DICOM file loads bit-for-bit identically to the same pixels
  written uncompressed (same contract as tests/test_dicom_compressed.py);
* malformed/unsupported streams raise, never return wrong pixels.
"""

from __future__ import annotations

import numpy as np
import pytest

from mdx.io import jpegll
from mdx.io.dicom import (
    TS_EXPLICIT_LE,
    TS_JPEG_LL,
    TS_JPEG_LL_SV1,
    DicomError,
    decode_pixels,
    load_dicom,
    read_dataset,
)
from mdx.io.dicom_write import write_dicom
from mdx.io.jpegll import JpegLLError


def _img(seed=0, shape=(40, 56), precision=12):
    """Smooth gradient + noise + a flat band — mixes small and big diffs."""
    rng = np.random.default_rng(seed)
    h, w = shape
    base = np.linspace(0, (1 << precision) - 1, w, dtype=np.int64)
    img = np.broadcast_to(base, shape).copy()
    img[h // 4:h // 2] = (1 << precision) // 2
    img += rng.integers(-200, 200, shape)
    return np.clip(img, 0, (1 << precision) - 1).astype(np.uint16)


class TestCodecRoundtrip:
    @pytest.mark.parametrize("pred", [1, 2, 3, 4, 5, 6, 7])
    def test_predictors(self, pred):
        img = _img(seed=pred)
        dec, p = jpegll.decode(jpegll.encode(img, precision=12,
                                             predictor=pred))
        assert p == 12
        np.testing.assert_array_equal(dec, img)

    @pytest.mark.parametrize("precision", [2, 4, 8, 10, 12, 15, 16])
    def test_precisions(self, precision):
        rng = np.random.default_rng(precision)
        img = rng.integers(0, 1 << precision, (24, 24)).astype(np.uint16)
        dec, p = jpegll.decode(jpegll.encode(img, precision=precision))
        assert p == precision
        np.testing.assert_array_equal(dec, img)

    def test_precision_inferred(self):
        img = _img(precision=10)
        enc = jpegll.encode(img)      # precision=None → from data
        dec, p = jpegll.decode(enc)
        assert p == max(2, int(img.max()).bit_length())
        np.testing.assert_array_equal(dec, img)

    @pytest.mark.parametrize("pred", [1, 4, 6])
    @pytest.mark.parametrize("restart_rows", [1, 3, 16])
    def test_restart_intervals(self, pred, restart_rows):
        # 40 rows: 3 and 16 leave a short final interval
        img = _img(seed=restart_rows)
        enc = jpegll.encode(img, precision=12, predictor=pred,
                            restart_rows=restart_rows)
        dec, _ = jpegll.decode(enc)
        np.testing.assert_array_equal(dec, img)

    @pytest.mark.parametrize("pt", [1, 3])
    @pytest.mark.parametrize("pred", [1, 5, 7])
    def test_point_transform(self, pt, pred):
        img = _img(seed=pt)
        enc = jpegll.encode(img, precision=12, predictor=pred,
                            point_transform=pt)
        dec, _ = jpegll.decode(enc)
        np.testing.assert_array_equal(dec, (img >> pt).astype(np.uint16) << pt)

    @pytest.mark.parametrize("ncomp", [2, 3, 4])
    def test_interleaved_components(self, ncomp):
        rng = np.random.default_rng(ncomp)
        img = rng.integers(0, 256, (20, 28, ncomp)).astype(np.uint16)
        dec, p = jpegll.decode(jpegll.encode(img, precision=8))
        assert p == 8 and dec.shape == img.shape
        np.testing.assert_array_equal(dec, img)

    def test_ssss16_extreme_diffs(self):
        # alternating 0/65535 rows at precision 16 → ±32768 diffs (the
        # SSSS=16 no-extra-bits symbol) on every column of every row pair
        img = np.zeros((10, 12), np.uint16)
        img[::2] = 65535
        dec, _ = jpegll.decode(jpegll.encode(img, precision=16))
        np.testing.assert_array_equal(dec, img)

    def test_constant_image_single_symbol_table(self):
        # all-zero diffs → one real Huffman symbol; exercises the
        # single-symbol package-merge path and the K.2 dummy
        img = np.full((16, 16), 777, np.uint16)
        dec, _ = jpegll.decode(jpegll.encode(img, precision=12))
        np.testing.assert_array_equal(dec, img)

    @pytest.mark.parametrize("shape", [(1, 1), (1, 17), (17, 1), (2, 2)])
    def test_degenerate_shapes(self, shape):
        rng = np.random.default_rng(shape[0] * 31 + shape[1])
        img = rng.integers(0, 4096, shape).astype(np.uint16)
        dec, _ = jpegll.decode(jpegll.encode(img, precision=12))
        np.testing.assert_array_equal(dec, img)

    def test_fuzz_roundtrip(self):
        rng = np.random.default_rng(99)
        for trial in range(25):
            h, w = int(rng.integers(1, 40)), int(rng.integers(1, 40))
            precision = int(rng.integers(2, 17))
            pred = int(rng.integers(1, 8))
            rr = int(rng.integers(0, 4))
            img = rng.integers(0, 1 << precision, (h, w)).astype(np.uint16)
            enc = jpegll.encode(img, precision=precision, predictor=pred,
                                restart_rows=rr)
            dec, p = jpegll.decode(enc)
            assert p == precision
            np.testing.assert_array_equal(dec, img, err_msg=f"trial {trial}")


class TestNativeParity:
    """The C entropy decoder is bit-identical to the Python oracle."""

    def _forced_python_decode(self, monkeypatch, enc):
        monkeypatch.setattr(
            jpegll, "_scan_diffs",
            lambda seg, tabs, rows, cols:
                jpegll._scan_diffs_py(seg, tabs, rows * cols))
        return jpegll.decode(enc)

    @pytest.mark.parametrize("pred", [1, 4, 6])
    def test_decode_parity(self, monkeypatch, pred):
        pytest.importorskip("mdx.io.native")
        from mdx.io import native
        try:
            native._load()
        except native.NativeUnavailable:
            pytest.skip("native library not built")
        img = _img(seed=pred + 50)
        enc = jpegll.encode(img, precision=12, predictor=pred,
                            restart_rows=8)
        d_native, _ = jpegll.decode(enc)
        d_python, _ = self._forced_python_decode(monkeypatch, enc)
        np.testing.assert_array_equal(d_native, d_python)

    def test_encode_pack_parity(self, monkeypatch):
        """Native bit packer emits byte-identical streams to the NumPy
        packer (codes MSB-first, 1-padding, 0xFF stuffing)."""
        from mdx.io import native
        try:
            native._load()
        except native.NativeUnavailable:
            pytest.skip("native library not built")
        rng = np.random.default_rng(5)
        for trial in range(15):
            h, w = int(rng.integers(1, 40)), int(rng.integers(1, 40))
            prec = int(rng.integers(2, 17))
            pred = int(rng.integers(1, 8))
            rr = int(rng.integers(0, 3))
            im = rng.integers(0, 1 << prec, (h, w)).astype(np.uint16)
            e_native = jpegll.encode(im, precision=prec, predictor=pred,
                                     restart_rows=rr)
            with monkeypatch.context() as mp:
                mp.setattr(jpegll, "_pack_segment", jpegll._pack_segment_py)
                e_python = jpegll.encode(im, precision=prec, predictor=pred,
                                         restart_rows=rr)
            assert e_native == e_python, f"trial {trial}"

    def test_pack_parity_ssss16_and_ff_stuffing(self, monkeypatch):
        # extremes: SSSS=16 symbols (no extra bits) and dense 0xFF bytes
        from mdx.io import native
        try:
            native._load()
        except native.NativeUnavailable:
            pytest.skip("native library not built")
        img = np.zeros((9, 11), np.uint16)
        img[::2] = 65535                      # ±32768 diffs everywhere
        e_native = jpegll.encode(img, precision=16)
        with monkeypatch.context() as mp:
            mp.setattr(jpegll, "_pack_segment", jpegll._pack_segment_py)
            e_python = jpegll.encode(img, precision=16)
        assert e_native == e_python
        dec, _ = jpegll.decode(e_native)
        np.testing.assert_array_equal(dec, img)

    def test_error_taxonomy_parity(self, monkeypatch):
        from mdx.io import native
        try:
            native._load()
        except native.NativeUnavailable:
            pytest.skip("native library not built")
        img = _img(seed=3)
        enc = bytearray(jpegll.encode(img, precision=12))
        # truncate mid-scan: both paths must say "Truncated"
        cut = enc[: len(enc) - 40] + b"\xff\xd9"
        with pytest.raises(JpegLLError, match="Truncated|Invalid"):
            jpegll.decode(bytes(cut))
        monkeypatch.setattr(
            jpegll, "_scan_diffs",
            lambda seg, tabs, rows, cols:
                jpegll._scan_diffs_py(seg, tabs, rows * cols))
        with pytest.raises(JpegLLError, match="Truncated|Invalid"):
            jpegll.decode(bytes(cut))


class TestDicomIntegration:
    """Same contract as the RLE/Deflated tests: the compressed encoding
    loads bit-for-bit identically to Explicit VR LE."""

    @pytest.mark.parametrize("dtype", [np.uint8, np.uint16, np.int16])
    def test_roundtrip_matches_uncompressed(self, tmp_path, dtype):
        rng = np.random.default_rng(17)
        info = np.iinfo(dtype)
        pix = rng.integers(info.min, int(info.max) + 1,
                           (48, 48)).astype(dtype)
        p_raw = str(tmp_path / "raw.dcm")
        p_jll = str(tmp_path / "jll.dcm")
        write_dicom(p_raw, pix, transfer_syntax=TS_EXPLICIT_LE)
        write_dicom(p_jll, pix, transfer_syntax=TS_JPEG_LL_SV1)
        img_raw, _ = load_dicom(p_raw)
        img_jll, _ = load_dicom(p_jll)
        np.testing.assert_array_equal(img_jll, img_raw)

    def test_multiframe_one_fragment_per_frame(self, tmp_path):
        rng = np.random.default_rng(18)
        pix = rng.integers(0, 4096, (5, 32, 32)).astype(np.uint16)
        p = str(tmp_path / "mf.dcm")
        write_dicom(p, pix, transfer_syntax=TS_JPEG_LL_SV1)
        ds = read_dataset(p)
        assert len(ds.fragments) == 5
        arr = decode_pixels(ds)
        np.testing.assert_array_equal(arr.reshape(pix.shape), pix)

    def test_single_frame_spanning_fragments(self, tmp_path):
        # PS3.5 A.4: one frame MAY span multiple fragments
        pix = _img(seed=19, shape=(32, 32))
        p = str(tmp_path / "sf.dcm")
        write_dicom(p, pix, transfer_syntax=TS_JPEG_LL_SV1)
        ds = read_dataset(p)
        (frag,) = ds.fragments
        ds.fragments = [frag[:37], frag[37:]]
        arr = decode_pixels(ds)
        np.testing.assert_array_equal(arr.reshape(pix.shape), pix)

    def test_multiframe_fragments_grouped_on_soi(self, tmp_path):
        # frames > 1 and fragments > frames → group on the FF D8 prefix
        rng = np.random.default_rng(20)
        pix = rng.integers(0, 4096, (3, 24, 24)).astype(np.uint16)
        p = str(tmp_path / "gs.dcm")
        write_dicom(p, pix, transfer_syntax=TS_JPEG_LL_SV1)
        ds = read_dataset(p)
        split = []
        for frag in ds.fragments:
            split += [frag[:21], frag[21:]]
        ds.fragments = split
        arr = decode_pixels(ds)
        np.testing.assert_array_equal(arr.reshape(pix.shape), pix)

    def test_process14_ts_57_reads(self, tmp_path):
        # the writer emits .70 (SV1); .57 allows any predictor — both UIDs
        # are 22 chars, so patching the file bytes yields a valid .57 file
        pix = _img(seed=21, shape=(24, 24))
        p = str(tmp_path / "p14.dcm")
        write_dicom(p, pix, transfer_syntax=TS_JPEG_LL_SV1)
        raw = open(p, "rb").read()
        assert len(TS_JPEG_LL) == len(TS_JPEG_LL_SV1)
        patched = str(tmp_path / "p14_57.dcm")
        with open(patched, "wb") as f:
            f.write(raw.replace(TS_JPEG_LL_SV1.encode(), TS_JPEG_LL.encode()))
        ds = read_dataset(patched)
        assert ds.transfer_syntax == TS_JPEG_LL
        arr = decode_pixels(ds)
        np.testing.assert_array_equal(arr.reshape(pix.shape), pix)

    def test_signed_full_range(self, tmp_path):
        # int16 extremes: sign-extension from the codestream precision
        pix = np.array([[-32768, 32767], [-1, 0]], np.int16)
        p = str(tmp_path / "sgn.dcm")
        write_dicom(p, pix, transfer_syntax=TS_JPEG_LL_SV1)
        arr = decode_pixels(read_dataset(p))
        np.testing.assert_array_equal(arr.reshape(pix.shape), pix)

    def test_compression_actually_compresses(self, tmp_path):
        # smooth clinical-looking data must come out smaller than raw
        y, x = np.mgrid[0:128, 0:128]
        pix = (2048 + 1000 * np.sin(x / 9.0) * np.cos(y / 11.0)
               ).astype(np.uint16)
        p_raw = str(tmp_path / "raw.dcm")
        p_jll = str(tmp_path / "jll.dcm")
        write_dicom(p_raw, pix, transfer_syntax=TS_EXPLICIT_LE)
        write_dicom(p_jll, pix, transfer_syntax=TS_JPEG_LL_SV1)
        import os
        assert os.path.getsize(p_jll) < 0.6 * os.path.getsize(p_raw)


class TestErrors:
    def test_not_a_jpeg(self):
        with pytest.raises(JpegLLError, match="SOI"):
            jpegll.decode(b"\x00\x01\x02\x03")

    def test_lossy_sof_rejected(self):
        # splice a baseline SOF0 marker where SOF3 would go
        enc = bytearray(jpegll.encode(_img(shape=(8, 8)), precision=12))
        i = bytes(enc).find(b"\xff\xc3")
        enc[i + 1] = 0xC0
        with pytest.raises(JpegLLError, match="SOF 0xC0"):
            jpegll.decode(bytes(enc))

    def test_truncated_stream(self):
        enc = jpegll.encode(_img(shape=(8, 8)), precision=12)
        with pytest.raises(JpegLLError):
            jpegll.decode(enc[: len(enc) // 2])

    def test_bad_encode_args(self):
        img = _img(shape=(8, 8))
        with pytest.raises(JpegLLError, match="Predictor"):
            jpegll.encode(img, predictor=0)
        with pytest.raises(JpegLLError, match="Precision"):
            jpegll.encode(img, precision=17)
        with pytest.raises(JpegLLError, match="exceeds"):
            jpegll.encode(img, precision=4)
        with pytest.raises(JpegLLError, match="Point transform"):
            jpegll.encode(img, precision=12, point_transform=12)

    def test_oversubscribed_dht(self):
        counts = np.zeros(16, np.int64)
        counts[0] = 3                      # 3 codes of length 1 > 2 possible
        with pytest.raises(JpegLLError, match="over-subscribes"):
            jpegll._build_table(counts, np.arange(3, dtype=np.uint8))

    def test_subsampled_rejected(self):
        enc = bytearray(jpegll.encode(
            np.zeros((8, 8, 3), np.uint16), precision=8))
        i = bytes(enc).find(b"\xff\xc3")
        # first component's Hi/Vi byte: FF C3 | len(2) | P(1) H(2) W(2)
        # Nf(1) | C1 HV1 Tq1 ...
        enc[i + 4 + 6 + 1] = 0x21
        with pytest.raises(JpegLLError, match="Subsampled"):
            jpegll.decode(bytes(enc))

    def test_unsupported_ts_message(self, tmp_path):
        """A genuinely unreadable syntax still gets the clear error.
        (JPEG Baseline was the example until round 4, then JPEG 2000
        until round 5 made both decodable; JPEG 2000 Part 2 multi-
        component — .4.92 — remains genuinely unsupported.)"""
        p = str(tmp_path / "lossy.dcm")
        write_dicom(p, _img(shape=(8, 8)), transfer_syntax=TS_JPEG_LL_SV1)
        raw = open(p, "rb").read()
        # JPEG 2000 Part 2 is 22 chars too: 1.2.840.10008.1.2.4.92
        lossy = raw.replace(TS_JPEG_LL_SV1.encode(),
                            b"1.2.840.10008.1.2.4.92")
        p2 = str(tmp_path / "l2.dcm")
        open(p2, "wb").write(lossy)
        with pytest.raises(DicomError, match="Unsupported transfer syntax"):
            read_dataset(p2)

    def test_sample_out_of_container_range(self, tmp_path):
        # 12-bit codestream inside BitsAllocated=8 container must raise,
        # not silently truncate
        pix = _img(seed=23, shape=(8, 8))             # 12-bit values
        p = str(tmp_path / "w.dcm")
        write_dicom(p, pix, transfer_syntax=TS_JPEG_LL_SV1)
        ds = read_dataset(p)
        ds.attrs["BitsAllocated"] = 8
        with pytest.raises(DicomError, match="out of range"):
            decode_pixels(ds)


class TestPydicomCrossCheck:
    """pydicom + a JPEG-LL plugin decodes our files identically (CI-only —
    neither is in the bench image)."""

    def test_pydicom_reads_our_jpegll(self, tmp_path):
        pydicom = pytest.importorskip("pydicom")
        pytest.importorskip("pylibjpeg")
        pix = _img(seed=30, shape=(48, 48))
        p = str(tmp_path / "x.dcm")
        write_dicom(p, pix, transfer_syntax=TS_JPEG_LL_SV1)
        ds = pydicom.dcmread(p)
        np.testing.assert_array_equal(ds.pixel_array, pix)
