"""Compressed transfer syntaxes: RLE Lossless + Deflated Explicit VR LE.

The reference reads both through plain pydicom (ref pipeline/dicom_io.py:
29-45); mdx implements the codecs from PS3.5 (Annex G / A.5).  The contract
tested here: a compressed encoding of the same pixels loads bit-for-bit
identically to the uncompressed Explicit VR LE encoding.
"""

from __future__ import annotations

import struct

import numpy as np
import pytest

from mdx.io import rle
from mdx.io.dicom import (
    TS_DEFLATED_LE,
    TS_RLE,
    DicomError,
    load_dicom,
    load_series,
    read_dataset,
)
from mdx.io.dicom_write import write_dicom, write_synthetic_dicom


def _pixels(seed=0, size=64, dtype=np.uint16, frames=0):
    rng = np.random.default_rng(seed)
    shape = (frames, size, size) if frames else (size, size)
    info = np.iinfo(dtype)
    # mix of smooth ramps (long runs for RLE) and noise (literals)
    base = np.linspace(info.min, info.max, size, dtype=np.int64)
    img = np.broadcast_to(base, shape[-2:]).copy()
    img[size // 4:size // 2] = info.max // 2  # constant band → replicate runs
    img = img + rng.integers(-100, 100, shape)
    return np.clip(img, info.min, info.max).astype(dtype)


class TestPackBits:
    @pytest.mark.parametrize("data", [
        b"",
        b"\x00",
        b"abc",
        b"a" * 3,
        b"a" * 128,          # max replicate run
        b"a" * 129,          # run split
        b"a" * 500,
        bytes(range(256)),   # pure literal
        bytes(range(256)) * 3,
        b"ab" * 200,         # alternating, no runs ≥3
        b"x" * 2 + b"yz" + b"w" * 130 + b"q",
    ])
    def test_roundtrip(self, data):
        enc = rle.packbits_encode(data)
        assert rle.packbits_decode(enc, len(data)) == data

    def test_roundtrip_random(self):
        rng = np.random.default_rng(7)
        for _ in range(20):
            # low-entropy bytes → plenty of runs AND literals
            data = rng.integers(0, 4, rng.integers(1, 2000)).astype(
                np.uint8).tobytes()
            enc = rle.packbits_encode(data)
            assert rle.packbits_decode(enc, len(data)) == data

    def test_decode_ignores_even_padding(self):
        enc = rle.packbits_encode(b"hello") + b"\x00"
        assert rle.packbits_decode(enc, 5) == b"hello"

    def test_decode_short_stream_raises(self):
        with pytest.raises(rle.RleError):
            rle.packbits_decode(b"\x04abc", 5)  # literal run cut off


class TestRleFrame:
    @pytest.mark.parametrize("dtype", [np.uint8, np.uint16, np.int16])
    def test_roundtrip(self, dtype):
        frame = _pixels(seed=1, size=32, dtype=dtype)
        frag = rle.encode_frame(frame)
        flat = rle.decode_frame(frag, 32, 32, 1, frame.dtype.itemsize)
        np.testing.assert_array_equal(
            flat.view(frame.dtype).reshape(frame.shape), frame)

    def test_segment_count_mismatch_raises(self):
        frame = _pixels(seed=2, size=16, dtype=np.uint16)
        frag = rle.encode_frame(frame)
        with pytest.raises(rle.RleError, match="segments"):
            rle.decode_frame(frag, 16, 16, 1, 1)  # wrong bytes/sample

    def test_truncated_header_raises(self):
        with pytest.raises(rle.RleError, match="header"):
            rle.decode_frame(b"\x01\x00\x00\x00", 8, 8, 1, 1)


class TestFileRoundTrip:
    """Compressed file == uncompressed file, bit-for-bit after load."""

    @pytest.mark.parametrize("ts", [TS_RLE, TS_DEFLATED_LE])
    @pytest.mark.parametrize("dtype", [np.uint8, np.uint16])
    def test_load_dicom_matches_uncompressed(self, tmp_path, ts, dtype):
        pix = _pixels(seed=3, dtype=dtype)
        p_raw = str(tmp_path / "raw.dcm")
        p_cmp = str(tmp_path / "cmp.dcm")
        write_dicom(p_raw, pix)
        write_dicom(p_cmp, pix, transfer_syntax=ts)
        a, meta_a = load_dicom(p_raw)
        b, meta_b = load_dicom(p_cmp)
        np.testing.assert_array_equal(a, b)
        assert meta_a == meta_b

    @pytest.mark.parametrize("ts", [TS_RLE, TS_DEFLATED_LE])
    def test_signed_rescale_window_mono1(self, tmp_path, ts):
        pix = (_pixels(seed=4, dtype=np.uint16) // 16).astype(np.int16) - 1024
        kw = dict(photometric="MONOCHROME1", rescale_slope=1.0,
                  rescale_intercept=-1024.0, window_center=40.0,
                  window_width=400.0)
        p_raw = str(tmp_path / "raw.dcm")
        p_cmp = str(tmp_path / "cmp.dcm")
        write_dicom(p_raw, pix, **kw)
        write_dicom(p_cmp, pix, transfer_syntax=ts, **kw)
        a, _ = load_dicom(p_raw, window=True)
        b, _ = load_dicom(p_cmp, window=True)
        np.testing.assert_array_equal(a, b)

    @pytest.mark.parametrize("ts", [TS_RLE, TS_DEFLATED_LE])
    def test_multiframe_series(self, tmp_path, ts):
        pix = _pixels(seed=5, size=32, frames=5)
        p_raw = str(tmp_path / "raw.dcm")
        p_cmp = str(tmp_path / "cmp.dcm")
        write_dicom(p_raw, pix)
        write_dicom(p_cmp, pix, transfer_syntax=ts)
        a, _ = load_series(p_raw)
        b, _ = load_series(p_cmp)
        assert b.shape == (5, 32, 32)
        np.testing.assert_array_equal(a, b)

    def test_synthetic_generator_passthrough(self, tmp_path):
        p = write_synthetic_dicom(str(tmp_path / "s.dcm"), kind="phantom",
                                  size=64, transfer_syntax=TS_RLE)
        img, meta = load_dicom(p)
        assert img.shape == (64, 64)
        assert meta["Modality"] == "CT"

    def test_rle_dataset_has_fragments(self, tmp_path):
        p = str(tmp_path / "r.dcm")
        write_dicom(p, _pixels(seed=6, frames=3, size=16),
                    transfer_syntax=TS_RLE)
        ds = read_dataset(p)
        assert ds.transfer_syntax == TS_RLE
        assert len(ds.fragments) == 3
        # every fragment: 64-byte header advertising 2 segments (16-bit)
        for frag in ds.fragments:
            assert struct.unpack("<I", frag[:4])[0] == 2


class TestCorruptInputs:
    def test_jpeg_transfer_syntax_raises(self, tmp_path):
        p = str(tmp_path / "j.dcm")
        write_dicom(p, _pixels(seed=7, size=16))
        raw = bytearray(open(p, "rb").read())
        # patch the TS UID in the file meta (same length as explicit LE +
        # trailing NUL pad): 1.2.840.10008.1.2.1 → 1.2.840.10008.1.2.4
        old = b"1.2.840.10008.1.2.1\x00"
        new = b"1.2.840.10008.1.2.4\x00"
        idx = raw.find(old)
        assert idx > 0
        raw[idx:idx + len(old)] = new
        open(p, "wb").write(raw)
        with pytest.raises(DicomError, match="transfer syntax"):
            read_dataset(p)

    def test_truncated_rle_fragment_raises(self, tmp_path):
        p = str(tmp_path / "t.dcm")
        write_dicom(p, _pixels(seed=8, size=32), transfer_syntax=TS_RLE)
        ds = read_dataset(p)
        ds.fragments = [ds.fragments[0][:80]]  # cut mid-segment
        from mdx.io.dicom import decode_pixels

        with pytest.raises(DicomError, match="RLE"):
            decode_pixels(ds)

    def test_corrupt_deflate_stream_raises(self, tmp_path):
        p = str(tmp_path / "d.dcm")
        write_dicom(p, _pixels(seed=9, size=16),
                    transfer_syntax=TS_DEFLATED_LE)
        raw = bytearray(open(p, "rb").read())
        # deflate stream starts right after the file meta: preamble+DICM
        # (132) + group-length element (8 hdr + 4 value) + meta_len
        (meta_len,) = struct.unpack("<I", raw[140:144])
        body_start = 144 + meta_len
        # 0xff first byte = BTYPE 3 (reserved) → guaranteed zlib error
        raw[body_start:] = b"\xff" * 8
        open(p, "wb").write(raw)
        with pytest.raises(DicomError, match="deflated"):
            load_dicom(p)

    def test_frame_count_mismatch_raises(self, tmp_path):
        p = str(tmp_path / "f.dcm")
        write_dicom(p, _pixels(seed=10, frames=4, size=16),
                    transfer_syntax=TS_RLE)
        ds = read_dataset(p)
        ds.fragments = ds.fragments[:2]
        from mdx.io.dicom import decode_pixels

        with pytest.raises(DicomError, match="frame fragments"):
            decode_pixels(ds)


class TestPydicomCrossCheck:
    """Our compressed writes decode identically under pydicom (CI-only —
    pydicom is not in the bench image)."""

    @pytest.mark.parametrize("ts", [TS_RLE, TS_DEFLATED_LE])
    def test_pydicom_reads_our_files(self, tmp_path, ts):
        pydicom = pytest.importorskip("pydicom")
        pix = _pixels(seed=11, dtype=np.uint16, size=48)
        p = str(tmp_path / "x.dcm")
        write_dicom(p, pix, transfer_syntax=ts)
        ds = pydicom.dcmread(p)
        np.testing.assert_array_equal(ds.pixel_array, pix)

    def test_we_read_pydicom_rle(self, tmp_path):
        pydicom = pytest.importorskip("pydicom")
        pytest.importorskip("pydicom.pixels")
        pix = _pixels(seed=12, dtype=np.uint16, size=48)
        p_raw = str(tmp_path / "raw.dcm")
        write_dicom(p_raw, pix)
        ds = pydicom.dcmread(p_raw)
        p_rle = str(tmp_path / "p_rle.dcm")
        from pydicom.uid import RLELossless

        ds.compress(RLELossless)
        ds.save_as(p_rle)
        ours, _ = load_dicom(p_rle)
        ref, _ = load_dicom(p_raw)
        np.testing.assert_array_equal(ours, ref)
