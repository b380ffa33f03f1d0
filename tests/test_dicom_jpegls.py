"""JPEG-LS (ITU-T T.87) transfer syntaxes — `.4.80` lossless and `.4.81`
near-lossless.

The reference cannot decode these at all — plain pydicom needs a plugin
its requirements.txt does not install (ref pipeline/dicom_io.py:29-45) —
so ``mdx.io.jpegls`` is a documented extension, following the
``mdx.io.jpegll`` playbook.  Contract tested here:

* encoder↔decoder round-trips are EXACT for NEAR=0 across precisions,
  shapes, restart intervals and content classes, and within ±NEAR for
  near-lossless;
* the native scan coder (``mdxio_jpegls_decode``/``_encode``) is
  bit-identical to the pure-Python clause-A oracle in both directions,
  with the same error taxonomy;
* a JPEG-LS DICOM file loads bit-for-bit identically to the same pixels
  written uncompressed;
* malformed/unsupported streams raise specific errors, never wrong
  pixels;
* (CI) pydicom + pylibjpeg-libjpeg decodes our files identically — the
  independent-implementation check that guards against a
  self-consistent-but-nonconformant encoder/decoder pair.
"""

from __future__ import annotations

import numpy as np
import pytest

from mdx.io import jpegls
from mdx.io.dicom import (
    TS_EXPLICIT_LE,
    TS_JPEG_LS,
    DicomError,
    decode_pixels,
    read_dataset,
)
from mdx.io.dicom_write import write_dicom
from mdx.io.jpegls import (
    JpegLSError,
    _BitReader,
    _BitWriter,
    _decode_scan_python,
    _encode_scan_python,
    _Params,
    default_thresholds,
)


def _img(seed=0, shape=(40, 56), precision=12):
    """Gradient + noise + a flat band — exercises regular AND run mode."""
    rng = np.random.default_rng(seed)
    h, w = shape
    base = np.linspace(0, (1 << precision) - 1, w, dtype=np.int64)
    img = np.broadcast_to(base, shape).copy()
    img[h // 4:h // 2] = (1 << precision) // 2
    img += rng.integers(-200, 200, shape)
    return np.clip(img, 0, (1 << precision) - 1).astype(np.uint16)


def _params(precision=12, near=0):
    maxval = (1 << precision) - 1
    t1, t2, t3 = default_thresholds(maxval, near)
    return _Params(maxval, near, t1, t2, t3, 64)


class TestDerivedParameters:
    def test_default_thresholds_8bit(self):
        # MAXVAL 255: FACTOR = (255+128)//256 = 1 → the BASIC values
        assert default_thresholds(255, 0) == (3, 7, 21)

    def test_default_thresholds_12bit(self):
        # MAXVAL 4095: FACTOR = (4095+128)//256 = 16
        assert default_thresholds(4095, 0) == (16 * 1 + 2, 16 * 4 + 3,
                                               16 * 17 + 4)

    def test_default_thresholds_small_maxval(self):
        # MAXVAL 3 (P=2): FACTOR = 256//4 = 64 → max()/clamp floor rules
        t1, t2, t3 = default_thresholds(3, 0)
        assert 1 <= t1 <= t2 <= t3 <= 3

    def test_default_thresholds_near(self):
        t1, t2, t3 = default_thresholds(255, 2)
        assert t1 >= 3  # NEAR+1 lower clamp
        assert (t1, t2, t3) == (1 * 1 + 2 + 6, 1 * 4 + 3 + 10,
                                1 * 17 + 4 + 14)

    def test_limit_qbpp(self):
        p = _params(8)
        assert p.limit == 2 * (8 + 8) and p.qbpp == 8 and p.range == 256
        p16 = _params(16)
        assert p16.limit == 2 * (16 + 16) and p16.qbpp == 16

    def test_near_reduces_range(self):
        p = _params(8, near=2)
        assert p.range == (255 + 4) // 5 + 1


class TestBitIO:
    def test_ff_stuffing_roundtrip(self):
        """Bytes equal to 0xFF must be followed by a 7-bit byte; the
        reader must consume them transparently."""
        bw = _BitWriter()
        bw.write_bits(0xFF, 8)       # forces a stuffed follow-up byte
        bw.write_bits(0b1010101, 7)  # exactly fills the 7-bit byte
        bw.write_bits(0x3, 2)
        bw.flush()
        data = bytes(bw.out)
        assert data[0] == 0xFF and data[1] == 0b01010101
        br = _BitReader(data + b"\xff\xd9", 0)
        assert br.read_bits(8) == 0xFF
        assert br.read_bits(7) == 0b1010101
        assert br.read_bits(2) == 0x3

    def test_pending_zero_bit_is_flushed(self):
        """A single pending 0 bit must survive flush (regression for the
        capacity/fill ambiguity)."""
        bw = _BitWriter()
        bw.write_bits(0, 1)
        bw.flush()
        assert bytes(bw.out) == b"\x00"

    def test_marker_mid_symbol_raises(self):
        br = _BitReader(b"\xff\xd9", 0)
        br.read_bits(8)
        with pytest.raises(JpegLSError, match="marker"):
            br.read_bit()

    def test_truncated_raises(self):
        br = _BitReader(b"\xab", 0)
        br.read_bits(8)
        with pytest.raises(JpegLSError, match="[Tt]runcated"):
            br.read_bit()


class TestCodecRoundtrip:
    @pytest.mark.parametrize("precision", [2, 4, 8, 10, 12, 14, 16])
    def test_precisions(self, precision):
        img = _img(seed=precision, precision=precision)
        enc = jpegls.encode(img, precision=precision)
        dec, p, near = jpegls.decode(enc)
        assert (p, near) == (precision, 0)
        np.testing.assert_array_equal(dec, img.astype(np.int64))

    def test_precision_inferred(self):
        img = np.array([[0, 100], [200, 255]], np.uint8)
        dec, p, _ = jpegls.decode(jpegls.encode(img))
        assert p == 8
        np.testing.assert_array_equal(dec, img.astype(np.int64))

    @pytest.mark.parametrize("near", [1, 2, 3, 7])
    def test_near_lossless_bound(self, near):
        img = _img(seed=near)
        enc = jpegls.encode(img, precision=12, near=near)
        dec, p, n = jpegls.decode(enc)
        assert n == near
        assert np.abs(dec - img.astype(np.int64)).max() <= near
        # near-lossless must actually compress harder than lossless
        assert len(enc) < len(jpegls.encode(img, precision=12))

    @pytest.mark.parametrize("restart_rows", [1, 5, 16])
    def test_restart_intervals(self, restart_rows):
        img = _img(seed=restart_rows, shape=(37, 23))
        enc = jpegls.encode(img, precision=12, restart_rows=restart_rows)
        dec, _, _ = jpegls.decode(enc)
        np.testing.assert_array_equal(dec, img.astype(np.int64))

    @pytest.mark.parametrize("shape", [(1, 1), (1, 17), (17, 1), (2, 2)])
    def test_degenerate_shapes(self, shape):
        rng = np.random.default_rng(sum(shape))
        img = rng.integers(0, 256, shape).astype(np.uint8)
        dec, _, _ = jpegls.decode(jpegls.encode(img, precision=8))
        np.testing.assert_array_equal(dec, img.astype(np.int64))

    def test_constant_image_pure_run(self):
        img = np.full((32, 32), 1234, np.uint16)
        enc = jpegls.encode(img, precision=12)
        assert len(enc) < 64  # a constant plane is almost all run bits
        dec, _, _ = jpegls.decode(enc)
        np.testing.assert_array_equal(dec, img.astype(np.int64))

    def test_extreme_alternation(self):
        """0 ↔ MAXVAL checkerboard: maximal gradients, LG escape path."""
        img = (np.indices((16, 16)).sum(0) % 2 * 65535).astype(np.uint16)
        dec, _, _ = jpegls.decode(jpegls.encode(img, precision=16))
        np.testing.assert_array_equal(dec, img.astype(np.int64))

    def test_runs_to_line_end(self):
        """Exact and partial run segments at end of line (the two EOL
        rules of A.7.1.2)."""
        for w in (4, 5, 8, 13, 16, 64):
            img = np.full((7, w), 42, np.uint8)
            img[3, 0] = 17  # force one interruption mid-image
            dec, _, _ = jpegls.decode(jpegls.encode(img, precision=8))
            np.testing.assert_array_equal(dec, img.astype(np.int64))

    def test_fuzz_roundtrip(self):
        rng = np.random.default_rng(99)
        for trial in range(60):
            p = int(rng.integers(2, 17))
            maxv = (1 << p) - 1
            h, w = int(rng.integers(1, 24)), int(rng.integers(1, 24))
            kind = trial % 5
            if kind == 0:
                img = rng.integers(0, maxv + 1, (h, w))
            elif kind == 1:
                img = np.full((h, w), rng.integers(0, maxv + 1))
            elif kind == 2:
                img = np.repeat(rng.integers(0, maxv + 1,
                                             (h, max(1, w // 3))),
                                3, axis=1)[:, :w]
                if img.shape[1] < w:
                    img = np.pad(img, ((0, 0), (0, w - img.shape[1])),
                                 mode="edge")
            elif kind == 3:
                img = rng.choice([0, maxv], (h, w))
            else:
                img = (np.add.outer(np.arange(h), np.arange(w))
                       * maxv // max(1, h + w))
            img = img.astype(np.int64)
            near = int(rng.integers(0, min(4, maxv // 2) + 1)) \
                if trial % 3 == 0 else 0
            enc = jpegls.encode(img, precision=p, near=near)
            dec, pp, nn = jpegls.decode(enc)
            assert (pp, nn) == (p, near)
            if near == 0:
                np.testing.assert_array_equal(dec, img)
            else:
                assert np.abs(dec - img).max() <= near


class TestMultiComponent:
    def test_ilv0_two_component_stream(self):
        """Nf>1 in ILV 0 (component-sequential scans, fresh coder state
        each) decodes to a stacked [H, W, C] plane set — hand-built
        stream since the encoder (DICOM grayscale) emits Nf=1."""
        import struct

        rng = np.random.default_rng(5)
        h, w, p = 16, 20, 8
        maxv = (1 << p) - 1
        planes = [rng.integers(0, maxv + 1, (h, w)).astype(np.int64)
                  for _ in range(2)]
        params = _params_for(maxv, 0)
        out = bytearray(b"\xff\xd8")
        out += b"\xff\xf7" + struct.pack(">HBHHB", 8 + 3 * 2, p, h, w, 2)
        out += bytes((1, 0x11, 0)) + bytes((2, 0x11, 0))
        for ci, plane in enumerate(planes, start=1):
            out += b"\xff\xda" + struct.pack(">HB", 8, 1)
            out += bytes((ci, 0)) + bytes((0, 0, 0))
            out += _encode_scan_python(plane, params)
        out += b"\xff\xd9"
        img, pp, near = jpegls.decode(bytes(out))
        assert img.shape == (h, w, 2) and (pp, near) == (p, 0)
        np.testing.assert_array_equal(img[..., 0], planes[0])
        np.testing.assert_array_equal(img[..., 1], planes[1])

    def test_missing_component_scan_raises(self):
        import struct

        out = bytearray(b"\xff\xd8")
        out += b"\xff\xf7" + struct.pack(">HBHHB", 8 + 3 * 2, 8, 4, 4, 2)
        out += bytes((1, 0x11, 0)) + bytes((2, 0x11, 0))
        params = _params_for(255, 0)
        out += b"\xff\xda" + struct.pack(">HB", 8, 1)
        out += bytes((1, 0)) + bytes((0, 0, 0))
        out += _encode_scan_python(np.zeros((4, 4), np.int64), params)
        out += b"\xff\xd9"  # second component's scan missing
        with pytest.raises(JpegLSError, match="component scans"):
            jpegls.decode(bytes(out))


class TestNativeParity:
    """The C scan coder is bit-identical to the Python clause-A oracle in
    BOTH directions, with the same error taxonomy."""

    @pytest.fixture(autouse=True)
    def _need_native(self):
        pytest.importorskip("mdx.io.native")
        from mdx.io import native
        try:
            native._load()
        except native.NativeUnavailable:
            pytest.skip("native library not built")

    @pytest.mark.parametrize("near", [0, 2])
    def test_bit_parity_both_directions(self, near):
        from mdx.io import native
        rng = np.random.default_rng(near)
        for trial in range(30):
            p = int(rng.integers(2, 17))
            maxv = (1 << p) - 1
            if near > maxv // 2:
                continue
            h, w = int(rng.integers(1, 24)), int(rng.integers(1, 24))
            img = rng.integers(0, maxv + 1, (h, w)).astype(np.int64)
            if trial % 2:
                img[h // 2:] = img[h // 2, 0]  # run-heavy lower half
            params = _params_for(maxv, near)
            py_bytes = _encode_scan_python(img, params)
            nat_bytes = native.jpegls_encode(img, params)
            assert py_bytes == nat_bytes
            buf = py_bytes + b"\xff\xd9"
            py_dec, py_end = _decode_scan_python(buf, 0, w, h, params)
            nat_dec, nat_end = native.jpegls_decode(buf, 0, w, h, params)
            np.testing.assert_array_equal(py_dec, nat_dec)
            assert py_end == nat_end

    def test_error_taxonomy_parity(self):
        from mdx.io import native
        img = _img(seed=5, shape=(16, 16))
        params = _params(12)
        enc = _encode_scan_python(img.astype(np.int64), params)
        # truncated entropy segment: both raise the truncation error
        cut = enc[:len(enc) // 2]
        with pytest.raises(JpegLSError, match="[Tt]runcated|marker"):
            _decode_scan_python(cut, 0, 16, 16, params)
        with pytest.raises(JpegLSError, match="[Tt]runcated|marker"):
            native.jpegls_decode(cut, 0, 16, 16, params)

    def test_full_codec_uses_native(self, monkeypatch):
        """decode()/encode() must give identical results with native
        forced OFF (the dispatch seam itself)."""
        img = _img(seed=7)
        enc_native = jpegls.encode(img, precision=12)
        monkeypatch.setattr(jpegls, "_native", lambda: None)
        enc_python = jpegls.encode(img, precision=12)
        assert enc_native == enc_python
        dec_p, _, _ = jpegls.decode(enc_native)
        monkeypatch.undo()
        dec_n, _, _ = jpegls.decode(enc_native)
        np.testing.assert_array_equal(dec_p, dec_n)


def _params_for(maxval, near):
    t1, t2, t3 = default_thresholds(maxval, near)
    return _Params(maxval, near, t1, t2, t3, 64)


class TestDicomIntegration:
    @pytest.mark.parametrize("dtype", [np.uint8, np.uint16, np.int16])
    def test_roundtrip_matches_uncompressed(self, tmp_path, dtype):
        rng = np.random.default_rng(1)
        if dtype == np.int16:
            pix = rng.integers(-1000, 3000, (32, 48)).astype(dtype)
        else:
            pix = rng.integers(0, np.iinfo(dtype).max + 1,
                               (32, 48)).astype(dtype)
        p_raw = str(tmp_path / "raw.dcm")
        p_ls = str(tmp_path / "ls.dcm")
        write_dicom(p_raw, pix, transfer_syntax=TS_EXPLICIT_LE)
        write_dicom(p_ls, pix, transfer_syntax=TS_JPEG_LS)
        a = decode_pixels(read_dataset(p_raw))
        b = decode_pixels(read_dataset(p_ls))
        np.testing.assert_array_equal(a, b)
        assert a.dtype == b.dtype

    def test_multiframe_one_fragment_per_frame(self, tmp_path):
        rng = np.random.default_rng(2)
        pix = rng.integers(0, 4096, (4, 24, 24)).astype(np.uint16)
        p = str(tmp_path / "mf.dcm")
        write_dicom(p, pix, transfer_syntax=TS_JPEG_LS)
        np.testing.assert_array_equal(decode_pixels(read_dataset(p)), pix)

    def test_single_frame_spanning_fragments(self, tmp_path):
        """A frame split across fragments re-joins before decode
        (PS3.5 A.4)."""
        rng = np.random.default_rng(3)
        pix = rng.integers(0, 4096, (24, 24)).astype(np.uint16)
        p = str(tmp_path / "x.dcm")
        write_dicom(p, pix, transfer_syntax=TS_JPEG_LS)
        ds = read_dataset(p)
        frag = ds.fragments[0]
        ds.fragments = [frag[:100], frag[100:]]
        np.testing.assert_array_equal(decode_pixels(ds), pix)

    def test_multiframe_fragments_grouped_on_soi(self, tmp_path):
        rng = np.random.default_rng(4)
        pix = rng.integers(0, 4096, (2, 24, 24)).astype(np.uint16)
        p = str(tmp_path / "mf.dcm")
        write_dicom(p, pix, transfer_syntax=TS_JPEG_LS)
        ds = read_dataset(p)
        f0, f1 = ds.fragments
        ds.fragments = [f0[:50], f0[50:], f1]  # 3 fragments, 2 frames
        np.testing.assert_array_equal(decode_pixels(ds), pix)

    def test_signed_full_range(self, tmp_path):
        pix = np.array([[-32768, -1, 0], [1, 32767, -12345]], np.int16)
        p = str(tmp_path / "s.dcm")
        write_dicom(p, pix, transfer_syntax=TS_JPEG_LS, signed=True)
        np.testing.assert_array_equal(decode_pixels(read_dataset(p)), pix)

    def test_compression_actually_compresses(self, tmp_path):
        import os

        pix = _img(seed=9, shape=(128, 128))
        p_raw = str(tmp_path / "raw.dcm")
        p_ls = str(tmp_path / "ls.dcm")
        write_dicom(p_raw, pix, transfer_syntax=TS_EXPLICIT_LE)
        write_dicom(p_ls, pix, transfer_syntax=TS_JPEG_LS)
        assert os.path.getsize(p_ls) < os.path.getsize(p_raw)

    def test_near_lossless_stream_decodes(self, tmp_path):
        """A `.4.81` dataset (NEAR>0 codestream) decodes within ±NEAR."""
        import struct as _s

        from mdx.io.dicom import TS_JPEG_LS_NEAR

        pix = _img(seed=10, shape=(24, 24))
        frag = jpegls.encode(pix, precision=12, near=2)
        if len(frag) % 2:
            frag += b"\x00"
        p = str(tmp_path / "n.dcm")
        write_dicom(p, pix, transfer_syntax=TS_EXPLICIT_LE)
        ds = read_dataset(p)
        ds.transfer_syntax = TS_JPEG_LS_NEAR
        ds.pixel_bytes = b""
        ds.fragments = [frag]
        out = decode_pixels(ds)
        assert np.abs(out.astype(np.int64) - pix.astype(np.int64)).max() <= 2
        _ = _s  # silence linters about the unused import pattern


class TestParallelFrameDecode:
    """Multi-frame compressed series decode fans out over frame threads
    (the native loops release the GIL); results and errors must be
    identical to the serial path."""

    def test_threads_match_serial(self, tmp_path, monkeypatch):
        rng = np.random.default_rng(21)
        pix = rng.integers(0, 4096, (6, 24, 24)).astype(np.uint16)
        p = str(tmp_path / "mf.dcm")
        write_dicom(p, pix, transfer_syntax=TS_JPEG_LS)
        monkeypatch.setenv("MDX_IO_THREADS", "1")
        serial = decode_pixels(read_dataset(p))
        monkeypatch.setenv("MDX_IO_THREADS", "4")
        threaded = decode_pixels(read_dataset(p))
        np.testing.assert_array_equal(serial, threaded)
        np.testing.assert_array_equal(threaded, pix)

    def test_error_propagates_through_pool(self, tmp_path, monkeypatch):
        rng = np.random.default_rng(22)
        pix = rng.integers(0, 4096, (4, 24, 24)).astype(np.uint16)
        p = str(tmp_path / "mf.dcm")
        write_dicom(p, pix, transfer_syntax=TS_JPEG_LS)
        ds = read_dataset(p)
        frags = list(ds.fragments)
        frags[2] = frags[2][:30]  # corrupt the third frame
        ds.fragments = frags
        monkeypatch.setenv("MDX_IO_THREADS", "4")
        with pytest.raises(DicomError, match="JPEG-LS"):
            decode_pixels(ds)


class TestErrors:
    def test_not_a_jpeg(self):
        with pytest.raises(JpegLSError, match="SOI"):
            jpegls.decode(b"\x00\x01\x02")

    def test_wrong_sof_rejected(self):
        """A T.81 lossless (SOF3) stream names the right codec."""
        from mdx.io import jpegll

        enc = jpegll.encode(np.ones((4, 4), np.uint16), precision=12,
                            predictor=1)
        with pytest.raises(JpegLSError, match="SOF3"):
            jpegls.decode(enc)

    def test_truncated_stream(self):
        enc = jpegls.encode(_img(seed=11), precision=12)
        with pytest.raises(JpegLSError):
            jpegls.decode(enc[:len(enc) // 2])

    def test_bad_encode_args(self):
        img8 = np.zeros((4, 4), np.uint8)
        with pytest.raises(JpegLSError, match="[Pp]recision"):
            jpegls.encode(img8, precision=17)
        with pytest.raises(JpegLSError, match="fit"):
            jpegls.encode(np.full((4, 4), 300, np.int32), precision=8)
        with pytest.raises(JpegLSError, match="unsigned"):
            jpegls.encode(np.full((4, 4), -1, np.int32))
        with pytest.raises(JpegLSError, match="NEAR"):
            jpegls.encode(img8, precision=8, near=200)
        with pytest.raises(JpegLSError, match="component"):
            jpegls.encode(np.zeros((4, 4, 3), np.uint8))
        with pytest.raises(JpegLSError, match="integer"):
            jpegls.encode(np.zeros((4, 4), np.float32))

    def test_interleaved_rejected(self):
        """Hand-build an ILV=1 SOS header: specific error, no wrong
        pixels."""
        import struct

        enc = bytearray(jpegls.encode(np.ones((4, 4), np.uint8),
                                      precision=8))
        # patch: SOF55 Nf=1 → fake 3-component frame w/ interleaved scan
        sos = enc.find(b"\xff\xda")
        ls, ns = struct.unpack_from(">HB", enc, sos + 2)
        assert ns == 1
        enc[sos + 2 + 2 + 1 + 2 * ns + 1] = 1  # ILV byte → line interleave
        enc[sos + 4] = 3  # claim Ns=3 (length now wrong → malformed)
        with pytest.raises(JpegLSError):
            jpegls.decode(bytes(enc))

    def test_lse_mapping_tables_rejected(self):
        import struct

        enc = jpegls.encode(np.ones((4, 4), np.uint8), precision=8)
        sof_end = enc.find(b"\xff\xda")
        lse = b"\xff\xf8" + struct.pack(">HB", 3, 2)  # LSE ID=2
        patched = enc[:sof_end] + lse + enc[sof_end:]
        with pytest.raises(JpegLSError, match="mapping"):
            jpegls.decode(patched)

    def test_point_transform_rejected(self):
        enc = bytearray(jpegls.encode(np.ones((4, 4), np.uint8),
                                      precision=8))
        sos = enc.find(b"\xff\xda")
        enc[sos + 2 + 6 + 1] = 2  # Al nibble of the SOS trailer
        with pytest.raises(JpegLSError, match="point transform"):
            jpegls.decode(bytes(enc))

    def test_sample_out_of_container_range(self, tmp_path):
        pix = _img(seed=12, shape=(16, 16))  # 12-bit values
        p = str(tmp_path / "x.dcm")
        write_dicom(p, pix, transfer_syntax=TS_JPEG_LS)
        ds = read_dataset(p)
        ds.attrs["BitsAllocated"] = 8
        with pytest.raises(DicomError, match="out of range"):
            decode_pixels(ds)

    def test_unsupported_bits32(self, tmp_path):
        pix = _img(seed=13, shape=(8, 8))
        p = str(tmp_path / "x.dcm")
        write_dicom(p, pix, transfer_syntax=TS_JPEG_LS)
        ds = read_dataset(p)
        ds.attrs["BitsAllocated"] = 32
        with pytest.raises(DicomError, match="16 bits"):
            decode_pixels(ds)

    def test_corrupt_entropy_raises_dicom_error(self, tmp_path):
        pix = _img(seed=14, shape=(16, 16))
        p = str(tmp_path / "x.dcm")
        write_dicom(p, pix, transfer_syntax=TS_JPEG_LS)
        ds = read_dataset(p)
        ds.fragments = [ds.fragments[0][:40]]
        with pytest.raises(DicomError, match="JPEG-LS"):
            decode_pixels(ds)


class TestPydicomCrossCheck:
    """Independent-implementation check (CI installs pydicom +
    pylibjpeg-libjpeg): a self-consistent but nonconformant codec pair
    would pass every round-trip above and fail here."""

    def test_pydicom_reads_our_jpegls(self, tmp_path):
        pydicom = pytest.importorskip("pydicom")
        pytest.importorskip("pylibjpeg")
        pix = _img(seed=30, shape=(48, 48))
        p = str(tmp_path / "x.dcm")
        write_dicom(p, pix, transfer_syntax=TS_JPEG_LS)
        ds = pydicom.dcmread(p)
        np.testing.assert_array_equal(ds.pixel_array, pix)

    def test_pydicom_reads_our_signed_jpegls(self, tmp_path):
        pydicom = pytest.importorskip("pydicom")
        pytest.importorskip("pylibjpeg")
        rng = np.random.default_rng(31)
        pix = rng.integers(-2000, 2000, (32, 32)).astype(np.int16)
        p = str(tmp_path / "s.dcm")
        write_dicom(p, pix, transfer_syntax=TS_JPEG_LS, signed=True)
        ds = pydicom.dcmread(p)
        np.testing.assert_array_equal(ds.pixel_array, pix)
