"""JPEG Baseline/Extended (lossy DCT) transfer syntaxes — `.4.50`/`.4.51`.

`.4.50` is the dominant ultrasound / secondary-capture archive syntax;
the reference cannot read it (plain pydicom, no plugins — ref
pipeline/dicom_io.py:29-45).  ``mdx.io.jpegdct`` is decode-only (writing
lossy medical images is deliberately unsupported).  Contract tested:

* decode matches Pillow's independent decoder within IDCT/upsampling
  tolerance (±2 gray / ±3 subsampled chroma) across quality levels,
  subsampling modes, restart intervals and shapes — PIL is a genuinely
  independent implementation, installed locally, so this is NOT
  CI-gated self-consistency;
* a hand-built single-block stream pins the 12-bit (`.4.51`) path
  against a directly computed IDCT;
* DICOM integration: encapsulated `.4.50` frames decode, YBR color is
  reduced to the Y plane for the grayscale QA path, errors are specific.
"""

from __future__ import annotations

import io
import struct

import numpy as np
import pytest

from mdx.io import jpegdct
from mdx.io.dicom import (
    TS_EXPLICIT_LE,
    TS_JPEG_BASELINE,
    DicomError,
    decode_pixels,
    load_dicom,
    read_dataset,
)
from mdx.io.dicom_write import write_dicom
from mdx.io.jpegdct import JpegDctError

PIL = pytest.importorskip("PIL.Image")


def _pil_jpeg(arr: np.ndarray, mode: str, **kw) -> bytes:
    b = io.BytesIO()
    PIL.fromarray(arr, mode).save(b, "JPEG", **kw)
    return b.getvalue()


def _pil_decode(stream: bytes) -> np.ndarray:
    return np.asarray(PIL.open(io.BytesIO(stream)))


def _gray(seed=0, shape=(64, 80)):
    rng = np.random.default_rng(seed)
    h, w = shape
    base = 128 + 40 * np.sin(np.arange(h * w).reshape(h, w) / 9.0)
    return np.clip(base + rng.normal(0, 8, shape), 0, 255).astype(np.uint8)


def _ycc_to_rgb(ycc: np.ndarray) -> np.ndarray:
    y, cb, cr = (ycc[..., i].astype(np.float64) for i in range(3))
    r = y + 1.402 * (cr - 128)
    g = y - 0.344136 * (cb - 128) - 0.714136 * (cr - 128)
    b = y + 1.772 * (cb - 128)
    return np.clip(np.stack([r, g, b], -1).round(), 0, 255)


class TestAgainstPillow:
    @pytest.mark.parametrize("quality", [95, 85, 50, 20])
    def test_grayscale(self, quality):
        g = _gray(seed=quality)
        s = _pil_jpeg(g, "L", quality=quality)
        dec, p = jpegdct.decode(s)
        assert p == 8 and dec.dtype == np.uint8
        diff = np.abs(dec.astype(int) - _pil_decode(s).astype(int))
        assert diff.max() <= 2

    @pytest.mark.parametrize("shape", [(8, 8), (9, 13), (64, 65), (1, 1),
                                       (17, 128)])
    def test_odd_shapes(self, shape):
        rng = np.random.default_rng(sum(shape))
        g = rng.integers(0, 256, shape).astype(np.uint8)
        s = _pil_jpeg(g, "L", quality=90)
        dec, _ = jpegdct.decode(s)
        assert dec.shape == shape
        diff = np.abs(dec.astype(int) - _pil_decode(s).astype(int))
        assert diff.max() <= 2

    @pytest.mark.parametrize("subsampling,name", [(0, "444"), (1, "422"),
                                                  (2, "420")])
    def test_color_subsampling(self, subsampling, name):
        g = _gray(seed=3)
        rgb = np.stack([g, np.roll(g, 5, 0), 255 - g], axis=-1)
        s = _pil_jpeg(rgb, "RGB", quality=85, subsampling=subsampling)
        dec, _ = jpegdct.decode(s)
        assert dec.shape == rgb.shape
        ours = _ycc_to_rgb(dec)
        ref = _pil_decode(s).astype(np.float64)
        diff = np.abs(ours - ref)
        assert diff.max() <= 3, name
        assert diff.mean() < 0.5, name

    @pytest.mark.parametrize("quality", [95, 85, 50])
    def test_progressive_grayscale(self, quality):
        """SOF2 successive-approximation scans (Annex G) — conformance
        extension beyond the sequential DICOM processes."""
        g = _gray(seed=quality + 60, shape=(96, 112))
        s = _pil_jpeg(g, "L", quality=quality, progressive=True)
        assert b"\xff\xc2" in s  # really progressive
        dec, _ = jpegdct.decode(s)
        diff = np.abs(dec.astype(int) - _pil_decode(s).astype(int))
        assert diff.max() <= 2

    @pytest.mark.parametrize("subsampling", [0, 2])
    def test_progressive_color(self, subsampling):
        g = _gray(seed=61)
        rgb = np.stack([g, np.roll(g, 5, 0), 255 - g], axis=-1)
        s = _pil_jpeg(rgb, "RGB", quality=85, progressive=True,
                      subsampling=subsampling)
        dec, _ = jpegdct.decode(s)
        ours = _ycc_to_rgb(dec)
        diff = np.abs(ours - _pil_decode(s).astype(np.float64))
        assert diff.max() <= 4
        assert diff.mean() < 0.6

    def test_progressive_matches_sequential_pixels(self):
        """The same source encoded sequential vs progressive at the same
        quality decodes to near-identical pixels (same coefficients,
        different scan order)."""
        g = _gray(seed=62, shape=(40, 56))
        seq = _pil_jpeg(g, "L", quality=90)
        pro = _pil_jpeg(g, "L", quality=90, progressive=True)
        a, _ = jpegdct.decode(seq)
        b, _ = jpegdct.decode(pro)
        assert np.abs(a.astype(int) - b.astype(int)).max() <= 1

    def test_restart_intervals(self):
        g = _gray(seed=4, shape=(48, 48))
        s = _pil_jpeg(g, "L", quality=85, restart_marker_blocks=2)
        assert b"\xff\xdd" in s  # DRI present
        dec, _ = jpegdct.decode(s)
        diff = np.abs(dec.astype(int) - _pil_decode(s).astype(int))
        assert diff.max() <= 2

    def test_high_frequency_content(self):
        rng = np.random.default_rng(5)
        g = (rng.integers(0, 2, (40, 40)) * 255).astype(np.uint8)
        s = _pil_jpeg(g, "L", quality=95)
        dec, _ = jpegdct.decode(s)
        diff = np.abs(dec.astype(int) - _pil_decode(s).astype(int))
        assert diff.max() <= 2


def _encode_sequential_12bit(img: np.ndarray) -> bytes:
    """Test-only SOF1 12-bit encoder: forward 8×8 DCT, q=1, one shared
    Huffman table pair covering every category — enough to synthesize
    valid multi-block 12-bit streams (no 12-bit encoder exists in any
    installable package, and the product stance is decode-only)."""
    import struct

    from mdx.io.jpegdct import _IDCT_C, _ZIGZAG

    h, w = img.shape
    assert h % 8 == 0 and w % 8 == 0
    by, bx = h // 8, w // 8
    shifted = img.astype(np.float64) - 2048.0
    blocks = shifted.reshape(by, 8, bx, 8).transpose(0, 2, 1, 3)
    # forward DCT: B[u,v] = Σ C[u,x]·b[x,y]·C[v,y]
    coefs = np.einsum("ux,ijxy,vy->ijuv", _IDCT_C * 2, blocks,
                      _IDCT_C * 2) / 4.0
    # zigzag index k holds the raster coefficient at _ZIGZAG[k]
    # (the decoder inverts with blocks[:, :, _ZIGZAG] = deq)
    zz = np.take(np.round(coefs).reshape(by, bx, 64), _ZIGZAG,
                 axis=2).astype(np.int64)

    # Huffman: category t coded as t 1-bits then 0?  Use canonical
    # tables: one code per symbol, lengths = uniform 8 bits for
    # simplicity (max 256 symbols fits).  DC symbols 0..15, AC all rs.
    def _canonical(symbols):
        counts = [0] * 16
        counts[7] = len(symbols)  # all length 8
        return bytes(counts), bytes(symbols), {
            s: (i, 8) for i, s in enumerate(symbols)}

    dc_counts, dc_vals, dc_code = _canonical(list(range(16)))
    ac_syms = sorted({0x00, 0xF0} | {
        (r << 4) | s for r in range(16) for s in range(1, 15)})
    ac_counts, ac_vals, ac_code = _canonical(ac_syms)

    bits: list = []

    def put(code, n):
        for i in range(n - 1, -1, -1):
            bits.append((code >> i) & 1)

    pred = 0
    for yb in range(by):
        for xb in range(bx):
            blk = zz[yb, xb]
            diff = int(blk[0]) - pred
            pred = int(blk[0])
            t = abs(diff).bit_length()
            c, ln = dc_code[t]
            put(c, ln)
            if t:
                put(diff if diff >= 0 else diff + (1 << t) - 1, t)
            k = 1
            while k < 64:
                run = 0
                while k < 64 and blk[k] == 0:
                    run += 1
                    k += 1
                if k == 64:
                    c, ln = ac_code[0x00]
                    put(c, ln)
                    break
                while run > 15:
                    c, ln = ac_code[0xF0]
                    put(c, ln)
                    run -= 16
                v = int(blk[k])
                s = abs(v).bit_length()
                c, ln = ac_code[(run << 4) | s]
                put(c, ln)
                put(v if v >= 0 else v + (1 << s) - 1, s)
                k += 1
    while len(bits) % 8:
        bits.append(1)
    payload = bytearray()
    for i in range(0, len(bits), 8):
        b = int("".join(map(str, bits[i:i + 8])), 2)
        payload.append(b)
        if b == 0xFF:
            payload.append(0x00)

    out = bytearray(b"\xff\xd8")
    out += b"\xff\xdb" + struct.pack(">HB", 2 + 1 + 128, 0x10)
    out += b"".join(struct.pack(">H", 1) for _ in range(64))
    out += b"\xff\xc1" + struct.pack(">HBHHB", 11, 12, h, w, 1)
    out += bytes((1, 0x11, 0))
    out += b"\xff\xc4" + struct.pack(
        ">HB", 2 + 1 + 16 + len(dc_vals), 0x00) + dc_counts + dc_vals
    out += b"\xff\xc4" + struct.pack(
        ">HB", 2 + 1 + 16 + len(ac_vals), 0x10) + ac_counts + ac_vals
    out += b"\xff\xda" + struct.pack(">HB", 8, 1) + bytes((1, 0x00))
    out += bytes((0, 63, 0))
    out += payload
    out += b"\xff\xd9"
    return bytes(out)


class Test12Bit:
    def test_multiblock_12bit_roundtrip(self):
        """A synthesized multi-block SOF1 12-bit stream (q=1) decodes to
        IDCT∘round∘DCT of the source — within the ±1 coefficient
        rounding bound."""
        rng = np.random.default_rng(70)
        img = np.clip(2048 + 600 * np.sin(
            np.arange(32 * 40).reshape(32, 40) / 5.0)
            + rng.normal(0, 50, (32, 40)), 0, 4095).astype(np.uint16)
        stream = _encode_sequential_12bit(img)
        dec, p = jpegdct.decode(stream)
        assert p == 12 and dec.dtype == np.uint16
        assert dec.shape == img.shape
        # q=1: error bounded by DCT coefficient rounding (≤ ~4 LSB)
        assert np.abs(dec.astype(int) - img.astype(int)).max() <= 4
    def _single_block_stream(self, dc: int) -> bytes:
        """Minimal SOF1 12-bit stream: one 8×8 block, flat DC value."""
        out = bytearray(b"\xff\xd8")
        # DQT: table 0, all ones (no quantisation)
        out += b"\xff\xdb" + struct.pack(">HB", 67, 0) + bytes([1] * 64)
        # SOF1: P=12, 8×8, one component
        out += b"\xff\xc1" + struct.pack(">HBHHB", 11, 12, 8, 8, 1)
        out += bytes((1, 0x11, 0))
        # DHT DC table 0: one code of length 2 for category `cat`;
        # AC table 0: one code of length 2 for EOB (0x00)
        cat = max(dc.bit_length(), 0)
        counts_dc = [0] * 16
        counts_dc[1] = 1  # one 2-bit... use length 2 → index 1
        out += b"\xff\xc4" + struct.pack(">HB", 2 + 1 + 16 + 1, 0x00)
        out += bytes(counts_dc) + bytes([cat])
        counts_ac = [0] * 16
        counts_ac[1] = 1
        out += b"\xff\xc4" + struct.pack(">HB", 2 + 1 + 16 + 1, 0x10)
        out += bytes(counts_ac) + bytes([0x00])
        # SOS
        out += b"\xff\xda" + struct.pack(">HB", 8, 1) + bytes((1, 0x00))
        out += bytes((0, 63, 0))
        # entropy: DC code '00' + cat bits of dc, AC EOB code '00', pad 1s
        bits = "00" + format(dc, f"0{cat}b") + "00"
        bits += "1" * ((8 - len(bits) % 8) % 8)
        out += int(bits, 2).to_bytes(len(bits) // 8, "big")
        out += b"\xff\xd9"
        return bytes(out)

    def test_flat_block_known_answer(self):
        # DC coefficient d with q=1 → spatial value d/8 + 2048 everywhere
        for dc in (0, 8, 800):
            stream = self._single_block_stream(dc)
            dec, p = jpegdct.decode(stream)
            assert p == 12 and dec.dtype == np.uint16
            expect = int(round(dc / 8.0)) + 2048
            assert dec.shape == (8, 8)
            np.testing.assert_array_equal(dec, np.full((8, 8), expect))

    def test_baseline_rejects_12bit(self):
        s = bytearray(self._single_block_stream(8))
        s[s.find(b"\xff\xc1") + 1] = 0xC0  # claim SOF0
        with pytest.raises(JpegDctError, match="P=8"):
            jpegdct.decode(bytes(s))


class TestScanGridSafety:
    """Crafted streams whose per-scan block grids disagree with the
    coefficient-array allocation — the progressive case used to index
    past the allocation (heap corruption in the native decoder from
    untrusted DICOM input), the sequential case desyncs the native row
    stride.  Progressive allocations are now the full interleaved grid;
    sequential duplicate-component scans are rejected."""

    @staticmethod
    def _prog_narrow_then_interleaved() -> bytes:
        """SOF2, 17×17, comp1 h=v=2 / comp2 h=v=1: a NON-interleaved DC
        first scan for comp1 (3×3 block grid) followed by an interleaved
        DC scan (4×4 grid for comp1) — the second scan indexes rows/cols
        past a narrow-grid allocation."""
        out = bytearray(b"\xff\xd8")
        out += b"\xff\xdb" + struct.pack(">HB", 67, 0) + bytes([1] * 64)
        out += b"\xff\xc2" + struct.pack(">HBHHB", 14, 8, 17, 17, 2)
        out += bytes((1, 0x22, 0)) + bytes((2, 0x11, 0))
        # DC table 0: single symbol 0 as the 1-bit code '0'
        counts = [0] * 16
        counts[0] = 1
        out += b"\xff\xc4" + struct.pack(">HB", 20, 0x00)
        out += bytes(counts) + bytes([0])
        # scan 1: comp1 only, DC first pass (ss=se=0, ah=0, al=1);
        # 3×3 = 9 blocks, 1 bit each, all zero diffs
        out += b"\xff\xda" + struct.pack(">HB", 8, 1) + bytes((1, 0x00))
        out += bytes((0, 0, 0x01))
        out += b"\x00\x00"
        # scan 2: interleaved DC over both comps; 2×2 MCUs × 5 blocks
        # = 20 bits, all zero diffs
        out += b"\xff\xda" + struct.pack(">HB", 10, 2)
        out += bytes((1, 0x00)) + bytes((2, 0x00))
        out += bytes((0, 0, 0x01))
        out += b"\x00\x00\x00"
        out += b"\xff\xd9"
        return bytes(out)

    def test_progressive_wider_later_scan_decodes(self, monkeypatch):
        """Both decoders take the crafted stream without indexing past
        the allocation, and agree."""
        s = self._prog_narrow_then_interleaved()
        dec, p = jpegdct.decode(s)
        assert p == 8 and dec.shape == (17, 17, 2)
        monkeypatch.setattr(jpegdct, "_native", lambda: None)
        py, _ = jpegdct.decode(s)
        np.testing.assert_array_equal(dec, py)

    def test_sequential_duplicate_component_rejected(self):
        out = bytearray(b"\xff\xd8")
        out += b"\xff\xdb" + struct.pack(">HB", 67, 0) + bytes([1] * 64)
        out += b"\xff\xc0" + struct.pack(">HBHHB", 11, 8, 8, 8, 1)
        out += bytes((1, 0x11, 0))
        counts = [0] * 16
        counts[0] = 1
        out += b"\xff\xc4" + struct.pack(">HB", 20, 0x00)
        out += bytes(counts) + bytes([0])
        out += b"\xff\xc4" + struct.pack(">HB", 20, 0x10)
        out += bytes(counts) + bytes([0x00])
        scan = b"\xff\xda" + struct.pack(">HB", 8, 1) + bytes((1, 0x00))
        scan += bytes((0, 63, 0)) + b"\x00"
        out += scan + scan + b"\xff\xd9"
        with pytest.raises(JpegDctError, match="more than one scan"):
            jpegdct.decode(bytes(out))


class TestNativeParity:
    """The C segment entropy decoder is bit-identical to the Python
    oracle, with the same error taxonomy."""

    @pytest.fixture(autouse=True)
    def _need_native(self):
        pytest.importorskip("mdx.io.native")
        from mdx.io import native
        try:
            native._load()
        except native.NativeUnavailable:
            pytest.skip("native library not built")

    def _decode_forced_python(self, monkeypatch, stream):
        monkeypatch.setattr(jpegdct, "_native", lambda: None)
        try:
            return jpegdct.decode(stream)
        finally:
            monkeypatch.undo()

    @pytest.mark.parametrize("kind", ["gray", "rgb444", "rgb420", "rst"])
    def test_bit_parity(self, monkeypatch, kind):
        g = _gray(seed=40, shape=(56, 72))
        if kind == "gray":
            s = _pil_jpeg(g, "L", quality=85)
        elif kind == "rst":
            s = _pil_jpeg(g, "L", quality=85, restart_marker_blocks=2)
        else:
            rgb = np.stack([g, np.roll(g, 3, 1), 255 - g], -1)
            s = _pil_jpeg(rgb, "RGB", quality=85,
                          subsampling=0 if kind == "rgb444" else 2)
        nat, _ = jpegdct.decode(s)
        py, _ = self._decode_forced_python(monkeypatch, s)
        np.testing.assert_array_equal(nat, py)

    @pytest.mark.parametrize("kind", ["gray", "rgb420", "lowq"])
    def test_progressive_bit_parity(self, monkeypatch, kind):
        g = _gray(seed=42, shape=(56, 72))
        if kind == "gray":
            s = _pil_jpeg(g, "L", quality=85, progressive=True)
        elif kind == "lowq":
            s = _pil_jpeg(g, "L", quality=20, progressive=True)
        else:
            rgb = np.stack([g, np.roll(g, 3, 1), 255 - g], -1)
            s = _pil_jpeg(rgb, "RGB", quality=85, progressive=True,
                          subsampling=2)
        nat, _ = jpegdct.decode(s)
        py, _ = self._decode_forced_python(monkeypatch, s)
        np.testing.assert_array_equal(nat, py)

    def test_error_taxonomy_parity(self, monkeypatch):
        s = _pil_jpeg(_gray(seed=41), "L", quality=85)
        cut = s[:len(s) * 2 // 3]
        with pytest.raises(JpegDctError):
            jpegdct.decode(cut)
        with pytest.raises(JpegDctError):
            self._decode_forced_python(monkeypatch, cut)


class TestDicomIntegration:
    def _encapsulate(self, tmp_path, pix_uncompressed, frags, ts,
                     photometric=None, samples=1):
        p = str(tmp_path / "x.dcm")
        write_dicom(p, pix_uncompressed, transfer_syntax=TS_EXPLICIT_LE)
        ds = read_dataset(p)
        ds.transfer_syntax = ts
        ds.pixel_bytes = b""
        ds.fragments = [f + (b"\x00" if len(f) % 2 else b"") for f in frags]
        if photometric:
            ds.attrs["PhotometricInterpretation"] = photometric
            ds.attrs["SamplesPerPixel"] = samples
        return ds

    def test_grayscale_frame(self, tmp_path):
        g = _gray(seed=10, shape=(64, 64))
        ds = self._encapsulate(tmp_path, g, [_pil_jpeg(g, "L", quality=95)],
                               TS_JPEG_BASELINE)
        out = decode_pixels(ds)
        assert out.dtype == np.uint8
        assert np.abs(out.astype(int) - g.astype(int)).mean() < 3

    def test_multiframe(self, tmp_path):
        frames = [_gray(seed=s, shape=(32, 32)) for s in (1, 2, 3)]
        ds = self._encapsulate(
            tmp_path, np.stack(frames),
            [_pil_jpeg(f, "L", quality=95) for f in frames],
            TS_JPEG_BASELINE)
        out = decode_pixels(ds)
        assert out.shape == (3, 32, 32)

    def test_ybr_grayscale_path_takes_y_plane(self, tmp_path):
        """An `.4.50` ultrasound-style YBR dataset: load_dicom's
        grayscale image must be the Y plane, not RGB-luma of YCbCr."""
        g = _gray(seed=11, shape=(64, 64))
        rgb = np.stack([g, np.full_like(g, 90), np.full_like(g, 160)], -1)
        stream = _pil_jpeg(rgb, "RGB", quality=95, subsampling=0)
        raw = np.zeros((64, 64), np.uint8)
        ds = self._encapsulate(tmp_path, raw, [stream], TS_JPEG_BASELINE,
                               photometric="YBR_FULL_422", samples=3)
        stored = decode_pixels(ds)          # stored YBR samples
        assert stored.shape == (64, 64, 3)
        # drive the grayscale path via _pixels
        from mdx.io.dicom import _pixels

        img = _pixels(ds, window=False)
        assert img.ndim == 2
        # the Y plane of the decoded stream, modulo codec loss
        y = jpegdct.decode(stream)[0][..., 0]
        assert np.abs(img - y.astype(np.float32)).max() <= 2.0

    def test_corrupt_stream_raises_dicom_error(self, tmp_path):
        g = _gray(seed=12, shape=(32, 32))
        frag = _pil_jpeg(g, "L")[:40]
        ds = self._encapsulate(tmp_path, g, [frag], TS_JPEG_BASELINE)
        with pytest.raises(DicomError, match="JPEG"):
            decode_pixels(ds)

    def test_signed_container_rejected(self, tmp_path):
        g = _gray(seed=13, shape=(32, 32))
        ds = self._encapsulate(tmp_path, g, [_pil_jpeg(g, "L")],
                               TS_JPEG_BASELINE)
        ds.attrs["PixelRepresentation"] = 1
        with pytest.raises(DicomError, match="[Ss]igned"):
            decode_pixels(ds)


class TestErrors:
    def test_not_a_jpeg(self):
        with pytest.raises(JpegDctError, match="SOI"):
            jpegdct.decode(b"\x12\x34")

    def test_arithmetic_sof_rejected(self):
        g = _gray(seed=14, shape=(32, 32))
        s = bytearray(_pil_jpeg(g, "L", quality=85))
        s[s.find(b"\xff\xc0") + 1] = 0xC9  # claim arithmetic sequential
        with pytest.raises(JpegDctError, match="arithmetic"):
            jpegdct.decode(bytes(s))

    def test_lossless_stream_names_right_codec(self):
        from mdx.io import jpegll

        enc = jpegll.encode(np.ones((4, 4), np.uint16), precision=12,
                            predictor=1)
        with pytest.raises(JpegDctError, match="jpegll"):
            jpegdct.decode(enc)

    def test_jpegls_stream_names_right_codec(self):
        from mdx.io import jpegls

        enc = jpegls.encode(np.ones((4, 4), np.uint8), precision=8)
        with pytest.raises(JpegDctError, match="jpegls"):
            jpegdct.decode(enc)

    def test_truncated(self):
        s = _pil_jpeg(_gray(seed=15), "L")
        with pytest.raises(JpegDctError):
            jpegdct.decode(s[:len(s) // 2])
