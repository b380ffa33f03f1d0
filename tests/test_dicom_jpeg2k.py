"""JPEG 2000 transfer syntaxes — `.4.90` (lossless) / `.4.91`.

The one archive syntax family the io layer refused through round 4; the
reference cannot read it at all (plain pydicom, no plugins — ref
pipeline/dicom_io.py:29-45).  ``mdx.io.jpeg2k`` is a from-the-standard
(ISO 15444-1) decoder; decode-only by design.

Pillow's OpenJPEG binding is a genuinely independent local oracle (a
different implementation, installed in this image — NOT CI-gated
self-consistency):

* reversible (5/3) streams must round-trip EXACTLY across sizes,
  decomposition levels, code-block sizes, all five progression orders,
  quality layers, precincts, tiles and JP2 wrapping — including
  bit-exact agreement with OpenJPEG's decode of truncated streams
  (the in-loop half-LSB reconstruction rule);
* irreversible (9/7) decodes must match OpenJPEG's within float-filter
  tolerance (±2);
* 16-bit and RGB (RCT/ICT) paths included.

DICOM integration: encapsulated `.4.90`/`.4.91` frames decode through
``decode_pixels``, YBR_RCT/YBR_ICT color arrives as RGB (the decoder
inverts the MCT) and reduces via luma weights, signedness mismatches
raise, and `.4.90` files transcode to the lossless targets.
"""

from __future__ import annotations

import io
import struct

import numpy as np
import pytest

from mdx.io import jpeg2k
from mdx.io.dicom import (
    TS_EXPLICIT_LE,
    TS_J2K,
    TS_J2K_LOSSLESS,
    DicomError,
    decode_pixels,
    load_dicom,
    read_dataset,
)
from mdx.io.dicom_write import write_dicom
from mdx.io.jpeg2k import Jpeg2kError

PIL = pytest.importorskip("PIL.Image")
from PIL import features as _pil_features  # noqa: E402

if not _pil_features.check("jpg_2000"):   # pragma: no cover
    pytest.skip("Pillow lacks OpenJPEG", allow_module_level=True)


def _enc(img: np.ndarray, mode: str = "L", **kw) -> bytes:
    b = io.BytesIO()
    PIL.fromarray(img, mode).save(b, "JPEG2000", **kw)
    return b.getvalue()


def _pil_dec(stream: bytes) -> np.ndarray:
    return np.asarray(PIL.open(io.BytesIO(stream)))


def _gray8(seed=0, shape=(70, 54)):
    rng = np.random.default_rng(seed)
    h, w = shape
    base = 128 + 60 * np.sin(np.arange(h * w).reshape(h, w) / 11.0)
    return np.clip(base + rng.normal(0, 20, shape), 0,
                   255).astype(np.uint8)


class TestLosslessExact:
    @pytest.mark.parametrize("shape", [(16, 16), (64, 80), (70, 54),
                                       (33, 47), (128, 96)])
    def test_shapes(self, shape):
        a = _gray8(seed=shape[0], shape=shape)
        dec, p, sg = jpeg2k.decode(_enc(a, no_jp2=True))
        assert p == 8 and not sg
        np.testing.assert_array_equal(dec, a)

    @pytest.mark.parametrize("nres", [1, 2, 3, 6])
    def test_decomposition_levels(self, nres):
        a = _gray8(seed=nres)
        dec, _, _ = jpeg2k.decode(_enc(a, no_jp2=True,
                                       num_resolutions=nres))
        np.testing.assert_array_equal(dec, a)

    @pytest.mark.parametrize("cb", [(32, 32), (64, 16), (16, 64)])
    def test_codeblock_sizes(self, cb):
        a = _gray8(seed=cb[0])
        dec, _, _ = jpeg2k.decode(_enc(a, no_jp2=True,
                                       codeblock_size=cb))
        np.testing.assert_array_equal(dec, a)

    @pytest.mark.parametrize("prog", ["LRCP", "RLCP", "RPCL", "PCRL",
                                      "CPRL"])
    def test_progression_orders(self, prog):
        a = _gray8(seed=len(prog))
        dec, _, _ = jpeg2k.decode(_enc(a, no_jp2=True,
                                       progression=prog))
        np.testing.assert_array_equal(dec, a)

    def test_quality_layers(self):
        a = _gray8(seed=9)
        dec, _, _ = jpeg2k.decode(_enc(
            a, no_jp2=True, quality_mode="rates",
            quality_layers=[20, 5, 1]))
        np.testing.assert_array_equal(dec, a)

    @pytest.mark.parametrize("psize", [(128, 128), (64, 64)])
    def test_precincts(self, psize):
        a = _gray8(seed=psize[0])
        dec, _, _ = jpeg2k.decode(_enc(a, no_jp2=True,
                                       precinct_size=psize))
        np.testing.assert_array_equal(dec, a)

    @pytest.mark.parametrize("tsize", [(32, 32), (16, 48), (64, 64)])
    def test_tiles(self, tsize):
        a = _gray8(seed=tsize[0])
        dec, _, _ = jpeg2k.decode(_enc(a, no_jp2=True,
                                       tile_size=tsize))
        np.testing.assert_array_equal(dec, a)

    def test_precincts_with_rpcl_and_tiles(self):
        a = _gray8(seed=77, shape=(96, 80))
        dec, _, _ = jpeg2k.decode(_enc(
            a, no_jp2=True, precinct_size=(64, 64), progression="RPCL",
            tile_size=(64, 64)))
        np.testing.assert_array_equal(dec, a)

    def test_jp2_container(self):
        a = _gray8(seed=10)
        dec, _, _ = jpeg2k.decode(_enc(a))  # JP2 boxes
        np.testing.assert_array_equal(dec, a)

    def test_16bit(self):
        rng = np.random.default_rng(11)
        a = np.clip(2048 + 800 * np.sin(
            np.arange(48 * 40).reshape(48, 40) / 7.0)
            + rng.normal(0, 100, (48, 40)), 0, 4095).astype(np.uint16)
        import warnings

        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            s = _enc(a, "I;16", no_jp2=True)
        dec, p, sg = jpeg2k.decode(s)
        assert p == 16 and not sg
        np.testing.assert_array_equal(dec, a)

    def test_rgb_rct(self):
        g = _gray8(seed=12)
        rgb = np.stack([g, np.roll(g, 3, 1), 255 - g], -1)
        dec, _, _ = jpeg2k.decode(_enc(rgb, "RGB", no_jp2=True))
        np.testing.assert_array_equal(dec, rgb)

    def test_truncated_stream_matches_openjpeg_bit_for_bit(self):
        """Rate-limited reversible streams stop mid-bitplane; the
        half-LSB reconstruction must agree with OpenJPEG exactly."""
        a = _gray8(seed=13, shape=(96, 96))
        for rate in (20, 8, 3):
            s = _enc(a, no_jp2=True, quality_mode="rates",
                     quality_layers=[rate])
            dec, _, _ = jpeg2k.decode(s)
            np.testing.assert_array_equal(dec, _pil_dec(s),
                                          err_msg=f"rate {rate}")


class TestIrreversible:
    def test_gray_97(self):
        a = _gray8(seed=20)
        s = _enc(a, no_jp2=True, irreversible=True)
        dec, _, _ = jpeg2k.decode(s)
        assert np.abs(dec.astype(int)
                      - _pil_dec(s).astype(int)).max() <= 2

    def test_gray_97_lossy_rate(self):
        a = _gray8(seed=21)
        s = _enc(a, no_jp2=True, irreversible=True,
                 quality_mode="rates", quality_layers=[10])
        dec, _, _ = jpeg2k.decode(s)
        assert np.abs(dec.astype(int)
                      - _pil_dec(s).astype(int)).max() <= 2

    def test_rgb_ict(self):
        g = _gray8(seed=22)
        rgb = np.stack([g, np.roll(g, 3, 1), 255 - g], -1)
        s = _enc(rgb, "RGB", no_jp2=True, irreversible=True)
        dec, _, _ = jpeg2k.decode(s)
        assert np.abs(dec.astype(int)
                      - _pil_dec(s).astype(int)).max() <= 2


class TestSigned:
    def test_signed_siz_flag(self):
        """Flipping SIZ's sign bit reinterprets the stream as signed
        with no DC shift: decode must equal the unsigned pixels − 128."""
        a = _gray8(seed=30, shape=(40, 40))
        s = bytearray(_enc(a, no_jp2=True))
        i = s.find(b"\xff\x51")          # SIZ
        # Ssiz of component 0 sits 36 bytes into the segment body
        ssiz_off = i + 4 + 36
        assert s[ssiz_off] == 7          # 8-bit unsigned
        s[ssiz_off] = 0x87               # 8-bit signed
        dec, p, sg = jpeg2k.decode(bytes(s))
        assert sg and p == 8 and dec.dtype == np.int16
        np.testing.assert_array_equal(dec,
                                      a.astype(np.int16) - 128)


class TestErrors:
    def test_not_a_codestream(self):
        with pytest.raises(Jpeg2kError, match="SOC"):
            jpeg2k.decode(b"\x00" * 64)

    def test_truncated(self):
        s = _enc(_gray8(seed=40), no_jp2=True)
        with pytest.raises(Jpeg2kError):
            jpeg2k.decode(s[:len(s) // 3])

    def test_empty_jp2(self):
        sig = bytes.fromhex("0000000c6a5020200d0a870a")
        with pytest.raises(Jpeg2kError, match="no codestream"):
            jpeg2k.decode(sig + struct.pack(">I", 16) + b"ftypdata0000")

    @pytest.mark.parametrize("marker,name", [
        (0xFF5E, "RGN"), (0xFF5F, "POC"), (0xFF60, "PPM")])
    def test_unsupported_features_named(self, marker, name):
        s = bytearray(_enc(_gray8(seed=41), no_jp2=True))
        i = s.find(b"\xff\x5c")          # before QCD
        seg = struct.pack(">HH", marker, 4) + b"\x00\x00"
        s2 = bytes(s[:i]) + seg + bytes(s[i:])
        with pytest.raises(Jpeg2kError, match=name):
            jpeg2k.decode(s2)

    def test_subsampled_components_named(self):
        s = bytearray(_enc(_gray8(seed=42), no_jp2=True))
        i = s.find(b"\xff\x51")
        s[i + 4 + 37] = 2                # XRsiz = 2
        with pytest.raises(Jpeg2kError, match="Subsampled"):
            jpeg2k.decode(bytes(s))


def _encapsulate_j2k(tmp_path, name, frames_streams, rows, cols,
                     ts, bits=8, samples=1, photometric=None,
                     signed=False):
    """Build a part-10 file with encapsulated J2K frame codestreams."""
    from mdx.io.transcode import _explicit_el

    el = _explicit_el
    body = [
        el((0x0028, 0x0002), b"US", struct.pack("<H", samples)),
    ]
    if photometric:
        pm = photometric.encode()
        body.append(el((0x0028, 0x0004), b"CS", pm))
    if samples > 1:
        body.append(el((0x0028, 0x0006), b"US", struct.pack("<H", 0)))
    if len(frames_streams) > 1:
        body.append(el((0x0028, 0x0008), b"IS",
                       str(len(frames_streams)).encode().ljust(2)))
    body += [
        el((0x0028, 0x0010), b"US", struct.pack("<H", rows)),
        el((0x0028, 0x0011), b"US", struct.pack("<H", cols)),
        el((0x0028, 0x0100), b"US", struct.pack("<H", bits)),
        el((0x0028, 0x0101), b"US", struct.pack("<H", bits)),
        el((0x0028, 0x0103), b"US",
           struct.pack("<H", 1 if signed else 0)),
    ]
    pix = struct.pack("<HH2sHI", 0x7FE0, 0x0010, b"OB", 0, 0xFFFFFFFF)
    pix += struct.pack("<HHI", 0xFFFE, 0xE000, 0)
    for s in frames_streams:
        if len(s) % 2:
            s += b"\x00"
        pix += struct.pack("<HHI", 0xFFFE, 0xE000, len(s)) + s
    pix += struct.pack("<HHI", 0xFFFE, 0xE0DD, 0)

    def m(elem, vr, val):
        return el((0x0002, elem), vr, val)

    def txt(t):
        v = t.encode()
        return v + (b"\x00" if len(v) % 2 else b"")

    els = b"".join([
        m(0x0001, b"OB", b"\x00\x01"),
        m(0x0002, b"UI", txt("1.2.840.10008.5.1.4.1.1.7")),
        m(0x0003, b"UI", txt("1.2.3.4.5")),
        m(0x0010, b"UI", txt(ts)),
        m(0x0012, b"UI", txt("1.2.826.0.1.3680043.9.9999")),
    ])
    meta = m(0x0000, b"UL", struct.pack("<I", len(els))) + els
    p = str(tmp_path / name)
    open(p, "wb").write(b"\x00" * 128 + b"DICM" + meta
                        + b"".join(body) + pix)
    return p


class TestDicomIntegration:
    def test_gray16_lossless_frame(self, tmp_path):
        rng = np.random.default_rng(50)
        a = np.clip(2048 + 500 * rng.normal(0, 1, (48, 64)), 0,
                    4095).astype(np.uint16)
        import warnings

        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            s = _enc(a, "I;16", no_jp2=True)
        p = _encapsulate_j2k(tmp_path, "x.dcm", [s], 48, 64,
                             TS_J2K_LOSSLESS, bits=16)
        ds = read_dataset(p)
        assert ds.transfer_syntax == TS_J2K_LOSSLESS
        np.testing.assert_array_equal(decode_pixels(ds), a)

    def test_multiframe(self, tmp_path):
        frames = [_gray8(seed=60 + i, shape=(32, 40)) for i in range(3)]
        streams = [_enc(f, no_jp2=True) for f in frames]
        p = _encapsulate_j2k(tmp_path, "m.dcm", streams, 32, 40,
                             TS_J2K_LOSSLESS)
        got = decode_pixels(read_dataset(p))
        np.testing.assert_array_equal(got, np.stack(frames))

    def test_lossy_91(self, tmp_path):
        a = _gray8(seed=61, shape=(32, 40))
        s = _enc(a, no_jp2=True, irreversible=True,
                 quality_mode="rates", quality_layers=[8])
        p = _encapsulate_j2k(tmp_path, "l.dcm", [s], 32, 40, TS_J2K)
        got = decode_pixels(read_dataset(p))
        assert np.abs(got.astype(int)
                      - _pil_dec(s).astype(int)).max() <= 2

    def test_ybr_rct_color_reduces_to_luma(self, tmp_path):
        g = _gray8(seed=62, shape=(32, 40))
        rgb = np.stack([g, np.roll(g, 3, 1), 255 - g], -1)
        s = _enc(rgb, "RGB", no_jp2=True)
        p = _encapsulate_j2k(tmp_path, "c.dcm", [s], 32, 40,
                             TS_J2K_LOSSLESS, samples=3,
                             photometric="YBR_RCT")
        img, _meta = load_dicom(p)
        assert img.ndim == 2
        # RGB→luma (to_grayscale weights), NOT a channel-0 extraction:
        # the decoder already inverted the RCT, so these are RGB samples
        from mdx.io.normalize import to_grayscale

        want = to_grayscale(rgb.astype(np.float32))
        np.testing.assert_allclose(img, want, atol=1e-5)

    def test_signedness_mismatch_raises(self, tmp_path):
        a = _gray8(seed=63, shape=(16, 16))
        s = _enc(a, no_jp2=True)
        p = _encapsulate_j2k(tmp_path, "s.dcm", [s], 16, 16,
                             TS_J2K_LOSSLESS, signed=True)
        with pytest.raises(DicomError, match="signedness"):
            decode_pixels(read_dataset(p))

    def test_corrupt_stream_names_codec(self, tmp_path):
        p = _encapsulate_j2k(tmp_path, "bad.dcm",
                             [b"\xff\x4f\xff\x51" + b"\x00" * 10],
                             16, 16, TS_J2K_LOSSLESS)
        with pytest.raises(DicomError, match="JPEG 2000"):
            decode_pixels(read_dataset(p))

    def test_transcode_j2k_source_to_lossless(self, tmp_path):
        from mdx.io.transcode import transcode

        a = _gray8(seed=64, shape=(32, 40))
        s = _enc(a, no_jp2=True)
        p = _encapsulate_j2k(tmp_path, "t.dcm", [s], 32, 40,
                             TS_J2K_LOSSLESS)
        dp = str(tmp_path / "out.dcm")
        transcode(p, dp, "jpeg-ls")
        np.testing.assert_array_equal(
            decode_pixels(read_dataset(dp)), a)

    def test_lossy_j2k_target_refused(self, tmp_path):
        img = np.zeros((8, 8), np.uint16)
        sp = write_dicom(str(tmp_path / "w.dcm"), img,
                         transfer_syntax=TS_EXPLICIT_LE)
        from mdx.io.transcode import transcode

        with pytest.raises(DicomError, match="lossy|unwritable"):
            transcode(sp, str(tmp_path / "o.dcm"), TS_J2K)

    def test_lossless_j2k_target_works(self, tmp_path):
        rng = np.random.default_rng(70)
        img = rng.integers(0, 4096, (24, 32)).astype(np.uint16)
        sp = write_dicom(str(tmp_path / "w.dcm"), img,
                         transfer_syntax=TS_EXPLICIT_LE)
        from mdx.io.transcode import transcode

        dp = str(tmp_path / "o.dcm")
        transcode(sp, dp, "j2k")
        ds = read_dataset(dp)
        assert ds.transfer_syntax == TS_J2K_LOSSLESS
        np.testing.assert_array_equal(decode_pixels(ds), img)


class TestNativeParity:
    """The C Tier-1 decoder is bit-identical to the Python oracle."""

    @pytest.fixture(autouse=True)
    def _need_native(self):
        pytest.importorskip("mdx.io.native")
        from mdx.io import native
        try:
            native._load()
        except native.NativeUnavailable:
            pytest.skip("native library not built")
        if not hasattr(native, "jpeg2k_t1_block"):
            pytest.skip("stale native module")

    def _decode_forced_python(self, monkeypatch, stream):
        monkeypatch.setattr(jpeg2k, "_native", lambda: None)
        try:
            return jpeg2k.decode(stream)
        finally:
            monkeypatch.undo()

    @pytest.mark.parametrize("kind", [
        "plain", "lossy97", "layers", "truncated", "tiles", "rgb",
        "bit16"])
    def test_bit_parity(self, monkeypatch, kind):
        g = _gray8(seed=hash(kind) % 100, shape=(96, 80))
        import warnings

        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            if kind == "plain":
                s = _enc(g, no_jp2=True)
            elif kind == "lossy97":
                s = _enc(g, no_jp2=True, irreversible=True,
                         quality_mode="rates", quality_layers=[8])
            elif kind == "layers":
                s = _enc(g, no_jp2=True, quality_mode="rates",
                         quality_layers=[20, 5, 1])
            elif kind == "truncated":
                s = _enc(g, no_jp2=True, quality_mode="rates",
                         quality_layers=[4])
            elif kind == "tiles":
                s = _enc(g, no_jp2=True, tile_size=(32, 32))
            elif kind == "rgb":
                rgb = np.stack([g, np.roll(g, 3, 1), 255 - g], -1)
                s = _enc(rgb, "RGB", no_jp2=True)
            else:
                a16 = (g.astype(np.uint16) * 16)
                s = _enc(a16, "I;16", no_jp2=True)
        nat, p1, s1 = jpeg2k.decode(s)
        py, p2, s2 = self._decode_forced_python(monkeypatch, s)
        assert (p1, s1) == (p2, s2)
        np.testing.assert_array_equal(nat, py)

    def test_segsym_error_parity(self, monkeypatch):
        """Both decoders raise the same error on a segmentation-symbol
        mismatch (crafted: flip COD's segsym flag on a plain stream so
        the decoder expects symbols the encoder never wrote)."""
        s = bytearray(_enc(_gray8(seed=5, shape=(32, 32)),
                           no_jp2=True))
        i = s.find(b"\xff\x52")          # COD
        s[i + 4 + 8] |= 0x20             # cb style: claim SEGSYM
        s = bytes(s)
        with pytest.raises(Jpeg2kError, match="Segmentation"):
            jpeg2k.decode(s)
        with pytest.raises(Jpeg2kError, match="Segmentation"):
            self._decode_forced_python(monkeypatch, s)


class TestFuzz:
    def test_corrupted_streams_fail_honestly(self):
        """Random byte corruption must yield Jpeg2kError or a valid
        decode — never IndexError/MemoryError/struct.error (a corrupted
        SIZ once attempted a 630 GiB allocation; geometry caps)."""
        rng = np.random.default_rng(1)
        a = ((np.arange(48 * 40) * 37) % 251).astype(
            np.uint8).reshape(48, 40)
        streams = [
            _enc(a, no_jp2=True),
            _enc(a, no_jp2=True, tile_size=(16, 16),
                 quality_mode="rates", quality_layers=[8, 2]),
        ]
        for trial in range(300):
            t = bytearray(streams[trial % 2])
            for _ in range(rng.integers(1, 5)):
                t[rng.integers(0, len(t))] = rng.integers(0, 256)
            try:
                jpeg2k.decode(bytes(t))
            except Jpeg2kError:
                pass


class TestEncoder:
    """`.4.90` write support (reversible 5/3, single tile, LRCP):
    lossless by construction, proven two ways — this module's decoder
    round-trips bit-exactly AND OpenJPEG (an independent decoder)
    reproduces the source from our codestream."""

    @pytest.mark.parametrize("case", [
        "gray8", "gray16", "odd", "flat", "zeros", "tiny", "cb16",
        "levels0", "levels8"])
    def test_dual_decoder_roundtrip(self, case):
        rng = np.random.default_rng(len(case))
        kw = {}
        if case == "gray8":
            img = _gray8(seed=1)
        elif case == "gray16":
            img = rng.integers(0, 4096, (48, 40)).astype(np.uint16)
        elif case == "odd":
            img = rng.integers(0, 255, (33, 47)).astype(np.uint8)
        elif case == "flat":
            img = np.full((64, 64), 200, np.uint8)
        elif case == "zeros":
            img = np.zeros((20, 28), np.uint8)
        elif case == "tiny":
            img = rng.integers(0, 255, (5, 3)).astype(np.uint8)
        elif case == "cb16":
            img = rng.integers(0, 255, (70, 54)).astype(np.uint8)
            kw = dict(cb=4)
        elif case == "levels0":
            img = _gray8(seed=2)
            kw = dict(levels=0)
        else:
            img = _gray8(seed=3)
            kw = dict(levels=8)
        s = jpeg2k.encode(img, **kw)
        dec, p, sg = jpeg2k.decode(s)
        np.testing.assert_array_equal(dec, img)
        assert not sg
        pil = _pil_dec(s)
        np.testing.assert_array_equal(pil.astype(np.int64),
                                      img.astype(np.int64))

    def test_signed_roundtrip(self):
        rng = np.random.default_rng(9)
        img = rng.integers(-2048, 2048, (40, 56)).astype(np.int16)
        s = jpeg2k.encode(img, signed=True)
        dec, p, sg = jpeg2k.decode(s)
        assert sg
        np.testing.assert_array_equal(dec, img)

    def test_mq_coder_fuzz(self):
        """The MQ encoder/decoder pair round-trips random decision
        sequences across all 19 contexts (the round-5 SETBITS flush bug
        hit ~1% of random sequences in their final 1-4 decisions)."""
        from mdx.io.jpeg2k import (
            _fresh_contexts,
            _MQDecoder,
            _MQEncoder,
        )

        rng = np.random.default_rng(0)
        for _ in range(250):
            n = int(rng.integers(1, 400))
            ctxs = rng.integers(0, 19, n)
            bits = (rng.random(n) < rng.random()).astype(int)
            enc = _MQEncoder()
            cx = _fresh_contexts()
            for c, b in zip(ctxs, bits):
                enc.encode(cx[int(c)], int(b))
            data = enc.flush()
            dec = _MQDecoder(data)
            cx2 = _fresh_contexts()
            assert [dec.decode(cx2[int(c)]) for c in ctxs] == \
                list(bits)

    def test_image_fuzz_roundtrip(self):
        rng = np.random.default_rng(5)
        for _ in range(30):
            h = int(rng.integers(1, 80))
            w = int(rng.integers(1, 80))
            depth = rng.choice([8, 16])
            if depth == 8:
                img = rng.integers(0, 256, (h, w)).astype(np.uint8)
            else:
                img = rng.integers(0, 65536, (h, w)).astype(np.uint16)
            lv = int(rng.integers(0, 6))
            s = jpeg2k.encode(img, levels=lv)
            dec, _, _ = jpeg2k.decode(s)
            np.testing.assert_array_equal(dec, img,
                                          err_msg=f"{h}x{w}@{depth}")

    def test_write_dicom_j2k(self, tmp_path):
        rng = np.random.default_rng(12)
        pix = rng.integers(-1000, 3000, (3, 24, 24)).astype(np.int16)
        p = write_dicom(str(tmp_path / "w.dcm"), pix, signed=True,
                        transfer_syntax=TS_J2K_LOSSLESS)
        ds = read_dataset(p)
        assert ds.transfer_syntax == TS_J2K_LOSSLESS
        np.testing.assert_array_equal(decode_pixels(ds), pix)


class TestEncoderNativeParity:
    """The C Tier-1 encoder emits BYTE-IDENTICAL codewords to the
    Python oracle (512² encode 13035 → 306 ms, 43×)."""

    @pytest.fixture(autouse=True)
    def _need_native(self):
        from mdx.io import native
        try:
            native._load()
        except native.NativeUnavailable:
            pytest.skip("native library not built")
        if not hasattr(native, "jpeg2k_t1_encode"):
            pytest.skip("stale native module")

    @pytest.mark.parametrize("case", ["noise8", "noise16", "smooth",
                                      "sparse", "allzero", "thin"])
    def test_block_bytes_identical(self, case):
        from mdx.io import native
        from mdx.io.jpeg2k import _t1_encode_block

        rng = np.random.default_rng(hash(case) % 1000)
        if case == "noise8":
            v = rng.integers(-255, 256, (64, 64))
        elif case == "noise16":
            v = rng.integers(-65535, 65536, (64, 64))
        elif case == "smooth":
            v = (20 * np.sin(np.arange(64 * 64).reshape(64, 64)
                             / 97.0)).astype(int)
        elif case == "sparse":
            v = np.zeros((64, 64), int)
            idx = rng.integers(0, 64, (2, 30))
            v[idx[0], idx[1]] = rng.integers(-1000, 1000, 30)
        elif case == "allzero":
            v = np.zeros((32, 32), int)
        else:
            v = rng.integers(-100, 100, (64, 3))
        v = v.astype(np.int64)
        for btype in (0, 1, 3):
            py = _t1_encode_block(v, btype)
            nat = native.jpeg2k_t1_encode(v, btype)
            assert py == nat, f"{case} btype={btype}"

    def test_full_encode_bytes_identical(self, monkeypatch):
        """Whole-image encode byte-for-byte equal with native forced
        off (the packet/codestream layers are shared Python)."""
        from mdx.io import jpeg2k as J

        img = _gray8(seed=88, shape=(70, 54))
        s_nat = J.encode(img)
        monkeypatch.setattr(
            J, "_t1_enc_block",
            lambda vals, btype: J._t1_encode_block(vals, btype))
        s_py = J.encode(img)
        assert s_nat == s_py


class TestReviewRegressions:
    """Round-5 self-review findings (code-review pass over the round
    diff) — each pinned here."""

    def test_jp2_wrapped_multiframe_fragment_grouping(self, tmp_path):
        """JP2-box-wrapped frames with MORE fragments than frames must
        group on the (full 8-byte) JP2 signature — the first cut of the
        check compared an 8-byte slice to a 6-byte literal and never
        matched."""
        frames = [_gray8(seed=70 + i, shape=(24, 32)) for i in range(2)]
        streams = [_enc(f) for f in frames]        # JP2 container form
        # split each stream into two fragments → 4 fragments, 2 frames
        frags = []
        for s in streams:
            frags += [s[:37], s[37:]]
        from mdx.io.dicom import _group_frame_streams

        got = _group_frame_streams(frags, 2, "JPEG 2000", kind="jpeg2k")
        assert got == streams

    def test_jls_fragment_starting_ff4f_not_split(self):
        """FF 4F can legally begin a JPEG-LS continuation fragment; the
        JPEG-family grouping must not treat it as a frame start."""
        from mdx.io.dicom import _group_frame_streams

        f1 = b"\xff\xd8" + b"\x01" * 10
        f2 = b"\xff\x4f" + b"\x02" * 10     # continuation, not a frame
        f3 = b"\xff\xd8" + b"\x03" * 10
        got = _group_frame_streams([f1, f2, f3], 2, "JPEG-LS",
                                   kind="jpeg")
        assert got == [f1 + f2, f3]

    def test_signed_8bit_write_roundtrip(self, tmp_path):
        """Signed 8-bit data must encode at depth 8 (a 16-bit codestream
        in a BitsAllocated=8 container is refused by the reader)."""
        rng = np.random.default_rng(71)
        pix = rng.integers(-128, 128, (20, 24)).astype(np.int8)
        p = write_dicom(str(tmp_path / "s8.dcm"), pix, signed=True,
                        transfer_syntax=TS_J2K_LOSSLESS)
        ds = read_dataset(p)
        np.testing.assert_array_equal(decode_pixels(ds), pix)

    def test_truncated_coc_qcc_raise_jpeg2k_error(self):
        s = bytearray(_enc(_gray8(seed=72), no_jp2=True))
        i = s.find(b"\xff\x5c")
        for marker in (0xFF53, 0xFF5D):     # COC, QCC
            seg = struct.pack(">HH", marker, 5) + b"\x00\x00\x00"
            s2 = bytes(s[:i]) + seg + bytes(s[i:])
            with pytest.raises(Jpeg2kError,
                               match="Truncated|too short"):
                jpeg2k.decode(s2)

    def test_ybr_rct_source_transcodes(self, tmp_path):
        """Color J2K sources (YBR_RCT photometric) decode to RGB, so the
        transcoder must rewrite the photometric instead of refusing."""
        from mdx.io.transcode import transcode

        g = _gray8(seed=73, shape=(16, 16))
        rgb = np.stack([g, np.roll(g, 2, 1), 255 - g], -1)
        s = _enc(rgb, "RGB", no_jp2=True)
        p = _encapsulate_j2k(tmp_path, "c.dcm", [s], 16, 16,
                             TS_J2K_LOSSLESS, samples=3,
                             photometric="YBR_RCT")
        want = decode_pixels(read_dataset(p))
        dp = str(tmp_path / "o.dcm")
        transcode(p, dp, "explicit-le")
        ds = read_dataset(dp)
        assert ds.get("PhotometricInterpretation") == "RGB"
        np.testing.assert_array_equal(decode_pixels(ds), want)

    def test_autotune_honors_tv_mode(self, monkeypatch):
        """MDX_TV_MODE must reach every PlanStatic construction site —
        the autotune paths once silently ignored it (the sweep is
        exactly where TV dominates)."""
        from mdx.ops.tv import resolve_tv_mode

        monkeypatch.setenv("MDX_TV_MODE", "fast")
        assert resolve_tv_mode() == "fast"
        import inspect

        from mdx.core import tuning
        from mdx.parallel import plan_sp
        from mdx.pipeline import spatial_runner

        for mod in (tuning, plan_sp, spatial_runner):
            src = inspect.getsource(mod)
            assert "resolve_tv_mode" in src, mod.__name__
