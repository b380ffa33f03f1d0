"""DICOM transfer-syntax transcoding (mdx/io/transcode.py).

Contract: pixels survive EXACTLY across every lossless source→target
pair, every other dataset element survives byte-for-byte (private tags
included), implicit-VR sources convert conformantly, lossy sources
decode into lossless targets, and lossy/unfaithful targets are refused.
"""

from __future__ import annotations

import io
import os
import struct

import numpy as np
import pytest

from mdx.io.dicom import (
    TS_DEFLATED_LE,
    TS_J2K_LOSSLESS,
    TS_EXPLICIT_LE,
    TS_JPEG_LL_SV1,
    TS_JPEG_LS,
    TS_JPEG_LS_NEAR,
    TS_RLE,
    DicomError,
    decode_pixels,
    read_dataset,
)
from mdx.io.dicom_write import write_dicom
from mdx.io.transcode import TARGET_ALIASES, transcode

_SRC_TS = {"explicit-le": TS_EXPLICIT_LE, "rle": TS_RLE,
           "jpeg-ll": TS_JPEG_LL_SV1, "jpeg-ls": TS_JPEG_LS,
           "deflated": TS_DEFLATED_LE, "j2k": TS_J2K_LOSSLESS}


@pytest.fixture()
def img16():
    rng = np.random.default_rng(0)
    return np.clip(2048 + 500 * rng.normal(0, 1, (48, 64)),
                   0, 4095).astype(np.uint16)


class TestMatrix:
    @pytest.mark.parametrize("src", sorted(_SRC_TS))
    @pytest.mark.parametrize("tgt", sorted(TARGET_ALIASES))
    def test_pixel_exact(self, tmp_path, img16, src, tgt):
        sp = write_dicom(str(tmp_path / "s.dcm"), img16,
                         transfer_syntax=_SRC_TS[src],
                         rescale_slope=1.0, rescale_intercept=-1024.0)
        dp = str(tmp_path / "t.dcm")
        transcode(sp, dp, tgt)
        ds = read_dataset(dp)
        assert ds.transfer_syntax == TARGET_ALIASES[tgt]
        np.testing.assert_array_equal(decode_pixels(ds), img16)
        # non-pixel attributes survive
        assert ds.get("RescaleIntercept") == -1024.0
        assert ds.get("Modality") == "CT"

    def test_multiframe_and_signed(self, tmp_path):
        rng = np.random.default_rng(1)
        pix = rng.integers(-1000, 3000, (3, 24, 24)).astype(np.int16)
        sp = write_dicom(str(tmp_path / "s.dcm"), pix, signed=True)
        dp = str(tmp_path / "t.dcm")
        transcode(sp, dp, "jpeg-ls")
        np.testing.assert_array_equal(
            decode_pixels(read_dataset(dp)), pix)


class TestFidelity:
    def test_private_tag_survives_byte_for_byte(self, tmp_path, img16):
        sp = write_dicom(str(tmp_path / "s.dcm"), img16)
        raw = open(sp, "rb").read()
        i = raw.rfind(struct.pack("<HH", 0x7FE0, 0x0010))
        priv = (struct.pack("<HH", 0x0009, 0x0010) + b"LO"
                + struct.pack("<H", 6) + b"mdxpr ")
        pp = str(tmp_path / "p.dcm")
        open(pp, "wb").write(raw[:i] + priv + raw[i:])
        dp = str(tmp_path / "t.dcm")
        transcode(pp, dp, "jpeg-ls")
        assert priv in open(dp, "rb").read()
        np.testing.assert_array_equal(
            decode_pixels(read_dataset(dp)), img16)

    def test_sequence_survives(self, tmp_path, img16):
        """An undefined-length SQ (with one item) is copied verbatim."""
        sp = write_dicom(str(tmp_path / "s.dcm"), img16)
        raw = open(sp, "rb").read()
        i = raw.rfind(struct.pack("<HH", 0x7FE0, 0x0010))
        inner = (struct.pack("<HH", 0x0008, 0x0060) + b"CS"
                 + struct.pack("<H", 2) + b"MR")
        item = struct.pack("<HHI", 0xFFFE, 0xE000, len(inner)) + inner
        seq = (struct.pack("<HH", 0x0008, 0x1140) + b"SQ\x00\x00"
               + struct.pack("<I", 0xFFFFFFFF) + item
               + struct.pack("<HHI", 0xFFFE, 0xE0DD, 0))
        pp = str(tmp_path / "p.dcm")
        open(pp, "wb").write(raw[:i] + seq + raw[i:])
        dp = str(tmp_path / "t.dcm")
        transcode(pp, dp, "rle")
        assert seq in open(dp, "rb").read()
        np.testing.assert_array_equal(
            decode_pixels(read_dataset(dp)), img16)

    def test_implicit_source_converts(self, tmp_path):
        """A headerless Implicit-VR dataset transcodes; known tags get
        dictionary VRs, and pixels survive."""
        rng = np.random.default_rng(2)
        img = rng.integers(0, 4096, (16, 20)).astype(np.uint16)

        def imp(group, elem, value):
            return struct.pack("<HHI", group, elem, len(value)) + value

        body = b"".join([
            imp(0x0008, 0x0060, b"CT"),
            imp(0x0028, 0x0002, struct.pack("<H", 1)),
            imp(0x0028, 0x0010, struct.pack("<H", 16)),
            imp(0x0028, 0x0011, struct.pack("<H", 20)),
            imp(0x0028, 0x0100, struct.pack("<H", 16)),
            imp(0x0028, 0x0101, struct.pack("<H", 16)),
            imp(0x0028, 0x0102, struct.pack("<H", 15)),
            imp(0x0028, 0x0103, struct.pack("<H", 0)),
            imp(0x0009, 0x0011, b"private-imp "),   # unknown → UN
            imp(0x7FE0, 0x0010, img.tobytes()),
        ])
        pp = str(tmp_path / "imp.dcm")
        open(pp, "wb").write(body)
        dp = str(tmp_path / "t.dcm")
        transcode(pp, dp, "jpeg-ll")
        ds = read_dataset(dp)
        assert ds.transfer_syntax == TS_JPEG_LL_SV1
        np.testing.assert_array_equal(decode_pixels(ds), img)
        out = open(dp, "rb").read()
        # known tag got its dictionary VR; unknown became UN
        assert struct.pack("<HH", 0x0008, 0x0060) + b"CS" in out
        assert struct.pack("<HH", 0x0009, 0x0011) + b"UN" in out
        assert b"private-imp " in out

    def test_lossy_source_to_lossless_target(self, tmp_path):
        PIL = pytest.importorskip("PIL.Image")
        from mdx.io.dicom import TS_JPEG_BASELINE

        rng = np.random.default_rng(3)
        g = rng.integers(0, 256, (32, 32)).astype(np.uint8)
        b = io.BytesIO()
        PIL.fromarray(g, "L").save(b, "JPEG", quality=95)
        frag = b.getvalue()
        if len(frag) % 2:
            frag += b"\x00"
        # build a real .4.50 part-10 file: write explicit, then rebuild
        # with the encapsulated pixel element and patched meta TS
        sp = write_dicom(str(tmp_path / "s.dcm"), g)
        raw = open(sp, "rb").read()
        # rewrite the meta TS element (lengths differ, so fix the
        # element length AND the group-length value)
        ts_el = raw.find(struct.pack("<HH", 0x0002, 0x0010) + b"UI")
        (old_len,) = struct.unpack_from("<H", raw, ts_el + 6)
        new_val = TS_JPEG_BASELINE.encode()
        if len(new_val) % 2:
            new_val += b"\x00"
        delta = len(new_val) - old_len
        gl_el = raw.find(struct.pack("<HH", 0x0002, 0x0000) + b"UL")
        (group_len,) = struct.unpack_from("<I", raw, gl_el + 8)
        raw = (raw[:gl_el + 8]
               + struct.pack("<I", group_len + delta)
               + raw[gl_el + 12:ts_el + 6]
               + struct.pack("<H", len(new_val)) + new_val
               + raw[ts_el + 8 + old_len:])
        i = raw.rfind(struct.pack("<HH", 0x7FE0, 0x0010))
        encap = (struct.pack("<HH2sHI", 0x7FE0, 0x0010, b"OB", 0,
                             0xFFFFFFFF)
                 + struct.pack("<HHI", 0xFFFE, 0xE000, 0)
                 + struct.pack("<HHI", 0xFFFE, 0xE000, len(frag)) + frag
                 + struct.pack("<HHI", 0xFFFE, 0xE0DD, 0))
        pp = str(tmp_path / "lossy.dcm")
        open(pp, "wb").write(raw[:i] + encap)
        want = decode_pixels(read_dataset(pp))  # decoded (lossy) pixels
        dp = str(tmp_path / "t.dcm")
        transcode(pp, dp, "jpeg-ls")
        np.testing.assert_array_equal(
            decode_pixels(read_dataset(dp)), want)


def _part10(body: bytes, ts: str) -> bytes:
    """Minimal part-10 wrapper: preamble + file meta naming ``ts``."""
    from mdx.io.transcode import _explicit_el

    def m(elem, vr, val):
        return _explicit_el((0x0002, elem), vr, val)

    def txt(s):
        b = s.encode()
        return b + (b"\x00" if len(b) % 2 else b"")

    els = b"".join([
        m(0x0001, b"OB", b"\x00\x01"),
        m(0x0002, b"UI", txt("1.2.840.10008.5.1.4.1.1.6.1")),
        m(0x0003, b"UI", txt("1.2.3.4.5")),
        m(0x0010, b"UI", txt(ts)),
        m(0x0012, b"UI", txt("1.2.826.0.1.3680043.9.9999")),
    ])
    meta = m(0x0000, b"UL", struct.pack("<I", len(els))) + els
    return b"\x00" * 128 + b"DICM" + meta + body


class TestColor:
    """Color sources re-written as interleaved 4:4:4 must come out
    conformant: subsampled photometrics rewritten, PlanarConfiguration
    forced/inserted as 0 (it is Type 1C when SamplesPerPixel>1)."""

    def _ybr422_source(self, tmp_path, with_planar: bool) -> str:
        PIL = pytest.importorskip("PIL.Image")
        from mdx.io.dicom import TS_JPEG_BASELINE
        from mdx.io.transcode import _explicit_el

        rng = np.random.default_rng(7)
        rgb = rng.integers(0, 256, (32, 32, 3)).astype(np.uint8)
        b = io.BytesIO()
        PIL.fromarray(rgb, "RGB").save(b, "JPEG", quality=92,
                                       subsampling=1)  # 4:2:2
        frag = b.getvalue()
        if len(frag) % 2:
            frag += b"\x00"
        el = _explicit_el
        body = b"".join([
            el((0x0008, 0x0060), b"CS", b"US"),
            el((0x0028, 0x0002), b"US", struct.pack("<H", 3)),
            el((0x0028, 0x0004), b"CS", b"YBR_FULL_422"),
        ] + ([el((0x0028, 0x0006), b"US", struct.pack("<H", 1))]
             if with_planar else []) + [
            el((0x0028, 0x0010), b"US", struct.pack("<H", 32)),
            el((0x0028, 0x0011), b"US", struct.pack("<H", 32)),
            el((0x0028, 0x0100), b"US", struct.pack("<H", 8)),
            el((0x0028, 0x0101), b"US", struct.pack("<H", 8)),
            el((0x0028, 0x0103), b"US", struct.pack("<H", 0)),
        ]) + (struct.pack("<HH2sHI", 0x7FE0, 0x0010, b"OB", 0,
                          0xFFFFFFFF)
              + struct.pack("<HHI", 0xFFFE, 0xE000, 0)
              + struct.pack("<HHI", 0xFFFE, 0xE000, len(frag)) + frag
              + struct.pack("<HHI", 0xFFFE, 0xE0DD, 0))
        sp = str(tmp_path / "ybr.dcm")
        open(sp, "wb").write(_part10(body, TS_JPEG_BASELINE))
        return sp

    @pytest.mark.parametrize("with_planar", [True, False])
    def test_ybr422_to_explicit_conformant(self, tmp_path, with_planar):
        sp = self._ybr422_source(tmp_path, with_planar)
        want = decode_pixels(read_dataset(sp))  # upsampled 4:4:4 YBR
        assert want.shape == (32, 32, 3)
        dp = str(tmp_path / "t.dcm")
        transcode(sp, dp, "explicit-le")
        ds = read_dataset(dp)
        assert ds.transfer_syntax == TS_EXPLICIT_LE
        # photometric no longer promises 2-samples-per-2-pixels packing
        assert ds.get("PhotometricInterpretation") == "YBR_FULL"
        # planar rewritten (or inserted) as 0 for the interleaved pixels
        assert ds.get("PlanarConfiguration") == 0
        np.testing.assert_array_equal(decode_pixels(ds), want)

    def test_unmappable_color_photometric_refused(self, tmp_path):
        sp = self._ybr422_source(tmp_path, with_planar=False)
        raw = open(sp, "rb").read()
        raw = raw.replace(b"YBR_FULL_422", b"YBR_PARTIAL_")
        pp = str(tmp_path / "p.dcm")
        open(pp, "wb").write(raw)
        with pytest.raises(DicomError, match="conformantly"):
            transcode(pp, str(tmp_path / "t.dcm"), "explicit-le")

    def test_planar_uncompressed_decodes_interleaved(self, tmp_path):
        """PlanarConfiguration=1 uncompressed color stores RR..GG..BB
        planes; decode_pixels must de-plane, and the transcode output
        must carry interleaved pixels with planar=0."""
        from mdx.io.transcode import _explicit_el

        rng = np.random.default_rng(8)
        rgb = rng.integers(0, 256, (6, 5, 3)).astype(np.uint8)
        planes = np.ascontiguousarray(rgb.transpose(2, 0, 1))
        el = _explicit_el
        body = b"".join([
            el((0x0028, 0x0002), b"US", struct.pack("<H", 3)),
            el((0x0028, 0x0004), b"CS", b"RGB "),
            el((0x0028, 0x0006), b"US", struct.pack("<H", 1)),
            el((0x0028, 0x0010), b"US", struct.pack("<H", 6)),
            el((0x0028, 0x0011), b"US", struct.pack("<H", 5)),
            el((0x0028, 0x0100), b"US", struct.pack("<H", 8)),
            el((0x0028, 0x0103), b"US", struct.pack("<H", 0)),
            el((0x7FE0, 0x0010), b"OB", planes.tobytes()),
        ])
        sp = str(tmp_path / "planar.dcm")
        open(sp, "wb").write(_part10(body, TS_EXPLICIT_LE))
        np.testing.assert_array_equal(
            decode_pixels(read_dataset(sp)), rgb)
        dp = str(tmp_path / "t.dcm")
        transcode(sp, dp, "explicit-le")
        ds = read_dataset(dp)
        assert ds.get("PlanarConfiguration") == 0
        np.testing.assert_array_equal(decode_pixels(ds), rgb)


class TestRefusals:
    def test_lossy_target_refused(self, tmp_path, img16):
        sp = write_dicom(str(tmp_path / "s.dcm"), img16)
        with pytest.raises(DicomError, match="lossy"):
            transcode(sp, str(tmp_path / "t.dcm"), TS_JPEG_LS_NEAR)

    def test_unknown_target_refused(self, tmp_path, img16):
        sp = write_dicom(str(tmp_path / "s.dcm"), img16)
        with pytest.raises(DicomError, match="Unknown"):
            transcode(sp, str(tmp_path / "t.dcm"), "1.2.3.4")

    def test_no_pixels_refused(self, tmp_path):
        body = struct.pack("<HHI", 0x0008, 0x0060, 2) + b"CT"
        pp = str(tmp_path / "np.dcm")
        open(pp, "wb").write(body)
        with pytest.raises(DicomError, match="pixel"):
            transcode(pp, str(tmp_path / "t.dcm"), "rle")


class TestCli:
    def test_module_cli(self, tmp_path, img16):
        import subprocess
        import sys

        sp = write_dicom(str(tmp_path / "s.dcm"), img16,
                         transfer_syntax=TS_RLE)
        dp = str(tmp_path / "t.dcm")
        out = subprocess.run(
            [sys.executable, "-m", "mdx.io.transcode", sp, dp,
             "--to", "jpeg-ls"],
            capture_output=True, text=True, timeout=300, check=True,
            cwd=os.path.join(os.path.dirname(__file__), ".."))
        assert "jpeg-ls" in out.stdout or TS_JPEG_LS in out.stdout
        np.testing.assert_array_equal(
            decode_pixels(read_dataset(dp)), img16)


class TestPydicomCrossCheck:
    def test_pydicom_reads_transcoded(self, tmp_path, img16):
        pydicom = pytest.importorskip("pydicom")
        sp = write_dicom(str(tmp_path / "s.dcm"), img16)
        dp = str(tmp_path / "t.dcm")
        transcode(sp, dp, "rle")
        ds = pydicom.dcmread(dp)
        np.testing.assert_array_equal(ds.pixel_array, img16)
