"""ctypes bindings for the native ingest kernels (native/mdxio.cpp).

Builds ``libmdxio.so`` with ``make`` on first use (g++ is part of the
deployment toolchain) and falls back silently to the NumPy path when the
toolchain or the build is unavailable — callers guard with try/except
(mdx/io/dicom.py:_rescale_and_orient).  Set ``MDX_NO_NATIVE=1`` to disable.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_NATIVE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libmdxio.so")

_lock = threading.Lock()
_lib: ctypes.CDLL | None = None
_build_failed = False

_SUFFIX = {
    np.dtype(np.uint8): "u8", np.dtype(np.int8): "s8",
    np.dtype(np.uint16): "u16", np.dtype(np.int16): "s16",
    np.dtype(np.uint32): "u32", np.dtype(np.int32): "s32",
}


class NativeUnavailable(RuntimeError):
    pass


def _load() -> ctypes.CDLL:
    global _lib, _build_failed
    if _lib is not None:
        return _lib
    if _build_failed or os.environ.get("MDX_NO_NATIVE"):
        raise NativeUnavailable("native kernels disabled or build failed")
    with _lock:
        if _lib is not None:
            return _lib
        # Rebuild when the library is missing OR older than its source: a
        # stale pre-existing build's missing symbols would otherwise
        # surface as AttributeError at binding time, escaping the
        # NativeUnavailable fallback in every caller.  The mtime check
        # runs HERE (not by always spawning make) so the common path does
        # no subprocess work, and the Makefile's recipe builds to a temp
        # file + atomic rename — a rebuild racing a live process that has
        # the .so mapped must never truncate it in place (g++ -o does;
        # observed SIGSEGV with ip inside the half-rewritten mapping).
        try:
            src_mtime = os.path.getmtime(
                os.path.join(_NATIVE_DIR, "mdxio.cpp"))
            need_build = os.path.getmtime(_LIB_PATH) < src_mtime
        except OSError:
            need_build = True  # library (or source) missing
        if need_build:
            try:
                subprocess.run(
                    ["make", "-C", _NATIVE_DIR], check=True,
                    capture_output=True, timeout=120)
            except Exception as exc:
                if not os.path.exists(_LIB_PATH):
                    _build_failed = True
                    raise NativeUnavailable(f"build failed: {exc}") from exc
                # toolchain missing but a library exists — try it; the
                # binding below still guards against missing symbols
        try:
            lib = ctypes.CDLL(_LIB_PATH)
        except OSError as exc:
            _build_failed = True
            raise NativeUnavailable(f"load failed: {exc}") from exc

        f32p = ctypes.POINTER(ctypes.c_float)
        try:
            for sfx in _SUFFIX.values():
                fn = getattr(lib, f"mdxio_rescale_f32_{sfx}")
                fn.argtypes = [ctypes.c_void_p, ctypes.c_int64,
                               ctypes.c_float, ctypes.c_float, f32p]
                fn.restype = None
                fn2 = getattr(lib, f"mdxio_rescale_norm_{sfx}")
                fn2.argtypes = [ctypes.c_void_p, ctypes.c_int64,
                                ctypes.c_float, ctypes.c_float,
                                ctypes.c_int, f32p]
                fn2.restype = None
            lib.mdxio_minmax_f32.argtypes = [f32p, ctypes.c_int64, f32p,
                                             f32p]
            lib.mdxio_minmax_f32.restype = None
            lib.mdxio_normalize_f32.argtypes = [f32p, ctypes.c_int64,
                                                ctypes.c_float,
                                                ctypes.c_float]
            lib.mdxio_normalize_f32.restype = None
            lib.mdxio_packbits_decode.argtypes = [
                ctypes.c_void_p, ctypes.c_int64, ctypes.c_void_p,
                ctypes.c_int64]
            lib.mdxio_packbits_decode.restype = ctypes.c_int64
            lib.mdxio_packbits_encode.argtypes = [
                ctypes.c_void_p, ctypes.c_int64, ctypes.c_void_p]
            lib.mdxio_packbits_encode.restype = ctypes.c_int64
            lib.mdxio_jpegll_diffs.argtypes = [
                ctypes.c_void_p, ctypes.c_int64, ctypes.c_void_p,
                ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64,
                ctypes.c_void_p]
            lib.mdxio_jpegll_diffs.restype = ctypes.c_int64
            lib.mdxio_jpegll_pack.argtypes = [
                ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64,
                ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p]
            lib.mdxio_jpegll_pack.restype = ctypes.c_int64
            lib.mdxio_jpegls_decode.argtypes = [
                ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64,
                ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
                ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
                ctypes.c_int32, ctypes.c_int32, ctypes.c_int64,
                ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
                ctypes.c_void_p, ctypes.POINTER(ctypes.c_int64)]
            lib.mdxio_jpegls_decode.restype = ctypes.c_int64
            lib.mdxio_jpegls_encode.argtypes = [
                ctypes.c_void_p, ctypes.c_int32, ctypes.c_int32,
                ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
                ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
                ctypes.c_int64, ctypes.c_int32, ctypes.c_int32,
                ctypes.c_int32, ctypes.c_void_p, ctypes.c_int64]
            lib.mdxio_jpegls_encode.restype = ctypes.c_int64
            lib.mdxio_jpegdct_segment.argtypes = [
                ctypes.c_void_p, ctypes.c_int64, ctypes.c_int32,
                ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
                ctypes.POINTER(ctypes.c_void_p),
                ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
                ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64,
                ctypes.c_int32, ctypes.c_int32]
            lib.mdxio_jpegdct_segment.restype = ctypes.c_int64
            lib.mdxio_jpegdct_prog_segment.argtypes = [
                ctypes.c_void_p, ctypes.c_int64, ctypes.c_int32,
                ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
                ctypes.c_void_p,  # per-comp array strides
                ctypes.POINTER(ctypes.c_void_p),
                ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
                ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64,
                ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
                ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
                ctypes.c_int32]
            lib.mdxio_jpegdct_prog_segment.restype = ctypes.c_int64
            lib.mdxio_jpeg2k_t1.argtypes = [
                ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
                ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int32,
                ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
                ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
                ctypes.c_void_p]
            lib.mdxio_jpeg2k_t1.restype = ctypes.c_int64
            lib.mdxio_jpeg2k_t1_enc.argtypes = [
                ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int32,
                ctypes.c_int32, ctypes.c_int32, ctypes.c_void_p,
                ctypes.c_int64, ctypes.POINTER(ctypes.c_int32),
                ctypes.POINTER(ctypes.c_int32)]
            lib.mdxio_jpeg2k_t1_enc.restype = ctypes.c_int64
        except AttributeError as exc:
            # stale library from an older source revision (and no
            # toolchain to rebuild it) — degrade to the Python paths
            # rather than leaking AttributeError past the
            # NativeUnavailable contract every caller relies on
            _build_failed = True
            raise NativeUnavailable(f"stale library: {exc}") from exc
        _lib = lib
        return lib


def available() -> bool:
    try:
        _load()
        return True
    except NativeUnavailable:
        return False


def _f32p(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def rescale_f32(src: np.ndarray, slope: float, intercept: float) -> np.ndarray:
    """src (int dtype, any shape) → float32 * slope + intercept."""
    lib = _load()
    dt = src.dtype.newbyteorder("=")
    sfx = _SUFFIX.get(np.dtype(dt))
    if sfx is None:
        raise NativeUnavailable(f"unsupported dtype {src.dtype}")
    src = np.ascontiguousarray(src, dtype=dt)
    out = np.empty(src.shape, np.float32)
    getattr(lib, f"mdxio_rescale_f32_{sfx}")(
        src.ctypes.data_as(ctypes.c_void_p), src.size,
        ctypes.c_float(slope), ctypes.c_float(intercept), _f32p(out))
    return out


def rescale_normalize(src: np.ndarray, slope: float, intercept: float,
                      invert: bool) -> np.ndarray:
    """Fused rescale + MONOCHROME1 inversion + min-max normalise → [0,1]."""
    lib = _load()
    dt = src.dtype.newbyteorder("=")
    sfx = _SUFFIX.get(np.dtype(dt))
    if sfx is None:
        raise NativeUnavailable(f"unsupported dtype {src.dtype}")
    src = np.ascontiguousarray(src, dtype=dt)
    out = np.empty(src.shape, np.float32)
    getattr(lib, f"mdxio_rescale_norm_{sfx}")(
        src.ctypes.data_as(ctypes.c_void_p), src.size,
        ctypes.c_float(slope), ctypes.c_float(intercept),
        1 if invert else 0, _f32p(out))
    return out


def normalize01(img: np.ndarray) -> np.ndarray:
    """Min-max normalise a float32 array in one native pass."""
    lib = _load()
    out = np.ascontiguousarray(img, np.float32).copy()
    lo = ctypes.c_float()
    hi = ctypes.c_float()
    lib.mdxio_minmax_f32(_f32p(out), out.size, ctypes.byref(lo),
                         ctypes.byref(hi))
    lib.mdxio_normalize_f32(_f32p(out), out.size, lo, hi)
    return out


def packbits_decode(data: bytes, expected: int) -> tuple[int, bytes]:
    """Native PackBits decode.  Returns ``(rc, out)``: rc == expected on
    success, rc < expected for a short stream, -1/-2 for a truncated
    literal/replicate run — the caller (mdx/io/rle.py) maps rc to the
    same RleError taxonomy as the Python loop."""
    lib = _load()
    src = np.frombuffer(data, np.uint8)
    out = np.empty(max(expected, 1), np.uint8)
    rc = lib.mdxio_packbits_decode(
        src.ctypes.data_as(ctypes.c_void_p), src.size,
        out.ctypes.data_as(ctypes.c_void_p), expected)
    return int(rc), out[:expected].tobytes()


def jpegll_diffs(seg: bytes, counts: np.ndarray, values: np.ndarray,
                 count: int) -> tuple[int, np.ndarray]:
    """Native JPEG Lossless entropy decode (destuffed scan bytes →
    int32 diffs).  Returns ``(rc, diffs)``: rc == count on success,
    -1 truncated, -2 invalid code — the caller (mdx/io/jpegll.py) maps
    rc to the same JpegLLError taxonomy as the Python loop."""
    lib = _load()
    src = np.frombuffer(seg, np.uint8)
    c = np.ascontiguousarray(counts, dtype=np.uint8)
    v = np.ascontiguousarray(values, dtype=np.uint8)
    out = np.empty(max(count, 1), np.int32)
    rc = lib.mdxio_jpegll_diffs(
        src.ctypes.data_as(ctypes.c_void_p), src.size,
        c.ctypes.data_as(ctypes.c_void_p),
        v.ctypes.data_as(ctypes.c_void_p), v.size,
        count, out.ctypes.data_as(ctypes.c_void_p))
    return int(rc), out[:count]


def jpegll_pack(ssss: np.ndarray, evals: np.ndarray, code_of: np.ndarray,
                len_of: np.ndarray) -> bytes:
    """Native JPEG Lossless bit packer — bit-identical to the NumPy
    packer in mdx/io/jpegll.py (codes MSB-first, 1-padded to a byte,
    0xFF stuffed)."""
    lib = _load()
    s = np.ascontiguousarray(ssss.ravel(), dtype=np.uint8)
    v = np.ascontiguousarray(evals.ravel(), dtype=np.int64)
    c = np.ascontiguousarray(code_of, dtype=np.int64)
    ln = np.ascontiguousarray(len_of, dtype=np.int64)
    out = np.empty(s.size * 8 + 2, np.uint8)
    n = lib.mdxio_jpegll_pack(
        s.ctypes.data_as(ctypes.c_void_p),
        v.ctypes.data_as(ctypes.c_void_p), s.size,
        c.ctypes.data_as(ctypes.c_void_p),
        ln.ctypes.data_as(ctypes.c_void_p),
        out.ctypes.data_as(ctypes.c_void_p))
    return out[:n].tobytes()


def packbits_encode(data: bytes) -> bytes:
    """Native PackBits encode — bit-identical to the Python encoder."""
    lib = _load()
    src = np.frombuffer(data, np.uint8)
    out = np.empty(src.size + src.size // 128 + 2, np.uint8)
    rc = lib.mdxio_packbits_encode(
        src.ctypes.data_as(ctypes.c_void_p), src.size,
        out.ctypes.data_as(ctypes.c_void_p))
    return out[:int(rc)].tobytes()


_JPEGLS_ERRORS = {
    -1: "Truncated JPEG-LS entropy segment.",
    -2: "Corrupt Golomb code (unary overflow).",
    -3: "Run length exceeds the line.",
    -4: "Entropy segment ended at a marker mid-symbol (truncated scan).",
    -5: "JPEG-LS encode output overflow.",
}


def _jpegls_raise(rc: int):
    from mdx.io.jpegls import JpegLSError

    raise JpegLSError(_JPEGLS_ERRORS.get(rc, f"native error {rc}"))


def jpegls_decode(buf: bytes, pos: int, width: int, height: int,
                  params) -> tuple[np.ndarray, int]:
    """Native JPEG-LS scan decode — bit-identical to the Python coder in
    mdx/io/jpegls.py (same clause-A control flow, same error taxonomy).
    Returns ``(plane int64 [H, W], end_offset)``."""
    lib = _load()
    src = np.frombuffer(buf, np.uint8)
    out = np.empty((height, width), np.int32)
    end = ctypes.c_int64(0)
    rc = lib.mdxio_jpegls_decode(
        src.ctypes.data_as(ctypes.c_void_p), src.size, pos,
        width, height, params.maxval, params.near,
        params.t1, params.t2, params.t3, params.reset,
        params.range, params.limit, params.qbpp, params.a_init,
        out.ctypes.data_as(ctypes.c_void_p), ctypes.byref(end))
    if rc != 0:
        _jpegls_raise(int(rc))
    return out.astype(np.int64), int(end.value)


def jpegls_encode(plane: np.ndarray, params) -> bytes:
    """Native JPEG-LS scan encode — bit-identical to the Python coder."""
    lib = _load()
    img = np.ascontiguousarray(plane, dtype=np.int32)
    height, width = img.shape
    # worst case ≈ LIMIT bits/sample (≤ 64) + stuffing; 10 B/sample is safe
    cap = img.size * 10 + 64
    out = np.empty(cap, np.uint8)
    rc = lib.mdxio_jpegls_encode(
        img.ctypes.data_as(ctypes.c_void_p), width, height,
        params.maxval, params.near, params.t1, params.t2, params.t3,
        params.reset, params.range, params.limit, params.qbpp,
        params.a_init, out.ctypes.data_as(ctypes.c_void_p), cap)
    if rc < 0:
        _jpegls_raise(int(rc))
    return out[:int(rc)].tobytes()


_JPEGDCT_ERRORS = {
    -1: "Truncated JPEG entropy segment.",
    -2: "Invalid Huffman code in scan data.",
    -3: "AC run overflows the block.",
    -4: "Invalid DC category.",
    -5: "Invalid progressive refinement symbol.",
}


def _jpegdct_marshal(seg, scan_comps, dc_tabs, ac_tabs, grids, coeffs):
    """Common ctypes marshaling for both DCT segment decoders: flattened
    per-component Huffman tables + sampling/grid arrays + output
    pointers.  Returns positional args through `mcus_x`-exclusive."""
    ncomp = len(scan_comps)
    hs = np.array([c.h for c in scan_comps], np.int32)
    vs = np.array([c.v for c in scan_comps], np.int32)
    bxs = np.array([grids[c.cid][1] for c in scan_comps], np.int32)
    dc_counts = np.zeros((ncomp, 16), np.uint8)
    dc_values = np.zeros((ncomp, 256), np.uint8)
    ac_counts = np.zeros((ncomp, 16), np.uint8)
    ac_values = np.zeros((ncomp, 256), np.uint8)
    outs = (ctypes.c_void_p * ncomp)()
    for i, c in enumerate(scan_comps):
        d = dc_tabs.get(c.td)
        a = ac_tabs.get(c.ta)
        for tab, counts, values in ((d, dc_counts, dc_values),
                                    (a, ac_counts, ac_values)):
            if tab is None:
                continue  # scan mode that never touches this table
            counts[i, :] = [
                tab.maxcode[L] - tab.mincode[L] + 1
                if tab.maxcode[L] >= 0 else 0 for L in range(1, 17)]
            values[i, :len(tab.values)] = np.frombuffer(
                bytes(tab.values), np.uint8)
        arr = coeffs[c.cid]
        assert arr.dtype == np.int32 and arr.flags.c_contiguous
        outs[i] = arr.ctypes.data
    src = np.frombuffer(seg, np.uint8)
    # keep every array alive through the call via the returned tuple
    return (src, ncomp, hs, vs, bxs, outs,
            dc_counts, dc_values, ac_counts, ac_values)


def jpegdct_segment(seg: bytes, scan_comps, dc_tabs, ac_tabs, grids,
                    coeffs, mcu0: int, cnt: int, interleaved: bool,
                    mcus_x: int) -> None:
    """Native JPEG (DCT) restart-segment entropy decode — bit-identical
    coefficients and error taxonomy to _decode_segment_py
    (mdx/io/jpegdct.py)."""
    from mdx.io.jpegdct import JpegDctError

    lib = _load()
    (src, ncomp, hs, vs, bxs, outs, dcc, dcv, acc, acv) = \
        _jpegdct_marshal(seg, scan_comps, dc_tabs, ac_tabs, grids, coeffs)
    rc = lib.mdxio_jpegdct_segment(
        src.ctypes.data_as(ctypes.c_void_p), src.size, ncomp,
        hs.ctypes.data_as(ctypes.c_void_p),
        vs.ctypes.data_as(ctypes.c_void_p),
        bxs.ctypes.data_as(ctypes.c_void_p), outs,
        dcc.ctypes.data_as(ctypes.c_void_p),
        dcv.ctypes.data_as(ctypes.c_void_p),
        acc.ctypes.data_as(ctypes.c_void_p),
        acv.ctypes.data_as(ctypes.c_void_p),
        mcu0, cnt, int(interleaved), mcus_x)
    if rc != 0:
        raise JpegDctError(_JPEGDCT_ERRORS.get(int(rc),
                                               f"native error {rc}"))


def jpegdct_prog_segment(seg: bytes, scan_comps, dc_tabs, ac_tabs, grids,
                         coeffs, mcu0: int, cnt: int, interleaved: bool,
                         mcus_x: int, ss: int, se: int, ah: int, al: int,
                         dc_scan: bool) -> None:
    """Native progressive (Annex G) restart-segment decode — bit-identical
    to _decode_prog_segment_py (mdx/io/jpegdct.py)."""
    from mdx.io.jpegdct import JpegDctError

    lib = _load()
    (src, ncomp, hs, vs, bxs, outs, dcc, dcv, acc, acv) = \
        _jpegdct_marshal(seg, scan_comps, dc_tabs, ac_tabs, grids, coeffs)
    # the coefficient ARRAY can be wider than this scan's block grid (a
    # DC scan may have allocated it at the interleaved grid) — C indexes
    # rows by the allocation stride, not the scan grid
    strides = np.array([coeffs[c.cid].shape[1] for c in scan_comps],
                       np.int32)
    rc = lib.mdxio_jpegdct_prog_segment(
        src.ctypes.data_as(ctypes.c_void_p), src.size, ncomp,
        hs.ctypes.data_as(ctypes.c_void_p),
        vs.ctypes.data_as(ctypes.c_void_p),
        bxs.ctypes.data_as(ctypes.c_void_p),
        strides.ctypes.data_as(ctypes.c_void_p), outs,
        dcc.ctypes.data_as(ctypes.c_void_p),
        dcv.ctypes.data_as(ctypes.c_void_p),
        acc.ctypes.data_as(ctypes.c_void_p),
        acv.ctypes.data_as(ctypes.c_void_p),
        mcu0, cnt, int(interleaved), mcus_x, ss, se, ah, al,
        int(dc_scan))
    if rc != 0:
        raise JpegDctError(_JPEGDCT_ERRORS.get(int(rc),
                                               f"native error {rc}"))


def jpeg2k_t1_block(chunks, btype: int, mb: int, zbp: int, total: int,
                    w: int, h: int, cb_style: int) -> np.ndarray:
    """Native EBCOT Tier-1 code-block decode — bit-identical values
    (including in-loop half-LSB reconstruction) and error taxonomy to
    mdx/io/jpeg2k.py::_t1_decode_block, which is the parity oracle."""
    from mdx.io.jpeg2k import Jpeg2kError, _Block, _codeword_segments

    numbps = mb - zbp
    if total <= 0 or numbps <= 0 or not chunks:
        return np.zeros((h, w), np.int32)
    lib = _load()
    blk = _Block(0, 0, w, h)
    blk.chunks = chunks
    segments = _codeword_segments(blk, cb_style, numbps)
    seg_data = b"".join(s[0] for s in segments)
    lens = np.array([len(s[0]) for s in segments], np.int64)
    firsts = np.array([s[1] for s in segments], np.int32)
    npasses = np.array([s[2] for s in segments], np.int32)
    raws = np.array([1 if s[3] else 0 for s in segments], np.uint8)
    out = np.zeros((h, w), np.int32)
    buf = np.frombuffer(seg_data, np.uint8) if seg_data else \
        np.zeros(1, np.uint8)
    rc = lib.mdxio_jpeg2k_t1(
        buf.ctypes.data_as(ctypes.c_void_p),
        lens.ctypes.data_as(ctypes.c_void_p),
        firsts.ctypes.data_as(ctypes.c_void_p),
        npasses.ctypes.data_as(ctypes.c_void_p),
        raws.ctypes.data_as(ctypes.c_void_p),
        len(segments), w, h, btype, numbps, total, cb_style,
        out.ctypes.data_as(ctypes.c_void_p))
    if rc == -1:
        raise Jpeg2kError(
            "Segmentation symbol mismatch (corrupt entropy data).")
    if rc != 0:
        raise Jpeg2kError(f"native Tier-1 error {rc}")
    return out


def jpeg2k_t1_encode(vals: np.ndarray, btype: int):
    """Native EBCOT Tier-1 code-block ENCODE — byte-identical codewords
    to mdx/io/jpeg2k.py::_t1_encode_block (the parity oracle).
    Returns (bytes, numbps, npasses)."""
    lib = _load()
    h, w = vals.shape
    v = vals.astype(np.int64)
    mag = np.abs(v).astype(np.int32)
    neg = (v < 0).astype(np.uint8)
    mag = np.ascontiguousarray(mag)
    neg = np.ascontiguousarray(neg)
    cap = int(h * w * 8 + 4096)
    out = np.empty(cap, np.uint8)
    numbps = ctypes.c_int32()
    npasses = ctypes.c_int32()
    rc = lib.mdxio_jpeg2k_t1_enc(
        mag.ctypes.data_as(ctypes.c_void_p),
        neg.ctypes.data_as(ctypes.c_void_p),
        w, h, btype,
        out.ctypes.data_as(ctypes.c_void_p), cap,
        ctypes.byref(numbps), ctypes.byref(npasses))
    if rc < 0:
        raise RuntimeError("native Tier-1 encode overflow")
    return bytes(out[:rc]), int(numbps.value), int(npasses.value)
