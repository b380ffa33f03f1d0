"""DICOM RLE Lossless codec (PS3.5 Annex G) — PackBits byte segments.

The reference gets RLE decode for free from ``pydicom.dcmread``
(reference pipeline/dicom_io.py:29-45 — RLE Lossless ``1.2.840.10008.1.2.5``
is handled by pydicom's built-in numpy handler); mdx implements the codec
from the standard so the from-scratch reader covers the same inputs.

Format recap (PS3.5 Annex G):

* Each frame is ONE encapsulated fragment: a 64-byte RLE header — 16
  little-endian uint32s: the segment count then up to 15 segment offsets
  (measured from the start of the header; unused entries 0) — followed by
  the segments.
* Pixels are split into "composite pixel code" byte planes: for each
  sample, one segment per byte, most-significant byte first (so 16-bit
  grayscale = 2 segments: MSB plane then LSB plane).
* Every segment is PackBits-encoded and padded to even length.
"""

from __future__ import annotations

import struct

import numpy as np

from mdx.io.native import NativeUnavailable as _NativeUnavailable

_HEADER_LEN = 64
_MAX_SEGMENTS = 15


class RleError(ValueError):
    """Malformed RLE frame."""


# ---------------------------------------------------------------------------
# PackBits
# ---------------------------------------------------------------------------


def packbits_decode(data: bytes, expected: int) -> bytes:
    """Decode a PackBits stream to exactly ``expected`` bytes.

    Control byte n: 0..127 → copy the next n+1 literal bytes; 129..255 →
    repeat the next byte 257-n times; 128 → no-op.  Trailing pad bytes
    beyond ``expected`` are ignored (segments are even-padded).

    Hot path: one Python iteration per control byte is the dominant cost
    of decoding an RLE series, so the loop runs in C when the native
    kernels are available (native/mdxio.cpp, bit-identical, same error
    taxonomy); this pure-Python body is the fallback and the parity
    oracle (tests/test_native.py).
    """
    try:
        from mdx.io import native as _native

        rc, out_b = _native.packbits_decode(data, expected)
    except _NativeUnavailable:
        pass
    else:
        if rc == -1:
            raise RleError("Truncated PackBits literal run.")
        if rc == -2:
            raise RleError("Truncated PackBits replicate run.")
        if rc < expected:
            raise RleError(
                f"PackBits stream too short: {rc} < {expected} bytes.")
        return out_b
    return _packbits_decode_py(data, expected)


def _packbits_decode_py(data: bytes, expected: int) -> bytes:
    out = bytearray()
    i, n = 0, len(data)
    while i < n and len(out) < expected:
        ctrl = data[i]
        i += 1
        if ctrl < 128:
            cnt = ctrl + 1
            if i + cnt > n:
                raise RleError("Truncated PackBits literal run.")
            out += data[i:i + cnt]
            i += cnt
        elif ctrl > 128:
            if i >= n:
                raise RleError("Truncated PackBits replicate run.")
            out += data[i:i + 1] * (257 - ctrl)
            i += 1
        # ctrl == 128: no-op
    if len(out) < expected:
        raise RleError(
            f"PackBits stream too short: {len(out)} < {expected} bytes.")
    return bytes(out[:expected])


def packbits_encode(data: bytes) -> bytes:
    """Encode ``data`` with PackBits (replicate runs ≥3, literals ≤128).

    Runs in C when available (bit-identical boundaries); Python fallback
    below is the parity oracle."""
    try:
        from mdx.io import native as _native

        return _native.packbits_encode(data)
    except _NativeUnavailable:
        return _packbits_encode_py(data)


def _packbits_encode_py(data: bytes) -> bytes:
    out = bytearray()
    i, n = 0, len(data)
    while i < n:
        run = 1
        while i + run < n and run < 128 and data[i + run] == data[i]:
            run += 1
        if run >= 3:
            out.append(257 - run)
            out.append(data[i])
            i += run
            continue
        # literal block: scan until the next replicate run of ≥3 (or 128)
        j = i + 1
        while j < n and (j - i) < 128:
            if j + 2 < n and data[j] == data[j + 1] == data[j + 2]:
                break
            j += 1
        out.append(j - i - 1)
        out += data[i:j]
        i = j
    return bytes(out)


# ---------------------------------------------------------------------------
# Frame codec
# ---------------------------------------------------------------------------


def decode_frame(fragment: bytes, rows: int, cols: int, samples: int,
                 bytes_per_sample: int) -> np.ndarray:
    """One RLE fragment → flat uint-composed pixel array.

    Returns a 1-D array of ``rows*cols*samples`` unsigned integers of width
    ``bytes_per_sample`` (caller views signed / reshapes).
    """
    if len(fragment) < _HEADER_LEN:
        raise RleError("RLE fragment shorter than its 64-byte header.")
    n_seg = struct.unpack("<I", fragment[:4])[0]
    offsets = struct.unpack("<15I", fragment[4:_HEADER_LEN])
    expected_segs = samples * bytes_per_sample
    if n_seg != expected_segs:
        raise RleError(
            f"RLE header advertises {n_seg} segments, geometry needs "
            f"{expected_segs} (samples={samples} × {bytes_per_sample} B).")
    if n_seg < 1 or n_seg > _MAX_SEGMENTS:
        raise RleError(f"RLE segment count {n_seg} out of range 1..15.")
    npix = rows * cols
    bounds = list(offsets[:n_seg]) + [len(fragment)]
    planes = []
    for s in range(n_seg):
        start, end = bounds[s], bounds[s + 1]
        if not (_HEADER_LEN <= start <= end <= len(fragment)):
            raise RleError("RLE segment offsets out of order / range.")
        planes.append(np.frombuffer(
            packbits_decode(fragment[start:end], npix), dtype=np.uint8))

    out_dtype = np.dtype(f"<u{bytes_per_sample}")
    out = np.zeros(npix * samples, dtype=out_dtype)
    # segment order: per sample, MSB plane → LSB plane (PS3.5 G.2)
    for s in range(samples):
        val = planes[s * bytes_per_sample].astype(out_dtype)
        for b in range(1, bytes_per_sample):
            val = (val << out_dtype.type(8)) | planes[s * bytes_per_sample + b]
        out[s::samples] = val  # interleave samples back into composite order
    return out


def encode_frame(frame: np.ndarray) -> bytes:
    """Flat/2-D/3-D frame of (u)int8/16/32 samples → one RLE fragment.

    ``frame`` is ``[rows, cols]`` or ``[rows, cols, samples]`` (or already
    flat in composite order).
    """
    samples = frame.shape[-1] if frame.ndim == 3 else 1
    bps = frame.dtype.itemsize
    n_seg = samples * bps
    if n_seg > _MAX_SEGMENTS:
        raise RleError(f"{n_seg} segments exceed the RLE limit of 15.")
    # big-endian byte view: [npix, samples*bps] with MSB-first per sample
    be = np.ascontiguousarray(frame).astype(
        frame.dtype.newbyteorder(">")).view(np.uint8)
    planes = be.reshape(-1, n_seg).T  # [n_seg, npix]

    segments = []
    for plane in planes:
        seg = packbits_encode(plane.tobytes())
        if len(seg) % 2:
            seg += b"\x00"  # PS3.5 G.3.1: segments are even-length
        segments.append(seg)

    offsets = []
    pos = _HEADER_LEN
    for seg in segments:
        offsets.append(pos)
        pos += len(seg)
    header = struct.pack(
        "<16I", n_seg, *(offsets + [0] * (_MAX_SEGMENTS - len(offsets))))
    return header + b"".join(segments)
