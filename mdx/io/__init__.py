"""Host-side I/O (L1): DICOM decode, normalisation, visuals, reports.

The reference delegates DICOM parsing to pydicom (ref pipeline/dicom_io.py);
this package implements a from-scratch reader/writer covering the
uncompressed syntaxes plus RLE, JPEG Lossless (``mdx.io.jpegll``),
JPEG-LS (``mdx.io.jpegls``), lossy DCT JPEG (``mdx.io.jpegdct``,
decode-only) and JPEG 2000 (``mdx.io.jpeg2k``, decode-only)
with native C entropy loops, a transfer-syntax transcoder
(``mdx.io.transcode``), an optional C++ fast path for pixel unpack +
rescale (``mdx.io.native``), and keeps the reference's
normalisation/report behaviour bit-compatible.
"""

from mdx.io.dicom import load_dicom, load_series, DicomError
from mdx.io.dicom_write import write_dicom
from mdx.io.normalize import normalize_image, to_grayscale
from mdx.io.report import build_markdown_report
from mdx.io.transcode import transcode
from mdx.io.visuals import save_visuals, save_single_image

__all__ = [
    "load_dicom", "load_series", "DicomError", "write_dicom",
    "normalize_image", "to_grayscale", "build_markdown_report",
    "save_visuals", "save_single_image", "transcode",
]
