"""Separable 2-D discrete wavelet transform (NumPy, float64).

Implements the PyWavelets conventions needed by the reference pipeline:

* ``estimate_sigma`` (reference ``pipeline/metrics.py:47``) — MAD of the
  single-level *db2* diagonal (HH) detail coefficients / Φ⁻¹(3/4).
* ``denoise_wavelet`` (reference ``pipeline/enhancement.py:169-174``) —
  BayesShrink soft/hard thresholding over a multi-level *db1* decomposition.

Conventions: symmetric (half-sample) boundary extension, analysis output
length ``floor((n + L - 1) / 2)`` per level, orthogonal reconstruction
filters.  Perfect reconstruction is unit-tested for odd/even lengths.
"""

from __future__ import annotations

import numpy as np

# Orthonormal Daubechies decomposition low-pass filters (PyWavelets ordering).
_SQRT2 = float(np.sqrt(2.0))
FILTERS: dict[str, np.ndarray] = {
    "db1": np.array([1.0, 1.0]) / _SQRT2,
    "db2": np.array(
        [
            (1 + np.sqrt(3.0)) / 4.0,
            (3 + np.sqrt(3.0)) / 4.0,
            (3 - np.sqrt(3.0)) / 4.0,
            (1 - np.sqrt(3.0)) / 4.0,
        ]
    )[::-1]
    / _SQRT2,
}
# MAD → sigma conversion constant: 1 / Phi^{-1}(0.75)
MAD_TO_SIGMA = 1.0 / 0.6744897501960817


def qmf_pair(name: str) -> tuple[np.ndarray, np.ndarray]:
    """Return (dec_lo, dec_hi) for an orthonormal wavelet."""
    lo = FILTERS[name]
    L = len(lo)
    # Quadrature mirror: hi[k] = (-1)^k * lo[L-1-k]
    hi = np.array([(-1.0) ** k * lo[L - 1 - k] for k in range(L)])
    return lo, hi


def _sym_ext(x: np.ndarray, n: int, axis: int) -> np.ndarray:
    """Half-sample symmetric extension by *n* samples on both ends."""
    if n == 0:
        return x
    return np.concatenate(
        [
            np.flip(np.take(x, range(0, min(n, x.shape[axis])), axis=axis), axis=axis),
            x,
            np.flip(
                np.take(
                    x,
                    range(max(0, x.shape[axis] - n), x.shape[axis]),
                    axis=axis,
                ),
                axis=axis,
            ),
        ],
        axis=axis,
    )


def _analysis_1d(x: np.ndarray, lo: np.ndarray, hi: np.ndarray, axis: int):
    """One analysis step along *axis*: returns (approx, detail)."""
    L = len(lo)
    n = x.shape[axis]
    ext = _sym_ext(x, L - 1, axis)
    ext = np.moveaxis(ext, axis, -1)
    n_out = (n + L - 1) // 2
    # window k covers ext[2k+1 : 2k+1+L]; correlate with the reversed filter
    lo_r = lo[::-1]
    hi_r = hi[::-1]
    idx = 2 * np.arange(n_out)[:, None] + 1 + np.arange(L)[None, :]
    win = ext[..., idx]  # (..., n_out, L)
    a = win @ lo_r
    d = win @ hi_r
    return np.moveaxis(a, -1, axis), np.moveaxis(d, -1, axis)


def _synthesis_1d(
    a: np.ndarray, d: np.ndarray, lo: np.ndarray, hi: np.ndarray, axis: int, n_out: int
) -> np.ndarray:
    """Inverse of :func:`_analysis_1d`, cropped to *n_out* samples."""
    L = len(lo)
    a = np.moveaxis(a, axis, -1)
    d = np.moveaxis(d, axis, -1)
    m = a.shape[-1]
    up_len = 2 * m
    ua = np.zeros(a.shape[:-1] + (up_len,), dtype=a.dtype)
    ud = np.zeros_like(ua)
    ua[..., ::2] = a
    ud[..., ::2] = d
    # Full convolution with orthogonal reconstruction filters (= reversed dec)
    rec_lo = lo[::-1]
    rec_hi = hi[::-1]
    full = np.apply_along_axis(lambda v: np.convolve(v, rec_lo), -1, ua)
    full = full + np.apply_along_axis(lambda v: np.convolve(v, rec_hi), -1, ud)
    # Analysis window offset was +1 into an (L-1)-extended signal: the first
    # reconstructed sample of the original signal sits at index L - 2.
    start = L - 2
    out = full[..., start : start + n_out]
    return np.moveaxis(out, -1, axis)


def dwt2(image: np.ndarray, wavelet: str = "db1"):
    """Single-level separable 2-D DWT → (LL, (LH, HL, HH))."""
    lo, hi = qmf_pair(wavelet)
    a_r, d_r = _analysis_1d(image, lo, hi, axis=0)
    ll, lh = _analysis_1d(a_r, lo, hi, axis=1)
    hl, hh = _analysis_1d(d_r, lo, hi, axis=1)
    return ll, (lh, hl, hh)


def idwt2(ll, details, wavelet: str, out_shape) -> np.ndarray:
    """Inverse of :func:`dwt2`, cropped to ``out_shape``."""
    lo, hi = qmf_pair(wavelet)
    lh, hl, hh = details
    a_r = _synthesis_1d(ll, lh, lo, hi, axis=1, n_out=out_shape[1])
    d_r = _synthesis_1d(hl, hh, lo, hi, axis=1, n_out=out_shape[1])
    return _synthesis_1d(a_r, d_r, lo, hi, axis=0, n_out=out_shape[0])


def max_level(shape, wavelet: str) -> int:
    """PyWavelets ``dwt_max_level`` over the smaller image dimension."""
    L = len(FILTERS[wavelet])
    n = min(shape)
    if n < L - 1 or L < 2:
        return 0
    if L == 2:
        return int(np.floor(np.log2(n)))
    return int(np.floor(np.log2(n / (L - 1.0))))


def wavedec2(image: np.ndarray, wavelet: str, level: int):
    """Multi-level 2-D decomposition → (LLn, [details_level_n..details_level_1])."""
    shapes = []
    details = []
    ll = image
    for _ in range(level):
        shapes.append(ll.shape)
        ll, det = dwt2(ll, wavelet)
        details.append(det)
    return ll, details[::-1], shapes[::-1]


def waverec2(ll, details, shapes, wavelet: str) -> np.ndarray:
    """Inverse of :func:`wavedec2`."""
    for det, shp in zip(details, shapes):
        ll = idwt2(ll, det, wavelet, shp)
    return ll


# ---------------------------------------------------------------------------
# Noise estimation + BayesShrink denoising (spec for the reference behaviour)
# ---------------------------------------------------------------------------


def estimate_sigma(image: np.ndarray) -> float:
    """Donoho wavelet-MAD noise estimate (ref ``pipeline/metrics.py:47``).

    sigma = median(|HH1(db2)|) / Phi^{-1}(0.75).
    """
    _, (_, _, hh) = dwt2(np.asarray(image, dtype=np.float64), "db2")
    return float(np.median(np.abs(hh)) * MAD_TO_SIGMA)


def _soft(x: np.ndarray, t: float) -> np.ndarray:
    return np.sign(x) * np.maximum(np.abs(x) - t, 0.0)


def _hard(x: np.ndarray, t: float) -> np.ndarray:
    return np.where(np.abs(x) > t, x, 0.0)


def _bayes_threshold(detail: np.ndarray, noise_var: float) -> float:
    """BayesShrink subband threshold: var_n / sqrt(max(E[d²] − var_n, eps))."""
    dvar = float(np.mean(detail * detail))
    eps = np.finfo(np.float64).eps
    return noise_var / np.sqrt(max(dvar - noise_var, eps))

_LEVEL_OFFSET = 3  # skimage: levels = max_level - 3 (min 1)


def denoise_wavelet(
    image: np.ndarray,
    sigma: float | None = None,
    mode: str = "soft",
    wavelet: str = "db1",
    wavelet_levels: int | None = None,
) -> np.ndarray:
    """BayesShrink wavelet denoise (ref ``pipeline/enhancement.py:169-174``).

    Matches the behavioural contract of skimage ``denoise_wavelet`` with
    ``rescale_sigma=True`` on float [0,1] input: noise sigma estimated from
    the finest diagonal subband when not given; per-subband BayesShrink
    soft/hard thresholds; multi-level db1.
    """
    img = np.asarray(image, dtype=np.float64)
    if wavelet_levels is None:
        wavelet_levels = max(max_level(img.shape, wavelet) - _LEVEL_OFFSET, 1)
    ll, details, shapes = wavedec2(img, wavelet, wavelet_levels)
    if sigma is None:
        hh_finest = details[-1][2]  # level-1 diagonal subband
        sigma = float(np.median(np.abs(hh_finest)) * MAD_TO_SIGMA)
    noise_var = sigma * sigma
    shrink = _soft if mode == "soft" else _hard
    new_details = []
    for det in details:
        new_details.append(
            tuple(shrink(band, _bayes_threshold(band, noise_var)) for band in det)
        )
    return waverec2(ll, new_details, shapes, wavelet)
