"""NumPy float64 reference-spec image primitives.

Re-derivations of the scikit-image/SciPy primitives the reference pipeline
uses.  Each function cites the reference call site.  These are the golden
oracles for the JAX device ops in ``mdx.ops``.
"""

from __future__ import annotations

import numpy as np
from scipy.ndimage import convolve as _ndconv
from scipy.ndimage import uniform_filter

from mdx.refimpl import wavelet_np as wnp

# ---------------------------------------------------------------------------
# Derivative stencils (ref pipeline/metrics.py:48,62-64)
# ---------------------------------------------------------------------------

# 3x3 Laplacian: cross stencil, zero-sum, positive centre.
LAPLACE_KERNEL = np.array([[0.0, -1.0, 0.0], [-1.0, 4.0, -1.0], [0.0, -1.0, 0.0]])
# Smoothed Sobel kernels, /4 normalisation (skimage convention).
SOBEL_H_KERNEL = np.array([[1.0, 2.0, 1.0], [0.0, 0.0, 0.0], [-1.0, -2.0, -1.0]]) / 4.0
SOBEL_V_KERNEL = SOBEL_H_KERNEL.T


def laplace(image: np.ndarray) -> np.ndarray:
    return _ndconv(np.asarray(image, np.float64), LAPLACE_KERNEL, mode="reflect")


def sobel_h(image: np.ndarray) -> np.ndarray:
    return _ndconv(np.asarray(image, np.float64), SOBEL_H_KERNEL, mode="reflect")


def sobel_v(image: np.ndarray) -> np.ndarray:
    return _ndconv(np.asarray(image, np.float64), SOBEL_V_KERNEL, mode="reflect")


def gradient_magnitude(image: np.ndarray) -> np.ndarray:
    return np.hypot(sobel_h(image), sobel_v(image))


def box_filter(image: np.ndarray, size: int) -> np.ndarray:
    """Mean filter with reflect boundary (ref uses scipy ``uniform_filter``)."""
    return uniform_filter(np.asarray(image, np.float64), size=size, mode="reflect")


def local_variance(image: np.ndarray, size: int) -> np.ndarray:
    """E[x²] − E[x]² over a size×size window, clamped at 0
    (ref pipeline/metrics.py:120-129, 194-197)."""
    img = np.asarray(image, np.float64)
    m = box_filter(img, size)
    m2 = box_filter(img * img, size)
    return np.maximum(m2 - m * m, 0.0)


# ---------------------------------------------------------------------------
# Gaussian blur (for unsharp mask; ref pipeline/enhancement.py:202-205)
# ---------------------------------------------------------------------------


def gaussian_kernel_1d(sigma: float, truncate: float = 4.0) -> np.ndarray:
    radius = int(truncate * sigma + 0.5)
    x = np.arange(-radius, radius + 1, dtype=np.float64)
    k = np.exp(-0.5 * (x / sigma) ** 2)
    return k / k.sum()


def gaussian_blur(image: np.ndarray, sigma: float, mode: str = "nearest") -> np.ndarray:
    """Separable Gaussian, 'nearest' boundary (skimage ``gaussian`` default)."""
    if sigma <= 0:
        return np.asarray(image, np.float64)
    k = gaussian_kernel_1d(sigma)
    img = np.asarray(image, np.float64)
    img = _ndconv(img, k[:, None], mode=mode)
    img = _ndconv(img, k[None, :], mode=mode)
    return img


def unsharp_mask(image: np.ndarray, radius: float, amount: float) -> np.ndarray:
    """result = clip(image + (image − gaussian(image, radius)) · amount, 0, 1).

    Ref pipeline/enhancement.py:202-205: skimage ``unsharp_mask`` with
    preserve_range=False clips its output to the [0, 1] value range
    (skimage/filters/_unsharp_mask.py ``np.clip(result, vrange...)``), so
    downstream ops (post-denoise, safeguards) see clipped values.
    """
    blurred = gaussian_blur(image, radius)
    out = np.asarray(image, np.float64) + (image - blurred) * amount
    return np.clip(out, 0.0, 1.0)


# ---------------------------------------------------------------------------
# Gamma (ref pipeline/enhancement.py:194-198)
# ---------------------------------------------------------------------------


def adjust_gamma(image: np.ndarray, gamma: float) -> np.ndarray:
    return np.power(np.clip(np.asarray(image, np.float64), 0.0, None), gamma)


# ---------------------------------------------------------------------------
# Histograms / entropy / percentiles (ref pipeline/metrics.py:112-151)
# ---------------------------------------------------------------------------


def shannon_entropy(image: np.ndarray, bins: int = 256, hi: float = 1.0) -> float:
    hist, _ = np.histogram(np.asarray(image).ravel(), bins=bins, range=(0.0, hi))
    hist = hist[hist > 0]
    if hist.size == 0:
        return 0.0
    p = hist / hist.sum()
    return float(-np.sum(p * np.log2(p)))


# ---------------------------------------------------------------------------
# CLAHE (ref pipeline/enhancement.py:183-187; skimage equalize_adapthist)
# ---------------------------------------------------------------------------


def clahe(
    image: np.ndarray,
    clip_limit: float = 0.015,
    tile_size: int = 16,
    nbins: int = 256,
) -> np.ndarray:
    """Contrast-limited adaptive histogram equalisation on a [0,1] image.

    Canonical CLAHE: pad (reflect) to a multiple of the tile size, per-tile
    clipped histograms with uniform excess redistribution, per-tile CDF maps,
    bilinear interpolation between the four surrounding tile maps.
    """
    img = np.clip(np.asarray(image, np.float64), 0.0, 1.0)
    h, w = img.shape
    t = int(tile_size)
    pad_h = (-h) % t
    pad_w = (-w) % t
    padded = np.pad(img, ((0, pad_h), (0, pad_w)), mode="reflect")
    ph, pw = padded.shape
    gy, gx = ph // t, pw // t

    # Quantise to bins
    q = np.minimum((padded * nbins).astype(np.int64), nbins - 1)
    tiles = q.reshape(gy, t, gx, t).transpose(0, 2, 1, 3).reshape(gy, gx, t * t)

    # Per-tile histograms
    hists = np.zeros((gy, gx, nbins), dtype=np.float64)
    for iy in range(gy):
        for ix in range(gx):
            hists[iy, ix] = np.bincount(tiles[iy, ix], minlength=nbins)

    # Clip + redistribute
    npix = float(t * t)
    clim = max(clip_limit * npix, 1.0)
    excess = np.maximum(hists - clim, 0.0).sum(axis=-1, keepdims=True)
    hists = np.minimum(hists, clim) + excess / nbins

    # Per-tile mapping: scaled CDF → [0, 1]
    cdf = np.cumsum(hists, axis=-1)
    cdf_min = cdf[..., :1]
    denom = np.maximum(cdf[..., -1:] - cdf_min, 1e-12)
    lut = (cdf - cdf_min) / denom  # (gy, gx, nbins)

    # Bilinear interpolation between the 4 surrounding tile centres
    yy = np.arange(ph, dtype=np.float64)
    xx = np.arange(pw, dtype=np.float64)
    fy = (yy + 0.5) / t - 0.5
    fx = (xx + 0.5) / t - 0.5
    y0 = np.clip(np.floor(fy).astype(np.int64), 0, gy - 1)
    x0 = np.clip(np.floor(fx).astype(np.int64), 0, gx - 1)
    y1 = np.minimum(y0 + 1, gy - 1)
    x1 = np.minimum(x0 + 1, gx - 1)
    wy = np.clip(fy - y0, 0.0, 1.0)[:, None]
    wx = np.clip(fx - x0, 0.0, 1.0)[None, :]

    def _sample(yi, xi):
        return lut[yi[:, None], xi[None, :], q]

    v00 = _sample(y0, x0)
    v01 = _sample(y0, x1)
    v10 = _sample(y1, x0)
    v11 = _sample(y1, x1)
    out = (
        (1 - wy) * ((1 - wx) * v00 + wx * v01)
        + wy * ((1 - wx) * v10 + wx * v11)
    )
    return out[:h, :w]


# ---------------------------------------------------------------------------
# Bilateral filter (ref pipeline/enhancement.py:102-143)
# ---------------------------------------------------------------------------


def bilateral(
    image: np.ndarray,
    d: int = 5,
    sigma_color: float = 0.05,
    sigma_space: float = 0.05,
) -> np.ndarray:
    """Sliding-window bilateral: spatial Gaussian × intensity Gaussian.

    Behavioural contract of the reference's hand-written NumPy filter:
    diameter clamped to ≤9 and forced odd; reflect padding; spatial weight
    exp(−(dx²+dy²)/(2·σs²·d²)); intensity weight exp(−Δ²/(2·σc²)).
    """
    img = np.asarray(image, np.float64)
    if d <= 0:
        return img
    d = min(int(d), 9)
    if d % 2 == 0:
        d += 1
    r = d // 2
    padded = np.pad(img, r, mode="reflect")
    num = np.zeros_like(img)
    den = np.zeros_like(img)
    for dy in range(-r, r + 1):
        for dx in range(-r, r + 1):
            shifted = padded[r + dy : r + dy + img.shape[0], r + dx : r + dx + img.shape[1]]
            sw = np.exp(-(dx * dx + dy * dy) / (2.0 * sigma_space**2 * d * d))
            iw = np.exp(-((img - shifted) ** 2) / (2.0 * sigma_color**2))
            w = sw * iw
            num += w * shifted
            den += w
    return num / (den + 1e-10)


# ---------------------------------------------------------------------------
# Total-variation denoise, Chambolle 2004 (ref pipeline/enhancement.py:309-312)
# ---------------------------------------------------------------------------


def tv_chambolle(
    image: np.ndarray,
    weight: float,
    eps: float = 2e-4,
    max_iter: int = 200,
) -> np.ndarray:
    """Chambolle projection algorithm for 2-D TV denoising.

    Mirrors skimage ``denoise_tv_chambolle``: dual variable p updated with
    step 1/(2·ndim); stop when |E_prev − E| < eps·E_init.
    """
    img = np.asarray(image, np.float64)
    ndim = img.ndim
    p = np.zeros((ndim,) + img.shape)
    g = np.zeros_like(p)
    d = np.zeros_like(img)
    e_init = 0.0
    e_prev = 0.0
    out = img
    for i in range(max_iter):
        if i > 0:
            # divergence of p
            d = -p.sum(0)
            d[1:, :] += p[0, :-1, :]
            d[:, 1:] += p[1, :, :-1]
            out = img + d
        else:
            out = img
        e = float((d * d).sum())
        # forward differences of out
        g[0, :-1, :] = np.diff(out, axis=0)
        g[0, -1, :] = 0.0
        g[1, :, :-1] = np.diff(out, axis=1)
        g[1, :, -1] = 0.0
        norm = np.sqrt((g * g).sum(axis=0))[np.newaxis, ...]
        e += weight * float(norm.sum())
        tau = 1.0 / (2.0 * ndim)
        norm = norm * tau / weight + 1.0
        p = (p - tau * g) / norm
        e /= img.size
        if i == 0:
            e_init = e
            e_prev = e
        else:
            if abs(e_prev - e) < eps * e_init:
                break
            e_prev = e
    return out


# ---------------------------------------------------------------------------
# SSIM / PSNR (ref pipeline/metrics.py:232-233)
# ---------------------------------------------------------------------------


def ssim(x: np.ndarray, y: np.ndarray, data_range: float = 1.0, win_size: int = 7) -> float:
    """Structural similarity, skimage defaults: 7×7 uniform window, unbiased
    covariance normalisation, border crop of (win−1)//2."""
    x = np.asarray(x, np.float64)
    y = np.asarray(y, np.float64)
    NP = win_size * win_size
    cov_norm = NP / (NP - 1.0)
    ux = uniform_filter(x, win_size, mode="reflect")
    uy = uniform_filter(y, win_size, mode="reflect")
    uxx = uniform_filter(x * x, win_size, mode="reflect")
    uyy = uniform_filter(y * y, win_size, mode="reflect")
    uxy = uniform_filter(x * y, win_size, mode="reflect")
    vx = cov_norm * (uxx - ux * ux)
    vy = cov_norm * (uyy - uy * uy)
    vxy = cov_norm * (uxy - ux * uy)
    k1, k2 = 0.01, 0.03
    c1 = (k1 * data_range) ** 2
    c2 = (k2 * data_range) ** 2
    a1 = 2.0 * ux * uy + c1
    a2 = 2.0 * vxy + c2
    b1 = ux * ux + uy * uy + c1
    b2 = vx + vy + c2
    s = (a1 * a2) / (b1 * b2)
    pad = (win_size - 1) // 2
    return float(s[pad:-pad, pad:-pad].mean())


def psnr(x: np.ndarray, y: np.ndarray, data_range: float = 1.0) -> float:
    mse = float(np.mean((np.asarray(x, np.float64) - np.asarray(y, np.float64)) ** 2))
    if mse == 0.0:
        return float("inf")
    return float(10.0 * np.log10((data_range * data_range) / mse))
