"""TPU device ops: batched, jittable image primitives (JAX/XLA/Pallas).

Every function here operates on batched ``[N, H, W]`` float32 arrays with
static shapes, is safe under ``jax.jit`` / ``pjit``, and is golden-tested
against the NumPy float64 reference spec in ``mdx.refimpl``.

Design rules (see /root/repo/pallas_guide-driven notes in AGENTS docs):
  * no data-dependent Python control flow — gating is either static
    (plan ops) or expressed as per-image masks + ``jnp.where``;
  * dynamic parameters (clip limits, gammas, sigmas…) are traced scalars or
    per-image ``[N]`` vectors so tuning loops never recompile;
  * boundary handling mirrors the reference exactly: SciPy ``reflect``
    (= ``jnp.pad(mode="symmetric")``), skimage ``nearest``
    (= ``jnp.pad(mode="edge")``).
"""

from mdx.ops.filters import (
    laplace,
    sobel_h,
    sobel_v,
    gradient_magnitude,
    box_filter,
    local_variance,
    gaussian_blur,
    unsharp_mask,
    adjust_gamma,
)
from mdx.ops.wavelet import (
    dwt2,
    idwt2,
    wavedec2,
    waverec2,
    estimate_sigma,
    denoise_wavelet,
    max_level,
)
from mdx.ops.hist import (histogram01, histogram_scaled,
                          shannon_entropy01, entropy_from_hist,
                          percentiles)
from mdx.ops.quantile import (order_statistics, percentiles_exact,
                              median_rows)
from mdx.ops.clahe import clahe
from mdx.ops.bilateral import bilateral
from mdx.ops.tv import tv_chambolle
from mdx.ops.ssim import ssim, psnr

__all__ = [
    "laplace", "sobel_h", "sobel_v", "gradient_magnitude", "box_filter",
    "local_variance", "gaussian_blur", "unsharp_mask", "adjust_gamma",
    "dwt2", "idwt2", "wavedec2", "waverec2", "estimate_sigma",
    "denoise_wavelet", "max_level",
    "histogram01", "histogram_scaled", "shannon_entropy01",
    "entropy_from_hist", "percentiles",
    "order_statistics", "percentiles_exact", "median_rows",
    "clahe", "bilateral", "tv_chambolle", "ssim", "psnr",
]
