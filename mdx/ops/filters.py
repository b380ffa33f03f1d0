"""Batched stencil / separable filters on [N, H, W] arrays (JAX).

Boundary conventions (matching mdx.refimpl/SciPy):
  * ``symmetric`` pad == SciPy ndimage ``mode="reflect"`` (edge repeated)
  * ``edge`` pad == SciPy ``mode="nearest"`` (skimage gaussian default)

Small static stencils (Sobel, Laplacian, box, DWT taps) run as fused
shift-MAC slice arithmetic — measured 2–15× faster than XLA's plain conv
lowering on TPU (docs/PERF.md).  Long/traced kernels (the fixed-support
Gaussian) use the batch-as-channels depthwise grouped conv, which is 11×
faster than the plain conv for identical taps.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np
from jax import lax

_DN = lax.conv_dimension_numbers((1, 1, 1, 1), (1, 1, 1, 1), ("NCHW", "OIHW", "NCHW"))


_LAPLACE = np.array([[0.0, -1.0, 0.0], [-1.0, 4.0, -1.0], [0.0, -1.0, 0.0]])
_SOBEL_H = np.array([[1.0, 2.0, 1.0], [0.0, 0.0, 0.0], [-1.0, -2.0, -1.0]]) / 4.0


def laplace_core(xp: jnp.ndarray) -> jnp.ndarray:
    """5-point Laplacian of an already 1-extended [N, H+2, W+2] block →
    [N, H, W].  The extension may be a symmetric pad (dense path) or a
    shard halo (spatial path) — the slice arithmetic is identical."""
    c = xp[:, 1:-1, 1:-1]
    return (4.0 * c - xp[:, :-2, 1:-1] - xp[:, 2:, 1:-1]
            - xp[:, 1:-1, :-2] - xp[:, 1:-1, 2:])


def sobel_h_core(xp: jnp.ndarray) -> jnp.ndarray:
    """Smoothed horizontal-edge Sobel of a 1-extended block → [N, H, W].

    Bit-identical to per-stage symmetric padding of each separable stage:
    the row diff and the column mirror act on different axes, so
    pad-then-diff equals diff-then-pad exactly."""
    d = 0.5 * (xp[:, 2:, :] - xp[:, :-2, :])          # [N, H, W+2]
    return 0.5 * d[:, :, :-2] + d[:, :, 1:-1] + 0.5 * d[:, :, 2:]


def sobel_v_core(xp: jnp.ndarray) -> jnp.ndarray:
    d = 0.5 * (xp[:, :, 2:] - xp[:, :, :-2])          # [N, H+2, W]
    return 0.5 * d[:, :-2, :] + d[:, 1:-1, :] + 0.5 * d[:, 2:, :]


def laplace(x: jnp.ndarray) -> jnp.ndarray:
    """3×3 cross Laplacian (ref pipeline/metrics.py:48).

    Direct 5-point stencil (shift-add): 15× faster than the XLA conv
    lowering at 128×512² (6.0 → 0.4 ms) — a small-stencil conv on TPU
    pays im2col/windowing overhead that five fused slice adds avoid.
    """
    vp = jnp.pad(x, ((0, 0), (1, 1), (1, 1)), mode="symmetric")
    return laplace_core(vp)


def _pad1(x: jnp.ndarray, axis: int) -> jnp.ndarray:
    pad = [(0, 0), (0, 0), (0, 0)]
    pad[axis] = (1, 1)
    return jnp.pad(x, pad, mode="symmetric")


def _smooth3(x: jnp.ndarray, axis: int) -> jnp.ndarray:
    """[1,2,1]/2 correlation along ``axis`` (symmetric boundary)."""
    n = x.shape[axis]
    xp = _pad1(x, axis)
    return (0.5 * lax.slice_in_dim(xp, 0, n, axis=axis)
            + lax.slice_in_dim(xp, 1, n + 1, axis=axis)
            + 0.5 * lax.slice_in_dim(xp, 2, n + 2, axis=axis))


def _diff3(x: jnp.ndarray, axis: int) -> jnp.ndarray:
    """[-1,0,1]/2 correlation along ``axis`` (symmetric boundary)."""
    n = x.shape[axis]
    xp = _pad1(x, axis)
    return 0.5 * (lax.slice_in_dim(xp, 2, n + 2, axis=axis)
                  - lax.slice_in_dim(xp, 0, n, axis=axis))


def sobel_h(x: jnp.ndarray) -> jnp.ndarray:
    """Smoothed horizontal-edge Sobel, /4 (ref pipeline/metrics.py:62).

    Separable shift-MAC ([−1,0,1]/2 rows ∘ [1,2,1]/2 cols): 5.5× faster
    than the 3×3 conv pair at 128×512² (gradient 11.0 → 2.0 ms).  The
    dense path pads ONE axis per stage (the first sweep stays on
    lane-aligned W; padding both axes up front cost ~13% of the headline,
    measured) — bit-identical to ``sobel_h_core`` on a both-axes-extended
    block, which the spatial layer uses (halos extend both axes anyway).
    """
    return _smooth3(_diff3(x, 1), 2)


def sobel_v(x: jnp.ndarray) -> jnp.ndarray:
    return _smooth3(_diff3(x, 2), 1)


def gradient_magnitude(x: jnp.ndarray) -> jnp.ndarray:
    return jnp.hypot(sobel_h(x), sobel_v(x))


def box_filter(x: jnp.ndarray, size: int) -> jnp.ndarray:
    """Mean filter, SciPy ``uniform_filter`` semantics (left-heavy window for
    even sizes, reflect boundary). Ref pipeline/metrics.py:125-126,195-196.

    Separable shift-add instead of a conv: the uniform kernel needs no
    multiplies, and ``size`` statically-unrolled slice adds per axis beat
    the XLA conv lowering by ~30% on TPU (16.5 → 11.6 ms for the 7×7
    local-variance pair at 128×512²) while staying one fused elementwise
    sweep per axis.  Same window support and per-axis 1/size scaling as
    ``uniform_filter``; summation reassociation is within golden tolerance.
    """
    lo = size // 2
    hi = size - lo - 1
    n, h, w = x.shape
    # one axis padded per sweep: the row accumulation stays on the
    # lane-aligned width (padding both axes up front measurably slowed the
    # headline); box_core (both-axes-extended) is the spatial-layer variant
    xp = jnp.pad(x, ((0, 0), (lo, hi), (0, 0)), mode="symmetric")
    acc = xp[:, 0:h, :]
    for i in range(1, size):
        acc = acc + xp[:, i:i + h, :]
    acc = acc * (1.0 / size)
    xp = jnp.pad(acc, ((0, 0), (0, 0), (lo, hi)), mode="symmetric")
    out = xp[:, :, 0:w]
    for i in range(1, size):
        out = out + xp[:, :, i:i + w]
    return out * (1.0 / size)


def box_core(xp: jnp.ndarray, size: int) -> jnp.ndarray:
    """Separable shift-add mean of an already (size−1)-extended block
    ([N, H+size−1, W+size−1], ``size//2`` leading / the rest trailing) →
    [N, H, W].  Bit-identical to padding the row-mean's columns instead
    (row sums and the column mirror act on different axes)."""
    h = xp.shape[1] - (size - 1)
    w = xp.shape[2] - (size - 1)
    acc = xp[:, 0:h, :]
    for i in range(1, size):
        acc = acc + xp[:, i:i + h, :]
    acc = acc * (1.0 / size)
    out = acc[:, :, 0:w]
    for i in range(1, size):
        out = out + acc[:, :, i:i + w]
    return out * (1.0 / size)


def local_variance(x: jnp.ndarray, size: int) -> jnp.ndarray:
    """max(E[x²] − E[x]², 0) over a size×size window."""
    m = box_filter(x, size)
    m2 = box_filter(x * x, size)
    return jnp.maximum(m2 - m * m, 0.0)


# Max unsharp radius is 3.0 (PARAM_BOUNDS) → kernel radius ≤ int(4·3+0.5)=12.
_GAUSS_MAX_RADIUS = 12


def _gauss_taps(sigma: jnp.ndarray, dtype) -> jnp.ndarray:
    """Fixed-support Gaussian taps for traced sigma (scalar or [N])."""
    r = _GAUSS_MAX_RADIUS
    taps = jnp.arange(-r, r + 1, dtype=dtype)
    sigma = jnp.asarray(sigma, dtype)
    if sigma.ndim == 1:
        taps = taps[None, :]
        sigma = sigma[:, None]
    radius_eff = jnp.floor(4.0 * sigma + 0.5)
    w = jnp.exp(-0.5 * jnp.square(taps / jnp.maximum(sigma, 1e-6)))
    w = jnp.where(jnp.abs(taps) <= radius_eff, w, 0.0)
    return w / jnp.sum(w, axis=-1, keepdims=True)


def shift_macs_rows(xp: jnp.ndarray, w: jnp.ndarray, h: int) -> jnp.ndarray:
    """Σₖ w[:,k]·xp[:,k:k+h,:] — one unrolled shifted-MAC sweep of
    per-image taps ``w`` [N,T] along rows of a pre-extended block.
    Tap-ascending accumulation order (bit-stable across call sites: the
    dense ``gaussian_blur`` n≤16 branch and both spatial halo layers)."""
    acc = None
    for k in range(w.shape[1]):
        t = w[:, k][:, None, None] * xp[:, k:k + h, :]
        acc = t if acc is None else acc + t
    return acc


def shift_macs_cols(xp: jnp.ndarray, w: jnp.ndarray, wd: int) -> jnp.ndarray:
    """Σₖ w[:,k]·xp[:,:,k:k+wd] — the column-sweep counterpart of
    :func:`shift_macs_rows`."""
    acc = None
    for k in range(w.shape[1]):
        t = w[:, k][:, None, None] * xp[:, :, k:k + wd]
        acc = t if acc is None else acc + t
    return acc


def gaussian_blur(x: jnp.ndarray, sigma: jnp.ndarray) -> jnp.ndarray:
    """Separable Gaussian with *traced* sigma on a fixed support.

    Matches skimage ``gaussian(mode='nearest', truncate=4)``: taps beyond
    ``int(4σ+0.5)`` are masked to exactly zero, so a dynamic sigma never
    changes the compiled program.  Ref pipeline/enhancement.py:202-205.

    Batch-size dispatch (hardware-swept at 512², docs/PERF.md round 3):
    the batch-as-channels grouped conv needs many channels to tile onto
    the MXU (n=32: 1.15 ms conv vs 1.29 shift-MAC; at 128×512² it is 11×
    a plain conv) but is PATHOLOGICAL at small batch — n=1 costs 18.4 ms
    (73 ms at 1024²) while unrolled shift-MACs are sub-ms at n≤16.  The
    single-image runner and the LLM tuning loop run at n=1.
    """
    r = _GAUSS_MAX_RADIUS
    n, h, wd = x.shape
    sigma = jnp.broadcast_to(
        jnp.asarray(sigma, x.dtype).reshape(-1), (n,))
    w = _gauss_taps(sigma, x.dtype)
    if n <= 16:
        # Sequential per-axis padding: the row sweep runs on the
        # lane-aligned original width (docs/PERF.md dead ends).
        xp = jnp.pad(x, ((0, 0), (r, r), (0, 0)), mode="edge")
        acc = shift_macs_rows(xp, w, h)
        acc = jnp.pad(acc, ((0, 0), (0, 0), (r, r)), mode="edge")
        return shift_macs_cols(acc, w, wd)
    xp = jnp.pad(x, ((0, 0), (r, r), (r, r)), mode="edge")[None]  # [1,N,H+2r,W+2r]
    kc = w.reshape(n, 1, 2 * r + 1, 1)
    kr = w.reshape(n, 1, 1, 2 * r + 1)
    out = lax.conv_general_dilated(
        xp, kc, (1, 1), "VALID", dimension_numbers=_DN,
        feature_group_count=n, precision=lax.Precision.HIGHEST)
    out = lax.conv_general_dilated(
        out, kr, (1, 1), "VALID", dimension_numbers=_DN,
        feature_group_count=n, precision=lax.Precision.HIGHEST)
    return out[0]


def unsharp_mask(x: jnp.ndarray, radius: jnp.ndarray, amount: jnp.ndarray,
                 impl: str | None = None) -> jnp.ndarray:
    """clip(x + (x − gaussian(x, radius))·amount, 0, 1)
    (ref pipeline/enhancement.py:202; skimage clips to the [0,1] value
    range when preserve_range=False).

    On TPU at ≤1024² the whole op can run as one fused VMEM-resident
    Pallas kernel (mdx/ops/pallas_kernels.py unsharp_tpu — identical
    formula and accumulation order); MDX_UNSHARP_IMPL gates it, with
    auto = the measured policy (conv until the hardware A/B runs).
    ``impl`` pins one lowering over the env knob (A/B tooling); an
    explicit 'pallas' pin that cannot dispatch (non-TPU backend or image
    above the VMEM size limit) raises rather than silently timing the
    XLA lowering — a discarded pin would turn an A/B into same-vs-same."""
    from mdx.ops.pallas_kernels import (
        _UNSHARP_WHOLE_LIMIT,
        on_tpu_backend,
        tv_band_for,
        unsharp_banded_tpu,
        unsharp_tpu,
        unsharp_use_pallas,
    )

    on_tpu = on_tpu_backend()
    h, w = x.shape[-2:]
    # whole-image kernel only at the ≤512² class (its scoped-VMEM ask at
    # 4×1024² measured 114.93M vs the 100M limit); above it the banded
    # kernel (bit-identical) covers any H a band divides
    whole = h * w <= _UNSHARP_WHOLE_LIMIT
    band = 0 if whole else tv_band_for(h)
    kind = "whole" if whole else "banded"
    if on_tpu and unsharp_use_pallas(impl, kind):
        if whole:
            return unsharp_tpu(x, radius, amount)
        if band:
            return unsharp_banded_tpu(x, radius, amount, band=band)
    if impl is not None and unsharp_use_pallas(impl, kind):
        raise ValueError(
            f"unsharp impl='pallas' pinned but not dispatchable: "
            f"backend {'tpu' if on_tpu else 'non-tpu'}, "
            f"h*w {h * w} vs whole limit {_UNSHARP_WHOLE_LIMIT}, "
            f"band {band}")
    amount = jnp.asarray(amount, x.dtype)
    if amount.ndim == 1:  # per-image
        amount = amount[:, None, None]
    return jnp.clip(x + (x - gaussian_blur(x, radius)) * amount, 0.0, 1.0)


def adjust_gamma(x: jnp.ndarray, gamma: jnp.ndarray) -> jnp.ndarray:
    """Power-law on [0,1] (ref pipeline/enhancement.py:194). Per-image gamma ok."""
    gamma = jnp.asarray(gamma, x.dtype)
    if gamma.ndim == 1:
        gamma = gamma[:, None, None]
    return jnp.power(jnp.maximum(x, 0.0), gamma)
