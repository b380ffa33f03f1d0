"""Batched separable 2-D DWT / BayesShrink wavelet denoising (JAX).

Mirrors the conventions of ``mdx.refimpl.wavelet_np`` (symmetric half-sample
extension, analysis length ``floor((n+L−1)/2)``, orthogonal reconstruction),
which itself encodes the PyWavelets behaviour the reference relies on:

* ``estimate_sigma`` — ref pipeline/metrics.py:47 (db2 HH MAD / Φ⁻¹(0.75))
* ``denoise_wavelet`` — ref pipeline/enhancement.py:169-174 (db1 BayesShrink)

All transforms are batched over [N, H, W]; decomposition depth is static
(derived from the static shape) so the whole multi-level denoise compiles to
one XLA program.  Thresholds are per-image traced scalars.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp
from jax import lax

from mdx.refimpl.wavelet_np import MAD_TO_SIGMA, qmf_pair, max_level

_DN = lax.conv_dimension_numbers((1, 1, 1, 1), (1, 1, 1, 1), ("NCHW", "OIHW", "NCHW"))


def _filters(wavelet: str, dtype):
    lo, hi = qmf_pair(wavelet)
    return (jnp.asarray(lo, dtype), jnp.asarray(hi, dtype))


def strided_taps_mac(ext: jnp.ndarray, taps, n_out: int,
                     axis: int) -> jnp.ndarray:
    """Σᵢ taps[i]·ext[…, i:i+2·n_out:2, …] along ``axis`` (1 or 2) — the
    strided shift-MAC analysis sweep on a pre-extended [N, H, W] signal
    (the same lowering as :func:`_analysis_last`, measured 2.2× XLA's
    strided conv; the n=1 strided conv it replaces in the spatial halo
    layers cost ~19 ms at 1×2048², docs/PERF.md round 3).  ``taps`` are
    passed already time-reversed; tap-ascending accumulation order."""
    acc = None
    for i in range(len(taps)):
        if axis == 1:
            s = ext[:, i:i + 2 * n_out:2, :][:, :n_out]
        else:
            s = ext[:, :, i:i + 2 * n_out:2][:, :, :n_out]
        t = jnp.asarray(taps[i], ext.dtype) * s
        acc = t if acc is None else acc + t
    return acc


def _analysis_last(x: jnp.ndarray, wavelet: str):
    """One analysis step along the last axis of [..., n] → (a, d).

    Strided shift-MAC instead of a strided conv: output j is
    ``Σ_i k_rev[i] · ext[2j+i]``, i.e. L strided slices each multiplied by
    one static tap, sharing the slice between the lo and hi filters —
    measured 2.2× faster than XLA's strided-conv lowering for the full
    db2 dwt2 at 128×512² (7.3 → 3.3 ms)."""
    lo, hi = qmf_pair(wavelet)
    L = len(lo)
    n = x.shape[-1]
    pad = [(0, 0)] * (x.ndim - 1) + [(L - 1, L - 1)]
    ext = jnp.pad(x, pad, mode="symmetric")[..., 1:]
    n_out = (n + L - 1) // 2
    lo_r, hi_r = lo[::-1], hi[::-1]
    a = d = None
    for i in range(L):
        s = ext[..., i:i + 2 * n_out:2][..., :n_out]
        ta = jnp.asarray(lo_r[i], x.dtype) * s
        td = jnp.asarray(hi_r[i], x.dtype) * s
        a = ta if a is None else a + ta
        d = td if d is None else d + td
    return a, d


def _synthesis_last(a: jnp.ndarray, d: jnp.ndarray, wavelet: str, n_out: int):
    """Inverse of :func:`_analysis_last`, cropped to n_out samples.

    Polyphase shift-MAC: writing the upsample-then-convolve form out by
    output parity (out[2q] = Σ_p lo[2p+1]·a[q+p] + hi[2p+1]·d[q+p];
    out[2q+1] = Σ_p lo[2p]·a[q+p] + hi[2p]·d[q+p]) removes both the
    strided-scatter upsample and the conv — L/2 shared slices per parity,
    interleaved at the end.  Bit-exact vs the conv form for db1/db2 at
    every length (even/odd) — same taps, same add order per output."""
    lo, hi = qmf_pair(wavelet)
    half = len(lo) // 2
    n_even = (n_out + 1) // 2
    pad = [(0, 0)] * (a.ndim - 1) + [(0, half)]
    ap = jnp.pad(a, pad)
    dp = jnp.pad(d, pad)
    even = odd = None
    for p in range(half):
        sa = ap[..., p:p + n_even]
        sd = dp[..., p:p + n_even]
        te = (jnp.asarray(lo[2 * p + 1], a.dtype) * sa
              + jnp.asarray(hi[2 * p + 1], a.dtype) * sd)
        to = (jnp.asarray(lo[2 * p], a.dtype) * sa
              + jnp.asarray(hi[2 * p], a.dtype) * sd)
        even = te if even is None else even + te
        odd = to if odd is None else odd + to
    inter = jnp.stack([even, odd], axis=-1)
    return inter.reshape(a.shape[:-1] + (2 * n_even,))[..., :n_out]


def _swap_hw(x):
    return jnp.swapaxes(x, -1, -2)


def dwt2(x: jnp.ndarray, wavelet: str = "db1"):
    """Single-level batched 2-D DWT of [N,H,W] → (LL, (LH, HL, HH))."""
    a, d = _analysis_last(_swap_hw(x), wavelet)       # along H
    a, d = _swap_hw(a), _swap_hw(d)
    ll, lh = _analysis_last(a, wavelet)               # along W
    hl, hh = _analysis_last(d, wavelet)
    return ll, (lh, hl, hh)


def idwt2(ll, details, wavelet: str, out_shape):
    h, w = out_shape
    lh, hl, hh = details
    a = _synthesis_last(ll, lh, wavelet, w)
    d = _synthesis_last(hl, hh, wavelet, w)
    return _swap_hw(_synthesis_last(_swap_hw(a), _swap_hw(d), wavelet, h))


def wavedec2(x: jnp.ndarray, wavelet: str, level: int):
    shapes, details = [], []
    ll = x
    for _ in range(level):
        shapes.append(ll.shape[-2:])
        ll, det = dwt2(ll, wavelet)
        details.append(det)
    return ll, details[::-1], shapes[::-1]


def waverec2(ll, details, shapes, wavelet: str):
    for det, shp in zip(details, shapes):
        ll = idwt2(ll, det, wavelet, shp)
    return ll


# ---------------------------------------------------------------------------
# Noise sigma + BayesShrink denoise
# ---------------------------------------------------------------------------


def mad_sigma_from_hh(hh: jnp.ndarray) -> jnp.ndarray:
    """Per-image MAD noise sigma [N] from a finest-HH subband [N,h,w]:
    median|HH| / Φ⁻¹(0.75) (PyWavelets/skimage convention).  The single
    home of this formula — shared by :func:`estimate_sigma`, both
    denoise_wavelet branches, and the A/B tooling/tests."""
    from mdx.ops.quantile import median_rows

    n = hh.shape[0]
    return median_rows(jnp.abs(hh.reshape(n, -1))) * jnp.asarray(
        MAD_TO_SIGMA, hh.dtype)


def estimate_sigma(x: jnp.ndarray) -> jnp.ndarray:
    """Per-image wavelet-MAD noise sigma, [N] (ref pipeline/metrics.py:47)."""
    _, (_, _, hh) = dwt2(x, "db2")
    return mad_sigma_from_hh(hh)


def _soft(x, t):
    return jnp.sign(x) * jnp.maximum(jnp.abs(x) - t, 0.0)


def _hard(x, t):
    return jnp.where(jnp.abs(x) > t, x, 0.0)


_LEVEL_OFFSET = 3  # levels = max_level − 3, min 1 (skimage convention)


def default_levels(shape: tuple[int, int], wavelet: str = "db1") -> int:
    return max(max_level(shape, wavelet) - _LEVEL_OFFSET, 1)


def denoise_wavelet(
    x: jnp.ndarray,
    sigma: jnp.ndarray | None = None,
    mode: str = "soft",
    wavelet: str = "db1",
    wavelet_levels: int | None = None,
    soft_mask: jnp.ndarray | None = None,
    impl: str | None = None,
) -> jnp.ndarray:
    """Batched BayesShrink wavelet denoise of [N,H,W].

    ``sigma`` may be None (estimated per image from the finest HH subband),
    a scalar, or a per-image [N] vector.  ``soft_mask`` ([N] bool) optionally
    selects soft/hard thresholding per image (overrides ``mode``), enabling
    mixed-mode candidate batches in the tuning loop.

    On TPU, db1 on 2^levels-divisible extents ≤1024² can run the whole
    transform chain as one fused VMEM-resident Pallas kernel
    (``wavelet_denoise_tpu``) behind MDX_WAVELET_IMPL (auto = XLA until
    the hardware A/B); ``impl`` pins one lowering (an undispatchable
    explicit 'pallas' pin raises — see the unsharp/bilateral precedent).
    """
    n = x.shape[0]
    if wavelet_levels is None:
        wavelet_levels = default_levels(x.shape[-2:], wavelet)

    from mdx.ops.pallas_kernels import (
        _WHOLE_IMAGE_LIMIT,
        on_tpu_backend,
        wavelet_denoise_tpu,
        wavelet_use_pallas,
    )

    h, w = x.shape[-2:]
    div = 1 << wavelet_levels
    kernel_ok = (wavelet == "db1" and h % div == 0 and w % div == 0
                 and h * w <= _WHOLE_IMAGE_LIMIT)
    if wavelet_use_pallas(impl) and kernel_ok and on_tpu_backend():
        if sigma is None:
            sigma = mad_sigma_from_hh(dwt2(x, wavelet)[1][2])
        soft = (soft_mask if soft_mask is not None
                else jnp.full((n,), mode == "soft", bool))
        return wavelet_denoise_tpu(x, sigma, soft, wavelet_levels)
    if impl is not None and wavelet_use_pallas(impl):
        raise ValueError(
            f"wavelet impl='pallas' pinned but not dispatchable: "
            f"backend {'tpu' if on_tpu_backend() else 'non-tpu'}, "
            f"wavelet {wavelet}, extents {h}x{w} vs 2^{wavelet_levels} "
            f"divisibility and limit {_WHOLE_IMAGE_LIMIT}")
    ll, details, shapes = wavedec2(x, wavelet, wavelet_levels)
    if sigma is None:
        sigma = mad_sigma_from_hh(details[-1][2])
    sigma = jnp.broadcast_to(jnp.asarray(sigma, x.dtype), (n,))
    noise_var = sigma * sigma
    eps = jnp.asarray(np.finfo(np.float32).eps, x.dtype)

    def _shrink(band):
        dvar = jnp.mean(band.reshape(n, -1) ** 2, axis=-1)
        t = (noise_var / jnp.sqrt(jnp.maximum(dvar - noise_var, eps)))[:, None, None]
        if soft_mask is not None:
            return jnp.where(soft_mask[:, None, None], _soft(band, t), _hard(band, t))
        return _soft(band, t) if mode == "soft" else _hard(band, t)

    new_details = [tuple(_shrink(b) for b in det) for det in details]
    return waverec2(ll, new_details, shapes, wavelet)
