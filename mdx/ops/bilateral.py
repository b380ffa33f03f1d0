"""Batched bilateral filter (JAX) — ref pipeline/enhancement.py:102-143.

The reference's single biggest hot spot: a Python double loop over d² window
offsets.  Here the d² shifted multiply-accumulates are unrolled at trace
time into one fused XLA elementwise program (the diameter is static; the
sigmas are traced, optionally per-image).  Fused VMEM-resident Pallas
variants are dispatched on TPU behind ``MDX_BILATERAL_IMPL``:
whole-image (``bilateral_tpu``, ≤1024² — measured wash, auto=XLA) and
banded (``bilateral_banded_tpu``, >1024² — measured 1.9× at 4×2048²,
auto=ON; docs/PERF.md).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def _norm_d(d: int) -> int:
    """Reference diameter semantics: clamp to ≤9, force odd."""
    d = min(int(d), 9)
    if d % 2 == 0:
        d += 1
    return d


def bilateral(
    x: jnp.ndarray,
    d: int = 5,
    sigma_color: jnp.ndarray = 0.05,
    sigma_space: jnp.ndarray = 0.05,
    impl: str | None = None,
) -> jnp.ndarray:
    """Edge-preserving smoothing of [N,H,W]: spatial × intensity Gaussian.

    ``impl`` pins the TPU lowering ('xla'|'pallas') over the
    MDX_BILATERAL_IMPL env knob (A/B tooling)."""
    if d <= 0:
        return x
    d = _norm_d(d)
    r = d // 2
    n, h, w = x.shape
    from mdx.ops.pallas_kernels import (
        _WHOLE_IMAGE_LIMIT,
        bilateral_banded_tpu,
        bilateral_tpu,
        bilateral_use_pallas,
        on_tpu_backend,
        tv_band_for,
    )

    on_tpu = on_tpu_backend()
    whole = h * w <= _WHOLE_IMAGE_LIMIT
    band = 0 if whole else tv_band_for(h)
    kind = "whole" if whole else "banded"
    if on_tpu and bilateral_use_pallas(impl, kind):
        if whole:
            return bilateral_tpu(x, d, sigma_color, sigma_space)
        if band and h % band == 0:
            return bilateral_banded_tpu(x, d, sigma_color, sigma_space,
                                        band=band)
    if impl is not None and bilateral_use_pallas(impl, kind):
        # an explicitly pinned 'pallas' that cannot dispatch must raise —
        # silently timing the XLA lowering would corrupt an A/B
        import jax

        if not on_tpu:
            why = f"backend is {jax.default_backend()!r}, not tpu"
        elif band == 0:
            why = (f"no band divides h {h} (banded class: h*w {h * w} "
                   f"> whole-image limit {_WHOLE_IMAGE_LIMIT})")
        else:
            why = f"h {h} not divisible by band {band}"
        raise ValueError(
            f"bilateral impl='pallas' pinned but not dispatchable: {why}")
    sc = jnp.asarray(sigma_color, x.dtype)
    ss = jnp.asarray(sigma_space, x.dtype)
    if sc.ndim == 1:
        sc = sc[:, None, None]
    if ss.ndim == 1:
        ss = ss[:, None, None]
    inv_2sc2 = 1.0 / (2.0 * sc * sc)
    inv_2ss2d2 = 1.0 / (2.0 * ss * ss * float(d * d))

    padded = jnp.pad(x, ((0, 0), (r, r), (r, r)), mode="reflect")
    num = jnp.zeros_like(x)
    den = jnp.zeros_like(x)
    for dy in range(-r, r + 1):
        for dx in range(-r, r + 1):
            shifted = padded[:, r + dy:r + dy + h, r + dx:r + dx + w]
            sw = jnp.exp(-float(dx * dx + dy * dy) * inv_2ss2d2)
            iw = jnp.exp(-jnp.square(x - shifted) * inv_2sc2)
            wgt = sw * iw
            num = num + wgt * shifted
            den = den + wgt
    return num / (den + 1e-10)
