"""Batched total-variation denoise, Chambolle projection (JAX).

Ref pipeline/enhancement.py:309-312 (skimage ``denoise_tv_chambolle``):
dual ascent with step 1/(2·ndim), stop when |E_prev − E| < eps·E_init or
after 200 iterations.  Expressed as ``lax.while_loop`` so the whole solve is
one compiled program; the per-image stop criterion is batched with a
converged-mask (converged images stop updating, loop exits when all have).
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax

# Relaxed-parity modes for the TV solve — the single largest dense-pass
# phase (~56% of the VPU roofline at 512², docs/PERF.md) is the
# content-dependent iteration count (~86 on noisy content); "fast" caps
# it.  "ref" is the reference's exact semantics
# (pipeline/enhancement.py:309-312, skimage denoise_tv_chambolle:
# eps=2e-4, ≤200 iterations) and stays the default everywhere — fast is
# strictly opt-in (MDX_TV_MODE=fast / PlanStatic.tv_mode).  The cap
# value comes from the measured speed-vs-quality curve in docs/PERF.md.
TV_MODES: dict[str, tuple[float, int]] = {
    "ref": (2e-4, 200),
    "fast": (2e-4, 40),
}


def resolve_tv_mode(tv_mode: "str | None" = None) -> str:
    """The effective TV mode: an explicit argument wins, else the
    ``MDX_TV_MODE`` env knob, else reference parity.  Validates so a
    typo'd env var fails loudly at plan lowering — shared by EVERY
    PlanStatic construction site (schemas, autotune, spatial plan) so
    the opt-in knob cannot be silently ignored on some path."""
    import os

    if tv_mode is None:
        tv_mode = os.environ.get("MDX_TV_MODE", "ref").strip().lower()
    tv_mode_params(tv_mode)  # validate
    return tv_mode


def tv_mode_params(mode: str) -> tuple[float, int]:
    """(eps, max_iter) for a TV mode name; unknown names raise (the knob
    is trace-time-only — a typo silently keeping the default would be
    invisible)."""
    try:
        return TV_MODES[mode]
    except KeyError:
        raise ValueError(
            f"MDX_TV_MODE/tv_mode={mode!r}: expected one of "
            f"{sorted(TV_MODES)}") from None


def tv_chambolle_xla(
    x: jnp.ndarray,
    weight: jnp.ndarray,
    eps: float = 2e-4,
    max_iter: int = 200,
) -> jnp.ndarray:
    n, h, w = x.shape
    weight = jnp.broadcast_to(jnp.asarray(weight, x.dtype), (n,))[:, None, None]
    size = float(h * w)
    tau = 0.25  # 1/(2·ndim), ndim = 2

    zrow = jnp.zeros((n, 1, w), x.dtype)
    zcol = jnp.zeros((n, h, 1), x.dtype)

    def _energy_and_out(p, first):
        if first:
            d = jnp.zeros_like(x)
            out = x
        else:
            # concat-style shifts: bit-identical to the .at[slice].add
            # form (same additions on the same elements) but fuses into
            # ~30% fewer HBM passes on TPU (measured 450 → 348 ms at
            # 16×2048²; XLA keeps the scatter-style updates as separate
            # dynamic-update-slice fusions)
            d = -(p[:, 0] + p[:, 1])
            d = d + jnp.concatenate([zrow, p[:, 0, :-1, :]], axis=1)
            d = d + jnp.concatenate([zcol, p[:, 1, :, :-1]], axis=2)
            out = x + d
        e = jnp.sum(d * d, axis=(1, 2))
        gy = jnp.concatenate([out[:, 1:, :] - out[:, :-1, :], zrow], axis=1)
        gx = jnp.concatenate([out[:, :, 1:] - out[:, :, :-1], zcol], axis=2)
        norm = jnp.sqrt(gy * gy + gx * gx)
        e = (e + weight[:, 0, 0] * jnp.sum(norm, axis=(1, 2))) / size
        return out, gy, gx, norm, e

    def _update_p(p, gy, gx, norm, active):
        scale = norm * tau / weight + 1.0
        new_p = jnp.stack([
            (p[:, 0] - tau * gy) / scale,
            (p[:, 1] - tau * gx) / scale,
        ], axis=1)
        return jnp.where(active[:, None, None, None], new_p, p)

    # iteration 0 (outside the loop: establishes E_init)
    p0 = jnp.zeros((n, 2, h, w), x.dtype)
    out0, gy, gx, norm, e0 = _energy_and_out(p0, first=True)
    p1 = _update_p(p0, gy, gx, norm, jnp.ones((n,), bool))

    def cond(state):
        i, p, out, e_prev, active = state
        return jnp.logical_and(i < max_iter, jnp.any(active))

    def body(state):
        i, p, out, e_prev, active = state
        new_out, gy, gx, norm, e = _energy_and_out(p, first=False)
        out = jnp.where(active[:, None, None], new_out, out)
        p = _update_p(p, gy, gx, norm, active)
        still = jnp.abs(e_prev - e) >= eps * e0
        active = jnp.logical_and(active, still)
        e_prev = jnp.where(active, e, e_prev)
        return (i + 1, p, out, e_prev, active)

    _, _, out, _, _ = lax.while_loop(
        cond, body, (jnp.asarray(1), p1, out0, e0, jnp.ones((n,), bool)))
    return out


def tv_chambolle(
    x: jnp.ndarray,
    weight: jnp.ndarray,
    eps: float = 2e-4,
    max_iter: int = 200,
) -> jnp.ndarray:
    """Platform-dispatching TV denoise.

    On TPU the dual-ascent solve runs as a VMEM-resident Pallas kernel
    (mdx/ops/pallas_kernels.py) — the XLA while_loop streams ~10 full-image
    HBM buffers per iteration; keeping the state on-chip makes iterations
    VPU-bound.  Parity ≤1e-7 (tests/test_pallas.py)."""
    from mdx.ops.pallas_kernels import on_tpu_backend

    on_tpu = on_tpu_backend()
    h, w = x.shape[-2:]
    # the kernel keeps x/out/p0/p1 (+temps) in VMEM — safe up to 1024²
    # with the raised scoped-VMEM limit (measured: 0.3 ms vs the XLA
    # while_loop's 7.7 ms at 4×1024²; 2048² exceeds physical VMEM and
    # fails to compile — larger images use the banded per-iteration
    # kernel (one pallas_call per Chambolle iteration, row bands through
    # VMEM, halo rows snapshotted in XLA) when a band divides H, else
    # the XLA while_loop
    if on_tpu:
        if h * w <= 1024 * 1024:
            from mdx.ops.pallas_kernels import tv_chambolle_tpu

            return tv_chambolle_tpu(x, weight, eps=eps, max_iter=max_iter)
        from mdx.ops.pallas_kernels import tv_band_for, tv_chambolle_banded

        band = tv_band_for(h)
        if band:
            return tv_chambolle_banded(x, weight, eps=eps,
                                       max_iter=max_iter, band=band)
    return tv_chambolle_xla(x, weight, eps=eps, max_iter=max_iter)
