"""Device-side DICOM frame normalisation — raw integers in, [0,1] out.

The batch paths (BASELINE configs 3/5) are host→device **upload-bound**
through a remote-TPU tunnel (and still copy-bound over PCIe on a local
VM): shipping decoded float32 frames moves 2× (uint16) to 4× (uint8) the
bytes of the stored pixels.  This module reproduces the host pixel
pipeline — modality rescale → optional VOI window → MONOCHROME1
inversion → min-max normalisation (ref pipeline/dicom_io.py:29-91, PS3.3
C.11.2.1.2; host forms: mdx/io/dicom.py _pixels + mdx/io/normalize.py) —
as one fused device program over the RAW integer stack plus a handful of
per-frame f32 scalars, so only the stored bytes cross the link.

Parity: every step mirrors the host op order in float32; per-frame
scalars that the host derives from whole-stack reductions (the MONO1
inversion pivot, the windowless-fallback bounds) are computed host-side
from the raw integer min/max — monotone-exactly equal to reducing the
rescaled array (see mdx/io/dicom.py raw_ingest_descriptor).  The only
permitted divergence is XLA fusing the rescale into an FMA (≤1 ulp),
asserted ≤2e-6 in tests/test_ingest.py.
"""

from __future__ import annotations

import jax.numpy as jnp


def _col(v):
    return jnp.asarray(v, jnp.float32)[:, None, None]


def normalize_ingest(
    raw: jnp.ndarray,
    slope: jnp.ndarray,
    intercept: jnp.ndarray,
    mono1: jnp.ndarray,
    gmax: jnp.ndarray,
    use_window: jnp.ndarray,
    wlo: jnp.ndarray,
    wden: jnp.ndarray,
    nlo: jnp.ndarray,
    nhi: jnp.ndarray,
    *,
    per_frame_minmax: bool,
) -> jnp.ndarray:
    """Raw integer [N,H,W] + per-frame [N] scalars → float32 [0,1] frames.

    ``per_frame_minmax`` selects the non-window batch contract (each frame
    min-max normalised independently, ref dicom_io.py:84-91 applied per
    frame) vs the windowed contract (stored window applied where
    ``use_window``, else the stack-global bounds ``nlo``/``nhi``).
    """
    v = raw.astype(jnp.float32) * _col(slope) + _col(intercept)
    inv = _col(mono1) > 0

    # normalisation branch: MONO1 inverts about the stack max BEFORE the
    # min-max (host: image.max() - image, then normalize_image)
    z = jnp.where(inv, _col(gmax) - v, v)
    if per_frame_minmax:
        zlo = jnp.min(z, axis=(1, 2), keepdims=True)
        zhi = jnp.max(z, axis=(1, 2), keepdims=True)
    else:
        zlo, zhi = _col(nlo), _col(nhi)
    rng = zhi - zlo
    nout = jnp.where(rng < 1e-8, 0.0,
                     (z - zlo) / jnp.where(rng < 1e-8, 1.0, rng))

    if per_frame_minmax:
        return nout

    # windowed branch: linear VOI (PS3.3 C.11.2.1.2), then 1-x for MONO1
    w = jnp.clip((v - _col(wlo)) / _col(wden), 0.0, 1.0)
    w = jnp.where(inv, 1.0 - w, w)
    return jnp.where(_col(use_window) > 0, w, nout)
