"""Property fuzz over the sharded enhancement chain: random op subsets,
parameters, mesh layouts, and shapes must match the dense composition.
The per-op suites pin each op's parity; this guards the INTEGRATION —
op ordering, gate plumbing, and halo interactions between ops."""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp
import pytest

from mdx.parallel import make_mesh, make_mesh2d, spatial, spatial2d


def _dense_chain(x, kw):
    from mdx.core.enhance import light_denoise
    from mdx.ops import filters as F
    from mdx.ops.bilateral import bilateral as dense_bilateral
    from mdx.ops.clahe import clahe_xla
    from mdx.ops.tv import tv_chambolle_xla
    from mdx.ops.wavelet import denoise_wavelet

    y = x
    if kw.get("denoise"):
        y = jnp.clip(denoise_wavelet(y), 0.0, 1.0)
    if kw.get("clahe_clip_limit") is not None:
        y = clahe_xla(jnp.clip(y, 0, 1),
                      jnp.float32(kw["clahe_clip_limit"]), tile_size=16)
    y = jnp.power(jnp.maximum(y, 0.0), jnp.float32(kw.get("gamma", 1.0)))
    y = jnp.clip(F.unsharp_mask(
        y, jnp.float32(kw.get("unsharp_radius", 0.8)),
        jnp.float32(kw.get("unsharp_amount", 0.5))), 0.0, 1.0)
    if kw.get("post_denoise_strength") is not None:
        y = light_denoise(y, jnp.float32(kw["post_denoise_strength"]))
    if kw.get("bilateral_d", 0) > 0:
        n = x.shape[0]
        y = dense_bilateral(
            jnp.clip(y, 0, 1), kw["bilateral_d"],
            jnp.full((n,), kw.get("bilateral_sigma_color", 0.05),
                     jnp.float32),
            jnp.full((n,), kw.get("bilateral_sigma_space", 0.05),
                     jnp.float32))
    if kw.get("tv_weight") is not None:
        y = tv_chambolle_xla(jnp.clip(y, 0, 1),
                             jnp.float32(kw["tv_weight"]))
    return jnp.clip(y, 0.0, 1.0)


_CASES = [
    # (seed, shape, mesh kind, kwargs)
    (0, (2, 64, 64), "1d", dict(denoise=True, gamma=1.05,
                                unsharp_amount=0.4)),
    (1, (1, 64, 96), "1d", dict(clahe_clip_limit=0.03, tv_weight=0.08,
                                bilateral_d=5)),
    (2, (2, 64, 64), "2d", dict(denoise=True, clahe_clip_limit=0.015,
                                post_denoise_strength=0.4)),
    (3, (1, 96, 64), "2d", dict(gamma=0.9, unsharp_amount=0.7,
                                tv_weight=0.03)),
    (4, (1, 64, 64), "2d", dict(denoise=True, clahe_clip_limit=0.02,
                                gamma=0.95, unsharp_amount=0.5,
                                post_denoise_strength=0.3, bilateral_d=3,
                                tv_weight=0.05)),
]


@pytest.mark.parametrize("seed,shape,kind,kw", _CASES)
def test_sharded_chain_matches_dense(seed, shape, kind, kw):
    r = np.random.default_rng(seed)
    n, h, w = shape
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float64)
    base = 0.45 + 0.25 * np.sin(xx / 13.0) * np.cos(yy / 9.0)
    x = jnp.asarray(np.clip(
        base[None] + r.normal(0, 0.1, (n, h, w)), 0, 1).astype(np.float32))
    if kind == "1d":
        mesh = make_mesh(n_data=1, n_space=4)
        got = spatial.enhance_spatial(x, mesh, **kw)
    else:
        mesh = make_mesh2d(n_data=1, n_sy=2, n_sx=2)
        got = spatial2d.enhance_spatial2d(x, mesh, **kw)
    want = _dense_chain(x, kw)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=5e-5)
