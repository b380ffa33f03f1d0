"""Pallas kernel parity tests (interpreter mode on the CPU backend).

The TPU kernels must be numerically interchangeable with the golden-tested
XLA implementations; interpret=True exercises the exact kernel logic
without TPU hardware.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp
import pytest

from mdx.ops.clahe import clahe_xla
from mdx.ops.pallas_kernels import clahe_tpu


@pytest.fixture()
def batch(noisy_image, low_contrast_image):
    return jnp.stack([jnp.asarray(noisy_image, jnp.float32),
                      jnp.asarray(low_contrast_image, jnp.float32)])


class TestClahePallas:
    def test_matches_xla_tile16(self, batch):
        clip = jnp.asarray([0.02, 0.05], jnp.float32)
        a = clahe_xla(batch, clip, 16)
        b = clahe_tpu(batch, clip, 16, interpret=True)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-6)

    def test_matches_xla_tile8(self, batch):
        clip = jnp.asarray([0.03, 0.03], jnp.float32)
        a = clahe_xla(batch, clip, 8)
        b = clahe_tpu(batch, clip, 8, interpret=True)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-6)

    def test_non_tile_multiple_padding(self, batch):
        x = batch[:, :60, :52]
        clip = jnp.asarray([0.02, 0.02], jnp.float32)
        a = clahe_xla(x, clip, 16)
        b = clahe_tpu(x, clip, 16, interpret=True)
        assert b.shape == x.shape
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-6)

    def test_matches_refimpl(self, noisy_image):
        from mdx.refimpl.filters_np import clahe as clahe_np

        ref = clahe_np(np.asarray(noisy_image, np.float64), 0.02, 16)
        got = clahe_tpu(jnp.asarray(noisy_image, jnp.float32)[None],
                        jnp.asarray([0.02]), 16, interpret=True)
        np.testing.assert_allclose(np.asarray(got)[0], ref, atol=2e-5)


    def test_range_preserved(self, batch):
        out = clahe_tpu(batch, jnp.asarray([0.08, 0.08]), 16,
                        interpret=True)
        o = np.asarray(out)
        assert o.min() >= -1e-6 and o.max() <= 1.0 + 1e-6


class TestTvPallas:
    def test_matches_xla(self, batch):
        from mdx.ops.pallas_kernels import tv_chambolle_tpu
        from mdx.ops.tv import tv_chambolle_xla

        w = jnp.asarray([0.05, 0.12], jnp.float32)
        a = tv_chambolle_xla(batch, w)
        b = tv_chambolle_tpu(batch, w, interpret=True)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)

    def test_matches_refimpl(self, noisy_image):
        from mdx.refimpl.filters_np import tv_chambolle as tv_np
        from mdx.ops.pallas_kernels import tv_chambolle_tpu

        ref = tv_np(np.asarray(noisy_image, np.float64), 0.08)
        got = tv_chambolle_tpu(jnp.asarray(noisy_image, jnp.float32)[None],
                               jnp.asarray([0.08]), interpret=True)
        np.testing.assert_allclose(np.asarray(got)[0], ref, atol=1e-5)

    def test_zero_weightish_is_gentle(self, clean_image):
        from mdx.ops.pallas_kernels import tv_chambolle_tpu

        x = jnp.asarray(clean_image, jnp.float32)[None]
        out = tv_chambolle_tpu(x, jnp.asarray([1e-6]), interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(x), atol=1e-3)


class TestTvBanded:
    """Per-iteration banded kernel for slices whose state exceeds VMEM."""

    def test_banded_matches_xla(self):
        from mdx.ops.pallas_kernels import tv_chambolle_banded
        from mdx.ops.tv import tv_chambolle_xla

        rng = np.random.default_rng(7)
        x = jnp.asarray(
            np.clip(rng.normal(0.5, 0.15, (3, 256, 192)), 0, 1), jnp.float32)
        w = jnp.asarray([0.08, 0.12, 0.05], jnp.float32)
        a = tv_chambolle_xla(x, w)
        b = tv_chambolle_banded(x, w, band=64, interpret=True)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)

    def test_banded_fixed_trips(self):
        # at a fixed trip count the energy partials (reduced band-first)
        # cannot perturb the stop test, so outputs match to float32 ulps
        from mdx.ops.pallas_kernels import tv_chambolle_banded
        from mdx.ops.tv import tv_chambolle_xla

        rng = np.random.default_rng(8)
        x = jnp.asarray(
            np.clip(rng.normal(0.5, 0.1, (2, 128, 256)), 0, 1), jnp.float32)
        w = jnp.asarray([0.1, 0.07], jnp.float32)
        a = tv_chambolle_xla(x, w, eps=0.0, max_iter=9)
        b = tv_chambolle_banded(x, w, eps=0.0, max_iter=9, band=64,
                                interpret=True)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-7)

    def test_per_image_convergence(self):
        # wildly different weights → per-image trip counts diverge; the
        # copy-through (aliased outputs + active gating) must freeze the
        # converged image's out/p exactly as the XLA while_loop does
        from mdx.ops.pallas_kernels import tv_chambolle_banded
        from mdx.ops.tv import tv_chambolle_xla

        rng = np.random.default_rng(9)
        x = jnp.asarray(
            np.clip(rng.normal(0.5, 0.2, (2, 128, 128)), 0, 1), jnp.float32)
        w = jnp.asarray([0.01, 0.3], jnp.float32)
        a = tv_chambolle_xla(x, w)
        b = tv_chambolle_banded(x, w, band=64, interpret=True)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)

    def test_band_for(self):
        from mdx.ops.pallas_kernels import tv_band_for

        assert tv_band_for(2048) == 256
        assert tv_band_for(1536) == 256
        assert tv_band_for(1152) == 128
        assert tv_band_for(1000) == 0


class TestClaheBanded:
    def test_banded_matches_xla(self, batch):
        from mdx.ops import pallas_kernels as PK

        clip = jnp.asarray([0.02, 0.05], jnp.float32)
        a = clahe_xla(batch, clip, 16)
        b = PK._clahe_banded(jnp.clip(batch, 0, 1), clip, 16, 256,
                             interpret=True)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-6)

    def test_banded_tile8(self, batch):
        from mdx.ops import pallas_kernels as PK

        clip = jnp.asarray([0.03, 0.03], jnp.float32)
        a = clahe_xla(batch, clip, 8)
        b = PK._clahe_banded(jnp.clip(batch, 0, 1), clip, 8, 256,
                             interpret=True)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-6)

    def test_dispatch_threshold(self):
        # raised to the 1024² class with the scoped-VMEM bump (round 3);
        # 2048²-class whole-image state exceeds physical VMEM
        from mdx.ops import pallas_kernels as PK

        assert 1024 * 1024 <= PK._WHOLE_IMAGE_LIMIT < 2048 * 2048


class TestClaheTileSizeEdges:
    """PARAM_BOUNDS allows clahe_tile_size ∈ [4, 48]; the kernels must be
    correct at the extremes, including non-divisible padding."""

    @pytest.mark.parametrize("tile", [4, 48])
    def test_whole_image_kernel(self, batch, tile):
        clip = jnp.asarray([0.02, 0.04], jnp.float32)
        a = clahe_xla(batch, clip, tile)
        b = clahe_tpu(batch, clip, tile, interpret=True)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)

    @pytest.mark.parametrize("tile", [4, 48])
    def test_banded_kernel(self, batch, tile):
        from mdx.ops import pallas_kernels as PK

        clip = jnp.asarray([0.02, 0.04], jnp.float32)
        pad_h = (-batch.shape[1]) % tile
        pad_w = (-batch.shape[2]) % tile
        xp = jnp.clip(batch, 0, 1)
        if pad_h or pad_w:
            xp = jnp.pad(xp, ((0, 0), (0, pad_h), (0, pad_w)),
                         mode="reflect")
        a = clahe_xla(batch, clip, tile)
        b = PK._clahe_banded(xp, clip, tile, 256, interpret=True)[
            :, :batch.shape[1], :batch.shape[2]]
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


class TestBoxStatsKernel:
    def test_interpret_parity_vs_xla_formulas(self):
        """box_stats_tpu (interpret) == the XLA local-variance reductions
        it replaces in image_stats (same shift-add order, fp-association
        tolerance)."""
        from mdx.ops.filters import local_variance
        from mdx.ops.pallas_kernels import box_stats_tpu

        rng = np.random.default_rng(5)
        for shape in ((3, 64, 96), (2, 96, 64), (1, 128, 128)):
            x = jnp.asarray(
                np.clip(rng.normal(0.5, 0.2, shape), 0, 1), jnp.float32)
            lcs, m16, s16 = box_stats_tpu(x, interpret=True)

            lv7s = jnp.sqrt(local_variance(x, 7)).reshape(shape[0], -1)
            want_lcs = jnp.std(lv7s, axis=-1)
            lv16 = local_variance(x, 16).reshape(shape[0], -1)
            np.testing.assert_allclose(np.asarray(lcs),
                                       np.asarray(want_lcs),
                                       rtol=1e-5, atol=1e-6)
            np.testing.assert_allclose(np.asarray(m16),
                                       np.asarray(jnp.mean(lv16, -1)),
                                       rtol=1e-5, atol=1e-7)
            np.testing.assert_allclose(np.asarray(s16),
                                       np.asarray(jnp.std(lv16, -1)),
                                       rtol=1e-5, atol=1e-7)


class TestUnsharpPallas:
    """Fused VMEM-resident unsharp kernel (pallas_kernels.unsharp_tpu)."""

    def test_matches_shift_mac_branch(self, batch):
        from mdx.ops.filters import unsharp_mask
        from mdx.ops.pallas_kernels import unsharp_tpu

        rad = jnp.asarray([1.0, 2.5], jnp.float32)
        amt = jnp.asarray([0.6, 1.2], jnp.float32)
        want = unsharp_mask(batch, rad, amt)   # n<=16 → shift-MAC branch
        got = unsharp_tpu(batch, rad, amt, interpret=True)
        np.testing.assert_allclose(np.asarray(want), np.asarray(got),
                                   atol=1e-6)

    @pytest.mark.parametrize("h,w", [(96, 80), (33, 129), (100, 36)])
    def test_shape_fuzz(self, h, w):
        from mdx.ops.filters import unsharp_mask
        from mdx.ops.pallas_kernels import unsharp_tpu

        r = np.random.default_rng(h * 7 + w)
        x = jnp.asarray(r.random((3, h, w), np.float32))
        rad = jnp.asarray([0.6, 1.7, 3.0], jnp.float32)
        amt = jnp.asarray([0.3, 0.9, 1.5], jnp.float32)
        want = unsharp_mask(x, rad, amt)
        got = unsharp_tpu(x, rad, amt, interpret=True)
        np.testing.assert_allclose(np.asarray(want), np.asarray(got),
                                   atol=1e-6, err_msg=f"{h}x{w}")

    def test_matches_refimpl(self, noisy_image):
        from mdx.ops.pallas_kernels import unsharp_tpu
        from mdx.refimpl.filters_np import unsharp_mask as unsharp_np

        x = jnp.asarray(noisy_image, jnp.float32)[None]
        got = unsharp_tpu(x, jnp.asarray([1.0]), jnp.asarray([0.6]),
                          interpret=True)
        ref = unsharp_np(np.asarray(noisy_image, np.float64), 1.0, 0.6)
        np.testing.assert_allclose(np.asarray(got)[0], ref, atol=2e-6)

    def test_scalar_params_and_range(self, batch):
        from mdx.ops.pallas_kernels import unsharp_tpu

        out = np.asarray(unsharp_tpu(batch, 2.0, 1.5, interpret=True))
        assert out.min() >= -1e-6 and out.max() <= 1.0 + 1e-6

    def test_tpu_lowering_stays_supported(self, batch):
        """Client-side Pallas→Mosaic lowering at the aligned product
        shape and a non-aligned one (jax.export(platforms=['tpu'])
        runs the client-side Mosaic MLIR lowering)."""
        import jax

        from mdx.ops.pallas_kernels import unsharp_tpu

        rad = jnp.asarray([1.0, 2.0], jnp.float32)
        amt = jnp.asarray([0.5, 0.8], jnp.float32)
        for shape in ((2, 512, 512), (2, 96, 80)):
            x = jnp.zeros(shape, jnp.float32)
            jax.export.export(
                jax.jit(lambda v, r, a: unsharp_tpu(v, r, a)),
                platforms=["tpu"])(x, rad, amt)

    def test_impl_knob(self, monkeypatch):
        from mdx.ops import pallas_kernels as PK

        monkeypatch.delenv("MDX_UNSHARP_IMPL", raising=False)
        assert PK.unsharp_use_pallas() is PK._AUTO_UNSHARP_PALLAS["whole"]
        assert (PK.unsharp_use_pallas(kind="banded")
                is PK._AUTO_UNSHARP_PALLAS["banded"])
        monkeypatch.setenv("MDX_UNSHARP_IMPL", "pallas")
        assert PK.unsharp_use_pallas()
        monkeypatch.setenv("MDX_UNSHARP_IMPL", "xla")
        assert not PK.unsharp_use_pallas()
        # explicit impl= pins the lowering over the env knob (A/B tooling)
        assert PK.unsharp_use_pallas(impl="pallas")
        monkeypatch.setenv("MDX_UNSHARP_IMPL", "pallas")
        assert not PK.unsharp_use_pallas(impl="xla")
        monkeypatch.setenv("MDX_UNSHARP_IMPL", "palas")
        with pytest.raises(ValueError, match="MDX_UNSHARP_IMPL"):
            PK.unsharp_use_pallas()

    def test_knob_routes_unsharp_mask(self, batch, monkeypatch):
        """On a (faked) TPU backend with MDX_UNSHARP_IMPL=pallas, the
        dense op routes through unsharp_tpu; parity unchanged."""
        import jax

        from mdx.ops import filters as F
        from mdx.ops import pallas_kernels as PK

        rad = jnp.asarray([1.0, 2.0], jnp.float32)
        amt = jnp.asarray([0.6, 0.9], jnp.float32)
        want = F.unsharp_mask(batch, rad, amt)  # real CPU path first

        monkeypatch.setenv("MDX_UNSHARP_IMPL", "pallas")
        monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
        calls = []
        real = PK.unsharp_tpu
        monkeypatch.setattr(
            PK, "unsharp_tpu",
            lambda v, r, a: (calls.append(1),
                             real(v, r, a, interpret=True))[1])
        got = F.unsharp_mask(batch, rad, amt)
        assert calls
        np.testing.assert_allclose(np.asarray(want), np.asarray(got),
                                   atol=1e-6)


class TestBilateralPallas:
    """Fused VMEM-resident bilateral kernel (pallas_kernels.bilateral_tpu)."""

    def test_matches_xla(self, batch):
        from mdx.ops.bilateral import bilateral
        from mdx.ops.pallas_kernels import bilateral_tpu

        sc = jnp.asarray([0.05, 0.12], jnp.float32)
        ss = jnp.asarray([0.05, 0.08], jnp.float32)
        want = bilateral(batch, 5, sc, ss)
        got = bilateral_tpu(batch, 5, sc, ss, interpret=True)
        np.testing.assert_allclose(np.asarray(want), np.asarray(got),
                                   atol=1e-6)

    @pytest.mark.parametrize("d,h,w", [(5, 96, 80), (9, 33, 129),
                                       (7, 100, 36)])
    def test_shape_fuzz(self, d, h, w):
        from mdx.ops.bilateral import _norm_d, bilateral
        from mdx.ops.pallas_kernels import bilateral_tpu

        r = np.random.default_rng(d * 10000 + h * 10 + w)
        x = jnp.asarray(r.random((2, h, w), np.float32))
        want = bilateral(x, d, 0.08, 0.06)
        got = bilateral_tpu(x, _norm_d(d), 0.08, 0.06, interpret=True)
        np.testing.assert_allclose(np.asarray(want), np.asarray(got),
                                   atol=1e-6, err_msg=f"d{d} {h}x{w}")

    def test_matches_refimpl(self, noisy_image):
        from mdx.ops.pallas_kernels import bilateral_tpu
        from mdx.refimpl.filters_np import bilateral as bilateral_np

        x = jnp.asarray(noisy_image, jnp.float32)[None]
        got = bilateral_tpu(x, 5, 0.05, 0.05, interpret=True)
        ref = bilateral_np(np.asarray(noisy_image, np.float64), 5,
                           0.05, 0.05)
        np.testing.assert_allclose(np.asarray(got)[0], ref, atol=2e-6)

    def test_tpu_lowering_stays_supported(self, batch):
        import jax

        from mdx.ops.pallas_kernels import bilateral_tpu

        sc = jnp.asarray([0.05, 0.12], jnp.float32)
        for shape in ((2, 512, 512), (2, 96, 80)):
            x = jnp.zeros(shape, jnp.float32)
            jax.export.export(
                jax.jit(lambda v, c: bilateral_tpu(v, 5, c, c)),
                platforms=["tpu"])(x, sc)

    def test_impl_knob(self, monkeypatch):
        from mdx.ops import pallas_kernels as PK

        monkeypatch.delenv("MDX_BILATERAL_IMPL", raising=False)
        assert PK.bilateral_use_pallas() is \
            PK._AUTO_BILATERAL_PALLAS["whole"]
        assert PK.bilateral_use_pallas(kind="banded") is \
            PK._AUTO_BILATERAL_PALLAS["banded"]
        monkeypatch.setenv("MDX_BILATERAL_IMPL", "pallas")
        assert PK.bilateral_use_pallas()
        monkeypatch.setenv("MDX_BILATERAL_IMPL", "xla")
        assert not PK.bilateral_use_pallas()
        # explicit impl= pins the lowering over the env knob (A/B tooling)
        assert PK.bilateral_use_pallas(impl="pallas")
        monkeypatch.setenv("MDX_BILATERAL_IMPL", "pallas")
        assert not PK.bilateral_use_pallas(impl="xla")
        monkeypatch.setenv("MDX_BILATERAL_IMPL", "bogus")
        with pytest.raises(ValueError, match="MDX_BILATERAL_IMPL"):
            PK.bilateral_use_pallas()

    def test_knob_routes_bilateral(self, batch, monkeypatch):
        import importlib

        import jax

        # the module, not the function the package re-export shadows
        B = importlib.import_module("mdx.ops.bilateral")
        from mdx.ops import pallas_kernels as PK

        sc = jnp.asarray([0.05, 0.12], jnp.float32)
        want = B.bilateral(batch, 5, sc, sc)  # real CPU path first

        monkeypatch.setenv("MDX_BILATERAL_IMPL", "pallas")
        monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
        calls = []
        real = PK.bilateral_tpu
        monkeypatch.setattr(
            PK, "bilateral_tpu",
            lambda v, d, c, s: (calls.append(1),
                                real(v, d, c, s, interpret=True))[1])
        got = B.bilateral(batch, 5, sc, sc)
        assert calls
        np.testing.assert_allclose(np.asarray(want), np.asarray(got),
                                   atol=1e-6)


class TestImplPinNotDispatchable:
    """An explicit impl='pallas' pin that cannot dispatch must raise —
    silently running the XLA lowering would corrupt an A/B (the
    profile_pass --ab candidates rely on the pin taking effect)."""

    def test_unsharp_pin_raises_off_tpu(self, batch):
        from mdx.ops.filters import unsharp_mask

        with pytest.raises(ValueError, match="not dispatchable"):
            unsharp_mask(batch, 1.0, 0.6, impl="pallas")

    def test_bilateral_pin_raises_off_tpu(self, batch):
        import importlib

        B = importlib.import_module("mdx.ops.bilateral")
        with pytest.raises(ValueError, match="not dispatchable"):
            B.bilateral(batch, 5, 0.05, 0.05, impl="pallas")

    def test_unsharp_pin_raises_above_size_limit(self, batch, monkeypatch):
        """Above the whole-image limit AND with no dividing band (h=60),
        neither unsharp kernel can dispatch — the pin must raise."""
        import jax

        from mdx.ops import pallas_kernels as PK
        from mdx.ops.filters import unsharp_mask

        monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
        monkeypatch.setattr(PK, "_UNSHARP_WHOLE_LIMIT", 0)
        with pytest.raises(ValueError, match="not dispatchable"):
            unsharp_mask(batch[:, :60, :], 1.0, 0.6, impl="pallas")

    def test_xla_pin_never_raises(self, batch):
        from mdx.ops.filters import unsharp_mask

        out = unsharp_mask(batch, 1.0, 0.6, impl="xla")
        assert out.shape == batch.shape


class TestUnsharpBanded:
    """Banded fused unsharp for the >1024² class (grid image × row-band,
    XLA-snapshotted row halos)."""

    @pytest.mark.parametrize("n,h,w,band", [(2, 128, 96, 64),
                                            (1, 192, 160, 64),
                                            (3, 256, 80, 128)])
    def test_matches_dense(self, n, h, w, band):
        from mdx.ops.filters import unsharp_mask
        from mdx.ops.pallas_kernels import unsharp_banded_tpu

        r = np.random.default_rng(n * 1000 + h + w)
        x = jnp.asarray(r.random((n, h, w), np.float32))
        rad = jnp.asarray(r.uniform(0.5, 3.0, n).astype(np.float32))
        amt = jnp.asarray(r.uniform(0.2, 1.5, n).astype(np.float32))
        want = unsharp_mask(x, rad, amt)
        got = unsharp_banded_tpu(x, rad, amt, band=band, interpret=True)
        np.testing.assert_allclose(np.asarray(want), np.asarray(got),
                                   atol=1e-6)

    def test_matches_whole_image_kernel(self, batch):
        from mdx.ops.pallas_kernels import unsharp_banded_tpu, unsharp_tpu

        a = unsharp_tpu(batch, 1.3, 0.7, interpret=True)
        b = unsharp_banded_tpu(batch, 1.3, 0.7, band=32, interpret=True)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_rejects_non_dividing_band(self, batch):
        from mdx.ops.pallas_kernels import unsharp_banded_tpu

        with pytest.raises(ValueError, match="does not divide"):
            unsharp_banded_tpu(batch[:, :60, :], 1.0, 0.6, band=64,
                               interpret=True)

    def test_dispatches_above_limit(self, batch, monkeypatch):
        """Above the whole-image limit with a dividing band, the pallas
        pin routes to the banded kernel."""
        import jax

        from mdx.ops import pallas_kernels as PK
        from mdx.ops.filters import unsharp_mask

        want = unsharp_mask(batch, 1.0, 0.6)  # real CPU path first
        monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
        monkeypatch.setattr(PK, "_UNSHARP_WHOLE_LIMIT", 0)
        calls = []
        real = PK.unsharp_banded_tpu
        monkeypatch.setattr(
            PK, "unsharp_banded_tpu",
            lambda v, r, a, band: (calls.append(band),
                                   real(v, r, a, band=band,
                                        interpret=True))[1])
        got = unsharp_mask(batch, 1.0, 0.6, impl="pallas")
        assert calls  # routed banded (batch is 64×64 → band 64)
        np.testing.assert_allclose(np.asarray(want), np.asarray(got),
                                   atol=1e-6)

    def test_tpu_lowering_stays_supported(self):
        import jax

        from mdx.ops.pallas_kernels import unsharp_banded_tpu

        x = jnp.zeros((1, 2048, 2048), jnp.float32)
        jax.export.export(
            jax.jit(lambda v, r, a: unsharp_banded_tpu(v, r, a, band=256)),
            platforms=["tpu"])(x, jnp.ones((1,)), jnp.ones((1,)))


class TestBilateralBanded:
    """Banded fused bilateral for the >1024² class (grid image ×
    row-band, XLA-snapshotted 2-D halos) — closes the kernel-matrix hole
    VERDICT r3 weak #6 flagged (no banded bilateral verdict at 2048²)."""

    @pytest.mark.parametrize("n,h,w,band,d", [(2, 128, 96, 64, 5),
                                              (1, 192, 160, 64, 9),
                                              (3, 256, 80, 128, 7)])
    def test_matches_xla(self, n, h, w, band, d):
        from mdx.ops.bilateral import _norm_d, bilateral
        from mdx.ops.pallas_kernels import bilateral_banded_tpu

        r = np.random.default_rng(n * 1000 + h + w + d)
        x = jnp.asarray(r.random((n, h, w), np.float32))
        sc = jnp.asarray(r.uniform(0.03, 0.12, n).astype(np.float32))
        ss = jnp.asarray(r.uniform(0.03, 0.12, n).astype(np.float32))
        want = bilateral(x, d, sc, ss)
        got = bilateral_banded_tpu(x, _norm_d(d), sc, ss, band=band,
                                   interpret=True)
        np.testing.assert_allclose(np.asarray(want), np.asarray(got),
                                   atol=1e-6)

    def test_matches_whole_image_kernel(self, batch):
        from mdx.ops.pallas_kernels import (bilateral_banded_tpu,
                                            bilateral_tpu)

        a = bilateral_tpu(batch, 5, 0.05, 0.05, interpret=True)
        b = bilateral_banded_tpu(batch, 5, 0.05, 0.05, band=32,
                                 interpret=True)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-7)

    def test_rejects_non_dividing_band(self, batch):
        from mdx.ops.pallas_kernels import bilateral_banded_tpu

        with pytest.raises(ValueError, match="does not divide"):
            bilateral_banded_tpu(batch[:, :60, :], 5, 0.05, 0.05,
                                 band=64, interpret=True)

    def test_dispatches_above_limit(self, batch, monkeypatch):
        """Above the whole-image limit with a dividing band, the pallas
        pin routes to the banded kernel."""
        import jax

        from mdx.ops import pallas_kernels as PK
        from mdx.ops.bilateral import bilateral

        want = bilateral(batch, 5, 0.05, 0.05)  # real CPU path first
        monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
        monkeypatch.setattr(PK, "_WHOLE_IMAGE_LIMIT", 0)
        calls = []
        real = PK.bilateral_banded_tpu
        monkeypatch.setattr(
            PK, "bilateral_banded_tpu",
            lambda v, d, sc, ss, band: (calls.append(band),
                                        real(v, d, sc, ss, band=band,
                                             interpret=True))[1])
        got = bilateral(batch, 5, 0.05, 0.05, impl="pallas")
        assert calls  # routed banded (batch is 64×64 → band 64)
        np.testing.assert_allclose(np.asarray(want), np.asarray(got),
                                   atol=1e-6)

    def test_tpu_lowering_stays_supported(self):
        import jax

        from mdx.ops.pallas_kernels import bilateral_banded_tpu

        x = jnp.zeros((1, 2048, 2048), jnp.float32)
        jax.export.export(
            jax.jit(lambda v, sc, ss: bilateral_banded_tpu(
                v, 5, sc, ss, band=256)),
            platforms=["tpu"])(x, jnp.ones((1,)), jnp.ones((1,)))


class TestWaveletDenoisePallas:
    """Fused Haar BayesShrink kernel (pallas_kernels.wavelet_denoise_tpu)."""

    def _sigma(self, x):
        from mdx.ops.wavelet import dwt2, mad_sigma_from_hh

        return mad_sigma_from_hh(dwt2(x, "db1")[1][2])

    @pytest.mark.parametrize("mode", ["soft", "hard"])
    def test_matches_xla(self, batch, mode):
        from mdx.ops.pallas_kernels import wavelet_denoise_tpu
        from mdx.ops.wavelet import default_levels, denoise_wavelet

        lv = default_levels(batch.shape[-2:], "db1")
        sig = self._sigma(batch)
        want = denoise_wavelet(batch, sigma=sig, mode=mode,
                               wavelet_levels=lv)
        got = wavelet_denoise_tpu(batch, sig,
                                  jnp.full((2,), mode == "soft"),
                                  lv, interpret=True)
        np.testing.assert_allclose(np.asarray(want), np.asarray(got),
                                   atol=2e-6)

    def test_mixed_soft_mask_and_sigma_vector(self):
        from mdx.ops.pallas_kernels import wavelet_denoise_tpu
        from mdx.ops.wavelet import denoise_wavelet

        r = np.random.default_rng(3)
        x = jnp.asarray(r.random((3, 96, 64), np.float32))
        sig = jnp.asarray([0.03, 0.08, 0.05], jnp.float32)
        mask = jnp.asarray([True, False, True])
        want = denoise_wavelet(x, sigma=sig, wavelet_levels=4,
                               soft_mask=mask)
        got = wavelet_denoise_tpu(x, sig, mask, 4, interpret=True)
        np.testing.assert_allclose(np.asarray(want), np.asarray(got),
                                   atol=2e-6)

    def test_matches_refimpl(self, noisy_image):
        from mdx.ops.pallas_kernels import wavelet_denoise_tpu
        from mdx.refimpl.wavelet_np import denoise_wavelet as dn_np

        x = jnp.asarray(noisy_image, jnp.float32)[None]
        sig = self._sigma(x)
        got = wavelet_denoise_tpu(x, sig, jnp.ones((1,)), 3,
                                  interpret=True)
        ref = dn_np(np.asarray(noisy_image, np.float64),
                    sigma=float(sig[0]), mode="soft", wavelet="db1",
                    wavelet_levels=3)
        np.testing.assert_allclose(np.asarray(got)[0], ref, atol=2e-5)

    def test_rejects_non_divisible(self, batch):
        from mdx.ops.pallas_kernels import wavelet_denoise_tpu

        with pytest.raises(ValueError, match="divisible"):
            wavelet_denoise_tpu(batch[:, :60, :], jnp.ones((2,)),
                                jnp.ones((2,)), 3, interpret=True)

    def test_knob_routes_denoise(self, batch, monkeypatch):
        """MDX_WAVELET_IMPL=pallas on a (faked) TPU backend routes the op
        through the kernel, incl. the sigma=None estimate path."""
        import jax

        from mdx.ops import pallas_kernels as PK
        from mdx.ops.wavelet import denoise_wavelet

        want = denoise_wavelet(batch)  # real CPU path, sigma estimated
        monkeypatch.setenv("MDX_WAVELET_IMPL", "pallas")
        monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
        calls = []
        real = PK.wavelet_denoise_tpu
        monkeypatch.setattr(
            PK, "wavelet_denoise_tpu",
            lambda v, s, m, lv: (calls.append(1),
                                 real(v, s, m, lv, interpret=True))[1])
        got = denoise_wavelet(batch)
        assert calls
        np.testing.assert_allclose(np.asarray(want), np.asarray(got),
                                   atol=2e-6)

    def test_pin_raises_for_db2(self, batch):
        from mdx.ops.wavelet import denoise_wavelet

        with pytest.raises(ValueError, match="not dispatchable"):
            denoise_wavelet(batch, wavelet="db2", impl="pallas")

    def test_impl_knob(self, monkeypatch):
        from mdx.ops import pallas_kernels as PK

        monkeypatch.delenv("MDX_WAVELET_IMPL", raising=False)
        assert PK.wavelet_use_pallas() is PK._AUTO_WAVELET_PALLAS
        monkeypatch.setenv("MDX_WAVELET_IMPL", "pallas")
        assert PK.wavelet_use_pallas()
        assert not PK.wavelet_use_pallas(impl="xla")
        monkeypatch.setenv("MDX_WAVELET_IMPL", "nope")
        with pytest.raises(ValueError, match="MDX_WAVELET_IMPL"):
            PK.wavelet_use_pallas()

    def test_tpu_lowering_stays_supported(self):
        import jax

        from mdx.ops.pallas_kernels import wavelet_denoise_tpu

        s = jnp.full((2,), 0.05, jnp.float32)
        for hw, lv in ((512, 6), (1024, 7)):
            x = jnp.zeros((2, hw, hw), jnp.float32)
            jax.export.export(
                jax.jit(lambda v, sg, sf, _lv=lv:
                        wavelet_denoise_tpu(v, sg, sf, _lv)),
                platforms=["tpu"])(x, s, s)


class TestSweptPlatformGuard:
    """The empirical dispatch/knee constants are stamped with the
    platform they were swept on (VERDICT r4 weak #6): a different TPU
    generation or jax version logs a one-time re-sweep warning."""

    class _FakeDev:
        def __init__(self, platform, kind):
            self.platform = platform
            self.device_kind = kind

    def _reset(self, monkeypatch):
        from mdx.ops import pallas_kernels as PK

        monkeypatch.setattr(PK, "_platform_checked", False)
        return PK

    def test_other_tpu_kind_warns(self, monkeypatch, caplog):
        import jax

        PK = self._reset(monkeypatch)
        monkeypatch.setattr(
            jax, "devices", lambda: [self._FakeDev("tpu", "TPU v6e")])
        with caplog.at_level("WARNING", logger="mdx.ops"):
            PK.check_swept_platform()
        assert "re-sweep" in caplog.text and "TPU v6e" in caplog.text

    def test_other_jax_version_warns(self, monkeypatch, caplog):
        import jax

        PK = self._reset(monkeypatch)
        monkeypatch.setattr(
            jax, "devices",
            lambda: [self._FakeDev("tpu", PK._SWEPT_DEVICE_KIND)])
        monkeypatch.setattr(jax, "__version__", "999.0.0")
        with caplog.at_level("WARNING", logger="mdx.ops"):
            PK.check_swept_platform()
        assert "parity_sweep" in caplog.text

    def test_swept_platform_silent_and_once(self, monkeypatch, caplog):
        import jax

        PK = self._reset(monkeypatch)
        monkeypatch.setattr(
            jax, "devices",
            lambda: [self._FakeDev("tpu", PK._SWEPT_DEVICE_KIND)])
        monkeypatch.setattr(jax, "__version__", PK._SWEPT_JAX_VERSION)
        with caplog.at_level("WARNING", logger="mdx.ops"):
            PK.check_swept_platform()
        assert caplog.text == ""
        assert PK._platform_checked  # later calls are free

    def test_non_tpu_devices_skip(self, monkeypatch, caplog):
        import jax

        PK = self._reset(monkeypatch)
        monkeypatch.setattr(
            jax, "devices", lambda: [self._FakeDev("cpu", "cpu")])
        with caplog.at_level("WARNING", logger="mdx.ops"):
            PK.check_swept_platform()
        assert caplog.text == ""
        assert not PK._platform_checked


class TestBf16Split:
    """The concat-bf16-split machinery behind the exact CLAHE remap
    (round-5 precision incident; docs/PERF.md): hi is bf16-exact, the
    parts sum back exactly, and the split remap matches the XLA
    lowering in interpret mode (the real-backend certificate is
    tools/parity_sweep.py)."""

    def test_split_identity_and_bf16_exactness(self):
        import jax.numpy as jnp

        from mdx.ops.pallas_kernels import _bf16_split

        rng = np.random.default_rng(4)
        a = jnp.asarray(rng.random((64, 128), np.float32))
        hi, lo = _bf16_split(a)
        np.testing.assert_array_equal(np.asarray(hi + lo),
                                      np.asarray(a))
        # hi survives a bf16 round-trip unchanged (its products on the
        # MXU's DEFAULT bf16 pass are therefore exact)
        np.testing.assert_array_equal(
            np.asarray(hi),
            np.asarray(hi.astype(jnp.bfloat16).astype(jnp.float32)))

    def test_interpret_parity(self):
        import jax.numpy as jnp

        from mdx.ops import pallas_kernels as PK
        from mdx.ops.clahe import clahe_xla

        rng = np.random.default_rng(3)
        x = jnp.asarray(rng.random((2, 64, 64), np.float32))
        got = PK.clahe_tpu(x, jnp.float32(0.02), 16, 256,
                           interpret=True)
        want = clahe_xla(x, jnp.float32(0.02), 16, 256)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=2e-5)


class TestClahePrecisionKnob:
    """MDX_CLAHE_PRECISION: exact (default — concat-bf16-split remap,
    golden parity on the real backend) vs fast (opt-in single-pass bf16,
    measured ≤4e-3 deviation; the banded >1024² class is MAC-bound and
    exactness costs ~4× there — docs/PERF.md round-5 record)."""

    def test_default_exact_and_validation(self, monkeypatch):
        from mdx.ops import pallas_kernels as PK

        monkeypatch.delenv("MDX_CLAHE_PRECISION", raising=False)
        assert PK.clahe_precision() is True
        monkeypatch.setenv("MDX_CLAHE_PRECISION", "fast")
        assert PK.clahe_precision() is False
        monkeypatch.setenv("MDX_CLAHE_PRECISION", "exact")
        assert PK.clahe_precision() is True
        monkeypatch.setenv("MDX_CLAHE_PRECISION", "fats")
        with pytest.raises(ValueError, match="MDX_CLAHE_PRECISION"):
            PK.clahe_precision()

    @pytest.mark.parametrize("mode", ["exact", "fast"])
    def test_interpret_parity_both_modes(self, monkeypatch, mode):
        """In interpret mode (f32 matmuls throughout) both modes match
        the XLA lowering — the knob only matters on the real MXU."""
        import jax.numpy as jnp

        from mdx.ops import pallas_kernels as PK
        from mdx.ops.clahe import clahe_xla

        monkeypatch.setenv("MDX_CLAHE_PRECISION", mode)
        rng = np.random.default_rng(3)
        x = jnp.asarray(rng.random((2, 64, 64), np.float32))
        got = PK.clahe_tpu(x, jnp.float32(0.02), 16, 256,
                           interpret=True)
        want = clahe_xla(x, jnp.float32(0.02), 16, 256)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=2e-5)

    @pytest.mark.parametrize("mode", ["exact", "fast"])
    def test_banded_interpret_parity_both_modes(self, monkeypatch,
                                                mode):
        import jax.numpy as jnp

        from mdx.ops import pallas_kernels as PK
        from mdx.ops.clahe import clahe_xla

        monkeypatch.setenv("MDX_CLAHE_PRECISION", mode)
        rng = np.random.default_rng(6)
        x = jnp.asarray(rng.random((2, 96, 64), np.float32))
        got = PK._clahe_banded(jnp.clip(x, 0, 1),
                               jnp.asarray([0.02, 0.04], jnp.float32),
                               16, 256, interpret=True)
        want = clahe_xla(x, jnp.asarray([0.02, 0.04], jnp.float32),
                         16, 256)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=2e-5)
