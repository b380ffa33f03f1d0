"""Deploy-time cache priming (mdx/pipeline/prime.py): the primer drives
the product entry points (qa_deterministic + the raw-ingest batch
program + packed collector) and lands executables in the persistent
cache.  Full dtype×window matrix exercised on TPU/CPU manually (8
programs at 64²); the suite primes a minimal matrix for wiring."""

import os

import pytest

from mdx.pipeline.prime import (
    _parse_shapes,
    prime,
    prime_spatial,
    prime_tuning,
)


class TestParseShapes:
    def test_pairs_and_squares(self):
        assert _parse_shapes("512x512,1024x768") == [(512, 512), (1024, 768)]
        assert _parse_shapes("256") == [(256, 256)]


class TestPrimeTuning:
    def test_primes_tuning_surface(self):
        """Drives the K-lane autotune sweep + the three GenAI tool
        programs through the product entry points; issue sets with the
        same candidate count K are deduplicated (same K ⇒ same HLO)."""
        msgs = []
        n = prime_tuning(
            [(64, 64)],
            issue_sets=(("noise", "low_contrast"), ("low_contrast",),
                        ("blur",)),
            log=msgs.append)
        # two distinct K values (9 and 27; the second set dedups) + the
        # three tool programs
        assert n == 5
        assert any("K=9" in m for m in msgs)
        assert any("K=27" in m for m in msgs)
        assert any("GenAI tool programs" in m for m in msgs)


class TestPrimeSpatial:
    def test_primes_spatial_surface(self):
        """Drives the sharded stats pass, the issue-driven QA chain per
        distinct gate combination (built through the runner's own
        issue_driven_kwargs, deduplicated), and one autotune sweep on an
        explicit 2-D mesh."""
        from mdx.parallel import make_mesh2d

        msgs = []
        n = prime_spatial(
            [(64, 64)],
            mesh=make_mesh2d(n_data=1, n_sy=2, n_sx=2),
            issue_sets=(("noise",), ("low_contrast",),
                        # same gates as low_contrast alone → dedups
                        ("clipping_low", "clipping_high")),
            log=msgs.append)
        # stats + 2 distinct gate combos + 1 autotune sweep
        assert n == 4
        assert any("ops=denoise " in m or "ops=denoise(" in m
                   or "ops=denoise" in m for m in msgs)
        assert any("ops=clahe" in m for m in msgs)
        assert any("autotune sweep" in m for m in msgs)
        assert any("2 gate combos" in m and "sy=2 sx=2" in m
                   for m in msgs)


class TestPrime:
    def test_primes_product_programs(self, tmp_path, monkeypatch):
        d = str(tmp_path / "cc")
        monkeypatch.setenv("MDX_COMPILE_CACHE", d)
        # FORCE past the CPU-backend gate: the primed chunk programs ARE
        # multi-device (data-sharded over the virtual mesh), but the
        # rendezvous abort is a cache-LOAD hazard and this per-test
        # tmp_path dir is only ever written, never reloaded.
        monkeypatch.setenv("MDX_COMPILE_CACHE_FORCE", "1")
        import jax
        from jax.experimental.compilation_cache import (
            compilation_cache as jax_cc)

        import mdx.pipeline.compile_cache as CC
        monkeypatch.setattr(CC, "_enabled_dir", None)
        old = jax.config.jax_compilation_cache_dir
        try:
            # Point jax at the empty dir FIRST (enable is idempotent, so
            # prime()'s internal call becomes a no-op), reset the live
            # cache object, and drop in-memory executables so the primed
            # programs actually recompile and persist in a full-suite run.
            assert CC.enable() == d
            jax_cc.reset_cache()
            jax.clear_caches()
            msgs = []
            n = prime([(64, 64)], chunk=2, dtypes=("uint16",),
                      window_modes=(False,), log=msgs.append)
            # single-image pass + one raw-ingest chunk program
            assert n == 2
            assert any(name.endswith("-cache") for name in os.listdir(d))
            assert any("dtype=uint16" in m for m in msgs)
        finally:
            # Restore even when old is None — the suite must run with NO
            # cache dir on the CPU mesh (conftest rendezvous-bug note).
            if jax.config.jax_compilation_cache_dir != old:
                jax.config.update("jax_compilation_cache_dir", old)
                jax_cc.reset_cache()
