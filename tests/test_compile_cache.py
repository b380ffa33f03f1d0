"""Persistent compilation cache wiring (mdx/pipeline/compile_cache.py).

The cache itself is JAX's; these tests cover mdx's resolution /
enablement contract.  End-to-end behaviour was verified on the TPU
backend: a fresh process logs ``Persistent compilation cache hit`` and
skips the remote compile (docs/PERF.md "fresh deploys").
"""

import os

import jax
import pytest

from mdx.pipeline import compile_cache as CC


@pytest.fixture()
def _reset(monkeypatch):
    """Isolate module state and restore the session's jax cache config."""
    monkeypatch.setattr(CC, "_enabled_dir", None)
    old = jax.config.jax_compilation_cache_dir
    yield
    if jax.config.jax_compilation_cache_dir != old:
        # Always restore — the suite runs with NO cache dir (None) on the
        # CPU mesh; leaking a force-enabled dir would re-expose the whole
        # suite to the AOT-reload rendezvous abort (conftest note).
        jax.config.update("jax_compilation_cache_dir", old)
        from jax.experimental.compilation_cache import (
            compilation_cache as jax_cc)

        jax_cc.reset_cache()


class TestCacheDir:
    def test_disabled_values(self, monkeypatch):
        for v in ("0", "off", "FALSE", "no", "", "  "):
            monkeypatch.setenv("MDX_COMPILE_CACHE", v)
            assert CC.cache_dir() is None

    def test_explicit_path(self, monkeypatch):
        monkeypatch.setenv("MDX_COMPILE_CACHE", "/x/y/cache")
        assert CC.cache_dir() == "/x/y/cache"

    def test_default_under_user_cache(self, monkeypatch):
        monkeypatch.delenv("MDX_COMPILE_CACHE", raising=False)
        monkeypatch.setenv("XDG_CACHE_HOME", "/tmp/xdg-test")
        assert CC.cache_dir() == "/tmp/xdg-test/mdx/jax-cache"


class TestEnable:
    def test_cpu_backend_refused(self, tmp_path, monkeypatch, _reset):
        """On the CPU backend enable() is a guarded no-op: the jaxlib
        0.9.0 AOT-reload path CHECK-aborts SPMD collectives (module
        docstring / conftest note)."""
        monkeypatch.setenv("MDX_COMPILE_CACHE", str(tmp_path / "cc"))
        monkeypatch.delenv("MDX_COMPILE_CACHE_FORCE", raising=False)
        if jax.default_backend() != "cpu":
            pytest.skip("CPU-backend gate")
        before = jax.config.jax_compilation_cache_dir
        assert CC.enable() is None
        assert jax.config.jax_compilation_cache_dir == before

    def test_enable_points_jax_at_dir(self, tmp_path, monkeypatch, _reset):
        d = str(tmp_path / "cc")
        monkeypatch.setenv("MDX_COMPILE_CACHE", d)
        monkeypatch.setenv("MDX_COMPILE_CACHE_FORCE", "1")
        assert CC.enable() == d
        assert os.path.isdir(d)
        assert jax.config.jax_compilation_cache_dir == d
        assert jax.config.jax_persistent_cache_min_entry_size_bytes == 0

    def test_idempotent(self, tmp_path, monkeypatch, _reset):
        d = str(tmp_path / "cc")
        monkeypatch.setenv("MDX_COMPILE_CACHE", d)
        monkeypatch.setenv("MDX_COMPILE_CACHE_FORCE", "1")
        assert CC.enable() == d
        # later env changes don't re-point an enabled cache
        monkeypatch.setenv("MDX_COMPILE_CACHE", str(tmp_path / "other"))
        assert CC.enable() == d

    def test_disabled_is_noop(self, monkeypatch, _reset):
        monkeypatch.setenv("MDX_COMPILE_CACHE", "0")
        before = jax.config.jax_compilation_cache_dir
        assert CC.enable() is None
        assert jax.config.jax_compilation_cache_dir == before

    def test_cpu_backend_round_trip(self, tmp_path, monkeypatch, _reset):
        """A compiled program actually lands in the cache directory
        (single-device program, FORCE-enabled — safe: the rendezvous bug
        needs SPMD collectives on the reload path).

        JAX initialises its cache object lazily at the FIRST compile and
        keeps it; re-pointing the config must be paired with a reset —
        the product never re-points (enable() runs once at process
        start), this is test-session hygiene only."""
        from jax.experimental.compilation_cache import (
            compilation_cache as jax_cc)

        d = str(tmp_path / "cc")
        monkeypatch.setenv("MDX_COMPILE_CACHE", d)
        monkeypatch.setenv("MDX_COMPILE_CACHE_FORCE", "1")
        CC.enable()
        jax_cc.reset_cache()
        import numpy as np
        import jax.numpy as jnp

        @jax.jit
        def probe(x):
            return jnp.tanh(x * 3.21) + jnp.flip(x, axis=0) * 0.5

        float(jnp.sum(probe(jnp.asarray(np.ones((33, 17), np.float32)))))
        assert any(name.endswith("-cache") for name in os.listdir(d))
