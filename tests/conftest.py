"""Shared fixtures: synthetic seeded images + a virtual 8-device CPU mesh.

Mirrors the reference test strategy (reference tests/conftest.py): fast,
deterministic, CPU-only tests on synthetic 64×64 arrays — no real DICOM
files or API keys required.  JAX is forced onto 8 virtual CPU devices so
multi-chip sharding is exercised without TPU hardware.
"""

import os

# Must be set before jax is imported anywhere.  Tests run on a virtual
# 8-device CPU mesh by default; set MDX_TEST_TPU=1 to run them on hardware.
if not os.environ.get("MDX_TEST_TPU"):
    os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("MDX_DB_PATH", "")  # set per-test via tmp_path

# NO persistent compilation cache on the CPU mesh: jax/jaxlib 0.9.0's
# XLA:CPU cache-LOAD path executes SPMD collectives with colliding
# rendezvous run-ids — repeated runs of a reloaded multi-device
# executable let a straggler thread from run N join run N+1's
# all-reduce (`rendezvous.h:315 Check failed: id < num_threads`) and
# the CHECK SIGABRTs pytest mid-suite with no Python error, at a test
# that depends on which entries happen to be warm.  Freshly-compiled
# executables are immune, so the suite runs uncached; the product cache
# (mdx/pipeline/compile_cache.py) gates itself to TPU for the same
# reason.  Two-phase repro: tools/repro scripts in the round-3 notes,
# docs/PERF.md "Measured dead ends".
os.environ.pop("JAX_COMPILATION_CACHE_DIR", None)
os.environ.setdefault("MDX_COMPILE_CACHE", "0")

import numpy as np
import pytest

# A pytest plugin may import jax before this conftest runs, in which case jax
# snapshotted JAX_PLATFORMS from the launch environment (on the TPU host that
# is the remote "axon" tunnel — tests would then compile over the network).
# Re-apply the platform choice through jax.config, which works as long as the
# backend has not been initialised yet.
import jax

if not os.environ.get("MDX_TEST_TPU"):
    jax.config.update("jax_platforms", "cpu")

# An ambient JAX_COMPILATION_CACHE_DIR may still have been snapshotted if
# a plugin pre-imported jax — clear it through jax.config so no cached CPU
# executable is ever loaded (the rendezvous bug above).
if not os.environ.get("MDX_TEST_TPU"):
    jax.config.update("jax_compilation_cache_dir", None)


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(42)


@pytest.fixture()
def clean_image():
    """Full-range gradient + fine texture — triggers no quality issues.

    Tuned against the detection thresholds: std≈0.23 (>0.12), σ̂≈0.01
    (<0.08), lap_var≈0.002 (>0.001), no clipped pixels.
    """
    img = np.linspace(0.1, 0.9, 64 * 64).reshape(64, 64).astype(np.float32)
    img += np.random.default_rng(42).normal(0, 0.01, img.shape).astype(np.float32)
    return np.clip(img, 0.0, 1.0).astype(np.float32)


@pytest.fixture()
def noisy_image():
    """Heavy Gaussian noise on a gradient — triggers the noise issue."""
    r = np.random.default_rng(7)
    yy, xx = np.mgrid[0:64, 0:64].astype(np.float64)
    img = 0.5 + 0.2 * (xx - 32) / 64.0 + r.normal(0, 0.15, (64, 64))
    return np.clip(img, 0.0, 1.0).astype(np.float32)


@pytest.fixture()
def low_contrast_image():
    """Values squeezed into [0.45, 0.55] — triggers low_contrast."""
    r = np.random.default_rng(3)
    img = 0.5 + 0.05 * np.tanh(r.normal(0, 1.0, (64, 64)))
    return np.clip(img, 0.0, 1.0).astype(np.float32)


@pytest.fixture()
def clipped_image():
    """Saturated shadows and highlights — triggers clipping issues."""
    yy, xx = np.mgrid[0:64, 0:64].astype(np.float64)
    img = (xx - 16) / 32.0
    return np.clip(img, 0.0, 1.0).astype(np.float32)


@pytest.fixture()
def no_issue_metrics():
    """Hand-built metric dict that triggers no issues."""
    return {
        "sigma": 0.02, "lap_var": 0.01, "std": 0.2,
        "pct_low": 0.0, "pct_high": 0.0,
    }


@pytest.fixture()
def all_issue_metrics():
    """Hand-built metric dict that triggers all five issues."""
    return {
        "sigma": 0.2, "lap_var": 0.0001, "std": 0.05,
        "pct_low": 0.05, "pct_high": 0.05,
    }


@pytest.fixture()
def valid_plan_dict():
    """A plan dict within PARAM_BOUNDS (mirror of reference conftest :58-76)."""
    return {
        "recommended_ops": ["denoise", "clahe", "unsharp"],
        "params": {
            "clahe_clip_limit": 0.02,
            "clahe_tile_size": 16,
            "gamma": 1.0,
            "unsharp_radius": 1.0,
            "unsharp_amount": 0.6,
            "denoise_mode": "soft",
            "post_denoise_strength": 0.3,
            "bilateral_d": 0,
            "bilateral_sigma_color": 0.05,
            "bilateral_sigma_space": 0.05,
            "tv_denoise_weight": 0.0,
        },
        "risk_warnings": ["may amplify noise"],
        "rationale": "test plan",
        "safety": "do not over-sharpen",
        "stop_reason": None,
    }
