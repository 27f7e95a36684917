"""Test harness: run everything on an 8-device virtual CPU mesh.

This is the TPU-world answer to "test multi-node without a cluster"
(SURVEY.md section 4): jax's host-platform device-count spoofing exercises
the same pjit/sharding code paths the real TPU mesh uses. The axon
sitecustomize force-selects the TPU backend via jax.config, so the override
must also go through jax.config (env vars alone are clobbered).
"""

import os

flags = os.environ.get('XLA_FLAGS', '')
if '--xla_force_host_platform_device_count' not in flags:
    os.environ['XLA_FLAGS'] = (
        flags + ' --xla_force_host_platform_device_count=8').strip()
os.environ['JAX_PLATFORMS'] = 'cpu'

import jax  # noqa: E402

jax.config.update('jax_platforms', 'cpu')

# Persistent compilation cache for the test mesh. The suite is
# compile-dominated on this 1-core host (29 min for 203 tests, ~95% of it
# tracing+XLA): caching executables across runs cuts reruns to minutes.
# core/cache.py deliberately refuses CPU sessions because a cache copied
# across machines with different host ISAs can SIGILL — that concern is
# cross-machine only; this dir is machine-local (~/.cache) and keyed by
# the same 8-device topology every run. Opt out: JAMIE_TPU_NO_CACHE=1.
if os.environ.get('JAMIE_TPU_NO_CACHE') != '1':
    _cache_dir = os.path.expanduser('~/.cache/jamie_tpu_xla_cpu_tests')
    os.makedirs(_cache_dir, exist_ok=True)
    jax.config.update('jax_compilation_cache_dir', _cache_dir)
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.0)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope='session')
def synthetic_pair():
    """Small MMD-MA-style paired dataset: two modalities generated from a
    shared 2-branch latent, cells aligned across modalities."""
    rng = np.random.RandomState(42)
    n, latent_dim = 120, 6
    t = rng.rand(n)
    branch = rng.rand(n) > 0.5
    z = np.stack([t, t ** 2, np.where(branch, t, -t),
                  np.where(branch, 1.0, -1.0),
                  np.sin(3 * t), np.cos(3 * t)], axis=1)
    z += 0.05 * rng.randn(n, latent_dim)
    w1 = rng.randn(latent_dim, 40)
    w2 = rng.randn(latent_dim, 25)
    x1 = z @ w1 + 0.1 * rng.randn(n, 40)
    x2 = z @ w2 + 0.1 * rng.randn(n, 25)
    labels = np.where(branch, 'a', 'b')
    return [x1.astype(np.float32), x2.astype(np.float32)], [labels, labels]
