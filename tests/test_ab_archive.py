"""Pallas kernels vs XLA references (interpreter mode on CPU)."""

import jax.numpy as jnp
import numpy as np

from jamie_tpu.ops.distances import pairwise_sq_euclidean
from jamie_tpu.ops.ab_archive import (
    fused_pd_update, pairwise_sq_euclidean_pallas,
)


def test_fused_pd_update_matches_reference():
    rng = np.random.RandomState(0)
    m, n = 24, 136  # not tile-aligned on the sublane axis
    F = jnp.asarray(rng.rand(m, n), jnp.float32)
    M1 = jnp.asarray(rng.randn(m, n) * 0.1, jnp.float32)
    M2 = jnp.asarray(rng.rand(m, n) * 0.01, jnp.float32)
    grad = jnp.asarray(rng.randn(m, n), jnp.float32)
    i = jnp.asarray(7, jnp.int32)
    eps = 0.001

    F2, M1_2, M2_2 = fused_pd_update(F, M1, M2, grad, i, eps)

    pho1, pho2, dlt = 0.9, 0.999, 1e-7
    m1 = pho1 * np.asarray(M1) + (1 - pho1) * np.asarray(grad)
    m2 = pho2 * np.asarray(M2) + (1 - pho2) * np.asarray(grad) ** 2
    hat1 = m1 / (1 - pho1 ** 7)
    hat2 = m2 / (1 - pho2 ** 7)
    g = hat1 / (np.sqrt(hat2) + dlt)
    f_tmp = np.maximum(np.asarray(F) - g, 0)
    f_ref = (1 - eps) * np.asarray(F) + eps * f_tmp

    np.testing.assert_allclose(np.asarray(M1_2), m1, rtol=1e-5, atol=1e-7)
    np.testing.assert_allclose(np.asarray(M2_2), m2, rtol=1e-5, atol=1e-7)
    np.testing.assert_allclose(np.asarray(F2), f_ref, rtol=1e-5, atol=1e-7)


def test_pairwise_pallas_matches_xla():
    rng = np.random.RandomState(1)
    x = rng.randn(70, 33).astype(np.float32)
    y = rng.randn(50, 33).astype(np.float32)
    ours = np.asarray(pairwise_sq_euclidean_pallas(
        x, y, tile_m=32, tile_n=128, tile_k=32))
    ref = np.asarray(pairwise_sq_euclidean(jnp.asarray(x), jnp.asarray(y)))
    np.testing.assert_allclose(ours, ref, atol=1e-3)


def test_pairwise_pallas_self_distance_zero_diag():
    rng = np.random.RandomState(2)
    x = rng.randn(40, 10).astype(np.float32)
    d = np.asarray(pairwise_sq_euclidean_pallas(x, tile_m=32, tile_n=128,
                                                tile_k=32))
    np.testing.assert_allclose(np.diag(d), 0, atol=1e-6)
    np.testing.assert_allclose(d, d.T, atol=1e-3)


def test_prime_dual_pallas_path_matches_xla_path():
    from jamie_tpu.solvers.prime_dual import prime_dual
    rng = np.random.RandomState(3)
    x = rng.randn(20, 5).astype(np.float32)
    Kx = np.asarray(pairwise_sq_euclidean(jnp.asarray(x)))
    F_xla = prime_dual(Kx, Kx, dx=5, dy=5, epoch_pd=50, verbose=False,
                       use_pallas=False)
    F_pl = prime_dual(Kx, Kx, dx=5, dy=5, epoch_pd=50, verbose=False,
                      use_pallas=True)
    np.testing.assert_allclose(F_pl, F_xla, rtol=1e-4, atol=1e-6)
