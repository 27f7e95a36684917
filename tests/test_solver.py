"""Prime-dual F-solver tests: convergence and matching quality on toy data."""

import numpy as np

from jamie_tpu.ops.distances import pairwise_distance
from jamie_tpu.solvers.assignment import hungarian_pairs
from jamie_tpu.solvers.prime_dual import prime_dual


def test_prime_dual_1x1_escape():
    F = prime_dual(np.zeros((1, 1)), np.zeros((1, 1)), dx=3, dy=4)
    np.testing.assert_array_equal(F, np.ones((1, 1)))


def test_prime_dual_shapes_and_nonneg():
    rng = np.random.RandomState(0)
    x = rng.randn(20, 5).astype(np.float32)
    y = rng.randn(30, 7).astype(np.float32)
    Kx = np.asarray(pairwise_distance(x))
    Ky = np.asarray(pairwise_distance(y))
    F = prime_dual(Kx, Ky, dx=5, dy=7, epoch_pd=300, verbose=False)
    assert F.shape == (20, 30)
    assert (F >= 0).all()
    assert np.isfinite(F).all()


def test_prime_dual_row_sums_near_one():
    """The constraints push F toward doubly-stochastic-like row sums."""
    rng = np.random.RandomState(1)
    x = rng.randn(25, 6).astype(np.float32)
    Kx = np.asarray(pairwise_distance(x))
    F = prime_dual(Kx, Kx, dx=6, dy=6, epoch_pd=2000, verbose=False)
    row_sums = F.sum(axis=1)
    assert np.abs(row_sums - 1).mean() < 0.35


def test_prime_dual_recovers_shuffled_identity():
    """Same dataset, shuffled copy: hungarian on F should recover a
    substantial fraction of the true permutation (far above chance)."""
    rng = np.random.RandomState(2)
    n = 40
    x = rng.randn(n, 8).astype(np.float32)
    perm = rng.permutation(n)
    y = x[perm] + 0.01 * rng.randn(n, 8).astype(np.float32)
    Kx = np.asarray(pairwise_distance(x))
    Ky = np.asarray(pairwise_distance(y))
    F = prime_dual(Kx, Ky, dx=8, dy=8, epoch_pd=2000, verbose=False)
    row, col = hungarian_pairs(F)
    # true match: x[i] corresponds to y[j] where perm[j] == i
    inv = np.empty(n, int)
    inv[perm] = np.arange(n)
    recovered = np.mean(col[np.argsort(row)] == inv)
    assert recovered > 0.5, f'only {recovered:.2f} of matches recovered'


def test_lowrank_corr_smoke():
    from jamie_tpu.solvers.lowrank import lowrank_corr
    rng = np.random.RandomState(0)
    x = rng.randn(15, 4).astype(np.float32)
    Kx = np.asarray(pairwise_distance(x))
    corr = lowrank_corr(Kx, Kx, dim=4, epochs=50, topk=3)
    assert corr.shape == (15, 15)
    np.testing.assert_allclose(corr.sum(axis=1), 3)  # top-k binarized rows
