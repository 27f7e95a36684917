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


def test_prime_dual_bf16_state_close_to_f32():
    """solver_state_dtype='bfloat16' (M1 + carried products + K operands
    stored bf16; F and M2 f32 — see the closed negative results in
    solvers/prime_dual.py) must track the f32-state trajectory to within
    the same order as the accepted bf16-matmul noise."""
    rng = np.random.RandomState(3)
    x = rng.randn(60, 8).astype(np.float32)
    y = x[rng.permutation(60)] + 0.01 * rng.randn(60, 8).astype(np.float32)
    Kx = np.asarray(pairwise_distance(x))
    Ky = np.asarray(pairwise_distance(y))
    F32 = np.asarray(prime_dual(Kx, Ky, dx=8, dy=8, epoch_pd=800,
                                verbose=False))
    Fb = np.asarray(prime_dual(Kx, Ky, dx=8, dy=8, epoch_pd=800,
                               verbose=False, state_dtype='bfloat16'))
    assert Fb.dtype == np.float32
    assert np.isfinite(Fb).all() and (Fb >= 0).all()
    corr = np.corrcoef(F32.ravel(), Fb.ravel())[0, 1]
    assert corr > 0.998, corr
    rel = np.linalg.norm(F32 - Fb) / max(np.linalg.norm(F32), 1e-12)
    assert rel < 0.05, rel


def test_prime_dual_bf16_state_sharded_matches_unsharded():
    """bf16 state + mesh sharding compose (the padded rows stay masked)."""
    import jax
    from jamie_tpu.core.mesh import create_mesh

    if len(jax.devices()) < 4:
        import pytest
        pytest.skip('needs the virtual multi-device mesh')
    mesh = create_mesh(shape=(4,), axis_names=('data',),
                       devices=jax.devices()[:4])
    rng = np.random.RandomState(4)
    x = rng.randn(21, 5).astype(np.float32)   # odd N: pad path
    Kx = np.asarray(pairwise_distance(x))
    F_ref = np.asarray(prime_dual(Kx, Kx, dx=5, dy=5, epoch_pd=200,
                                  verbose=False, state_dtype='bfloat16'))
    F_sh = np.asarray(prime_dual(Kx, Kx, dx=5, dy=5, epoch_pd=200,
                                 verbose=False, state_dtype='bfloat16',
                                 mesh=mesh))
    np.testing.assert_allclose(F_sh, F_ref, rtol=1e-3, atol=1e-5)


def test_solver_state_dtype_auto_resolution():
    """'auto' (the default) resolves by dense-state entry count: exact
    f32 up to DENSE_F32_STATE_ENTRIES, bf16 in the band up to
    LANDMARK_AUTO_ENTRIES (measured chip ceilings, RESULTS.md round 5);
    explicit values pass through untouched."""
    from jamie_tpu import JAMIE
    from jamie_tpu.estimator import (
        DENSE_F32_STATE_ENTRIES, LANDMARK_AUTO_ENTRIES,
    )

    jm = JAMIE()
    assert jm.config.solver_state_dtype == 'auto'
    assert jm._resolved_state_dtype(10_000) == 'float32'
    assert jm._resolved_state_dtype(DENSE_F32_STATE_ENTRIES) == 'float32'
    assert (jm._resolved_state_dtype(DENSE_F32_STATE_ENTRIES + 1)
            == 'bfloat16')
    # The band the raise opened really is below the landmark cutoff
    assert DENSE_F32_STATE_ENTRIES < LANDMARK_AUTO_ENTRIES
    assert LANDMARK_AUTO_ENTRIES == 520_000_000

    jm32 = JAMIE(solver_state_dtype='float32')
    assert jm32._resolved_state_dtype(10**12) == 'float32'
    jmb = JAMIE(solver_state_dtype='bfloat16')
    assert jmb._resolved_state_dtype(4) == 'bfloat16'
