"""Sampling-regime tests: detection and batch statistics."""

import jax
import numpy as np

from jamie_tpu.train.sampling import (detect_sampling_method,
                                      make_epoch_sampler, make_sampler)


def test_detect_diag():
    assert detect_sampling_method(np.eye(5)) == 'diag'


def test_detect_hybrid():
    P = np.diag([1., 0., 1., 0., 1.])
    assert detect_sampling_method(P) == 'hybrid'
    P = np.zeros((4, 6))
    P[0, 1] = 1
    assert detect_sampling_method(P) == 'hybrid'


def test_detect_zeros():
    assert detect_sampling_method(np.zeros((4, 6))) == 'zeros'


def test_diag_sampler_no_replacement():
    sample = make_sampler('diag', (100, 100), 64)
    idx0, idx1 = sample(jax.random.PRNGKey(0))
    assert idx0.shape == (64,)
    np.testing.assert_array_equal(idx0, idx1)
    assert len(np.unique(np.asarray(idx0))) == 64  # no replacement


def test_diag_sampler_with_replacement_when_batch_exceeds_rows():
    sample = make_sampler('diag', (10, 10), 32)
    idx0, _ = sample(jax.random.PRNGKey(0))
    assert idx0.shape == (32,)
    assert np.asarray(idx0).max() < 10


def test_zeros_sampler_independent():
    sample = make_sampler('zeros', (50, 80), 32)
    idx0, idx1 = sample(jax.random.PRNGKey(0))
    assert np.asarray(idx0).max() < 50
    assert np.asarray(idx1).max() < 80
    assert not np.array_equal(np.asarray(idx0), np.asarray(idx1))


def test_hybrid_sampler_statistics():
    """~true_ratio of slots are matched pairs (jamie.py:559-573 intent)."""
    rng = np.random.RandomState(0)
    n = 200
    mask = rng.rand(n) < 0.5
    P = np.diag(mask.astype(float))
    pairs = np.argwhere(P > 0)
    sample = make_sampler('hybrid', (n, n), 128, corr_pairs=pairs,
                          true_ratio=0.8)
    frac_matched = []
    pair_set = {tuple(p) for p in pairs}
    for s in range(20):
        idx0, idx1 = sample(jax.random.PRNGKey(s))
        matched = sum((int(a), int(b)) in pair_set
                      for a, b in zip(np.asarray(idx0), np.asarray(idx1)))
        frac_matched.append(matched / 128)
    mean_frac = np.mean(frac_matched)
    # matched pairs arise from corr slots (0.8) plus random coincidences
    assert 0.7 < mean_frac < 0.95


def test_epoch_sampler_diag_exhaustive_without_replacement():
    """Each batch is without-replacement AND the epoch covers every cell."""
    n, batch, steps = 100, 32, 4   # ceil(100/32) = 4 -> 128 slots, wraps
    sample = make_epoch_sampler('diag', (n, n), batch, steps)
    idx0, idx1 = sample(jax.random.PRNGKey(0))
    assert idx0.shape == (steps, batch)
    np.testing.assert_array_equal(idx0, idx1)
    for row in np.asarray(idx0):
        assert len(np.unique(row)) == batch   # within-batch no replacement
    assert len(np.unique(np.asarray(idx0))) == n   # epoch exhaustive


def test_epoch_sampler_diag_with_replacement_when_batch_exceeds_rows():
    sample = make_epoch_sampler('diag', (10, 10), 32, 1)
    idx0, _ = sample(jax.random.PRNGKey(0))
    assert idx0.shape == (1, 32)
    assert np.asarray(idx0).max() < 10


def test_epoch_sampler_zeros_independent_per_modality():
    sample = make_epoch_sampler('zeros', (50, 80), 32, 3)
    idx0, idx1 = sample(jax.random.PRNGKey(0))
    assert np.asarray(idx0).max() < 50
    assert np.asarray(idx1).max() < 80
    for row in np.asarray(idx1):
        assert len(np.unique(row)) == 32
    assert not np.array_equal(np.asarray(idx0), np.asarray(idx1))


def test_epoch_sampler_hybrid_statistics_match_per_step():
    """The epoch draw keeps the per-step hybrid distribution exactly."""
    rng = np.random.RandomState(0)
    n = 200
    mask = rng.rand(n) < 0.5
    pairs = np.argwhere(np.diag(mask.astype(float)) > 0)
    sample = make_epoch_sampler('hybrid', (n, n), 128, 10,
                                corr_pairs=pairs, true_ratio=0.8)
    idx0, idx1 = sample(jax.random.PRNGKey(0))
    pair_set = {tuple(p) for p in pairs}
    matched = sum((int(a), int(b)) in pair_set
                  for a, b in zip(np.asarray(idx0).ravel(),
                                  np.asarray(idx1).ravel()))
    assert 0.7 < matched / idx0.size < 0.95
