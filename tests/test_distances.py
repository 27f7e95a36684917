"""Distance-matrix parity against scipy/sklearn references."""

import numpy as np
import pytest
from scipy import stats
from sklearn.metrics.pairwise import pairwise_distances

from jamie_tpu.ops.distances import (
    dataset_distance_matrix, geodesic_distances, pairwise_distance,
)


@pytest.fixture(scope='module')
def X():
    return np.random.RandomState(0).randn(40, 12).astype(np.float32)


def test_euclidean_matches_sklearn(X):
    ours = np.asarray(pairwise_distance(X, 'euclidean'))
    ref = pairwise_distances(X, metric='euclidean')
    np.testing.assert_allclose(ours, ref, atol=1e-3)


def test_sqeuclidean(X):
    ours = np.asarray(pairwise_distance(X, 'sqeuclidean'))
    ref = pairwise_distances(X, metric='sqeuclidean')
    np.testing.assert_allclose(ours, ref, atol=1e-3)


def test_cosine(X):
    ours = np.asarray(pairwise_distance(X, 'cosine'))
    ref = pairwise_distances(X, metric='cosine')
    np.testing.assert_allclose(ours, ref, atol=1e-4)


def test_correlation(X):
    ours = np.asarray(pairwise_distance(X, 'correlation'))
    ref = pairwise_distances(X, metric='correlation')
    np.testing.assert_allclose(ours, ref, atol=1e-4)


def test_host_fallback_metric(X):
    ours = np.asarray(pairwise_distance(X, 'cityblock'))
    ref = pairwise_distances(X, metric='cityblock')
    np.testing.assert_allclose(ours, ref, atol=1e-3)


def test_blockwise_equals_direct():
    X = np.random.RandomState(1).randn(300, 8).astype(np.float32)
    direct = np.asarray(pairwise_distance(X, 'euclidean', block=4096))
    blocked = np.asarray(pairwise_distance(X, 'euclidean', block=64))
    np.testing.assert_allclose(direct, blocked, atol=1e-4)


def test_spearman_mode(X):
    ours = dataset_distance_matrix(X, 'spearman')
    rho, _ = stats.spearmanr(X, axis=1)
    ref = (1 - rho) / 2
    np.testing.assert_allclose(ours, ref, atol=1e-4)


def test_spearman_ties_match_scipy():
    """Integer-valued data has heavy rank ties; tie-averaging must be exact
    (scipy rankdata method='average')."""
    X = np.random.RandomState(3).randint(0, 4, (30, 25)).astype(np.float32)
    from jamie_tpu.ops.distances import _rank_rows
    ours = np.asarray(_rank_rows(X))
    ref = np.vstack([stats.rankdata(row, method='average') for row in X])
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_spearman_reference_shape():
    """scMNC-Visual shape (3654 x 1302): the old F^2-per-row tie-averaging
    materialized N*F^2 ~ 6.2e9 elements under vmap; the sort-based ranker
    must handle this in O(N*F)."""
    rng = np.random.RandomState(4)
    X = rng.randn(3654, 1302).astype(np.float32)
    X[:, :50] = np.round(X[:, :50])  # inject ties
    d = dataset_distance_matrix(X, 'spearman')
    assert d.shape == (3654, 3654)
    assert np.isfinite(d).all()
    # spot-check 5 random rows against scipy
    idx = rng.choice(3654, 5, replace=False)
    sub = X[idx]
    rho, _ = stats.spearmanr(sub, axis=1)
    np.testing.assert_allclose(d[np.ix_(idx, idx)], (1 - rho) / 2, atol=1e-3)


def test_pearson_mode(X):
    ours = dataset_distance_matrix(X, 'pearson')
    ref = (1 - np.corrcoef(X)) / 2
    np.testing.assert_allclose(ours, ref, atol=1e-4)


def test_geodesic_connected():
    """Geodesic >= euclidean, zero diagonal, symmetric, finite."""
    X = np.random.RandomState(2).randn(60, 5).astype(np.float32)
    g = geodesic_distances(X, kmax=40)
    assert g.shape == (60, 60)
    assert np.isfinite(g).all()
    np.testing.assert_allclose(np.diag(g), 0, atol=1e-5)
    np.testing.assert_allclose(g, g.T, atol=1e-4)
    e = np.asarray(pairwise_distance(X, 'euclidean'))
    assert (g >= e - 1e-3).all()  # shortest path can't beat straight line


def test_feature_chunked_matches_direct():
    from jamie_tpu.ops import distances as D
    X = np.random.RandomState(3).randn(50, 200).astype(np.float32)
    direct = np.asarray(D._pairwise_euclidean_impl(X, squared=True))
    old = D._FEATURE_CHUNK_THRESHOLD
    try:
        D._FEATURE_CHUNK_THRESHOLD = 100  # force the streaming path
        chunked = np.asarray(D._pairwise_euclidean_impl(X, squared=True))
    finally:
        D._FEATURE_CHUNK_THRESHOLD = old
    # the streamed path uses bf16-input matmuls (f32 accumulation)
    np.testing.assert_allclose(chunked, direct, rtol=2e-2, atol=0.5)


def test_resident_bf16_matches_streamed(monkeypatch):
    """The whole-matrix bf16 residency path agrees with the f32 streamed
    path to bf16-input tolerance."""
    import jamie_tpu.ops.distances as dmod
    from jamie_tpu.core import residency

    rng = np.random.RandomState(6)
    X = rng.randn(120, 600).astype(np.float32)
    ref = np.asarray(pairwise_distance(X, 'euclidean'))

    monkeypatch.setattr(dmod, '_FEATURE_CHUNK_THRESHOLD', 10_000)
    try:
        ours = np.asarray(pairwise_distance(X, 'euclidean'))
    finally:
        residency.clear_residency_cache()
    assert np.abs(ours - ref).max() / max(ref.max(), 1) < 0.01
    # symmetric, zero diagonal
    np.testing.assert_allclose(np.diag(ours), 0, atol=1e-4)


def test_residency_cache_shared_and_cleared():
    from jamie_tpu.core import residency

    X = np.random.RandomState(7).randn(50, 40).astype(np.float32)
    a = residency.device_bf16(X)
    b = residency.device_bf16(X)
    assert a is b                      # one upload, shared
    assert residency.device_bf16(X, budget_bytes=10) is None  # over budget
    residency.clear_residency_cache()
    c = residency.device_bf16(X)
    assert c is not a
    residency.clear_residency_cache()


def test_residency_cache_evicts_on_gc():
    """A dead host array releases its device bf16 copy immediately via the
    weakref callback (ADVICE round 2: the round-2 cache leaked HBM until an
    id-collision lookup)."""
    from jamie_tpu.core import residency

    residency.clear_residency_cache()
    X = np.random.RandomState(0).randn(64, 8).astype(np.float32)
    assert residency.device_bf16(X) is not None
    assert len(residency._cache) == 1
    del X
    import gc
    gc.collect()
    assert len(residency._cache) == 0


def test_resident_build_chunked_matches_exact(monkeypatch):
    """The row-chunked donated resident build (the scGLUE-class Distance
    fast path) produces distances matching the exact f32 build to
    bf16-input tolerance, handles row counts that don't divide the chunk,
    and leaves the residency installed for the PCA phase."""
    import jamie_tpu.ops.distances as dmod
    from jamie_tpu.core import residency

    rng = np.random.RandomState(8)
    for n in (96, 130):
        X = rng.randn(n, 700).astype(np.float32)
        ref = np.asarray(pairwise_distance(X, 'euclidean'))
        residency.clear_residency_cache()
        # multi-chunk donated build (16 rows/chunk) is bf16-faithful
        dev = residency.build_resident_bf16(X, chunk_bytes=700 * 2 * 16)
        assert dev.shape == X.shape and str(dev.dtype) == 'bfloat16'
        np.testing.assert_allclose(np.asarray(dev, np.float32), X,
                                   rtol=1e-2, atol=1e-2)
        # the huge-matrix dispatch builds + caches its own residency
        monkeypatch.setattr(dmod, '_FEATURE_CHUNK_THRESHOLD', 10_000)
        ours = np.asarray(pairwise_distance(X, 'euclidean'))
        assert np.abs(ours - ref).max() / max(ref.max(), 1) < 0.01
        np.testing.assert_allclose(np.diag(ours), 0, atol=1e-4)
        np.testing.assert_allclose(ours, ours.T, atol=1e-4)
        # ...and it stays installed for the PCA phase: repeat lookups hit
        first = residency.device_bf16(X)
        assert first is residency.device_bf16(X)
        residency.clear_residency_cache()
