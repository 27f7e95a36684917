"""Device UMAP (solvers/umap.py): calibration, curve fit, embedding
quality, and the preclass wiring (reference model_pca='umap',
jamie/jamie.py:444-451)."""

import numpy as np
import pytest

from jamie_tpu.solvers.umap import (
    _fuzzy_graph, _smooth_knn, fit_ab, umap_embed,
)


def test_fit_ab_default_matches_umap_learn():
    # umap-learn's committed find_ab_params(1.0, 0.1) result
    a, b = fit_ab(0.1, 1.0)
    assert a == pytest.approx(1.57694, abs=1e-3)
    assert b == pytest.approx(0.89506, abs=1e-3)


def test_fit_ab_nondefault_curve_shape():
    a, b = fit_ab(0.5, 1.0)
    # larger min_dist flattens the curve near 0 -> smaller a
    a0, _ = fit_ab(0.1, 1.0)
    assert a < a0
    # the fitted curve tracks the target at min_dist
    assert 1.0 / (1.0 + a * 0.5 ** (2 * b)) == pytest.approx(1.0, abs=0.2)


def test_smooth_knn_hits_log2k_target():
    import jax.numpy as jnp
    rng = np.random.RandomState(0)
    knn_d = np.sort(np.abs(rng.randn(50, 15)), axis=1).astype(np.float32)
    rho, sigma = _smooth_knn(jnp.asarray(knn_d))
    np.testing.assert_allclose(np.asarray(rho), knn_d[:, 0], atol=1e-6)
    w = np.exp(-np.maximum(knn_d - np.asarray(rho)[:, None], 0)
               / np.asarray(sigma)[:, None])
    np.testing.assert_allclose(w.sum(1), np.log2(15), atol=1e-2)


def test_fuzzy_graph_symmetric_bounded():
    import jax.numpy as jnp
    from jamie_tpu.ops.distances import pairwise_distance
    rng = np.random.RandomState(1)
    X = rng.randn(60, 8).astype(np.float32)
    W = np.asarray(_fuzzy_graph(
        jnp.asarray(pairwise_distance(X, 'euclidean')), 10))
    np.testing.assert_allclose(W, W.T, atol=1e-6)
    assert W.min() >= 0.0 and W.max() <= 1.0 + 1e-6
    assert np.allclose(np.diag(W), 0.0)
    # every row keeps its neighborhood: >= k nonzeros
    assert (np.count_nonzero(W, axis=1) >= 10).all()


def test_umap_embed_separates_clusters():
    rng = np.random.RandomState(2)
    a = rng.randn(40, 12).astype(np.float32)
    b = rng.randn(40, 12).astype(np.float32) + 12.0
    X = np.vstack([a, b])
    emb = umap_embed(X, n_components=2, n_epochs=150, seed=0)
    assert emb.shape == (80, 2) and np.isfinite(emb).all()
    ca, cb = emb[:40].mean(0), emb[40:].mean(0)
    spread = max(emb[:40].std(), emb[40:].std())
    assert np.linalg.norm(ca - cb) > 2.0 * spread


def test_umap_embed_deterministic_per_seed():
    rng = np.random.RandomState(3)
    X = rng.randn(30, 6).astype(np.float32)
    e1 = umap_embed(X, n_epochs=50, seed=7)
    e2 = umap_embed(X, n_epochs=50, seed=7)
    np.testing.assert_allclose(e1, e2, atol=1e-5)
    e3 = umap_embed(X, n_epochs=50, seed=8)
    assert not np.allclose(e1, e3, atol=1e-5)


def test_umap_tiny_input_guard():
    import warnings
    with warnings.catch_warnings(record=True) as rec:
        warnings.simplefilter('always')
        emb = umap_embed(np.zeros((2, 4), np.float32))
    assert emb.shape == (2, 2)
    assert any('umap' in str(r.message).lower() for r in rec)


def test_estimator_umap_preclass_end_to_end():
    """model_pca='umap' through the public API: fit, project, impute."""
    from jamie_tpu import JAMIE
    rng = np.random.RandomState(4)
    z = rng.randn(40, 4).astype(np.float32)
    d1 = (z @ rng.randn(4, 20)).astype(np.float32)
    d2 = (z @ rng.randn(4, 15)).astype(np.float32)
    jm = JAMIE(model_pca='umap', pca_dim=[6, 6], epoch_DNN=20,
               min_epochs=5, epoch_chunk=5, batch_size=20,
               use_early_stop=False)
    emb = jm.fit_transform(dataset=[d1, d2])
    assert emb[0].shape[0] == 40 and np.isfinite(emb[0]).all()
    imp = jm.modal_predict(d1, 0)
    assert imp.shape == (40, 15) and np.isfinite(imp).all()
