"""Legacy t-SNE projection path tests."""

import numpy as np
import pytest

from jamie_tpu.solvers.tsne import joint_probabilities, project_tsne


def test_joint_probabilities_properties():
    rng = np.random.RandomState(0)
    x = rng.randn(60, 5)
    from jamie_tpu.ops.distances import pairwise_distance
    D = np.asarray(pairwise_distance(x))
    P = joint_probabilities(D, perplexity=15)
    assert P.shape == (60, 60)
    np.testing.assert_allclose(P.sum(), 1.0, rtol=1e-4)
    np.testing.assert_allclose(P, P.T, atol=1e-7)
    assert (P >= 0).all()
    assert np.diag(P).max() < 1e-6


def test_project_tsne_separates_clusters():
    rng = np.random.RandomState(1)
    n = 60
    labels = rng.randint(0, 2, n)
    centers = np.array([[0.0] * 5, [8.0] * 5])
    x = centers[labels] + 0.3 * rng.randn(n, 5)
    y = x[:, :4] + 0.1 * rng.randn(n, 4)  # second modality, aligned

    from jamie_tpu.ops.distances import pairwise_distance
    P1 = joint_probabilities(np.asarray(pairwise_distance(x)), 15)
    P2 = joint_probabilities(np.asarray(pairwise_distance(y)), 15)
    pairs = np.arange(n)
    Y1, Y2 = project_tsne([x, y], [P1, P2], pairs, pairs, output_dim=2,
                          n_iters=400)
    assert np.isfinite(Y1).all() and np.isfinite(Y2).all()
    # clusters separate in the embedding
    d_intra = np.linalg.norm(
        Y1[labels == 0] - Y1[labels == 0].mean(0), axis=1).mean()
    d_inter = np.linalg.norm(
        Y1[labels == 0].mean(0) - Y1[labels == 1].mean(0))
    assert d_inter > 2 * d_intra
    # matched pairs land close
    d_match = np.linalg.norm(Y1 - Y2, axis=1).mean()
    rand = np.linalg.norm(Y1 - Y2[rng.permutation(n)], axis=1).mean()
    assert d_match < rand


def test_estimator_tsne_mode():
    from jamie_tpu import JAMIE
    rng = np.random.RandomState(2)
    z = rng.randn(50, 4).astype(np.float32)
    x0 = (z @ rng.randn(4, 20)).astype(np.float32)
    x1 = (z @ rng.randn(4, 15)).astype(np.float32)
    jm = JAMIE(project_mode='tsne', output_dim=2, epoch_pd=200,
               distance_mode='euclidean', perplexity=10)
    out = jm.fit_transform(dataset=[x0, x1])
    assert out[0].shape == (50, 2)
    assert out[1].shape == (50, 2)
    assert np.isfinite(out[0]).all()


def test_estimator_tsne_mode_zeros_sentinel(monkeypatch):
    """project_mode='tsne' + use_f_tilde=False past the sentinel threshold:
    the all-zeros F is never materialized, and the hungarian pairs are the
    synthesized leading diagonal (round-2 verdict: this path raised
    IndexError on self.pairs_x[0])."""
    import jamie_tpu.estimator as est
    from jamie_tpu import JAMIE

    monkeypatch.setattr(est, 'SENTINEL_ENTRIES', 100)  # 40*40 > 100
    rng = np.random.RandomState(3)
    z = rng.randn(40, 3).astype(np.float32)
    x0 = (z @ rng.randn(3, 12)).astype(np.float32)
    x1 = (z @ rng.randn(3, 9)).astype(np.float32)
    jm = JAMIE(project_mode='tsne', output_dim=2, use_f_tilde=False,
               distance_mode='euclidean', perplexity=10)
    out = jm.fit_transform(dataset=[x0, x1])
    assert jm.match_result == ['zeros']
    np.testing.assert_array_equal(jm.pairs_x[0], np.arange(40))
    np.testing.assert_array_equal(jm.pairs_y[0], np.arange(40))
    assert out[0].shape == (40, 2) and np.isfinite(out[0]).all()
