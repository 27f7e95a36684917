"""Metric and figure-suite tests (figures on the Agg backend)."""

import matplotlib

matplotlib.use('Agg')

import matplotlib.pyplot as plt  # noqa: E402
import numpy as np  # noqa: E402
import pytest  # noqa: E402

from jamie_tpu import evaluation as ev  # noqa: E402


@pytest.fixture()
def integrated():
    rng = np.random.RandomState(0)
    z = rng.randn(80, 8)
    labels = np.where(rng.rand(80) > 0.5, 'a', 'b')
    a = z + 0.05 * rng.randn(80, 8)
    b = z + 0.05 * rng.randn(80, 8)
    return [a, b], [labels, labels]


def test_foscttm_aligned_near_zero(integrated):
    data, labels = integrated
    f = ev.test_closer(data)
    assert f < 0.05


def test_foscttm_blocked_matches_single_dispatch(integrated, monkeypatch):
    """The atlas row-blocked FOSCTTM is exact: forcing tiny blocks must
    reproduce the single-dispatch value bit-for-bit (integer comparisons)."""
    data, _ = integrated
    ref = ev.test_closer(data)
    monkeypatch.setattr(ev, '_FOSCTTM_BLOCK_ENTRIES', 80 * 7)  # ~9-row blocks
    blocked = ev.test_closer(data)
    assert blocked == ref


def test_lta_blocked_matches_single_dispatch(integrated, monkeypatch):
    data, labels = integrated
    ref = ev.knn_label_transfer_accuracy(data, labels, k=5)
    monkeypatch.setattr(ev, '_FOSCTTM_BLOCK_ENTRIES', 80 * 7)
    blocked = ev.knn_label_transfer_accuracy(data, labels, k=5)
    assert blocked == ref


def test_foscttm_matches_reference_formula(integrated):
    data, _ = integrated
    ours = ev.test_closer(data)
    from sklearn.metrics.pairwise import pairwise_distances
    ref = ev.test_closer(
        data, distance_metric=lambda x: pairwise_distances(
            x, metric='euclidean'))
    assert abs(ours - ref) < 1e-6


def test_foscttm_random_near_half():
    rng = np.random.RandomState(1)
    a = rng.randn(100, 5)
    b = rng.randn(100, 5)
    f = ev.test_closer([a, b])
    assert 0.3 < f < 0.7


def test_lta_matches_sklearn(integrated):
    data, labels = integrated
    ours, k = ev.knn_label_transfer_accuracy(data, labels, k=5)
    from sklearn.neighbors import KNeighborsClassifier
    knn = KNeighborsClassifier(n_neighbors=5)
    knn.fit(data[1], labels[1])
    ref = np.mean(knn.predict(data[0]) == labels[0])
    assert abs(ours - ref) < 0.05  # tie-breaking may differ slightly


def test_lta_auto_k(integrated):
    data, labels = integrated
    acc, k = ev.knn_label_transfer_accuracy(data, labels, k=None)
    # 20% of avg class size: ~0.2 * 80/2 = 8
    assert 4 <= k <= 12


def test_label_dist(integrated):
    data, labels = integrated
    keys, dist = ev.test_label_dist(data, labels, verbose=False)
    assert list(keys) == ['a', 'b']
    assert dist.shape == (2, 2)
    assert dist[0, 1] > 0


def test_plot_integrated_smoke(integrated):
    data, labels = integrated
    plt.figure()
    ev.plot_integrated(data, labels, names=['m1', 'm2'], method='pca')
    plt.close('all')


def test_plot_accuracy_smoke(integrated):
    data, labels = integrated
    plt.figure()
    ev.plot_accuracy([data], labels, ['JAMIE'])
    plt.close('all')


def test_plot_accuracy_table_smoke(integrated):
    data, labels = integrated
    plt.figure()
    ev.plot_accuracy_table([data, data], labels, ['A', 'B'])
    plt.close('all')


def test_plot_accuracy_graph_smoke(integrated):
    data, labels = integrated
    plt.figure()
    ev.plot_accuracy_graph([data, data], labels, ['A', 'B'])
    plt.close('all')


def test_plot_silhouette_smoke(integrated):
    data, labels = integrated
    plt.figure()
    ev.plot_silhouette([data], labels, ['JAMIE'], ['m1', 'm2'])
    plt.close('all')


def test_plot_correlation_smoke(integrated):
    data, labels = integrated
    rng = np.random.RandomState(0)
    imputed = [[d + 0.3 * rng.randn(*d.shape) for d in data]]
    plt.figure()
    ev.plot_correlation(imputed * 2, data, ['m1', 'm2'],
                        names=['A', 'B'])
    plt.close('all')


def test_plot_auroc_smoke(integrated):
    data, labels = integrated
    rng = np.random.RandomState(0)
    imputed = [[d + 0.3 * rng.randn(*d.shape) for d in data]]
    plt.figure()
    ev.plot_auroc(imputed * 2, data, ['m1', 'm2'], names=['A', 'B'])
    plt.close('all')


def test_plot_sample_smoke(integrated):
    data, _ = integrated
    rng = np.random.RandomState(0)
    imputed = data[0] + 0.2 * rng.randn(*data[0].shape)
    plt.figure()
    idx = ev.plot_sample(data[0], imputed, 'Imputed', 'm1')
    assert 0 <= idx < data[0].shape[0]
    plt.close('all')


def test_plot_distribution_similarity_smoke(integrated):
    data, labels = integrated
    plt.figure()
    ev.plot_distribution_similarity(
        [np.asarray(d) for d in data], labels[0], title='JS')
    plt.close('all')


def test_plot_impact_smoke():
    rng = np.random.RandomState(0)
    values = rng.rand(20)
    fnames = np.array([f'f{i}' for i in range(20)])
    plt.figure()
    ev.plot_impact(values, fnames, baseline=0.5, max_features=10)
    plt.close('all')


def test_evaluate_impact_host():
    rng = np.random.RandomState(0)
    x = rng.randn(50, 6)
    w = np.full(6, 0.1)
    w[2] = 5.0  # feature 2 dominates
    y = x @ w

    def function(data, idx=None):
        return data @ w

    def perf(logits, true):
        return np.corrcoef(logits, true)[0, 1]

    baseline, performance, idx = ev.evaluate_impact(function, perf, x, y)
    assert baseline > 0.99
    # occluding feature 2 should hurt the most
    assert np.argmin(performance) == 2


def test_plot_auroc_density_branch(integrated):
    """Density mode of the AUROC/correlation template (reference
    jamie/evaluation.py:529-545), missing in round 1."""
    data, labels = integrated
    rng = np.random.RandomState(0)
    imputed = [[d + 0.3 * rng.randn(*d.shape) for d in data]]
    plt.figure()
    ev.plot_auroc(imputed * 2, data, ['m1', 'm2'], names=['A', 'B'],
                  plot_type='density')
    plt.close('all')


def test_vectorized_auroc_matches_sklearn():
    from sklearn.metrics import roc_auc_score
    from jamie_tpu.figures import _binary_auroc_by_column
    rng = np.random.RandomState(3)
    score = rng.randn(80, 12)
    truth = rng.randn(80, 12) + 0.5 * score
    positive = truth > np.median(truth)
    mine = _binary_auroc_by_column(score, positive)
    for j in range(12):
        expect = roc_auc_score(positive[:, j], score[:, j])
        np.testing.assert_allclose(mine[j], expect, rtol=1e-12)


def test_vectorized_pearson_matches_scipy():
    from scipy.stats import pearsonr
    from jamie_tpu.figures import _pearson_by_column
    rng = np.random.RandomState(4)
    pred = rng.randn(60, 7)
    true = rng.randn(60, 7) + 0.3 * pred
    mine = _pearson_by_column(pred, true)
    for j in range(7):
        np.testing.assert_allclose(mine[j], pearsonr(pred[:, j],
                                                     true[:, j])[0],
                                   rtol=1e-10)


def test_sign_test_matches_binomial():
    from scipy.stats import binom
    from jamie_tpu.figures import _sign_test_p
    n, wins = 40, 28
    upper = binom.sf(wins - 1, n, 0.5)
    assert abs(_sign_test_p(wins, n) - 2 * min(upper, 1 - upper)) < 1e-12
    assert _sign_test_p(0, 0) == 1.0

def test_evaluate_impact_keep_sequential_restores():
    """keep mode restores occluded columns even under sequential=True,
    matching the reference's boolean-mask copy semantics
    (jamie/evaluation.py:1022-1036; ADVICE round 2)."""
    rng = np.random.RandomState(1)
    x = rng.randn(40, 4)
    w = np.array([4.0, 3.0, 2.0, 1.0])
    y = x @ w

    def function(data, idx=None):
        return data @ w

    def perf(logits, true):
        return np.corrcoef(logits, true)[0, 1]

    base, seq, _ = ev.evaluate_impact(function, perf, x, y, mode='keep',
                                      sequential=True)
    base2, plain, _ = ev.evaluate_impact(function, perf, x, y, mode='keep',
                                         sequential=False)
    np.testing.assert_allclose(seq, plain, atol=1e-12)
