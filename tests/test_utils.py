"""Utility-layer tests: triage, hashing, JS distance, baselines, timing."""

import numpy as np
import pytest

from jamie_tpu.utils import (
    ensure_list, hash_kwargs, jensen_shannon_from_array, outliers,
    predict_knn, sort_by_interest, time_logger,
)


def test_outliers_basic():
    x = np.concatenate([np.zeros(20), [100.0]])[:, None]
    mask = outliers(x)
    assert mask[-1, 0]
    assert not mask[:20].any()


def test_outliers_limits():
    x = np.random.RandomState(0).randn(100, 3)
    result, (lo, hi, span) = outliers(x, return_limits=True)
    assert lo.shape == (1, 3)
    assert (hi > lo).all()


def test_ensure_list():
    assert ensure_list(3).tolist() == [3]
    assert ensure_list([1, 2]).tolist() == [1, 2]
    assert ensure_list(np.array([1])).tolist() == [1]


def test_jensen_shannon_identical_is_zero():
    rng = np.random.RandomState(0)
    a = rng.randn(500)
    assert jensen_shannon_from_array([a, a]) < 1e-9


def test_jensen_shannon_disjoint_is_large():
    rng = np.random.RandomState(0)
    a = rng.randn(500)
    b = rng.randn(500) + 50
    assert jensen_shannon_from_array([a, b]) > 0.7


def test_sort_by_interest_shapes():
    rng = np.random.RandomState(0)
    true = rng.randn(100, 12)
    pred = true + 0.5 * rng.randn(100, 12)
    order, idx = sort_by_interest([true, pred], limit=5)
    assert len(order) == 12
    assert len(idx) <= 5


def test_hash_kwargs_defaults_collapse():
    data = [np.zeros((10, 4)), np.zeros((10, 3))]
    size_str, hash_str = hash_kwargs({'output_dim': 32}, 'toy', data)
    assert size_str == 'toy---10-4---10-3'
    assert hash_str == size_str  # default value drops out


def test_hash_kwargs_nondefault_included():
    data = [np.zeros((10, 4)), np.zeros((10, 3))]
    _, hash_str = hash_kwargs({'output_dim': 64}, 'toy', data)
    assert 'output_dim' in hash_str and '64' in hash_str


def test_predict_knn():
    rng = np.random.RandomState(0)
    x = rng.randn(50, 5)
    y = x @ rng.randn(5, 3)
    pred = predict_knn(x, y, k=3)
    assert pred.shape == y.shape
    r = np.corrcoef(pred.ravel(), y.ravel())[0, 1]
    assert r > 0.8


def test_predict_nn_runs():
    from jamie_tpu.models.baselines import predict_nn
    rng = np.random.RandomState(0)
    x = rng.randn(40, 6).astype(np.float32)
    y = (x @ rng.randn(6, 4)).astype(np.float32)
    pred = predict_nn(x, y, epochs=5, batch_size=16)
    assert pred.shape == y.shape
    assert np.isfinite(pred).all()


def test_time_logger_sections(capsys):
    tl = time_logger()
    tl.log('a')
    tl.log('b')
    tl.log('a')
    total = tl.aggregate()
    out = capsys.readouterr().out
    assert 'a:' in out and 'b:' in out and 'Total:' in out
    assert total > 0
    assert len(tl.history['a']) == 2


def test_config_cache_key():
    from jamie_tpu.config import JamieConfig
    c1 = JamieConfig()
    c2 = JamieConfig(output_dim=64)
    k1 = c1.cache_key('toy', [(10, 4), (10, 3)])
    k2 = c2.cache_key('toy', [(10, 4), (10, 3)])
    assert k1 == 'toy---10-4---10-3'
    assert k1 != k2
    assert c2.nondefault_kwargs() == {'output_dim': 64}


def test_io_load_matrix_roundtrip(tmp_path):
    from jamie_tpu.io import load_matrix
    x = np.random.RandomState(0).randn(10, 4).astype(np.float32)
    np.save(tmp_path / 'm.npy', x)
    np.testing.assert_allclose(load_matrix(str(tmp_path / 'm.npy')), x)
    np.savetxt(tmp_path / 'm.txt', x)
    np.testing.assert_allclose(load_matrix(str(tmp_path / 'm.txt')), x,
                               rtol=1e-5)
    mm = load_matrix(str(tmp_path / 'm.npy'), mmap=True)
    np.testing.assert_allclose(np.asarray(mm), x)
    t = load_matrix(str(tmp_path / 'm.npy'), transpose=True)
    assert t.shape == (4, 10)


def test_config_unknown_kwarg_warns():
    """A misspelled kwarg warns instead of silently running defaults
    (round-2 verdict: silent config typos)."""
    import warnings as w

    from jamie_tpu.config import config_from_kwargs

    with w.catch_warnings(record=True) as rec:
        w.simplefilter('always')
        cfg = config_from_kwargs(epoch_dnn=50)  # typo: epoch_DNN
    assert cfg.epoch_DNN == 10000
    assert any('epoch_dnn' in str(r.message) for r in rec)

    # Known-inert UnionCom params and the lr alias stay silent
    with w.catch_warnings(record=True) as rec:
        w.simplefilter('always')
        cfg = config_from_kwargs(lr=5e-4, beta=1.0)
    assert cfg.model_lr == 5e-4
    assert not rec

    # Conflicting lr + model_lr: model_lr wins and the dropped alias warns
    with w.catch_warnings(record=True) as rec:
        w.simplefilter('always')
        cfg = config_from_kwargs(lr=1e-2, model_lr=1e-4)
    assert cfg.model_lr == 1e-4
    assert any('lr' in str(r.message) and 'ignored' in str(r.message)
               for r in rec)

    # Equal values are not a conflict
    with w.catch_warnings(record=True) as rec:
        w.simplefilter('always')
        cfg = config_from_kwargs(lr=1e-4, model_lr=1e-4)
    assert cfg.model_lr == 1e-4 and not rec


def test_knn_dist_graph_properties():
    from jamie_tpu.nn_funcs import knn_dist
    from scipy.sparse.csgraph import connected_components

    rng = np.random.RandomState(5)
    # two blobs force the component-bridging path (close enough that the
    # bridge's exp(-d2) does not underflow — the reference underflows too)
    x = np.concatenate([rng.randn(12, 3) * 0.3, 1.5 + rng.randn(12, 3) * 0.3])
    adj = knn_dist(x, k=3)
    assert adj.shape == (24, 24)
    np.testing.assert_allclose(adj, adj.T, atol=1e-6)
    # csr input: scipy's dense path silently nulls near-zero edge weights
    import scipy.sparse as sp
    assert connected_components(sp.csr_matrix(adj), directed=False)[0] == 1
    # Gaussian kernel: every edge weight is exp(-d2) of the true distance
    d2 = ((x[:, None] - x[None]) ** 2).sum(-1)
    i, j = np.nonzero(adj)
    np.testing.assert_allclose(adj[i, j], np.exp(-d2[i, j]), rtol=1e-4)
    # each row keeps at least its k nearest others
    nn = np.argsort(d2, axis=1)[:, 1:3]
    assert all(adj[r, c] > 0 for r in range(24) for c in nn[r][:1])


def test_knn_sim_bipartite():
    from jamie_tpu.nn_funcs import knn_sim

    rng = np.random.RandomState(6)
    corr = rng.rand(10, 8).astype(np.float32)
    out = knn_sim(corr, k=2)
    assert out.shape == (10, 8)
    # kept entries are a subset of corr's values, nonnegative
    i, j = np.nonzero(out)
    np.testing.assert_allclose(out[i, j], corr[i, j], rtol=1e-6)
    # every kept entry contains each row's single best partner
    best = corr.argmax(axis=1)
    assert all(out[r, best[r]] > 0 for r in range(10))


def test_load_matrix_mmap_dtype(tmp_path):
    """mmap=True returns the stored dtype (casting would defeat mmap) and
    warns when a different dtype was requested."""
    import warnings as w

    from jamie_tpu.io import load_matrix

    p = str(tmp_path / 'm64.npy')
    np.save(p, np.arange(12, dtype=np.float64).reshape(3, 4))
    with w.catch_warnings(record=True) as rec:
        w.simplefilter('always')
        out = load_matrix(p, mmap=True)           # default dtype=f32
    assert out.dtype == np.float64 and isinstance(out, np.memmap)
    assert any('stored dtype' in str(r.message) for r in rec)
    with w.catch_warnings(record=True) as rec:
        w.simplefilter('always')
        out = load_matrix(p, mmap=True, dtype=None)
    assert out.dtype == np.float64 and not rec
    # non-mmap still casts
    assert load_matrix(p).dtype == np.float32


def test_reference_name_aliases():
    """Every public reference symbol resolves under its reference name:
    preclass (jamie/utilities.py:654) and SimpleJAMIEModel (:681) are the
    two renamed classes — the aliases must stay importable and usable."""
    import jax

    from jamie_tpu.models import SimpleCoupledAE, SimpleJAMIEModel
    from jamie_tpu.preprocess import Preprocessor
    from jamie_tpu.utils import preclass

    assert preclass is Preprocessor
    assert SimpleJAMIEModel is SimpleCoupledAE
    # reference construction signature: positional (input_dim, output_dim)
    m = SimpleJAMIEModel((5, 7), 3)
    xs = [np.ones((4, 5), np.float32), np.ones((4, 7), np.float32)]
    corr = np.eye(4, dtype=np.float32)
    var = m.init(jax.random.PRNGKey(0), xs, corr)
    emb, rec = m.apply(var, xs, corr)
    assert emb[0].shape == (4, 3) and rec[1].shape == (4, 7)
    pre = preclass.fit(np.random.RandomState(0).randn(20, 6), pca_dim=2)
    assert pre.transform(np.random.RandomState(1).randn(3, 6)).shape == (3, 2)
