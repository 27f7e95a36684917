"""SparseLandmarkF: k-sparse landmark factors, the 500k+ cell layout.

Pins that every consumer of the k-sparse layout agrees with the dense
LowRankF built from the same interpolation weights (same math, different
memory: O(N k) vs O(N L) — ops/lowrank.py SparseLandmarkF docstring).
"""

import numpy as np
import pytest

from jamie_tpu.ops.lowrank import LowRankF, SparseLandmarkF


def _random_factors(n0=37, n1=29, L0=11, L1=13, k=3, seed=0):
    """Random k-sparse interpolation factors + the dense LowRankF that
    represents the identical F."""
    rng = np.random.RandomState(seed)
    ix = np.stack([rng.choice(L0, k, replace=False) for _ in range(n0)])
    iy = np.stack([rng.choice(L1, k, replace=False) for _ in range(n1)])
    wx = rng.rand(n0, k).astype(np.float32)
    wx /= wx.sum(1, keepdims=True)
    wy = rng.rand(n1, k).astype(np.float32)
    wy /= wy.sum(1, keepdims=True)
    f_l = rng.rand(L0, L1).astype(np.float32)

    ax = np.zeros((n0, L0), np.float32)
    ax[np.arange(n0)[:, None], ix] = wx
    ay = np.zeros((n1, L1), np.float32)
    ay[np.arange(n1)[:, None], iy] = wy
    sp = SparseLandmarkF(ix, wx, iy, wy, f_l)
    dn = LowRankF(ax @ f_l, ay)
    return sp, dn


def test_shapes_and_dense_agreement():
    sp, dn = _random_factors()
    assert sp.shape == dn.shape
    assert isinstance(sp, LowRankF)   # estimator isinstance checks pass
    np.testing.assert_allclose(sp.to_dense(), dn.to_dense(),
                               rtol=1e-5, atol=1e-7)
    # lazy dense factors agree too
    np.testing.assert_allclose(np.asarray(sp.u), np.asarray(dn.u),
                               rtol=1e-5, atol=1e-7)
    np.testing.assert_allclose(np.asarray(sp.v), np.asarray(dn.v),
                               rtol=1e-6, atol=1e-8)


def test_gather_batch_matches_dense():
    sp, dn = _random_factors(seed=1)
    idx0 = np.array([0, 5, 36, 2, 2])
    idx1 = np.array([1, 28, 7])
    np.testing.assert_allclose(np.asarray(sp.gather_batch(idx0, idx1)),
                               np.asarray(dn.gather_batch(idx0, idx1)),
                               rtol=1e-5, atol=1e-7)


def test_col_sums_and_normalized():
    sp, dn = _random_factors(seed=2)
    np.testing.assert_allclose(np.asarray(sp.col_sums()),
                               np.asarray(dn.col_sums()),
                               rtol=1e-5, atol=1e-7)
    cn = sp.col_normalized()
    assert isinstance(cn, SparseLandmarkF)
    np.testing.assert_allclose(cn.to_dense(), dn.col_normalized().to_dense(),
                               rtol=1e-5, atol=1e-7)
    np.testing.assert_allclose(cn.to_dense().sum(0), 1.0, rtol=1e-5)


def test_topk_matches_dense_topk():
    sp, dn = _random_factors(n0=40, n1=33, seed=3)
    # col_block smaller than n1 exercises the running merge; smaller than
    # k exercises the -inf pad in _topk_merge
    for col_block in (7, 2, 64):
        got = sp.top_k(4, block=16, col_block=col_block).to_dense()
        want = dn.top_k(4, block=16).to_dense()
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-7)


def test_transpose_roundtrip():
    sp, dn = _random_factors(seed=4)
    np.testing.assert_allclose(sp.T.to_dense(), dn.to_dense().T,
                               rtol=1e-5, atol=1e-7)
    assert sp.T.shape == (sp.shape[1], sp.shape[0])


def test_landmark_correspondence_layout_parity():
    """factor_layout='sparse' returns the same F as 'dense' (identical
    landmark set, solver run, and interpolation weights — only the layout
    differs)."""
    from jamie_tpu.solvers.landmark import landmark_correspondence

    rng = np.random.RandomState(5)
    z = rng.randn(90, 5).astype(np.float32)
    x = (z @ rng.randn(5, 16) + 0.05 * rng.randn(90, 16)).astype(np.float32)
    y = (z @ rng.randn(5, 12) + 0.05 * rng.randn(90, 12)).astype(np.float32)
    kw = dict(n_landmarks=32, k_interp=4, epoch_pd=200, verbose=False)
    f_dense = landmark_correspondence(x, y, factor_layout='dense', **kw)
    f_sparse = landmark_correspondence(x, y, factor_layout='sparse', **kw)
    assert isinstance(f_sparse, SparseLandmarkF)
    assert not isinstance(f_dense, SparseLandmarkF)
    np.testing.assert_allclose(f_sparse.to_dense(), f_dense.to_dense(),
                               rtol=1e-4, atol=1e-6)
    with pytest.raises(ValueError):
        landmark_correspondence(x, y, factor_layout='bogus', **kw)


def test_trainer_sparse_factors_match_dense_fit():
    """A fit with F as SparseLandmarkF matches the same fit with the
    equivalent dense-factor LowRankF (same batches, same losses) — pins the
    trainer's on-the-fly batch mix against the materialized-U path."""
    from jamie_tpu.config import JamieConfig
    from jamie_tpu.models import CoupledVAE
    from jamie_tpu.train.trainer import JamieTrainer

    rng = np.random.RandomState(6)
    n = 60
    z = rng.randn(n, 4).astype(np.float32)
    x0 = (z @ rng.randn(4, 12)).astype(np.float32)
    x1 = (z @ rng.randn(4, 9)).astype(np.float32)
    sp, dn = _random_factors(n0=n, n1=n, L0=10, L1=10, k=4, seed=7)
    P = np.eye(n, dtype=np.float32)
    cfg = JamieConfig(epoch_DNN=12, min_epochs=3, batch_size=30,
                      epoch_chunk=6, use_early_stop=False, pca_dim=None,
                      log_DNN=1000)
    model = CoupledVAE((12, 9), cfg.output_dim, dropout=0.0)

    dense = JamieTrainer(cfg, model, [x0, x1], P, dn)
    dense.fit()
    sparse = JamieTrainer(cfg, model, [x0, x1], P, sp)
    sparse.fit()
    np.testing.assert_allclose(sparse.epoch_losses, dense.epoch_losses,
                               rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(sparse.final_corr()),
                               np.asarray(dense.final_corr()),
                               rtol=1e-4, atol=1e-6)


def test_trainer_sparse_factors_on_mesh():
    """Mesh row-sharding of the (N, k) factor arrays: one sharded fit runs
    and matches the unsharded losses."""
    import jax

    from jamie_tpu.config import JamieConfig
    from jamie_tpu.core.mesh import create_mesh
    from jamie_tpu.models import CoupledVAE
    from jamie_tpu.train.trainer import JamieTrainer

    if len(jax.devices()) < 2:
        pytest.skip('needs the multi-device CPU mesh')
    rng = np.random.RandomState(8)
    n = 64
    z = rng.randn(n, 4).astype(np.float32)
    x0 = (z @ rng.randn(4, 12)).astype(np.float32)
    x1 = (z @ rng.randn(4, 9)).astype(np.float32)
    sp, _ = _random_factors(n0=n, n1=n, L0=10, L1=10, k=4, seed=9)
    P = np.eye(n, dtype=np.float32)
    cfg = JamieConfig(epoch_DNN=8, min_epochs=2, batch_size=32,
                      epoch_chunk=4, use_early_stop=False, pca_dim=None,
                      log_DNN=1000)
    model = CoupledVAE((12, 9), cfg.output_dim, dropout=0.0)
    plain = JamieTrainer(cfg, model, [x0, x1], P, sp)
    plain.fit()
    meshed = JamieTrainer(cfg, model, [x0, x1], P, sp, mesh=create_mesh())
    meshed.fit()
    np.testing.assert_allclose(meshed.epoch_losses, plain.epoch_losses,
                               rtol=1e-4, atol=1e-5)


def test_estimator_sparse_layout_end_to_end():
    """Full fit_transform with the landmark path forced and
    corr_factor_layout='sparse': finite embeddings, SparseLandmarkF match
    result, and the final correspondence stays sparse/low-rank."""
    from jamie_tpu import JAMIE

    rng = np.random.RandomState(10)
    z = rng.randn(100, 5).astype(np.float32)
    x = (z @ rng.randn(5, 20) + 0.05 * rng.randn(100, 20)).astype(np.float32)
    y = (z @ rng.randn(5, 15) + 0.05 * rng.randn(100, 15)).astype(np.float32)
    jm = JAMIE(epoch_DNN=10, min_epochs=5, use_early_stop=False,
               batch_size=50, epoch_chunk=5, log_DNN=1000, log_pd=1000,
               epoch_pd=100, pca_dim=None, corr_landmarks=32,
               corr_factor_layout='sparse', distance_mode='euclidean')
    emb = jm.fit_transform(dataset=[x, y])
    assert all(np.isfinite(np.asarray(e)).all() for e in emb)
    assert isinstance(jm.match_result[0], SparseLandmarkF)
