"""Sparse (ELL) P/F layouts: exactness vs dense, atlas-scale boundedness."""

import jax.numpy as jnp
import numpy as np

from jamie_tpu.config import JamieConfig
from jamie_tpu.models import CoupledVAE
from jamie_tpu.ops.sparse import (
    SparseRows, as_sparse_rows, is_sparse_input, sparse_gather_batch,
)
from jamie_tpu.train.trainer import JamieTrainer


def _data(n=64, d0=10, d1=8, seed=0):
    rng = np.random.RandomState(seed)
    z = rng.randn(n, 4).astype(np.float32)
    return [(z @ rng.randn(4, d0)).astype(np.float32),
            (z @ rng.randn(4, d1)).astype(np.float32)]


def _cfg(**kw):
    return JamieConfig(**{**dict(
        epoch_DNN=20, min_epochs=5, batch_size=32, epoch_chunk=10,
        log_DNN=1000, use_early_stop=False, pca_dim=None), **kw})


def _random_sparse(n0, n1, density, seed=0):
    rng = np.random.RandomState(seed)
    dense = np.where(rng.rand(n0, n1) < density,
                     rng.rand(n0, n1).astype(np.float32), 0.0)
    return dense.astype(np.float32)


def test_sparse_rows_roundtrip():
    dense = _random_sparse(20, 15, 0.1, seed=1)
    sp = SparseRows.from_dense(dense)
    np.testing.assert_allclose(sp.to_dense(), dense, atol=1e-7)
    assert sp.nnz == (dense != 0).sum()
    np.testing.assert_allclose(sp.row_sums(), dense.sum(1), atol=1e-5)
    np.testing.assert_allclose(sp.col_sums(), dense.sum(0), atol=1e-5)
    # coordinate-tuple constructor
    r, c = np.nonzero(dense)
    sp2 = as_sparse_rows((r, c, dense[r, c]), shape=(20, 15))
    np.testing.assert_allclose(sp2.to_dense(), dense, atol=1e-7)
    # scipy constructor
    import scipy.sparse as ss
    sp3 = as_sparse_rows(ss.csr_matrix(dense))
    np.testing.assert_allclose(sp3.to_dense(), dense, atol=1e-7)
    assert is_sparse_input(sp) and is_sparse_input(ss.csr_matrix(dense))
    assert not is_sparse_input(dense)


def test_top_k_keeps_largest():
    dense = np.abs(_random_sparse(10, 30, 1.0, seed=2))
    sp = SparseRows.top_k(dense, 5)
    d2 = sp.to_dense()
    for i in range(10):
        kept = np.sort(dense[i])[-5:]
        np.testing.assert_allclose(np.sort(d2[i][d2[i] > 0]), kept, atol=1e-6)


def test_col_normalized_matches_dense():
    dense = _random_sparse(12, 9, 0.3, seed=3)
    sp = SparseRows.from_dense(dense).col_normalized()
    sums = dense.sum(0)
    ref = dense / np.where(sums == 0, 1, sums)[None, :]
    np.testing.assert_allclose(sp.to_dense(), ref, atol=1e-6)


def test_gather_batch_exact_with_duplicates():
    dense = _random_sparse(30, 25, 0.2, seed=4)
    sp = SparseRows.from_dense(dense)
    rng = np.random.RandomState(0)
    idx0 = rng.randint(0, 30, 16)   # duplicates likely
    idx1 = rng.randint(0, 25, 16)
    out = np.asarray(sparse_gather_batch(
        jnp.asarray(sp.cols), jnp.asarray(sp.vals),
        jnp.asarray(idx0), jnp.asarray(idx1)))
    np.testing.assert_allclose(out, dense[np.ix_(idx0, idx1)], atol=1e-6)


def test_sparse_p_matches_dense_fit():
    """Off-diagonal partial prior: SparseRows P reproduces the dense fit
    exactly (same pairs table -> same batches -> same losses/params)."""
    data = _data(n=60)
    # half-diagonal prior plus a few off-diagonal soft matches
    rng = np.random.RandomState(7)
    P = np.zeros((60, 60), np.float32)
    on = rng.choice(60, 30, replace=False)
    P[on, on] = 1.0
    off = rng.choice(60, 10, replace=False)
    P[off, (off + 7) % 60] = 0.5
    F = np.zeros((60, 60), np.float32)
    cfg = _cfg()
    model = CoupledVAE((10, 8), cfg.output_dim, dropout=0.0)

    dense = JamieTrainer(cfg, model, data, P, F)
    s_dense = dense.fit()
    sparse = JamieTrainer(cfg, model, data, SparseRows.from_dense(P), F)
    s_sparse = sparse.fit()

    assert dense.sampling_method == sparse.sampling_method == 'hybrid'
    np.testing.assert_allclose(dense.epoch_losses, sparse.epoch_losses,
                               rtol=1e-5)
    np.testing.assert_allclose(dense.final_embed(s_dense)[0],
                               sparse.final_embed(s_sparse)[0],
                               rtol=1e-4, atol=1e-6)


def test_sparse_f_matches_dense_fit():
    """Sparse F (e.g. top-k-compressed solver output) with exact contents
    reproduces the dense-F fit."""
    data = _data(n=48)
    n = 48
    P = np.eye(n, dtype=np.float32)
    F = _random_sparse(n, n, 0.15, seed=8)
    cfg = _cfg()
    model = CoupledVAE((10, 8), cfg.output_dim, dropout=0.0)

    dense = JamieTrainer(cfg, model, data, P, F)
    s_dense = dense.fit()
    sparse = JamieTrainer(cfg, model, data, P, SparseRows.from_dense(F))
    s_sparse = sparse.fit()

    np.testing.assert_allclose(dense.epoch_losses, sparse.epoch_losses,
                               rtol=1e-5)
    # The batch F_sub gathers are bitwise identical, but the two operand
    # layouts compile to different XLA fusions whose ~1e-7 rounding deltas
    # compound through Adam; embeddings agree to fusion-noise tolerance.
    np.testing.assert_allclose(dense.final_embed(s_dense)[0],
                               sparse.final_embed(s_sparse)[0],
                               atol=1e-2)


def test_sparse_identity_detected_as_diag():
    data = _data(n=40)
    sp = SparseRows.from_dense(np.eye(40, dtype=np.float32))
    tr = JamieTrainer(_cfg(epoch_DNN=6), CoupledVAE((10, 8), 32, dropout=0.0),
                      data, sp, 'zeros')
    assert tr.sampling_method == 'diag'


def test_final_corr_sparse_no_materialization():
    """final_corr with sparse P and zero F returns a SparseRows when dense
    would blow the budget, matching the dense computation's values."""
    data = _data(n=50)
    P = _random_sparse(50, 50, 0.1, seed=9)
    cfg = _cfg(epoch_DNN=4)
    model = CoupledVAE((10, 8), cfg.output_dim, dropout=0.0)
    tr = JamieTrainer(cfg, model, data, SparseRows.from_dense(P), 'zeros')
    out = tr.final_corr(max_dense_entries=100)  # force the sparse branch
    assert isinstance(out, SparseRows)
    sums = P.sum(0)
    ref = P / np.where(sums == 0, 1, sums)[None, :]  # pf_ratio = 1.0
    np.testing.assert_allclose(out.to_dense(), ref, atol=1e-6)
    # and the dense branch agrees
    dense_out = tr.final_corr()
    np.testing.assert_allclose(np.asarray(dense_out), ref, atol=1e-6)


def test_atlas_scale_sparse_prior_memory_bounded():
    """50k cells with a 50% sparse prior: N^2 would be 10 GB (2.5e9 f32) —
    this fits only if no phase materializes it."""
    n = 50_000
    rng = np.random.RandomState(11)
    data = _data(n=n, d0=12, d1=6, seed=11)
    on = rng.choice(n, n // 2, replace=False)
    P = SparseRows.from_coo(on, on, np.ones(n // 2, np.float32), (n, n))
    cfg = _cfg(epoch_DNN=2, min_epochs=0, batch_size=256, epoch_chunk=1)
    model = CoupledVAE((12, 6), cfg.output_dim, dropout=0.0)
    tr = JamieTrainer(cfg, model, data, P, 'zeros')
    assert tr.sampling_method == 'hybrid'
    tr.fit()
    assert np.isfinite(tr.epoch_losses).all()
    fc = tr.final_corr()
    assert isinstance(fc, SparseRows)


def test_estimator_sparse_p_and_f_top_k():
    from jamie_tpu import JAMIE
    data = _data(n=50)
    rng = np.random.RandomState(12)
    on = rng.choice(50, 25, replace=False)
    P = SparseRows.from_coo(on, on, np.ones(25, np.float32), (50, 50))
    jm = JAMIE(P=P, f_top_k=4, epoch_DNN=15, min_epochs=3,
               batch_size=25, epoch_chunk=5, pca_dim=None, epoch_pd=50,
               use_early_stop=False, log_DNN=1000)
    out = jm.fit_transform(dataset=data)
    assert jm.sampling_method == 'hybrid'
    assert isinstance(jm.F, SparseRows)
    assert np.isfinite(out[0]).all()


def test_transpose_roundtrip():
    dense = _random_sparse(14, 9, 0.25, seed=13)
    sp = SparseRows.from_dense(dense)
    np.testing.assert_allclose(sp.T.to_dense(), dense.T, atol=1e-7)
    np.testing.assert_allclose(sp.T.T.to_dense(), dense, atol=1e-7)


def test_sparse_p_on_mesh_matches_unsharded():
    """SparseRows P with its ELL arrays row-sharded over the 8-device mesh
    reproduces the unsharded fit."""
    import jax

    from jamie_tpu.core.mesh import create_mesh

    assert len(jax.devices()) >= 8
    mesh = create_mesh(shape=(8,), axis_names=('data',))
    data = _data(n=64)
    rng = np.random.RandomState(17)
    on = rng.choice(64, 32, replace=False)
    P = SparseRows.from_coo(on, on, np.ones(32, np.float32), (64, 64))
    cfg = _cfg()
    model = CoupledVAE((10, 8), cfg.output_dim, dropout=0.0)

    plain = JamieTrainer(cfg, model, data, P, 'zeros')
    plain.fit()
    sharded = JamieTrainer(cfg, model, data, P, 'zeros', mesh=mesh)
    with mesh:
        sharded.fit()
    assert sharded.sampling_method == 'hybrid'
    np.testing.assert_allclose(plain.epoch_losses, sharded.epoch_losses,
                               rtol=1e-3, atol=1e-4)


def test_top_k_keeps_negative_entries():
    """top_k ranks by magnitude so general (signed) matrices keep their
    largest negative entries (ADVICE round 2: signed ranking dropped them)."""
    dense = np.array([[-5.0, 0.5, 3.0, 0.0],
                      [1.0, -0.1, 0.0, 2.0]], np.float32)
    sp = SparseRows.top_k(dense, 2)
    out = sp.to_dense()
    np.testing.assert_allclose(out[0], [-5.0, 0.0, 3.0, 0.0])
    np.testing.assert_allclose(out[1], [1.0, 0.0, 0.0, 2.0])
