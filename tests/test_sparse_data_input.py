"""scipy-sparse data matrices through distances / PCA / landmark / estimator.

The reference densifies sparse single-cell matrices at load (scGLUE.ipynb
cell 3 `.todense()`); here CSR inputs flow through fit_transform with only
row/column blocks ever densifying (core/hostmat.py). These tests pin
parity against the dense paths on every route, including the forced
residency and feature-streamed ones.
"""

import numpy as np
import pytest
from scipy import sparse

from jamie_tpu.core import hostmat


def _sparse_pair(n=40, f=25, density=0.3, seed=0):
    rng = np.random.RandomState(seed)
    dense = rng.rand(n, f).astype(np.float32)
    dense[rng.rand(n, f) > density] = 0.0
    return dense, sparse.csr_matrix(dense)


def test_hostmat_helpers():
    dense, csr = _sparse_pair()
    assert hostmat.is_scipy_sparse(csr)
    assert not hostmat.is_scipy_sparse(dense)
    assert hostmat.ensure_row_major(csr) is csr
    assert hostmat.ensure_col_major(csr).format == 'csc'
    np.testing.assert_array_equal(hostmat.densify(csr), dense)
    np.testing.assert_array_equal(hostmat.dense_rows(csr, 5, 12),
                                  dense[5:12])
    np.testing.assert_array_equal(
        hostmat.dense_cols(hostmat.ensure_col_major(csr), 3, 9),
        dense[:, 3:9])


@pytest.mark.parametrize('metric', ['euclidean', 'sqeuclidean', 'cosine',
                                    'correlation'])
def test_pairwise_distance_sparse_parity(metric):
    from jamie_tpu.ops.distances import pairwise_distance
    dense, csr = _sparse_pair()
    d_dense = np.asarray(pairwise_distance(dense, metric))
    d_sparse = np.asarray(pairwise_distance(csr, metric))
    np.testing.assert_allclose(d_sparse, d_dense, rtol=1e-5, atol=1e-5)


def test_dataset_distance_matrix_sparse_modes():
    from jamie_tpu.ops.distances import dataset_distance_matrix
    dense, csr = _sparse_pair()
    for mode in ('euclidean', 'geodesic', 'spearman', 'pearson'):
        d_dense = np.asarray(dataset_distance_matrix(dense, mode))
        d_sparse = np.asarray(dataset_distance_matrix(csr, mode))
        np.testing.assert_allclose(d_sparse, d_dense, rtol=1e-5, atol=1e-5,
                                   err_msg=mode)


def test_sparse_resident_bf16_path(monkeypatch):
    """Force the bf16-residency route: sparse and dense resident builds
    must agree exactly (same bf16 rounding of the same values)."""
    from jamie_tpu.core import residency
    from jamie_tpu.ops import distances

    dense, csr = _sparse_pair(n=32, f=48)
    monkeypatch.setattr(distances, '_FEATURE_CHUNK_THRESHOLD', 100)
    d_dense = np.asarray(distances.pairwise_distance(dense, 'euclidean'))
    residency.clear_residency_cache()
    d_sparse = np.asarray(distances.pairwise_distance(csr, 'euclidean'))
    residency.clear_residency_cache()
    np.testing.assert_allclose(d_sparse, d_dense, rtol=0, atol=0)


def test_sparse_feature_chunked_path(monkeypatch):
    """Force the feature-streamed route (residency budget 0): the CSC
    conversion + per-chunk densify must reproduce the dense stream."""
    from jamie_tpu.core import residency
    from jamie_tpu.ops import distances

    dense, csr = _sparse_pair(n=32, f=48)
    monkeypatch.setattr(distances, '_FEATURE_CHUNK_THRESHOLD', 100)
    monkeypatch.setattr(residency, 'DEFAULT_BUDGET_BYTES', 0)
    d_dense = np.asarray(distances.pairwise_distance(dense, 'euclidean'))
    d_sparse = np.asarray(distances.pairwise_distance(csr, 'euclidean'))
    np.testing.assert_allclose(d_sparse, d_dense, rtol=0, atol=0)


def test_pca_sparse_parity_direct_and_streamed(monkeypatch):
    from jamie_tpu import preprocess
    from jamie_tpu.core import residency

    dense, csr = _sparse_pair(n=30, f=50, density=0.4)

    out_dense = preprocess.PCA(5).fit_transform(dense)
    out_sparse = preprocess.PCA(5).fit_transform(csr)
    np.testing.assert_allclose(out_sparse, out_dense, rtol=1e-4, atol=1e-5)

    # force the streamed route (f > n and element count over threshold)
    monkeypatch.setattr(preprocess, '_STREAM_THRESHOLD', 100)
    monkeypatch.setattr(residency, 'DEFAULT_BUDGET_BYTES', 0)
    out_dense_s = preprocess.PCA(5).fit_transform(dense)
    out_sparse_s = preprocess.PCA(5).fit_transform(csr)
    np.testing.assert_allclose(out_sparse_s, out_dense_s,
                               rtol=1e-4, atol=1e-5)

    # transform (not fit_transform) exercises the row-chunked projection
    pca = preprocess.PCA(5)
    pca.fit(dense)
    np.testing.assert_allclose(pca.transform(csr), pca.transform(dense),
                               rtol=1e-4, atol=1e-5)


def test_pca_row_streamed_tall_route(monkeypatch):
    """Tall (n > f) matrices over the stream threshold with no residency
    budget take the new row-streamed randomized route — parity vs the
    direct fit for dense AND sparse inputs."""
    from jamie_tpu import preprocess
    from jamie_tpu.core import residency

    rng = np.random.RandomState(11)
    # strongly separated spectrum: near-degenerate eigenpairs would rotate
    # freely between the exact and randomized routes
    z = rng.randn(400, 6).astype(np.float32) * np.array(
        [16, 9, 5.5, 3.2, 1.9, 1.0], np.float32)
    dense = np.maximum(z @ rng.randn(6, 40) - 0.3, 0).astype(np.float32)
    csr = sparse.csr_matrix(dense)

    out_ref = preprocess.PCA(5).fit_transform(dense)   # direct route

    monkeypatch.setattr(preprocess, '_STREAM_THRESHOLD', 100)
    monkeypatch.setattr(residency, 'DEFAULT_BUDGET_BYTES', 0)
    for X in (dense, csr):
        out = preprocess.PCA(5).fit_transform(X)
        # randomized-vs-exact: captured variance per component (rtol
        # covers the round-4 ChunkUploader's bf16 link rounding of
        # continuous values; sparse values also round to bf16)...
        np.testing.assert_allclose(np.linalg.norm(out, axis=0),
                                   np.linalg.norm(out_ref, axis=0),
                                   rtol=1e-2)
        # ...and each component's direction (signed correlation; exact
        # elementwise equality is not a property of a randomized sketch)
        for j in range(5):
            r = np.corrcoef(out[:, j], out_ref[:, j])[0, 1]
            assert r > 0.995, (j, r)


def test_pca_sparse_resident_route(monkeypatch):
    from jamie_tpu import preprocess
    from jamie_tpu.core import residency

    dense, csr = _sparse_pair(n=30, f=50, density=0.4)
    monkeypatch.setattr(preprocess, '_STREAM_THRESHOLD', 100)
    residency.clear_residency_cache()
    out_dense = preprocess.PCA(5).fit_transform(dense)
    residency.clear_residency_cache()
    out_sparse = preprocess.PCA(5).fit_transform(csr)
    residency.clear_residency_cache()
    np.testing.assert_allclose(out_sparse, out_dense, rtol=1e-3, atol=1e-4)


def test_preprocessor_sparse_no_pca_densifies():
    from jamie_tpu.preprocess import Preprocessor
    dense, csr = _sparse_pair()
    pre_d = Preprocessor.fit(dense, pca_dim=None)
    pre_s = Preprocessor.fit(csr, pca_dim=None)
    np.testing.assert_allclose(pre_s.transform_fit(), pre_d.transform_fit(),
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(pre_s.transform(csr), pre_d.transform(dense),
                               rtol=1e-6, atol=1e-6)


def test_landmark_correspondence_sparse_parity():
    from jamie_tpu.solvers.landmark import landmark_correspondence
    import ml_dtypes

    rng = np.random.RandomState(3)
    z = rng.randn(60, 4).astype(np.float32)
    xd = np.maximum(z @ rng.randn(4, 30) - 0.5, 0).astype(np.float32)
    yd = np.maximum(z @ rng.randn(4, 20) - 0.5, 0).astype(np.float32)
    # CSR inputs take the device-resident SpMM route, whose cell->landmark
    # Gram multiplies bf16-rounded operands (the package-wide sparse link
    # policy). bf16-exact inputs isolate that from real divergence: the
    # remaining diff is f32 accumulation order only.
    xd = xd.astype(ml_dtypes.bfloat16).astype(np.float32)
    yd = yd.astype(ml_dtypes.bfloat16).astype(np.float32)
    F_dense = landmark_correspondence(
        xd, yd, n_landmarks=16, epoch_pd=50, seed=1,
        selection='fps').to_dense()
    F_sparse = landmark_correspondence(
        sparse.csr_matrix(xd), sparse.csr_matrix(yd), n_landmarks=16,
        epoch_pd=50, seed=1, selection='fps').to_dense()
    np.testing.assert_allclose(F_sparse, F_dense, rtol=1e-3, atol=1e-5)


def test_estimator_sparse_dataset_end_to_end():
    """CSR modalities through the full public fit, vs the dense fit at the
    same seed — identical paths after blockwise densification."""
    from jamie_tpu import JAMIE

    rng = np.random.RandomState(5)
    z = rng.randn(50, 4).astype(np.float32)
    a = np.maximum(z @ rng.randn(4, 20) - 0.8, 0).astype(np.float32)
    b = np.maximum(z @ rng.randn(4, 15) - 0.8, 0).astype(np.float32)
    kwargs = dict(epoch_DNN=60, min_epochs=20, epoch_pd=40, epoch_chunk=20,
                  pca_dim=(10, 8), batch_size=16, manual_seed=11)
    out_dense = JAMIE(**kwargs).fit_transform(dataset=[a, b])
    out_sparse = JAMIE(**kwargs).fit_transform(
        dataset=[sparse.csr_matrix(a), sparse.csr_matrix(b)])
    for od, os_ in zip(out_dense, out_sparse):
        np.testing.assert_allclose(os_, od, rtol=1e-4, atol=1e-5)


def test_estimator_accepts_h5addata(tmp_path):
    """H5adData objects (the native reader's return) feed fit_transform
    directly, like AnnData does in the reference (jamie/jamie.py:147-149)."""
    import h5py

    from jamie_tpu import JAMIE
    from jamie_tpu.io import read_h5ad

    rng = np.random.RandomState(7)
    z = rng.randn(40, 3).astype(np.float32)
    for name, w in (('m1', 12), ('m2', 9)):
        X = (z @ rng.randn(3, w)).astype(np.float32)
        with h5py.File(tmp_path / f'{name}.h5ad', 'w') as f:
            f.create_dataset('X', data=X)
            obs = f.create_group('obs')
            obs.attrs['_index'] = '_index'
            obs.create_dataset(
                '_index', data=[f'c{i}'.encode() for i in range(40)])
    ds = [read_h5ad(str(tmp_path / 'm1.h5ad')),
          read_h5ad(str(tmp_path / 'm2.h5ad'))]
    jm = JAMIE(epoch_DNN=40, min_epochs=10, epoch_pd=30, epoch_chunk=10,
               pca_dim=(8, 6), batch_size=16)
    out = jm.fit_transform(dataset=ds)
    assert out[0].shape == (40, 32)
    assert jm.test_closer(out) <= 0.5
