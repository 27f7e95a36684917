"""DeviceCSR SpMM paths (matmul / tmatmul / row_sq_sums) — exactness vs
dense references. Below the 100M-dense-element link threshold DeviceCSR
stores exact f32 values (matching what the dense chunk paths ship at the
same sizes), so these small fixtures compare against exact f32 products;
the at-scale bf16 rounding policy is pinned by monkeypatching the
threshold in test_matmul_bf16_at_scale.

These are the scatter-free kernels that replaced the serialized on-chip
CSR block decode for every matmul-shaped consumer (PCA sketch/projection,
cell->landmark Gram, FPS JL sketch); see core/residency.py's SpMM note and
VERDICT round-4 item 1.
"""

import numpy as np
import pytest

import ml_dtypes
import scipy.sparse as sp

from jamie_tpu.core.residency import DeviceCSR


def _rand_csr(rng, n, f, density, empty_row_stretch=0):
    X = sp.random(n, f, density=density, format='csr', random_state=rng,
                  dtype=np.float32)
    if empty_row_stretch:
        # zero out a contiguous stretch of rows (stresses the window-span
        # plan: a window can cover many empty rows)
        lil = X.tolil()
        lil[n // 3:n // 3 + empty_row_stretch] = 0
        X = lil.tocsr()
    X.sort_indices()
    return X


def _bf16(a):
    return np.asarray(a, np.float32).astype(ml_dtypes.bfloat16).astype(
        np.float32)


def _ref_matmul(X, M, s=0, e=None):
    """Exact dense reference (f64 accumulation; small fixtures are below
    the link threshold, so the SpMM operands are exact f32)."""
    e = X.shape[0] if e is None else e
    return (X[s:e].toarray().astype(np.float64)
            @ M.astype(np.float64)).astype(np.float32)


@pytest.mark.parametrize('n,f,density,k', [
    (300, 200, 0.05, 7),
    (1000, 64, 0.02, 33),
    (97, 5000, 0.001, 4),     # wide + very sparse: tiny windows
    (513, 300, 0.5, 130),     # dense-ish: large windows, small span
])
def test_matmul_matches_dense(n, f, density, k):
    rng = np.random.RandomState(0)
    X = _rand_csr(rng, n, f, density)
    M = rng.randn(f, k).astype(np.float32)
    out = np.asarray(DeviceCSR(X).matmul(M))
    np.testing.assert_allclose(out, _ref_matmul(X, M), rtol=1e-4, atol=1e-5)


def test_matmul_row_blocks():
    rng = np.random.RandomState(1)
    X = _rand_csr(rng, 400, 150, 0.07)
    M = rng.randn(150, 9).astype(np.float32)
    d = DeviceCSR(X)
    for s, e in [(0, 400), (0, 37), (37, 211), (211, 400), (399, 400)]:
        np.testing.assert_allclose(np.asarray(d.matmul(M, s, e)),
                                   _ref_matmul(X, M, s, e),
                                   rtol=1e-4, atol=1e-5)


def test_matmul_empty_rows_and_blocks():
    rng = np.random.RandomState(2)
    X = _rand_csr(rng, 500, 80, 0.05, empty_row_stretch=120)
    M = rng.randn(80, 5).astype(np.float32)
    d = DeviceCSR(X)
    np.testing.assert_allclose(np.asarray(d.matmul(M)), _ref_matmul(X, M),
                               rtol=1e-4, atol=1e-5)
    # a block that is entirely inside the empty stretch
    s, e = 500 // 3 + 5, 500 // 3 + 60
    blk = np.asarray(d.matmul(M, s, e))
    assert blk.shape == (e - s, 5)
    np.testing.assert_allclose(blk, _ref_matmul(X, M, s, e),
                               rtol=1e-4, atol=1e-5)


def test_matmul_all_zero_matrix():
    X = sp.csr_matrix((64, 32), dtype=np.float32)
    M = np.ones((32, 3), np.float32)
    out = np.asarray(DeviceCSR(X).matmul(M))
    assert out.shape == (64, 3)
    assert np.all(out == 0)


def test_tmatmul_matches_dense():
    rng = np.random.RandomState(3)
    X = _rand_csr(rng, 250, 180, 0.04)
    Q = rng.randn(250, 11).astype(np.float32)
    out = np.asarray(DeviceCSR(X).tmatmul(Q))       # (f, k) = X^T Q
    ref = (X.toarray().astype(np.float64).T
           @ Q.astype(np.float64)).astype(np.float32)
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-5)


def test_tmatmul_empty_columns():
    rng = np.random.RandomState(4)
    X = _rand_csr(rng, 120, 90, 0.03)
    # zero out a column stretch (empty CSC rows)
    X = X.tolil()
    X[:, 30:55] = 0
    X = X.tocsr()
    X.sort_indices()
    Q = rng.randn(120, 6).astype(np.float32)
    out = np.asarray(DeviceCSR(X).tmatmul(Q))
    ref = (X.toarray().astype(np.float64).T
           @ Q.astype(np.float64)).astype(np.float32)
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-5)
    assert np.all(out[30:55] == 0)


def test_row_sq_sums():
    rng = np.random.RandomState(5)
    X = _rand_csr(rng, 300, 70, 0.06, empty_row_stretch=40)
    sq = np.asarray(DeviceCSR(X).row_sq_sums())
    ref = (X.toarray() ** 2).sum(axis=1)
    np.testing.assert_allclose(sq, ref, rtol=1e-3, atol=1e-5)


def test_matmul_bf16_at_scale(monkeypatch):
    """At/above the link threshold DeviceCSR rounds values (and the SpMM's
    M operand) to bf16 — pinned by lowering the threshold."""
    from jamie_tpu.core import residency

    monkeypatch.setattr(residency, 'BF16_LINK_ELEMS', 100)
    rng = np.random.RandomState(9)
    X = _rand_csr(rng, 80, 60, 0.2)
    M = rng.randn(60, 5).astype(np.float32)
    d = DeviceCSR(X)
    assert str(d.ev.dtype) == 'bfloat16'
    out = np.asarray(d.matmul(M))
    ref = (_bf16(X.toarray()).astype(np.float64)
           @ _bf16(M).astype(np.float64)).astype(np.float32)
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-5)
    # and stays exact f32 below it
    monkeypatch.setattr(residency, 'BF16_LINK_ELEMS', 100_000_000)
    assert str(DeviceCSR(X).ev.dtype) == 'float32'


def test_landmark_weights_spmm_route_matches_dense():
    """_cell_to_landmark_weights through the DeviceCSR SpMM route must pick
    the same nearest landmarks (and near-identical weights) as the dense
    route on the same data."""
    from jamie_tpu.solvers.landmark import _cell_to_landmark_weights

    rng = np.random.RandomState(6)
    n, f, L = 500, 120, 16
    dense = np.zeros((n, f), np.float32)
    mask = rng.rand(n, f) < 0.2
    dense[mask] = rng.randn(mask.sum()).astype(np.float32)
    dense = _bf16(dense)     # remove the bf16 link rounding from the diff
    X = sp.csr_matrix(dense)
    lm = dense[rng.choice(n, L, replace=False)]

    ix_d, w_d = _cell_to_landmark_weights(dense, lm, k=4, sparse=True)
    ix_s, w_s = _cell_to_landmark_weights(X, lm, k=4, sparse=True,
                                          block=128)
    # identical index sets per row (order can differ on exact ties)
    same = np.mean([set(a) == set(b)
                    for a, b in zip(np.asarray(ix_d), np.asarray(ix_s))])
    assert same > 0.99
    np.testing.assert_allclose(np.sort(np.asarray(w_s), axis=1),
                               np.sort(np.asarray(w_d), axis=1),
                               rtol=5e-2, atol=1e-3)


def test_row_streamed_pca_spmm_route_matches_dense():
    """_pca_fit_row_streamed on a CSR input (SpMM sketch/projection) must
    recover the same subspace as on the equivalent dense ndarray."""
    from jamie_tpu.preprocess import _pca_fit_row_streamed

    rng = np.random.RandomState(7)
    n, f, k = 600, 50, 5
    base = rng.randn(n, 8) @ rng.randn(8, f) + 0.01 * rng.randn(n, f)
    base[rng.rand(n, f) < 0.7] = 0.0       # sparse-ish structure
    base = _bf16(base.astype(np.float32))
    X = sp.csr_matrix(base)

    m_d, c_d, s_d = _pca_fit_row_streamed(base, k, seed=0)
    m_s, c_s, s_s = _pca_fit_row_streamed(X, k, seed=0)
    np.testing.assert_allclose(np.asarray(m_s), np.asarray(m_d),
                               rtol=1e-3, atol=1e-5)
    # same subspace: principal angles ~ 0 (signs/rotation may differ)
    cd = np.asarray(c_d)
    cs = np.asarray(c_s)
    sv = np.linalg.svd(
        (cd / np.linalg.norm(cd, axis=1, keepdims=True))
        @ (cs / np.linalg.norm(cs, axis=1, keepdims=True)).T,
        compute_uv=False)
    assert np.all(sv > 0.99), sv
    # scores reproduce the centered data through the components
    rec_d = np.asarray(s_d) @ cd
    rec_s = np.asarray(s_s) @ cs
    np.testing.assert_allclose(rec_s, rec_d, rtol=0.1, atol=0.05)


def test_pca_transform_spmm_route_matches_dense(monkeypatch):
    """PCA.transform on a big-threshold CSR input (resident SpMM projection)
    matches the dense-route projection of the same data."""
    from jamie_tpu import preprocess as pp

    rng = np.random.RandomState(8)
    n, f, k = 300, 80, 6
    base = rng.randn(n, 8) @ rng.randn(8, f)
    base[rng.rand(n, f) < 0.6] = 0.0
    base = _bf16(base.astype(np.float32))
    pca = pp.PCA(n_components=k).fit(base)

    dense_out = pca.transform(base)
    # force the streaming/resident (dcsr SpMM) path for the sparse input
    monkeypatch.setattr(pp, '_STREAM_THRESHOLD', 100)
    sparse_in = sp.csr_matrix(base)
    out = pca.transform(sparse_in, row_chunk_bytes=f * 4 * 64)
    # bf16 rounding of the projection operands: ~2^-8 relative on
    # O(10) scores -> atol a few 1e-2
    np.testing.assert_allclose(out, dense_out, rtol=5e-2, atol=2e-2)


def test_row_streamed_pca_sketch_blocks_match_whole(monkeypatch):
    """The row-blocked SpMM sketch (bounds the (ell_rows, k) einsum
    partial that OOMed the 1M fit) equals the whole-matrix product."""
    import scipy.sparse as sp

    import jamie_tpu.preprocess as pp
    from jamie_tpu.core.residency import clear_residency_cache

    rng = np.random.RandomState(11)
    X = sp.random(700, 90, density=0.05, random_state=rng,
                  format='csr', dtype=np.float32)
    monkeypatch.setattr(pp, '_SKETCH_SPMM_ROWS', 128)  # force >1 block
    m_b, c_b, s_b = pp._pca_fit_row_streamed(X, 8)
    clear_residency_cache()
    monkeypatch.setattr(pp, '_SKETCH_SPMM_ROWS', 10 ** 9)
    m_w, c_w, s_w = pp._pca_fit_row_streamed(X, 8)
    np.testing.assert_allclose(np.asarray(m_b), np.asarray(m_w),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.abs(np.asarray(c_b)),
                               np.abs(np.asarray(c_w)),
                               rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.abs(np.asarray(s_b)),
                               np.abs(np.asarray(s_w)),
                               rtol=1e-3, atol=1e-3)
