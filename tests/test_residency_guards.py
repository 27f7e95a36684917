"""Residency contract guards (VERDICT round-4 item 8 + advisor findings):

- the id()-keyed device caches must DETECT in-place mutation of a cached
  host array (content fingerprint checked on every hit) instead of
  silently serving stale data;
- non-canonical CSR inputs (duplicates / unsorted) must decode like the
  dense path (duplicates SUM) without mutating the caller's matrix;
- mixed device/host pairwise-distance calls must not round-trip the
  device operand through the tunnel (per-argument guard).
"""

import warnings

import numpy as np
import pytest
import scipy.sparse as sp

from jamie_tpu.core import residency


def test_device_bf16_detects_inplace_mutation():
    residency.clear_residency_cache()
    X = np.random.RandomState(0).randn(64, 32).astype(np.float32)
    a = residency.device_bf16(X)
    assert a is not None
    # untouched: hit serves the same device buffer silently
    with warnings.catch_warnings():
        warnings.simplefilter('error')
        assert residency.device_bf16(X) is a
    # mutate a FINGERPRINT-SAMPLED row (row 0 is always sampled; the check
    # is a cheap content sample, not a full hash — by design)
    X[0, 7] += 100.0          # in-place mutation the id() key can't see
    with pytest.warns(UserWarning, match='mutated in place'):
        b = residency.device_bf16(X)
    assert b is not a
    np.testing.assert_allclose(
        np.asarray(b, np.float32)[0, 7], np.float32(X[0, 7]),
        rtol=1e-2)           # bf16 rounding
    residency.clear_residency_cache()


def test_device_csr_detects_inplace_mutation():
    rng = np.random.RandomState(1)
    X = sp.random(80, 40, density=0.2, format='csr', random_state=rng,
                  dtype=np.float32)
    X.sum_duplicates()
    a = residency.device_csr(X, budget_bytes=1 << 30)
    assert a is not None
    with warnings.catch_warnings():
        warnings.simplefilter('error')
        assert residency.device_csr(X, budget_bytes=1 << 30) is a
    X.data[0] += 50.0
    with pytest.warns(UserWarning, match='mutated in place'):
        b = residency.device_csr(X, budget_bytes=1 << 30)
    assert b is not a
    np.testing.assert_allclose(np.asarray(b.rows(0, 80)), X.toarray(),
                               rtol=1e-2, atol=1e-4)


def test_device_csr_noncanonical_duplicates_sum_and_caller_untouched():
    """Duplicate (row, col) entries must SUM (like toarray/densify), and
    the caller's matrix must not be canonicalized in place."""
    rows = np.array([0, 0, 1, 2, 2, 2], np.int32)
    cols = np.array([3, 3, 1, 0, 0, 4], np.int32)
    vals = np.array([1.0, 2.0, 5.0, 0.5, 0.25, 7.0], np.float32)
    X = sp.csr_matrix((vals, (rows, cols)), shape=(4, 6))
    # coo->csr canonicalizes; rebuild raw to force duplicates
    X = sp.csr_matrix(
        (vals, cols, np.array([0, 2, 3, 6, 6], np.int32)), shape=(4, 6))
    assert not X.has_canonical_format
    nnz_before = int(X.nnz)
    dense = X.toarray()                    # scipy sums duplicates
    dev = residency.DeviceCSR(X)
    np.testing.assert_allclose(np.asarray(dev.rows(0, 4)), dense,
                               rtol=1e-2, atol=1e-5)
    # SpMM path agrees too
    M = np.eye(6, dtype=np.float32)
    np.testing.assert_allclose(np.asarray(dev.matmul(M)), dense,
                               rtol=1e-2, atol=1e-5)
    assert int(X.nnz) == nnz_before        # caller untouched


def test_encode_csr_chunk_noncanonical_duplicates_sum():
    """A CSR chunk with duplicate (row, col) entries must encode the
    MERGED values (the decode scatter promises unique indices)."""
    rng = np.random.RandomState(9)
    n, f = 8, 4000          # wide + sparse so the CSR format wins
    rows = rng.randint(0, n, 600).astype(np.int32)
    cols = rng.randint(0, f, 600).astype(np.int32)
    rows[1] = rows[0]; cols[1] = cols[0]        # guaranteed duplicate
    vals = rng.randn(600).astype(np.float32)
    order = np.argsort(rows, kind='stable')
    rows, cols, vals = rows[order], cols[order], vals[order]
    indptr = np.zeros(n + 1, np.int32)
    np.add.at(indptr[1:], rows, 1)
    indptr = np.cumsum(indptr).astype(np.int32)
    X = sp.csr_matrix((vals, cols, indptr), shape=(n, f))
    dense = X.toarray()                          # scipy sums duplicates
    nnz_raw = int(X.nnz)
    chunk = X.copy()
    enc = residency._encode_csr_chunk(chunk, f)
    assert enc is not None
    kind, payload, _ = enc
    assert kind in ('csr', 'csr_const')
    e_indptr = payload[0]
    assert int(e_indptr[-1]) < nnz_raw           # duplicates were merged
    # decode payload on host: must equal the dense (duplicate-summed) form
    out = np.zeros((n, f), np.float32)
    e_cols = payload[1]
    e_vals = (np.full(int(e_indptr[-1]), payload[2], np.float32)
              if kind == 'csr_const'
              else np.asarray(payload[2][:int(e_indptr[-1])], np.float32))
    for i in range(n):
        s, e = int(e_indptr[i]), int(e_indptr[i + 1])
        out[i, e_cols[s:e].astype(np.int64)] = e_vals[s:e]
    np.testing.assert_allclose(out, dense, rtol=1e-2, atol=1e-4)


def test_mixed_device_host_distance_no_tunnel_roundtrip(monkeypatch):
    """x on device + y on host above the feature-chunk threshold must slice
    the device operand directly (ChunkUploader would fetch it back through
    the link block by block)."""
    import jax.numpy as jnp

    import jamie_tpu.ops.distances as dmod
    from jamie_tpu.core.residency import ChunkUploader

    rng = np.random.RandomState(2)
    xh = rng.randn(40, 30).astype(np.float32)
    yh = rng.randn(25, 30).astype(np.float32)
    xd = jnp.asarray(xh)

    wrapped = []
    orig_init = ChunkUploader.__init__

    def spy_init(self, arr, *a, **k):
        wrapped.append(arr)
        return orig_init(self, arr, *a, **k)

    monkeypatch.setattr(ChunkUploader, '__init__', spy_init)
    monkeypatch.setattr(dmod, '_FEATURE_CHUNK_THRESHOLD', 100)
    d = np.asarray(dmod.pairwise_sq_euclidean(xd, yh))
    ref = (np.sum(xh ** 2, 1)[:, None] + np.sum(yh ** 2, 1)[None, :]
           - 2.0 * xh @ yh.T)
    np.testing.assert_allclose(d, np.maximum(ref, 0), rtol=1e-2, atol=1e-3)
    # only the HOST operand went through the uploader
    assert all(w is yh for w in wrapped), [type(w) for w in wrapped]
    assert len(wrapped) >= 1


def test_transform_fit_device_path_is_one_shot_with_clear_error():
    import jax.numpy as jnp

    from jamie_tpu.preprocess import Preprocessor

    rng = np.random.RandomState(3)
    data = rng.randn(60, 12).astype(np.float32)
    pre = Preprocessor.fit(data, pca_dim=4)
    # force the device branch: replace the cached sample with a jax array
    pre._fit_sample = jnp.asarray(np.asarray(pre._fit_sample))
    out1 = pre.transform_fit()
    assert out1 is not None
    with pytest.raises(RuntimeError, match='one-shot'):
        pre.transform_fit()
