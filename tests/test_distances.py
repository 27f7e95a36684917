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


def test_resident_build_dtype_aware_formats():
    """Round-4 dtype-aware residency (VERDICT item 3): every link format
    (bits / u8 / CSR / bf16 fallback) reconstructs the same resident bf16
    matrix as the plain bf16 ship, and the transfer counter shows the cut."""
    import scipy.sparse as sp

    from jamie_tpu.core import residency

    rng = np.random.RandomState(11)
    f = 96
    cases = {
        'binary01': (rng.rand(40, f) < 0.3).astype(np.float32),
        'binary_scaled': 2.5 * (rng.rand(40, f) < 0.3).astype(np.float32),
        'counts_u8': rng.poisson(3.0, (40, f)).clip(0, 255)
                        .astype(np.float32),
        'continuous': rng.randn(40, f).astype(np.float32),
        'all_zero': np.zeros((40, f), np.float32),
    }
    expected_fmt_bytes = {
        # per full 40 x 96 matrix: bits = 40*12, u8 = 40*96, bf16 = 2*40*96
        'binary01': 40 * (f // 8),
        'binary_scaled': 40 * (f // 8),
        'counts_u8': 40 * f,
        'continuous': 2 * 40 * f,
        'all_zero': 0,
    }
    for name, X in cases.items():
        residency.reset_transfer_stats()
        dev = residency.build_resident_bf16(X, chunk_bytes=f * 2 * 16)
        want = np.asarray(residency.host_bf16(X), np.float32)
        np.testing.assert_array_equal(np.asarray(dev, np.float32), want,
                                      err_msg=name)
        stats = residency.transfer_stats()
        assert stats['bytes'] == expected_fmt_bytes[name], \
            (name, stats)
        assert stats['bf16_equiv_bytes'] == 2 * 40 * f

    # sparse CSR: low-density float values ship as indices + bf16 values
    dense = np.zeros((64, 4096), np.float32)
    mask = rng.rand(64, 4096) < 0.01
    dense[mask] = rng.randn(mask.sum()).astype(np.float32)
    X = sp.csr_matrix(dense)
    residency.reset_transfer_stats()
    dev = residency.build_resident_bf16(X, chunk_bytes=4096 * 2 * 16)
    want = np.asarray(residency.host_bf16(dense), np.float32)
    np.testing.assert_array_equal(np.asarray(dev, np.float32), want)
    stats = residency.transfer_stats()
    assert stats['bytes'] < 0.25 * stats['bf16_equiv_bytes'], stats

    # sparse CSR with constant values: indices only
    Xc = sp.csr_matrix((np.full(X.nnz, 3.0, np.float32), X.indices,
                        X.indptr), shape=X.shape)
    residency.reset_transfer_stats()
    dev = residency.build_resident_bf16(Xc, chunk_bytes=4096 * 2 * 16)
    np.testing.assert_array_equal(
        np.asarray(dev, np.float32),
        np.asarray(residency.host_bf16(Xc.toarray().astype(np.float32)),
                   np.float32))

    # mixed chunks: binary rows then continuous rows classify per chunk
    # (chunks are clamped to >=64 rows, so use 64-row blocks)
    Xm = np.vstack([(rng.rand(64, f) < 0.4).astype(np.float32),
                    rng.randn(64, f).astype(np.float32)])
    residency.reset_transfer_stats()
    dev = residency.build_resident_bf16(Xm, chunk_bytes=f * 2 * 64)
    np.testing.assert_array_equal(
        np.asarray(dev, np.float32),
        np.asarray(residency.host_bf16(Xm), np.float32))
    stats = residency.transfer_stats()
    assert stats['bytes'] == 64 * (f // 8) + 2 * 64 * f, stats


def test_chunk_uploader_rows_cols_roundtrip():
    """Round-4 ChunkUploader (the streamed-phase twin of the resident
    build): every link format decodes back to the source block — exactly
    for bits/u8/CSR-const/CSR-u8, to bf16 rounding for continuous — and
    the backpressure window drains cleanly."""
    import scipy.sparse as sp

    from jamie_tpu.core import residency

    rng = np.random.RandomState(13)
    f = 96
    exact_cases = {
        'binary01': (rng.rand(40, f) < 0.3).astype(np.float32),
        'binary_scaled': 1.5 * (rng.rand(40, f) < 0.3).astype(np.float32),
        'counts_u8': rng.poisson(3.0, (40, f)).clip(0, 255)
                        .astype(np.float32),
        'all_zero': np.zeros((40, f), np.float32),
    }
    for name, X in exact_cases.items():
        up = residency.ChunkUploader(X)
        got = np.vstack([np.asarray(up.rows(s, s + 16))
                         for s in range(0, 40, 16)])
        np.testing.assert_array_equal(got, X, err_msg=name)
        gc = np.hstack([np.asarray(up.cols(s, s + 32))
                        for s in range(0, f, 32)])
        np.testing.assert_array_equal(gc, X, err_msg=name)
        up.drain()

    # continuous below the link threshold: exact f32 (bf16 rounding is
    # reserved for matrices past BF16_LINK_ELEMS dense elements)
    X = rng.randn(40, f).astype(np.float32)
    up = residency.ChunkUploader(X)
    got = np.asarray(up.rows(0, 40))
    np.testing.assert_array_equal(got, X)

    # sparse CSR rows / CSC cols: u8-valued sparse round-trips exactly
    dense = np.zeros((64, 512), np.float32)
    mask = rng.rand(64, 512) < 0.02
    dense[mask] = rng.randint(1, 9, mask.sum()).astype(np.float32)
    residency.reset_transfer_stats()
    up = residency.ChunkUploader(sp.csr_matrix(dense))
    got = np.vstack([np.asarray(up.rows(s, s + 16))
                     for s in range(0, 64, 16)])
    np.testing.assert_array_equal(got, dense)
    stats = residency.transfer_stats()
    assert stats['bytes'] < 0.25 * stats['bf16_equiv_bytes'], stats
    upc = residency.ChunkUploader(sp.csc_matrix(dense))
    gc = np.hstack([np.asarray(upc.cols(s, s + 128))
                    for s in range(0, 512, 128)])
    np.testing.assert_array_equal(gc, dense)

    # backpressure object: tiny window forces blocking, results unchanged
    bp = residency._Backpressure(limit_bytes=64)
    up2 = residency.ChunkUploader(dense, limit_bytes=64)
    got2 = np.asarray(up2.rows(0, 64))
    np.testing.assert_array_equal(got2, dense)
    bp.drain()


def test_bits2_per_column_two_valued_formats():
    """Round-4 'bits2' link format: z-scored binary data (what every
    reference notebook feeds JAMIE for binary ATAC) is two-valued PER
    COLUMN — it ships as packed bits + per-column bf16 lo/hi and decodes
    bit-identically to the plain bf16 ship."""
    from jamie_tpu.core import residency

    rng = np.random.RandomState(7)
    n, f = 128, 96
    b = (rng.rand(n, f) < 0.15).astype(np.float32)
    b[:, :3] = 0.0                              # constant columns survive
    mu, sd = b.mean(0), b.std(0)
    X = (b - mu) / np.where(sd == 0, 1.0, sd)   # z-score, guard const cols
    X = X.astype(np.float32)

    kind, (lo, hi, eq_hi) = residency._classify_dense_chunk(X)
    assert kind == 'bits2'
    np.testing.assert_array_equal(lo, X.min(0))
    np.testing.assert_array_equal(hi, X.max(0))
    np.testing.assert_array_equal(eq_hi, X == X.max(0))

    # resident build: bit-identical to the all-bf16 build, 1 bit/elem
    residency.reset_transfer_stats()
    dev = residency.build_resident_bf16(X, chunk_bytes=f * 2 * 64)
    np.testing.assert_array_equal(
        np.asarray(dev, np.float32),
        np.asarray(residency.host_bf16(X), np.float32))
    stats = residency.transfer_stats()
    n_chunks = (n + 63) // 64
    assert stats['bytes'] == n * (f // 8) + n_chunks * 2 * 2 * f, stats

    # uploader rows/cols: decode matches the bf16-rounded source
    want = np.asarray(residency.host_bf16(X), np.float32)
    up = residency.ChunkUploader(X)
    got = np.vstack([np.asarray(up.rows(s, s + 32))
                     for s in range(0, n, 32)])
    np.testing.assert_array_equal(got, want)
    gc = np.hstack([np.asarray(up.cols(s, s + 32))
                    for s in range(0, f, 32)])
    np.testing.assert_array_equal(gc, want)

    # continuous data must NOT classify bits2
    kind2, _ = residency._classify_dense_chunk(
        rng.randn(64, f).astype(np.float32))
    assert kind2 == 'bf16'


def test_encode_cache_roundtrip(tmp_path, monkeypatch):
    """File-backed resident builds replay cached link payloads: identical
    resident matrix, zero re-encode host time, same byte accounting."""
    from jamie_tpu.core import residency

    rng = np.random.RandomState(21)
    X = np.vstack([(rng.rand(64, 96) < 0.2).astype(np.float32),
                   rng.randn(64, 96).astype(np.float32)])
    src = tmp_path / 'x.npy'
    np.save(src, X)
    arr = np.load(src, mmap_mode='r')

    monkeypatch.setattr(residency, 'ENCODE_CACHE_DIR', str(tmp_path / 'enc'))
    residency.reset_transfer_stats()
    dev1 = residency.build_resident_bf16(arr, chunk_bytes=96 * 2 * 64)
    s1 = residency.transfer_stats()
    assert s1['encode_s'] > 0

    residency.reset_transfer_stats()
    dev2 = residency.build_resident_bf16(arr, chunk_bytes=96 * 2 * 64)
    s2 = residency.transfer_stats()
    np.testing.assert_array_equal(np.asarray(dev1, np.float32),
                                  np.asarray(dev2, np.float32))
    assert s2['encode_s'] == 0.0 and s2['read_s'] == 0.0, s2
    assert s2['bytes'] == s1['bytes']

    # mutating the file invalidates the key (mtime/size change)
    np.save(src, X + 1.0)
    arr3 = np.load(src, mmap_mode='r')
    residency.reset_transfer_stats()
    dev3 = residency.build_resident_bf16(arr3, chunk_bytes=96 * 2 * 64)
    assert residency.transfer_stats()['encode_s'] > 0
    np.testing.assert_array_equal(
        np.asarray(dev3, np.float32),
        np.asarray(residency.host_bf16(X + 1.0), np.float32))

    # plain in-memory arrays never touch the cache
    residency.reset_transfer_stats()
    residency.build_resident_bf16(X, chunk_bytes=96 * 2 * 64)
    assert residency.transfer_stats()['encode_s'] > 0


def test_memmap_keeps_cache_identity_through_distances(tmp_path, monkeypatch):
    """Memmap sources must reach device_bf16 AS-IS: np.asarray on a memmap
    returns a fresh base-class view per call, which (a) drops .filename so
    the on-disk encode cache never engages and (b) changes id() so the
    distance and PCA phases each pay a full upload (caught in round 4: the
    warm bench still spent 60 s re-encoding page-cached sources)."""
    import jamie_tpu.ops.distances as dmod
    from jamie_tpu.core import residency
    from jamie_tpu.ops.distances import pairwise_sq_euclidean

    rng = np.random.RandomState(22)
    X = rng.randn(80, 60).astype(np.float32)
    src = tmp_path / 'x.npy'
    np.save(src, X)
    arr = np.load(src, mmap_mode='r')

    monkeypatch.setattr(dmod, '_FEATURE_CHUNK_THRESHOLD', 1000)
    monkeypatch.setattr(residency, 'ENCODE_CACHE_DIR', str(tmp_path / 'enc'))
    residency.clear_residency_cache()
    residency.reset_transfer_stats()
    d1 = np.asarray(pairwise_sq_euclidean(arr))
    s1 = residency.transfer_stats()
    assert s1['encode_s'] > 0
    import os
    assert os.listdir(tmp_path / 'enc'), 'encode cache never engaged'

    # same memmap again: resident copy shared (id-stable), zero new bytes
    residency.reset_transfer_stats()
    d2 = np.asarray(pairwise_sq_euclidean(arr))
    s2 = residency.transfer_stats()
    assert s2['bytes'] == 0, s2
    np.testing.assert_array_equal(d1, d2)

    # fresh memmap of the same file (new process ersatz): encode cache
    # replays — upload happens, re-encode does not
    residency.clear_residency_cache()
    arr2 = np.load(src, mmap_mode='r')
    residency.reset_transfer_stats()
    np.asarray(pairwise_sq_euclidean(arr2))
    s3 = residency.transfer_stats()
    assert s3['bytes'] > 0 and s3['encode_s'] == 0.0 \
        and s3['read_s'] == 0.0, s3
    residency.clear_residency_cache()


def test_device_csr_resident_rows():
    """DeviceCSR: one upload, on-chip row-block decode identical to the
    source values (exact f32 below the link threshold), shared across
    uploaders."""
    import scipy.sparse as sp

    from jamie_tpu.core import residency

    rng = np.random.RandomState(31)
    dense = np.zeros((300, 500), np.float32)
    mask = rng.rand(300, 500) < 0.04
    dense[mask] = rng.randn(int(mask.sum())).astype(np.float32)
    X = sp.csr_matrix(dense)
    want = dense    # below BF16_LINK_ELEMS: values exact

    residency.clear_residency_cache()
    residency.reset_transfer_stats()
    up1 = residency.ChunkUploader(X)
    assert up1.dcsr is not None
    got = np.vstack([np.asarray(up1.rows(s, s + 64))
                     for s in range(0, 300, 64)])
    np.testing.assert_array_equal(got, want)
    one_upload = residency.transfer_stats()['bytes']
    assert one_upload == up1.dcsr.nbytes

    # a second uploader on the same matrix reuses the resident CSR:
    # zero additional link bytes for any number of passes
    up2 = residency.ChunkUploader(X)
    assert up2.dcsr is up1.dcsr
    g2 = np.asarray(up2.rows(10, 299))   # odd, unaligned block
    np.testing.assert_array_equal(g2, want[10:299])
    assert residency.transfer_stats()['bytes'] == one_upload

    # empty edge rows + all-zero matrix
    g3 = np.asarray(up2.rows(0, 1))
    np.testing.assert_array_equal(g3, want[0:1])
    Z = sp.csr_matrix((5, 9), dtype=np.float32)
    upz = residency.ChunkUploader(Z)
    if upz.dcsr is not None:
        np.testing.assert_array_equal(np.asarray(upz.rows(0, 5)),
                                      np.zeros((5, 9)))

    # over-budget matrices fall back to streaming (an already-resident
    # copy is returned regardless — residency is free once paid)
    residency.clear_residency_cache()
    assert residency.device_csr(X, budget_bytes=10) is None
    residency.clear_residency_cache()


def test_pairwise_device_inputs_never_stream(monkeypatch):
    """Device-resident inputs must not take the host feature-chunked path
    (it would FETCH device blocks back through the link to re-upload
    them — caught live at the 100k atlas: 655 MB round-trips per
    landmark block)."""
    import jax.numpy as jnp

    import jamie_tpu.ops.distances as dmod
    from jamie_tpu.core import residency
    from jamie_tpu.ops.distances import pairwise_sq_euclidean

    rng = np.random.RandomState(17)
    xh = rng.randn(120, 50).astype(np.float32)
    yh = rng.randn(40, 50).astype(np.float32)
    ref = np.asarray(pairwise_sq_euclidean(xh, yh))

    monkeypatch.setattr(dmod, '_FEATURE_CHUNK_THRESHOLD', 100)
    residency.reset_transfer_stats()
    got = np.asarray(pairwise_sq_euclidean(jnp.asarray(xh), jnp.asarray(yh)))
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)
    # no bytes counted: the uploader/resident builders never engaged
    assert residency.transfer_stats()['bytes'] == 0


def test_encode_cache_prune(tmp_path, monkeypatch):
    """The cache DIRECTORY is LRU-bounded: oldest entries drop once the
    total crosses the limit; the newest save always survives."""
    import os

    from jamie_tpu.core import residency

    d = tmp_path / 'enc'
    os.makedirs(d)
    for i in range(4):
        p = d / f'e{i}.npz'
        np.savez(p, x=np.zeros(256, np.uint8))
        os.utime(p, (1000 + i, 1000 + i))
    sz = os.path.getsize(d / 'e0.npz')
    residency._prune_encode_cache(str(d), total_limit=2 * sz)
    left = sorted(os.listdir(d))
    assert left == ['e2.npz', 'e3.npz'], left   # oldest two pruned

    # under the limit: nothing pruned
    residency._prune_encode_cache(str(d), total_limit=10 * sz)
    assert sorted(os.listdir(d)) == ['e2.npz', 'e3.npz']


# --------------------------------------------------------------------------
# Every advertised mode must compute (VERDICT round-4 item 3): the
# reference accepts the full pinned-old-sklearn metric list
# (jamie/jamie.py:117-127); three of them (kulsinski / wminkowski /
# sokalmichener) were removed from modern sklearn/scipy and are now
# implemented natively (bool-Gram MXU formulas, ops/distances.py).
# --------------------------------------------------------------------------

def _mode_input(mode, rng):
    if mode == 'haversine':           # (lat, lon) pairs in radians
        return np.stack([rng.uniform(-1.2, 1.2, 25),
                         rng.uniform(-3.0, 3.0, 25)], 1).astype(np.float32)
    if mode in ('dice', 'jaccard', 'matching', 'rogerstanimoto',
                'russellrao', 'sokalmichener', 'sokalsneath', 'yule',
                'kulsinski', 'hamming'):
        return (rng.rand(25, 9) < 0.4).astype(np.float32)
    return rng.randn(25, 9).astype(np.float32)


@pytest.mark.parametrize('mode', [m for m in __import__(
    'jamie_tpu.config', fromlist=['DISTANCE_MODES']).DISTANCE_MODES
    if m not in ('geodesic', 'spearman', 'pearson')])
def test_every_advertised_pairwise_mode_computes(mode):
    rng = np.random.RandomState(7)
    x = _mode_input(mode, rng)
    d = np.asarray(pairwise_distance(x, mode))
    assert d.shape == (x.shape[0], x.shape[0])
    assert np.all(np.isfinite(d)), mode
    assert np.all(np.diag(d) < 1e-3 + (mode == 'kulsinski')), mode


def _bool_counts(u, v):
    u, v = u != 0, v != 0
    ctt = int(np.sum(u & v)); ctf = int(np.sum(u & ~v))
    cft = int(np.sum(~u & v)); cff = int(np.sum(~u & ~v))
    return ctt, ctf, cft, cff


def test_kulsinski_formula():
    rng = np.random.RandomState(1)
    x = (rng.rand(12, 15) < 0.5).astype(np.float32)
    d = np.asarray(pairwise_distance(x, 'kulsinski'))
    for i in range(0, 12, 3):
        for j in range(0, 12, 4):
            ctt, ctf, cft, _ = _bool_counts(x[i], x[j])
            n = x.shape[1]
            ref = (ctf + cft - ctt + n) / (cft + ctf + n)
            np.testing.assert_allclose(d[i, j], ref, rtol=1e-5)


def test_sokalmichener_formula():
    rng = np.random.RandomState(2)
    x = (rng.rand(12, 15) < 0.5).astype(np.float32)
    d = np.asarray(pairwise_distance(x, 'sokalmichener'))
    for i in range(0, 12, 3):
        for j in range(0, 12, 4):
            ctt, ctf, cft, cff = _bool_counts(x[i], x[j])
            r = ctf + cft
            ref = 2.0 * r / (cff + ctt + 2.0 * r) if r else 0.0
            np.testing.assert_allclose(d[i, j], ref, rtol=1e-5)


def test_wminkowski_default_is_euclidean():
    rng = np.random.RandomState(3)
    x = rng.randn(20, 6).astype(np.float32)
    d = np.asarray(pairwise_distance(x, 'wminkowski'))
    ref = pairwise_distances(x, metric='euclidean')
    np.testing.assert_allclose(d, ref, rtol=1e-4, atol=1e-4)


def test_wminkowski_weights_and_p():
    from jamie_tpu.ops.distances import _wminkowski_dist
    rng = np.random.RandomState(4)
    x = rng.randn(10, 5).astype(np.float32)
    w = rng.rand(5).astype(np.float32) + 0.5
    d = np.asarray(_wminkowski_dist(x, p=3.0, w=w, block=4))
    i, j = 2, 7
    ref = (np.sum(np.abs(w * (x[i] - x[j])) ** 3.0)) ** (1 / 3.0)
    np.testing.assert_allclose(d[i, j], ref, rtol=1e-4)
