"""Preprocessing parity: PCA correctness, preclass round-trips, clamping."""

import numpy as np
import pytest

from jamie_tpu.preprocess import PCA, Preprocessor


def test_pca_matches_sklearn_subspace():
    rng = np.random.RandomState(0)
    X = rng.randn(50, 20).astype(np.float32)
    X[:, :5] *= 10  # give the spectrum structure
    ours = PCA(n_components=5).fit(X)
    from sklearn.decomposition import PCA as SkPCA
    sk = SkPCA(n_components=5).fit(X)
    # Components should span the same subspace (signs/rotations may differ
    # only by sign here since eigenvalues are distinct)
    for i in range(5):
        dot = abs(np.dot(ours.components_[i], sk.components_[i]))
        assert dot > 0.99, f'component {i} mismatch: |cos|={dot}'


def test_pca_gram_route_tall_features():
    """features >> samples triggers the Gram route."""
    rng = np.random.RandomState(1)
    X = rng.randn(30, 500).astype(np.float32)
    pca = PCA(n_components=10).fit(X)
    Y = pca.transform(X)
    assert Y.shape == (30, 10)
    # Projection variance should be sorted descending
    var = Y.var(axis=0)
    assert np.all(np.diff(var) <= 1e-3)
    # Round trip error below total variance
    Xr = pca.inverse_transform(Y)
    assert np.mean((Xr - X) ** 2) < X.var()


def test_preprocessor_roundtrip_with_pca():
    rng = np.random.RandomState(2)
    X = rng.randn(40, 30).astype(np.float32) * 5 + 3
    pre = Preprocessor.fit(X, pca_dim=30)
    T = pre.transform(X)
    Xr = pre.inverse_transform(T)
    np.testing.assert_allclose(Xr, X, atol=1e-2)


def test_preprocessor_roundtrip_standardize_only():
    rng = np.random.RandomState(3)
    X = rng.randn(40, 7).astype(np.float32) * 2 + 1
    pre = Preprocessor.fit(X, pca_dim=None)
    T = pre.transform(X)
    np.testing.assert_allclose(T.mean(0), 0, atol=1e-4)
    np.testing.assert_allclose(T.std(0), 1, atol=1e-4)
    Xr = pre.inverse_transform(T)
    np.testing.assert_allclose(Xr, X, atol=1e-4)


def test_preprocessor_nan_guard():
    """Constant features give std=0 -> NaN -> 0 (utilities.py:665-669)."""
    X = np.ones((10, 3), np.float32)
    X[:, 1] = np.arange(10)
    pre = Preprocessor.fit(X, pca_dim=None)
    T = pre.transform(X)
    assert np.isfinite(T).all()
    np.testing.assert_allclose(T[:, 0], 0)


def test_pca_dim_clamped_with_warning():
    rng = np.random.RandomState(4)
    X = rng.randn(10, 6).astype(np.float32)
    with pytest.warns(UserWarning, match='adjusting to compensate'):
        pre = Preprocessor.fit(X, pca_dim=512)
    assert pre.transform(X).shape == (10, 6)


def test_preprocessor_serialization_roundtrip():
    rng = np.random.RandomState(5)
    X = rng.randn(20, 8).astype(np.float32)
    pre = Preprocessor.fit(X, pca_dim=4)
    d = pre.to_dict()
    pre2 = Preprocessor.from_dict(d)
    np.testing.assert_allclose(pre.transform(X), pre2.transform(X),
                               rtol=1e-6)


def test_pca_streamed_matches_direct():
    from jamie_tpu import preprocess as pp
    rng = np.random.RandomState(7)
    spectrum = 4.0 * (0.7 ** np.arange(400))
    X = (rng.randn(30, 400) * spectrum).astype(np.float32)
    k = 5
    direct = pp.PCA(n_components=k).fit(X)
    from jamie_tpu.core import residency
    old = pp._STREAM_THRESHOLD
    old_budget = residency.DEFAULT_BUDGET_BYTES
    try:
        pp._STREAM_THRESHOLD = 100      # force the large-matrix route...
        residency.DEFAULT_BUDGET_BYTES = 0   # ...and veto bf16 residency
        streamed = pp.PCA(n_components=k).fit(X)
    finally:
        pp._STREAM_THRESHOLD = old
        residency.DEFAULT_BUDGET_BYTES = old_budget
    # subspace agreement (streamed path is randomized; components may rotate
    # within near-degenerate blocks)
    A = direct.components_
    Bc = streamed.components_ / np.linalg.norm(
        streamed.components_, axis=1, keepdims=True)
    sv = np.linalg.svd(A @ Bc.T, compute_uv=False)
    assert sv.min() > 0.95, f'subspace angle too large: cos={sv.min()}'
    # atol matches the resident-bf16 test: since round 4 the streamed path
    # ships continuous chunks bf16 over the link (ChunkUploader), the same
    # rounding the resident path applies — means derive from those chunks
    np.testing.assert_allclose(streamed.mean_, direct.mean_, atol=5e-2)


def test_pca_randomized_matches_exact():
    """Randomized PCA must capture the same subspace / variance as exact PCA
    (per-component vectors may rotate within near-degenerate blocks; the
    downstream VAE is invariant to that rotation)."""
    from jamie_tpu import preprocess as pp
    rng = np.random.RandomState(8)
    # geometric spectrum decay, like real single-cell covariance spectra
    spectrum = 5.0 * (0.75 ** np.arange(150))
    X = (rng.randn(200, 150) @ np.diag(spectrum)).astype(np.float32)
    k = 8
    exact = pp.PCA(n_components=k).fit(X)
    mean, comps = pp._pca_fit_randomized(
        np.asarray(X, np.float32), k, power_iters=2)
    comps = np.array(comps)
    comps = comps / np.linalg.norm(comps, axis=1, keepdims=True)
    # principal angles between the two k-dim subspaces ~ 0
    M = exact.components_ @ comps.T
    sv = np.linalg.svd(M, compute_uv=False)
    assert sv.min() > 0.95, f'subspace angle too large: cos={sv.min()}'
    # captured variance matches
    Xc = X - X.mean(0)
    var_exact = np.sum((Xc @ exact.components_.T) ** 2)
    var_rand = np.sum((Xc @ comps.T) ** 2)
    assert var_rand > 0.99 * var_exact


def test_nonlinear_tsne_preclass():
    """model_pca='tsne': device t-SNE embedding + kNN out-of-sample maps."""
    import warnings as w

    from jamie_tpu.preprocess import Preprocessor

    rng = np.random.RandomState(5)
    z = rng.randn(60, 2).astype(np.float32)
    X = (z @ rng.randn(2, 20)).astype(np.float32)
    pre = Preprocessor.fit(X, pca_dim=2, method='tsne')
    emb = pre.transform_fit()
    assert emb.shape == (60, 2)
    assert np.isfinite(emb).all()
    # out-of-sample transform: a fit row maps near its own embedding
    t0 = pre.transform(X[:5])
    np.testing.assert_allclose(t0, emb[:5], atol=1e-3)
    # new (noisy) rows produce finite embeddings near the fit cloud
    t1 = pre.transform(X[:5] + 0.01 * rng.randn(5, 20).astype(np.float32))
    assert np.isfinite(t1).all()
    assert np.abs(t1).max() <= np.abs(emb).max() * 1.5 + 1
    # inverse maps embedding rows back near their source rows
    inv = pre.inverse_transform(emb[:5])
    assert np.isfinite(inv).all()
    # serialization carries the embedding arrays
    pre2 = Preprocessor.from_dict(pre.to_dict())
    np.testing.assert_allclose(pre2.transform(X[:5]), t0, atol=1e-5)
    # umap preclass runs the device implementation end-to-end
    pre_u = Preprocessor.fit(X[:30], pca_dim=2, method='umap')
    emb_u = pre_u.transform(X[:30])
    assert emb_u.shape == (30, 2) and np.isfinite(emb_u).all()


def test_pca_resident_bf16_matches_streamed():
    """Resident-bf16 randomized PCA recovers the same subspace as the
    streamed f32 path (bf16 rounding tolerance)."""
    import jax.numpy as jnp

    from jamie_tpu.core import residency
    from jamie_tpu.preprocess import (
        _pca_fit_resident_bf16, _pca_fit_streamed,
    )

    rng = np.random.RandomState(9)
    z = rng.randn(200, 8).astype(np.float32)
    X = (z @ rng.randn(8, 900) + 0.01 * rng.randn(200, 900)).astype(np.float32)
    mean_s, comps_s, scores_s = _pca_fit_streamed(X, 6)
    xdev = jnp.asarray(X).astype(jnp.bfloat16)
    mean_r, comps_r, scores_r = _pca_fit_resident_bf16(xdev, 6)
    np.testing.assert_allclose(np.asarray(mean_r), np.asarray(mean_s),
                               atol=2e-2)
    # same subspace: projector difference small
    Ps = np.asarray(comps_s).T @ np.asarray(comps_s)
    Pr = np.asarray(comps_r).T @ np.asarray(comps_r)
    assert np.abs(Ps - Pr).max() < 0.05
    # scores reproduce the projection of the fit data
    proj = (X - np.asarray(mean_r)) @ np.asarray(comps_r).T
    corr = [abs(np.corrcoef(proj[:, j], np.asarray(scores_r)[:, j])[0, 1])
            for j in range(6)]
    assert min(corr) > 0.99
    residency.clear_residency_cache()


def test_transform_fit_device_scores_stay_on_device(monkeypatch):
    """The atlas-scale chain: row-streamed PCA returns DEVICE scores; the
    Preprocessor standardizes them on device (same values as the host
    path) and hands the trainer a jax array — no 2.1 GB host round-trip
    (the measured Mapping wall of the million-cell fit). The raw score
    buffer is donated and every alias released."""
    import jax

    import jamie_tpu.preprocess as pp

    rng = np.random.RandomState(5)
    x = rng.randn(300, 40).astype(np.float32)   # tall: row-streamed route
    monkeypatch.setattr(pp, '_STREAM_THRESHOLD', 100)

    pre = pp.Preprocessor.fit(x, pca_dim=8)
    assert isinstance(pre._fit_sample, jax.Array)
    raw = np.asarray(pre._fit_sample)       # host copy BEFORE the donation
    out = pre.transform_fit()
    assert isinstance(out, jax.Array)
    assert pre._fit_sample is None and pre.pca.scores_ is None

    # parity with the host path's standardize of the same raw scores
    ref = (raw - raw.mean()) / raw.std()
    ref[np.isnan(ref)] = 0
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-5, atol=1e-5)

    # serving transform still host in / host out
    served = pre.transform(x[:7])
    assert isinstance(served, np.ndarray) and served.shape == (7, 8)


def test_row_streamed_power_iters_knob(monkeypatch):
    """pca_power_iters=0 halves the row-streamed route's decode passes;
    for data whose effective rank is under pca_dim + oversample, the
    subspace is captured exactly either way (same components up to sign,
    same scores)."""
    import jamie_tpu.preprocess as pp

    rng = np.random.RandomState(11)
    x = (rng.randn(400, 12) @ rng.randn(12, 60)).astype(np.float32)
    monkeypatch.setattr(pp, '_STREAM_THRESHOLD', 100)

    out1 = np.asarray(pp.PCA(8, power_iters=1).fit_transform(x))
    out0 = np.asarray(pp.PCA(8, power_iters=0).fit_transform(x))
    np.testing.assert_allclose(np.abs(out0), np.abs(out1),
                               rtol=5e-3, atol=5e-3)
