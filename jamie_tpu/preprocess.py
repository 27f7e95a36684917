"""Invertible preprocessing: PCA projection + fit-sample standardization.

Reference parity: `preclass` (jamie/utilities.py:654-678) wired through
`project_jamie` (jamie/jamie.py:434-469) — optional per-modality PCA to
`pca_dim` (auto-clamped to data size) followed by standardization against the
*fit sample's* mean/std with NaN -> 0; fully invertible. The reference stores
transform closures on the pickled model (jamie/model.py:133-141); here the
state is plain arrays (components, means, stds) so checkpoints carry no code.

TPU-first: PCA is computed on device via the Gram-matrix route — for
cells << features (the single-cell regime, e.g. 9k x 242k) an N x N eigh
plus matmuls, all MXU work; for features <= cells the F x F covariance eigh.
Matches sklearn PCA's projection semantics (centered, components from SVD).
"""

from __future__ import annotations

import warnings
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


# Above this many elements (and f > n) PCA reads the shared bf16 residency
# — one 2-byte/element upload reused with the distance phase — falling back
# to f32 feature-chunk streaming past the HBM budget. 100M (round 3, was
# 500M): quality-neutral per examples/bf16_threshold_ab.py; see
# ops/distances._FEATURE_CHUNK_THRESHOLD for the A/B numbers.
_STREAM_THRESHOLD = 100_000_000

# Above this many cells, full eigh of the N x N Gram matrix is slower than a
# randomized range finder (eigh is sequential-heavy on TPU; the randomized
# path is pure MXU matmuls + a small QR/eigh)
_RANDOMIZED_THRESHOLD = 4096

# Row-block size for the resident-CSR SpMM sketch in the row-streamed PCA:
# bounds the (ell_rows, k) einsum partial at ~280 MB (a whole-matrix call
# materializes 2.1 GB at 1M cells x k=522, which OOMed the 1M atlas fit
# alongside Q/scores/QR workspace — round 5).
_SKETCH_SPMM_ROWS = 65_536


@partial(jax.jit,
         static_argnames=('n_components', 'oversample', 'power_iters',
                          'seed'))
def _pca_fit_randomized(X: jnp.ndarray, n_components: int,
                        oversample: int = 10, power_iters: int = 2,
                        seed: int = 0):
    """Halko-style randomized PCA: two passes of tall matmuls + a small
    factorization. Accuracy for the top components matches exact PCA to the
    spectral-decay limit; power iterations sharpen slowly-decaying spectra."""
    n, f = X.shape
    k = min(n_components + oversample, min(n, f))
    mean = jnp.mean(X, axis=0)
    Xc = X - mean
    key = jax.random.PRNGKey(seed)
    omega = jax.random.normal(key, (f, k), jnp.float32)
    Y = Xc @ omega                               # (n, k)
    Q, _ = jnp.linalg.qr(Y)
    for _ in range(power_iters):
        Z = Xc.T @ Q                             # (f, k)
        Q, _ = jnp.linalg.qr(Xc @ Z)
    B = Q.T @ Xc                                 # (k, f)
    # top right-singular vectors of B == of Xc (within the range of Q)
    BBt = B @ B.T
    w, Ub = jnp.linalg.eigh(BBt)
    Ub = Ub[:, ::-1][:, :n_components]
    s = jnp.sqrt(jnp.maximum(w[::-1][:n_components], 1e-12))
    comps = (Ub / s).T @ B                       # (n_components, f)
    return mean, comps


@partial(jax.jit,
         static_argnames=('n_components', 'oversample', 'seed'))
def _pca_fit_resident_bf16(X, n_components: int, oversample: int = 10,
                           seed: int = 0):
    """Randomized PCA straight from a device-resident bf16 matrix.

    Centering is implicit — (X - 1 mean^T) M = X M - 1 (mean^T M) — so no
    f32 or centered copy of the (huge) matrix ever materializes; every
    product is a bf16 MXU matmul with f32 accumulation, the same rounding
    the streamed path applies. Returns (mean, components, fit scores)."""
    n, f = X.shape
    k = min(n_components + oversample, n)
    mean = jnp.mean(X, axis=0, dtype=jnp.float32)          # (f,)

    key = jax.random.PRNGKey(seed)
    omega = jax.random.normal(key, (f, k), jnp.float32)
    mo = mean @ omega                                       # (k,)
    Y = jnp.matmul(X, omega.astype(jnp.bfloat16),
                   preferred_element_type=jnp.float32) - mo[None, :]
    Q, _ = jnp.linalg.qr(Y)                                 # (n, k) f32
    # One power iteration sharpens slowly-decaying spectra
    Zt = jnp.matmul(Q.T, X, preferred_element_type=jnp.float32) \
        - jnp.sum(Q, axis=0)[:, None] * mean[None, :]       # (k, f)
    Y = jnp.matmul(X, Zt.T.astype(jnp.bfloat16),
                   preferred_element_type=jnp.float32) \
        - (mean @ Zt.T)[None, :]
    Q, _ = jnp.linalg.qr(Y)

    B = jnp.matmul(Q.T, X, preferred_element_type=jnp.float32) \
        - jnp.sum(Q, axis=0)[:, None] * mean[None, :]       # (k, f)
    BBt = B @ B.T
    w, Ub = jnp.linalg.eigh(BBt)
    Ub = Ub[:, ::-1][:, :n_components]
    s = jnp.sqrt(jnp.maximum(w[::-1][:n_components], 1e-12))
    comps = (Ub / s).T @ B                                  # (k', f)
    scores = Q @ (Ub * s)                                   # (n, k')
    return mean, comps, scores


def _pca_fit_streamed(X, n_components: int, oversample: int = 10,
                      seed: int = 0):
    """Randomized PCA with the feature axis streamed host->device, for
    matrices too large to keep whole in HBM (e.g. 9.2k x 242k ATAC). Two
    streaming passes: range finding (Y = Xc Omega, with Omega generated
    per-chunk from a counter-derived key) and projection (B = Q^T Xc);
    avoids both the resident matrix and the N x N eigh. Sparse X should
    arrive CSC (_pca_fit converts) so each column chunk densifies in
    O(chunk nnz). Chunks ship through the dtype-aware backpressured
    uploader (core/residency.ChunkUploader): binary/int/sparse sources
    put 2-16x fewer bytes on the link, and pinned host transfer buffers
    stay bounded (the unbounded async loop OOM-killed the 100k atlas)."""
    from .core.residency import ChunkUploader

    n, f = X.shape
    k = min(n_components + oversample, n)
    chunk = max(int((1 << 30) / (n * 4)), 1024)
    key = jax.random.PRNGKey(seed)
    up = ChunkUploader(X)

    # Pass 1: column means + sketch Y = sum_b Xc_b Omega_b
    mean_parts = []
    Y = jnp.zeros((n, k), jnp.float32)
    for ci, start in enumerate(range(0, f, chunk)):
        xb = up.cols(start, start + chunk)
        mb = jnp.mean(xb, axis=0)
        omega_b = jax.random.normal(jax.random.fold_in(key, ci),
                                    (xb.shape[1], k), jnp.float32)
        Y = Y + (xb - mb) @ omega_b
        mean_parts.append(np.asarray(mb))
    Q, _ = jnp.linalg.qr(Y)

    # Pass 2: B = Q^T Xc, accumulated on host per chunk (k x f)
    comp_parts = []
    for start in range(0, f, chunk):
        xb = up.cols(start, start + chunk)
        xbc = xb - jnp.mean(xb, axis=0)
        comp_parts.append(np.asarray(Q.T @ xbc))
    B = np.concatenate(comp_parts, axis=1)           # (k, f) on host

    BBt = jnp.asarray(B) @ jnp.asarray(B).T          # (k, k)
    w, Ub = jnp.linalg.eigh(BBt)
    Ub = np.asarray(Ub)[:, ::-1][:, :n_components]
    s = np.sqrt(np.maximum(np.asarray(w)[::-1][:n_components], 1e-12))
    comps = jnp.asarray((Ub / s).T @ B)              # (n_components, f)
    mean = jnp.asarray(np.concatenate(mean_parts))
    # Training scores come free from the sketch: Xc ~ Q B, so
    # Xc comps^T ~ Q Ub s — no third pass and no full-matrix projection.
    scores = np.asarray(Q) @ (Ub * s)                # (n, n_components)
    return mean, comps, scores


def _pca_fit_row_streamed(X, n_components: int, oversample: int = 10,
                          seed: int = 0, chunk_bytes: int = 1 << 30,
                          power_iters: int = 1):
    """Randomized PCA with the CELL axis streamed host->device, for tall
    matrices (n > f) too large to reside whole — the raw-feature atlas
    case (e.g. 100k cells x 20k genes, dense or CSR). The (f, k) sketch,
    (k, f) projection, and (k, k) eigh all fit trivially; the matrix is
    read three times in row blocks (sketch, power iteration, projection)
    and the training scores come free from the final range.

    Mirrors _pca_fit_streamed (the wide-matrix, column-streamed twin).
    Row blocks ship through the dtype-aware backpressured uploader
    (core/residency.ChunkUploader): the 3%-dense atlas CSR goes over the
    link as indices+values (~16x under dense f32), and pinned host
    buffers stay bounded — the previous unbounded async loop queued all
    four passes' dense chunks (~60 GB) and was host-OOM-killed at 131 GB
    RSS on the 100k-cell atlas (round 4)."""
    from .core.hostmat import dense_rows
    from .core.residency import ChunkUploader

    n, f = X.shape
    k = min(n_components + oversample, min(n, f))
    rows = max(int(chunk_bytes / max(f * 4, 1)), 256)
    key = jax.random.PRNGKey(seed)
    up = ChunkUploader(X)

    # Column means: one streamed pass (scipy sparse .mean is O(nnz))
    if hasattr(X, 'mean') and not isinstance(X, np.ndarray):
        mean = jnp.asarray(np.asarray(X.mean(axis=0)).ravel(), jnp.float32)
    else:
        acc = np.zeros((f,), np.float64)
        for s in range(0, n, rows):
            acc += dense_rows(X, s, s + rows).sum(axis=0, dtype=np.float64)
        mean = jnp.asarray(acc / n, jnp.float32)

    omega = jax.random.normal(key, (f, k), jnp.float32)
    # Device-resident CSR sources skip the dense block decode entirely:
    # the decode is a serialized TPU scatter (~9.2M nnz/s, round-4 probe)
    # while both PCA passes only ever MATMUL the block — DeviceCSR.matmul/
    # tmatmul compute X @ M and X^T @ Q directly as gather + one-hot
    # matmuls (core/residency.py SpMM note), turning the dominant atlas
    # Mapping cost into MXU/bandwidth work.
    dcsr = getattr(up, 'dcsr', None)

    def sketch(M):
        """Y = Xc M, streamed over row blocks: (n, k) stays on device.
        The SpMM route is ALSO row-blocked: a whole-matrix matmul
        materializes the (ell_rows, k) einsum partial before the
        subrow combine — 2.1 GB at 1M cells x k=522, which OOMed the
        million-cell fit on top of Q/scores/QR workspace (round-5 1M
        re-run). 128k-row slices bound it at ~280 MB for free (the
        slice boundaries land on the device-side 256-row ELL padding)."""
        mo = mean @ M                                   # (k,)
        if dcsr is not None:
            step = _SKETCH_SPMM_ROWS
            if n <= step:
                return dcsr.matmul(M) - mo[None, :]
            parts = [dcsr.matmul(M, s, min(s + step, n)) - mo[None, :]
                     for s in range(0, n, step)]
            return jnp.concatenate(parts, axis=0)
        parts = []
        for s in range(0, n, rows):
            xb = up.rows(s, s + rows)
            parts.append(xb @ M - mo[None, :])
        return jnp.concatenate(parts, axis=0)

    def project(Q):
        """B = Q^T Xc, streamed: (k, f) accumulator on device."""
        B = -jnp.sum(Q, axis=0)[:, None] * mean[None, :]
        if dcsr is not None:
            return B + dcsr.tmatmul(Q).T
        for s in range(0, n, rows):
            xb = up.rows(s, s + rows)
            B = B + Q[s:s + rows].T @ xb
        return B

    Q, _ = jnp.linalg.qr(sketch(omega))
    for _ in range(power_iters):    # each iteration = 2 more data passes
        Q, _ = jnp.linalg.qr(sketch(project(Q).T))
    B = project(Q)
    if dcsr is not None:
        # The CSC twin only serves the projection passes above; at atlas
        # scale it is 0.6-1.2 GB of HBM that the eigendecode + trainer
        # phases below should not have to share the chip with.
        dcsr.release_csc()
    BBt = B @ B.T
    w, Ub = jnp.linalg.eigh(BBt)
    Ub = Ub[:, ::-1][:, :n_components]
    s = jnp.sqrt(jnp.maximum(w[::-1][:n_components], 1e-12))
    comps = (Ub / s).T @ B                              # (n_components, f)
    # Scores STAY ON DEVICE: at 1M cells they are 2.1 GB, and fetching
    # them through the ~10 MB/s tunnel link (then standardizing on host
    # and re-uploading for the trainer) measured as the dominant Mapping
    # cost of the million-cell atlas fit. The standardize + trainer
    # residency chain is device-aware end to end.
    scores = Q @ (Ub * s)                               # (n, n_components)
    return mean, comps, scores


@jax.jit
def _component_signs(comps) -> jnp.ndarray:
    """Deterministic signs (sklearn svd_flip style: largest-|.| of each
    component made positive)."""
    comps = jnp.asarray(comps)
    signs = jnp.sign(comps[jnp.arange(comps.shape[0]),
                           jnp.argmax(jnp.abs(comps), axis=1)])
    return jnp.where(signs == 0, 1.0, signs)


def _pca_fit(X, n_components: int, power_iters: int = 1):
    """Return (mean, components[k, F], fit_scores_or_None). scipy-sparse X
    flows through the residency / column-streamed routes blockwise; the
    small-matrix routes densify (sub-threshold by definition).
    power_iters applies to the row-streamed (tall atlas) route only — the
    one where an iteration costs two extra full decode passes."""
    from .core.hostmat import densify, ensure_col_major, is_scipy_sparse

    sparse_in = is_scipy_sparse(X)
    n, f = X.shape if sparse_in else np.shape(X)
    if n * f > _STREAM_THRESHOLD:
        from .core.residency import device_bf16
        # ndarrays (incl. memmaps) pass through AS-IS: np.asarray on a
        # memmap returns a fresh base-class view — .filename lost (no
        # encode cache) and id() unstable (no sharing with the distance
        # phase's upload). See ops/distances.py same-named call site.
        xdev = device_bf16(X if sparse_in or isinstance(X, np.ndarray)
                           else np.asarray(X))
        if xdev is not None:
            # One shared bf16 residency (uploaded by the distance phase)
            # replaces the streamed path's two extra f32 passes
            mean, comps, scores = _pca_fit_resident_bf16(xdev, n_components)
        elif f > n:
            mean, comps, scores = _pca_fit_streamed(
                ensure_col_major(X) if sparse_in else np.asarray(X),
                n_components)
        else:
            # tall (atlas) orientation: stream the cell axis instead
            mean, comps, scores = _pca_fit_row_streamed(
                X, n_components, power_iters=power_iters)
        signs = _component_signs(comps)
        if isinstance(scores, jax.Array):
            # device scores stay on device (atlas-scale: see the
            # row-streamed route) — the sign flip is a trivial scale
            return mean, comps * signs[:, None], scores * signs[None, :]
        return (mean, comps * signs[:, None],
                np.asarray(scores) * np.asarray(signs)[None, :])
    if sparse_in:
        X = densify(X)
    if (min(n, f) > _RANDOMIZED_THRESHOLD
            and n_components <= min(n, f) // 4):
        mean, comps = _pca_fit_randomized(
            jnp.asarray(X, jnp.float32), n_components)
    else:
        mean, comps = _pca_fit_direct(jnp.asarray(X, jnp.float32),
                                      n_components)
    signs = _component_signs(comps)
    return mean, comps * signs[:, None], None


@partial(jax.jit, static_argnames=('n_components',))
def _pca_fit_direct(X, n_components: int):
    """Exact PCA in one dispatch (Gram route for tall-feature matrices)."""
    n, f = X.shape
    mean = jnp.mean(X, axis=0)
    Xc = X - mean
    if f > n:
        # Gram route: Xc Xc^T = U S^2 U^T; components = S^-1 U^T Xc
        G = Xc @ Xc.T
        w, U = jnp.linalg.eigh(G)           # ascending
        w = w[::-1][:n_components]
        U = U[:, ::-1][:, :n_components]
        s = jnp.sqrt(jnp.maximum(w, 1e-12))
        comps = (U / s).T @ Xc              # (k, F)
    else:
        C = Xc.T @ Xc
        w, V = jnp.linalg.eigh(C)
        V = V[:, ::-1][:, :n_components]
        comps = V.T
    return mean, comps


@jax.jit
def _pca_project(X, mean, comps_t):
    return (X - mean) @ comps_t


@partial(jax.jit, donate_argnums=(0,))
def _standardize_device(x, mean, std):
    """(x - mean) / std with the host path's NaN->0 (inf passes through);
    donates x so the raw fit-sample buffer is released in place."""
    out = (x - mean) / std
    return jnp.where(jnp.isnan(out), 0.0, out)


class PCA:
    """Minimal sklearn-compatible PCA running on device.

    `scores_` holds the fit data's projection when the fit route computes it
    as a by-product (the streamed randomized route), so atlas-scale callers
    never re-project the full matrix.
    """

    def __init__(self, n_components: int, power_iters: int = 1):
        self.n_components = int(n_components)
        self.power_iters = int(power_iters)
        self.mean_: Optional[np.ndarray] = None
        self.components_: Optional[np.ndarray] = None
        self.scores_: Optional[np.ndarray] = None

    def fit(self, X):
        from .core.hostmat import as_f32_ndarray, is_scipy_sparse
        if not is_scipy_sparse(X):
            X = as_f32_ndarray(X)   # keeps memmap identity/.filename
        mean, comps, scores = _pca_fit(X, self.n_components,
                                       power_iters=self.power_iters)
        # Device-resident: at wide-F shapes the components are ~0.5 GB
        # (512 x 241757) and every transform/inverse consumes them on
        # device anyway — fetching to host and re-uploading costs two
        # passes over the ~10-55 MB/s tunnel link per fit. Host copies are
        # made only on serialization (Preprocessor.to_dict).
        self.mean_ = jnp.asarray(mean)
        self.components_ = jnp.asarray(comps)
        # device scores are kept on device (the atlas-scale fit consumes
        # them there; fetching 2.1 GB at 1M cells was the Mapping wall)
        self.scores_ = (None if scores is None
                        else scores if isinstance(scores, jax.Array)
                        else np.asarray(scores))
        return self

    def transform(self, X, row_chunk_bytes: int = 2 << 30):
        from .core.hostmat import as_f32_ndarray, is_scipy_sparse
        from .core.residency import ChunkUploader
        if not is_scipy_sparse(X):
            X = as_f32_ndarray(X)   # keeps memmap identity/.filename
        comps_t = jnp.asarray(self.components_).T
        mean = jnp.asarray(self.mean_)
        n, f = X.shape
        if n * f * 4 <= row_chunk_bytes and not is_scipy_sparse(X):
            # small matrices ship exact f32 (no link rounding)
            return np.asarray(_pca_project(jnp.asarray(X), mean, comps_t))
        # Row-chunked projection so huge matrices never sit whole in HBM.
        # Past the package-wide 100M-element bf16 threshold chunks go
        # through the dtype-aware uploader (binary/int/sparse sources put
        # 2-16x fewer bytes on the link, continuous rounds to bf16 — the
        # policy the resident distance path applies at the same sizes);
        # below it they ship exact f32.
        from .core.hostmat import dense_rows
        rows = max(int(row_chunk_bytes / (f * 4)), 64)
        up = ChunkUploader(X) if n * f >= _STREAM_THRESHOLD else None
        if up is not None and up.dcsr is not None:
            # resident CSR: project each row block via the scatter-free
            # SpMM (X @ comps directly — the dense block decode was a
            # serialized ~9.2M nnz/s scatter, core/residency.py SpMM note)
            mproj = mean @ comps_t                       # (k,)
            out = [np.asarray(up.dcsr.matmul(comps_t, s, min(s + rows, n))
                              - mproj[None, :])
                   for s in range(0, n, rows)]
            return np.concatenate(out, axis=0)
        blk = ((lambda s: up.rows(s, s + rows)) if up is not None
               else (lambda s: jnp.asarray(dense_rows(X, s, s + rows))))
        out = [np.asarray(_pca_project(blk(s), mean, comps_t))
               for s in range(0, n, rows)]
        return np.concatenate(out, axis=0)

    def fit_transform(self, X):
        self.fit(X)
        if self.scores_ is not None:
            return self.scores_
        return self.transform(X)

    def inverse_transform(self, Y):
        Y = np.asarray(Y, np.float32)
        return np.asarray(
            jnp.asarray(Y) @ jnp.asarray(self.components_)
            + jnp.asarray(self.mean_))


class NonlinearEmbedding:
    """t-SNE / UMAP preclass front end (model_pca='tsne'/'umap',
    jamie/jamie.py:444-451) with a kNN out-of-sample extension.

    The reference's nonlinear preclass cannot transform unseen data
    (sklearn TSNE has no transform; its preclass then raises) nor invert
    (umap inverse 'will sometimes crash kernel', jamie/jamie.py:446).
    Documented deviation: both directions here interpolate over the k
    nearest fit samples with inverse-distance weights — transform maps new
    rows through neighbors in input space, inverse_transform through
    neighbors in embedding space — so modal_predict works under a
    nonlinear preclass.

    'umap' runs the device UMAP (solvers/umap.py) — kNN graph, fuzzy
    simplicial set, and SGD layout all jitted — rather than importing
    umap-learn, whose Numba kernels would run on host."""

    K_NEIGHBORS = 10

    def __init__(self, n_components: int, method: str = 'tsne'):
        self.n_components = int(n_components)
        self.method = method
        self.fit_data_: Optional[np.ndarray] = None
        self.embedding_: Optional[np.ndarray] = None

    def fit_transform(self, X):
        X = np.asarray(X, np.float32)
        method = self.method
        if method == 'umap':
            from .solvers.umap import umap_embed
            emb = umap_embed(X, self.n_components)
        elif method == 'tsne':
            from .solvers.tsne import tsne_embed
            perplexity = float(min(30.0, max(2.0, (X.shape[0] - 1) / 3)))
            emb = tsne_embed(X, self.n_components, perplexity=perplexity)
        self.fit_data_ = X
        self.embedding_ = np.asarray(emb, np.float32)
        return self.embedding_

    def _knn_interpolate(self, queries, keys, values):
        """Inverse-distance-weighted average of `values` over each query's
        k nearest rows of `keys` (exact matches return their value)."""
        from .ops.distances import pairwise_sq_euclidean
        q = jnp.asarray(np.asarray(queries, np.float32))
        kj = jnp.asarray(keys)
        vj = jnp.asarray(values)
        d2 = pairwise_sq_euclidean(q, kj)
        k = min(self.K_NEIGHBORS, kj.shape[0])
        neg_d2, idx = jax.lax.top_k(-d2, k)
        w = 1.0 / jnp.maximum(-neg_d2, 1e-12)
        w = w / jnp.sum(w, axis=1, keepdims=True)
        return np.asarray(jnp.einsum('nk,nkd->nd', w, vj[idx]))

    def transform(self, X):
        assert self.fit_data_ is not None, 'embedding not fit yet'
        return self._knn_interpolate(X, self.fit_data_, self.embedding_)

    def inverse_transform(self, Y):
        assert self.fit_data_ is not None, 'embedding not fit yet'
        return self._knn_interpolate(Y, self.embedding_, self.fit_data_)


class Preprocessor:
    """preclass-equivalent: [PCA ->] standardize by fit-sample stats.

    axis: None standardizes by the scalar mean/std of the whole transformed
    sample (the PCA path, jamie.py:453); 0 standardizes per feature (the
    no-PCA path, jamie.py:455,462-465).
    """

    def __init__(self, sample: Optional[np.ndarray] = None,
                 pca: Optional[PCA] = None, axis: Optional[int] = None):
        self.pca = pca
        self.axis = axis
        if sample is None:
            self.sample_mean = None
            self.sample_std = None
        elif isinstance(sample, jax.Array):
            # device fit sample (atlas-scale PCA scores): the stats are a
            # scalar (axis=None) or a (k,) vector — fetch THOSE, never the
            # 2.1 GB sample itself
            self.sample_mean = np.asarray(jnp.mean(sample, axis), np.float32)
            self.sample_std = np.asarray(jnp.std(sample, axis), np.float32)
        else:
            sample = np.asarray(sample, np.float32)
            self.sample_mean = np.asarray(sample.mean(axis), np.float32)
            with warnings.catch_warnings():
                warnings.simplefilter('ignore')
                self.sample_std = np.asarray(sample.std(axis), np.float32)

    @classmethod
    def fit(cls, data: np.ndarray, pca_dim: Optional[int] = None,
            method: str = 'pca', power_iters: int = 1) -> 'Preprocessor':
        """Build the per-modality preprocessor exactly as project_jamie does
        (jamie/jamie.py:436-465): PCA to pca_dim (clamped, with warning) then
        scalar standardization; or per-feature standardization if no PCA.

        scipy-sparse data streams through the PCA routes blockwise; the
        no-PCA route densifies (per-feature standardization destroys
        sparsity anyway) with a warning at atlas sizes."""
        from .core.hostmat import as_f32_ndarray, densify, is_scipy_sparse
        if is_scipy_sparse(data):
            if pca_dim is None:
                if data.shape[0] * data.shape[1] > 1_000_000_000:
                    warnings.warn(
                        'sparse input without pca_dim densifies '
                        f'{data.shape} on host; set pca_dim to keep the '
                        'pipeline streaming', UserWarning)
                data = densify(data)
        else:
            data = as_f32_ndarray(data)   # keeps memmap identity/.filename
        if pca_dim is not None:
            dim = int(pca_dim)
            if min(*data.shape) < dim:
                warnings.warn(
                    f'PCA dim must be lower than {min(*data.shape)}, found '
                    f'{dim}, adjusting to compensate.')
                dim = min(*data.shape)
            # (fit sample is cached so the estimator's subsequent transform
            # of the fit data never re-projects the full matrix)
            if method in ('umap', 'tsne'):
                pca = NonlinearEmbedding(n_components=dim, method=method)
                if is_scipy_sparse(data):
                    data = densify(data)   # NLE preclass is small-N only
            else:
                pca = PCA(n_components=dim, power_iters=power_iters)
            sample = pca.fit_transform(data)
            pre = cls(sample, pca=pca, axis=None)
            pre._fit_sample = sample
            return pre
        pre = cls(data, axis=0)
        pre._fit_sample = data
        return pre

    def transform_fit(self):
        """Standardized transform of the data this preprocessor was fit on,
        using the cached PCA scores — avoids re-projecting the full matrix
        (critical for 242k-feature modalities).

        Device fit samples standardize ON DEVICE and the result is handed
        to the trainer as-is (jnp.asarray keeps it in place) — no host
        round-trip; the raw sample's HBM is released afterwards (this is
        the one consumer; at 1M cells each copy is 2.1 GB). Same NaN->0
        semantics as the host path (inf from a zero std passes through
        there too).

        ONE-SHOT on the device path: the standardize donates the score
        buffer, so the raw `_fit_sample` / `pca.scores_` are gone after
        the first call (a deliberate trade — keeping them doubles peak
        HBM at atlas scale). The host path stays repeatable; a second
        device-path call raises below instead of recomputing."""
        sample = getattr(self, '_fit_sample', None)
        if sample is None:
            raise RuntimeError(
                'transform_fit: the device fit sample was already consumed '
                '(the device path donates the score buffer and is one-shot '
                'by design; call transform(X) to re-project instead)')
        if isinstance(sample, jax.Array):
            out = _standardize_device(sample, float(self.sample_mean),
                                      float(self.sample_std))
            # the donation invalidated the raw-score buffer: drop every
            # reference to it (pca.scores_ aliases the same array)
            self._fit_sample = None
            if self.pca is not None:
                self.pca.scores_ = None
            return out
        out = np.array(sample, np.float32)
        out = out - self.sample_mean
        with warnings.catch_warnings():
            warnings.simplefilter('ignore')
            out = out / self.sample_std
        out[np.isnan(out)] = 0
        return out

    def transform(self, X):
        from .core.hostmat import as_f32_ndarray, densify, is_scipy_sparse
        if is_scipy_sparse(X):
            # PCA.transform streams sparse rows itself; everything else
            # (NLE kNN interpolation, bare standardization) needs dense.
            out = X if isinstance(self.pca, PCA) else densify(X)
        else:
            out = as_f32_ndarray(X)   # keeps memmap identity/.filename
        if self.pca is not None:
            out = self.pca.transform(out)
        out = out - self.sample_mean
        with warnings.catch_warnings():
            warnings.simplefilter('ignore')
            out = out / self.sample_std
        out[np.isnan(out)] = 0
        return out

    def inverse_transform(self, X):
        out = np.asarray(X, np.float32)
        out = out * self.sample_std
        out = out + self.sample_mean
        if self.pca is not None:
            out = self.pca.inverse_transform(out)
        return out

    # --- checkpointable state (no pickled closures) ---
    def to_dict(self) -> dict:
        d = {
            'axis': -1 if self.axis is None else self.axis,
            'sample_mean': self.sample_mean,
            'sample_std': self.sample_std,
        }
        if isinstance(self.pca, NonlinearEmbedding):
            d['nle_fit_data'] = self.pca.fit_data_
            d['nle_embedding'] = self.pca.embedding_
            d['nle_method'] = np.array(self.pca.method)
        elif self.pca is not None:
            d['pca_mean'] = np.asarray(self.pca.mean_)
            d['pca_components'] = np.asarray(self.pca.components_)
        return d

    @classmethod
    def from_dict(cls, d: dict) -> 'Preprocessor':
        self = cls.__new__(cls)
        axis = int(d['axis'])
        self.axis = None if axis == -1 else axis
        self.sample_mean = np.asarray(d['sample_mean'])
        self.sample_std = np.asarray(d['sample_std'])
        if 'nle_embedding' in d:
            emb = np.asarray(d['nle_embedding'])
            nle = NonlinearEmbedding(n_components=emb.shape[1],
                                     method=str(np.asarray(d['nle_method'])))
            nle.fit_data_ = np.asarray(d['nle_fit_data'])
            nle.embedding_ = emb
            self.pca = nle
        elif 'pca_components' in d:
            pca = PCA(n_components=int(np.asarray(d['pca_components']).shape[0]))
            pca.mean_ = np.asarray(d['pca_mean'])
            pca.components_ = np.asarray(d['pca_components'])
            self.pca = pca
        else:
            self.pca = None
        return self


def identity(x):
    """Identity preprocessing (jamie/utilities.py:48-50)."""
    return x
