"""Landmark (Nystrom-style) correspondence: prime-dual F past one chip's N².

The reference's hot loop (jamie/jamie.py:314-414) holds five dense (N0, N1)
f32 arrays — ~200 GB at 100k cells — so unsupervised correspondence simply
cannot run at atlas scale, dense OR row-sharded. This solver bounds the
whole estimation at O(N L + L²):

1. pick L landmark cells per modality (farthest-point cover by default —
   measurably better true-match recovery than uniform; L defaults to 2048),
2. run the exact prime-dual solver on the (L, L) landmark distance
   matrices — same iteration count, same semantics, tiny state,
3. extend to all cells with row-stochastic kNN-Gaussian interpolation
   weights A (each cell is a convex mixture of its k nearest landmarks,
   bandwidth = its own mean kNN distance),
4. return F = (A_x F_L) A_y^T as a LowRankF factorization — never
   materialized; the trainer gathers batch subsets as two small matmuls.

Quality: the correspondence mass a cell receives is a smooth function of
its position relative to the landmark set, which is exactly the regime
where Nystrom extension is sound; the A/B harness
(examples/landmark_ab.py) measures the FOSCTTM/LTA cost vs the dense
solver at small N where both run.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.distances import pairwise_sq_euclidean
from ..ops.lowrank import LowRankF
from .prime_dual import prime_dual


@partial(jax.jit, static_argnames=('k',))
def _interp_weights_sparse(d2, k: int):
    """Row-stochastic kNN-Gaussian weights from squared cell->landmark
    distances, in k-sparse form: each row's k nearest landmark indices and
    their weights exp(-d2 / mean_knn_d2) (per-row bandwidth), normalized
    to sum 1."""
    neg, idx = jax.lax.top_k(-d2, k)
    knn_d2 = -neg                                    # (n, k), ascending
    bw = jnp.maximum(jnp.mean(knn_d2, axis=1, keepdims=True), 1e-12)
    w = jnp.exp(-knn_d2 / bw)
    return idx, w / jnp.sum(w, axis=1, keepdims=True)


@partial(jax.jit, static_argnames=('k', 'n_landmarks'))
def _interp_weights(d2, k: int, n_landmarks: int):
    """Dense (n, L) layout of _interp_weights_sparse."""
    idx, w = _interp_weights_sparse(d2, k)
    a = jnp.zeros((d2.shape[0], n_landmarks), jnp.float32)
    rows = jnp.arange(d2.shape[0])[:, None]
    return a.at[rows, idx].set(w)


@partial(jax.jit, static_argnames=('n_landmarks',))
def _fps_indices_device(x, first, n_landmarks: int):
    """Farthest-point sampling (greedy 2-approx k-center cover): repeatedly
    add the cell farthest from the chosen set. Each pick is one matvec over
    the dataset, so L picks cost L passes over x's HBM — trivial on device.
    Better geometric coverage than uniform sampling: the measured
    true-match rank through the full landmark pipeline improves ~1.35x at
    L/N=0.2: 35.6 vs 48.0 mean rank of 1200 (examples/landmark_ab.py
    --selection-ab)."""
    sq = jnp.sum(x * x, axis=1)

    def body(i, carry):
        idx, d = carry
        nxt = jnp.argmax(d).astype(jnp.int32)
        idx = idx.at[i].set(nxt)
        d_new = jnp.maximum(sq + sq[nxt] - 2.0 * (x @ x[nxt]), 0.0)
        return idx, jnp.minimum(d, d_new)

    d0 = jnp.maximum(sq + sq[first] - 2.0 * (x @ x[first]), 0.0)
    idx0 = jnp.zeros((n_landmarks,), jnp.int32).at[0].set(first)
    idx, _ = jax.lax.fori_loop(1, n_landmarks, body, (idx0, d0))
    return idx


# FPS keeps the whole matrix device-resident in f32; past this it runs on
# a JL sketch instead (geometry preserved to O(eps) at 256 dims)
_FPS_BYTES_BUDGET = 2 << 30


def _project_for_fps(arr, rng, dim: int = 256, chunk_rows: int = 8192):
    """Device-chunked random Gaussian projection for FPS on modalities too
    wide to sit on device in f32 (e.g. a raw 240k-feature atlas matrix):
    pairwise distances survive a JL sketch, which is all FPS consumes.
    Host sources ship through the dtype-aware uploader (binary atlas
    matrices go over the link bit-packed, 16x under the old f32)."""
    from ..core.residency import ChunkUploader

    n, d = arr.shape
    proj = jnp.asarray(
        rng.randn(d, dim).astype(np.float32) / np.sqrt(dim))
    up = None if isinstance(arr, jax.Array) else ChunkUploader(arr)
    if up is not None and up.dcsr is not None:
        # resident CSR: X @ proj directly (SpMM), no dense block decode
        return up.dcsr.matmul(proj)
    out = []
    for s in range(0, n, chunk_rows):
        xb = (arr[s:s + chunk_rows] if up is None
              else up.rows(s, s + chunk_rows))
        out.append(xb @ proj)
    return jnp.concatenate(out, axis=0) if len(out) > 1 else out[0]


def _select_landmarks(x, n_landmarks: int, method: str, rng) -> np.ndarray:
    n = int(x.shape[0])
    if method == 'uniform':
        return np.sort(rng.choice(n, n_landmarks, replace=False))
    if method == 'fps':
        from ..core.hostmat import densify, is_scipy_sparse
        first = int(rng.randint(n))
        if x.shape[0] * x.shape[1] * 4 > _FPS_BYTES_BUDGET:
            # the JL projection densifies sparse row blocks on the way in
            xd = _project_for_fps(x, rng)
        else:
            xd = jnp.asarray(densify(x) if is_scipy_sparse(x)
                             else np.asarray(x), jnp.float32)
        return np.sort(np.asarray(
            _fps_indices_device(xd, first, int(n_landmarks))))
    raise ValueError(f'unknown landmark selection method {method!r}')


def _cell_to_landmark_weights(x, landmarks, k: int, block: int = 8192,
                              sparse: bool = False):
    """A (n, L) built in row blocks so the (n, L) distance intermediate
    stays bounded; x and landmarks may be host or device arrays. Host
    sources past the package-wide 100M-element bf16 threshold ship
    through the dtype-aware uploader; smaller ones ship exact f32.
    sparse=True returns the k-sparse layout (idx (n, k) i32, w (n, k) f32)
    instead of the dense (n, L) matrix — same weights, O(n k) memory."""
    from ..core.residency import ChunkUploader, device_csr

    lm = jnp.asarray(np.asarray(landmarks), jnp.float32)
    n = x.shape[0]
    L = lm.shape[0]
    from ..core.hostmat import dense_rows
    big = int(n) * int(x.shape[1]) >= 100_000_000
    # CSR sources of ANY size go device-resident (if the HBM budget
    # allows) and take the SpMM Gram — one upload, no dense block decode;
    # the bf16 value rounding is the same link policy every other sparse
    # path applies. Non-CSR hosts past the threshold stream as before.
    dcsr = device_csr(x) if not isinstance(x, jax.Array) else None
    up = (ChunkUploader(x)
          if big and dcsr is None and not isinstance(x, jax.Array)
          else None)
    import time as _time
    verbose = n >= 50_000   # atlas scale: show block progress like the
    t0 = _time.perf_counter()  # prime-dual epoch log does
    lm_sq = jnp.sum(lm * lm, axis=1) if dcsr is not None else None
    parts = []
    for s in range(0, n, block):
        if dcsr is not None:
            # resident CSR: the cell->landmark Gram directly via SpMM —
            # the dense block decode was the serialized-scatter wall
            e = min(s + block, n)
            xlm = dcsr.matmul(lm.T, s, e)            # (r, L)
            x_sq = dcsr.row_sq_sums()[s:e]
            d2 = jnp.maximum(x_sq[:, None] + lm_sq[None, :] - 2.0 * xlm,
                             0.0)
        elif up is not None:
            xb = up.rows(s, s + block)
            d2 = pairwise_sq_euclidean(xb, lm)
        elif isinstance(x, jax.Array):
            xb = x[s:s + block].astype(jnp.float32)
            d2 = pairwise_sq_euclidean(xb, lm)
        else:
            xb = jnp.asarray(dense_rows(x, s, s + block))
            d2 = pairwise_sq_euclidean(xb, lm)
        parts.append(_interp_weights_sparse(d2, min(k, L)) if sparse
                     else _interp_weights(d2, min(k, L), L))
        if verbose:
            print(f'landmark weights: rows [{min(s + block, n)}/{n}] '
                  f'{_time.perf_counter() - t0:.1f}s', flush=True)
    if sparse:
        if len(parts) == 1:
            return parts[0]
        return (jnp.concatenate([p[0] for p in parts], axis=0),
                jnp.concatenate([p[1] for p in parts], axis=0))
    return jnp.concatenate(parts, axis=0) if len(parts) > 1 else parts[0]


# Past this many dense-factor entries per side (N x L), the correspondence
# returns the k-sparse factor layout instead: three (N, 2048) f32 factors
# are ~2.5 GB of HBM at N=200k and 12 GB at 500k, while the sparse layout
# is O(N k). Under it, dense stays the default (fewer moving parts in the
# jitted batch gather).
_SPARSE_FACTOR_ENTRIES = 400_000_000


def landmark_correspondence(
    X, Y,
    n_landmarks: int = 2048,
    k_interp: int = 8,
    distance_mode: str = 'euclidean',
    seed: int = 666,
    mesh=None,
    kmax: int = 40,
    selection: str = 'fps',
    factor_layout: str = 'auto',
    **prime_dual_kwargs,
) -> LowRankF:
    """Low-rank unsupervised correspondence between datasets X (N0, f0) and
    Y (N1, f1). See module docstring; `prime_dual_kwargs` forward to the
    exact solver (epoch_pd, rho, epsilon, delay, log_pd, verbose, ...).
    selection: 'fps' (farthest-point cover, default) or 'uniform'.
    factor_layout: 'dense' -> LowRankF (U = A_x F_L materialized, N x L),
    'sparse' -> SparseLandmarkF (k-sparse A factors, O(N k) memory),
    'auto' -> sparse once max(N) x L crosses _SPARSE_FACTOR_ENTRIES."""
    from ..ops.distances import dataset_distance_matrix
    from ..ops.lowrank import SparseLandmarkF

    n0, n1 = int(X.shape[0]), int(Y.shape[0])
    L0, L1 = min(int(n_landmarks), n0), min(int(n_landmarks), n1)
    from ..core.hostmat import is_scipy_sparse

    rng = np.random.RandomState(seed)
    lx = _select_landmarks(X, L0, selection, rng)
    ly = _select_landmarks(Y, L1, selection, rng)
    # CSR fancy row indexing gathers just the landmark rows — the full
    # matrix never densifies
    Xl = X[lx].toarray() if is_scipy_sparse(X) else np.asarray(X)[lx]
    Yl = Y[ly].toarray() if is_scipy_sparse(Y) else np.asarray(Y)[ly]

    # Exact solver on the landmark subproblem. Graph-based modes (geodesic)
    # are computed on the landmark subset's own graph — at L=2048 that is a
    # denser sampling than most full datasets the reference ever ran.
    Kx = dataset_distance_matrix(Xl, distance_mode, kmax=kmax)
    Ky = dataset_distance_matrix(Yl, distance_mode, kmax=kmax)
    F_L = prime_dual(Kx, Ky, dx=int(X.shape[1]), dy=int(Y.shape[1]),
                     mesh=mesh, **prime_dual_kwargs)

    if factor_layout == 'auto':
        factor_layout = ('sparse' if max(n0, n1) * max(L0, L1)
                         > _SPARSE_FACTOR_ENTRIES else 'dense')
    if factor_layout == 'sparse':
        ix, wx = _cell_to_landmark_weights(X, Xl, k_interp, sparse=True)
        iy, wy = _cell_to_landmark_weights(Y, Yl, k_interp, sparse=True)
        return SparseLandmarkF(ix, wx, iy, wy, F_L)
    if factor_layout != 'dense':
        raise ValueError(f'unknown factor_layout {factor_layout!r}')
    A_x = _cell_to_landmark_weights(X, Xl, k_interp)
    A_y = _cell_to_landmark_weights(Y, Yl, k_interp)
    # U carries the solved landmark correspondences mixed by each row
    # cell's weights; V is the column side's affinity. (A_x F_L) is one
    # (N0, L0) x (L0, L1) MXU matmul.
    U = A_x @ F_L
    return LowRankF(U, A_y)
