"""Sample-sample distance matrices.

Reference parity: `JAMIE.compute_distances` (jamie/jamie.py:839-890) — per-
dataset distance matrices used by the correspondence solver. The reference
delegates to sklearn `pairwise_distances` (26 metric names), unioncom's
`geodesic_distances` (kNN-graph shortest path), and scipy spearman/pearson.

TPU-first design: the hot metrics (euclidean/sqeuclidean/cosine/correlation/
spearman/pearson) are expressed as Gram-matrix matmuls that ride the MXU and
are computed in row blocks so N x F never has to fit in VMEM and N x N is the
only large output. Exotic set-membership metrics fall back to sklearn on host
(they're cold paths used by no committed experiment). Geodesic builds the kNN
graph on device and runs shortest-path on host (scipy csgraph) — an O(N^2)
Dijkstra is host-bound by design; the graph construction is the heavy part.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

# Metrics with an MXU-friendly device implementation
_DEVICE_METRICS = ('euclidean', 'l2', 'sqeuclidean', 'cosine', 'correlation',
                   'kulsinski', 'sokalmichener', 'wminkowski')
_HOST_FALLBACK_METRICS = (
    'l1', 'manhattan', 'cityblock', 'braycurtis', 'canberra', 'chebyshev',
    'dice', 'hamming', 'jaccard', 'mahalanobis', 'matching',
    'minkowski', 'rogerstanimoto', 'russellrao', 'seuclidean',
    'sokalsneath', 'yule', 'nan_euclidean', 'haversine',
)


def _block_rows(n: int, target: int = 4096) -> int:
    if n <= target:
        return n
    return target


@partial(jax.jit, static_argnames=('squared', 'zero_diag'))
def _euclidean_block(xb, y, y_sq, squared: bool, zero_diag: bool = False):
    xb_sq = jnp.sum(xb * xb, axis=1)[:, None]
    d2 = xb_sq + y_sq[None, :] - 2.0 * (xb @ y.T)
    d2 = jnp.maximum(d2, 0.0)
    d = d2 if squared else jnp.sqrt(d2)
    if zero_diag:  # fused so the eager 3-op diag mask never dispatches
        d = d * (1.0 - jnp.eye(d.shape[0], dtype=d.dtype))
    return d


@partial(jax.jit, static_argnames=('squared', 'zero_diag'))
def _euclidean_full(x, y, squared: bool, zero_diag: bool):
    return _euclidean_block(x, y, jnp.sum(y * y, axis=1), squared, zero_diag)


def pairwise_sq_euclidean(x: jnp.ndarray, y: Optional[jnp.ndarray] = None,
                          block: int = 4096) -> jnp.ndarray:
    return _pairwise_euclidean_impl(x, y, squared=True, block=block)


@jax.jit
def _gram_accum(acc, xsq_acc, ysq_acc, xb, yb):
    """One streamed Gram step: accumulate cross products (bf16 inputs, f32
    accumulation) and squared row norms, all on device."""
    acc = acc + jnp.matmul(xb.astype(jnp.bfloat16),
                           yb.astype(jnp.bfloat16).T,
                           preferred_element_type=jnp.float32)
    xsq_acc = xsq_acc + jnp.sum(xb * xb, axis=1)
    ysq_acc = ysq_acc + jnp.sum(yb * yb, axis=1)
    return acc, xsq_acc, ysq_acc


def _pairwise_euclidean_feature_chunked(x, y, squared, self_dist,
                                        chunk_bytes=2 << 30):
    """Stream feature chunks host->device and accumulate the Gram matrix.

    For extreme feature counts (e.g. 242k-feature ATAC, SURVEY.md section 6
    scGLUE row) the full matrix never has to reside in HBM; only the chunk
    and the N x N accumulator do. Norm accumulation rides the same transfer.
    Sparse inputs should arrive CSC (the caller converts) so each column
    chunk densifies in O(chunk nnz). Chunks ship through the dtype-aware
    backpressured uploader (core/residency.ChunkUploader): binary/int/
    sparse sources put 2-16x fewer bytes on the tunnel link, and the
    numerics are unchanged — `_gram_accum` already rounded the block to
    bf16 for the MXU product, which is exactly the rounding the uploader's
    continuous link format applies."""
    from ..core.residency import ChunkUploader

    def _col_source(a):
        # Per-argument guard (round-4 advisor): a device-resident operand
        # is sliced directly in HBM — wrapping it in ChunkUploader would
        # FETCH every block back through the ~1-10 MB/s tunnel only to
        # re-upload it. Only host-side inputs stream through the uploader.
        if isinstance(a, jax.Array):
            return lambda s, e: a[:, s:e].astype(jnp.float32)
        return ChunkUploader(a).cols

    n, f = x.shape
    m = y.shape[0]
    chunk = max(int(chunk_bytes / ((n + m) * 4)), 1024)
    acc = jnp.zeros((n, m), jnp.float32)
    x_sq = jnp.zeros((n,), jnp.float32)
    y_sq = jnp.zeros((m,), jnp.float32)
    xcols = _col_source(x)
    ycols = xcols if (self_dist and y is x) else _col_source(y)
    for start in range(0, f, chunk):
        xb = xcols(start, start + chunk)
        yb = xb if (self_dist and y is x) else ycols(start, start + chunk)
        acc, x_sq, y_sq = _gram_accum(acc, x_sq, y_sq, xb, yb)
    d2 = x_sq[:, None] + y_sq[None, :] - 2.0 * acc
    d2 = jnp.maximum(d2, 0.0)
    d = d2 if squared else jnp.sqrt(d2)
    if self_dist:
        d = d * (1.0 - jnp.eye(n, dtype=d.dtype))
    return d


# Above this many elements the matrix goes through the shared bf16
# residency (one 2-byte/element upload reused by distances + PCA) instead
# of per-phase f32 uploads; beyond the residency HBM budget it streams in
# feature chunks. 100M (round 3, was 500M): the mid-size shapes this newly
# covers (scGLUE RNA 266M, DM_rep4 150M) were paying two f32 passes over
# the ~20-55 MB/s tunnel link; the bf16 rounding is quality-neutral on the
# real datasets (examples/bf16_threshold_ab.py: scGEM LTA 0.879+-0.019
# bf16 vs 0.859+-0.024 f32, scMNC-Motor 0.863+-0.004 vs 0.864+-0.007,
# FOSCTTM unchanged, 3 full-config seeds forced through the bf16 path).
_FEATURE_CHUNK_THRESHOLD = 100_000_000

# --------------------------------------------------------------------------
# Wide-modality (scGLUE-class) fast path: resident bf16 build + one Gram
# --------------------------------------------------------------------------
# At 9190 x 241757 the Gram itself is ~0.3 s of MXU (4e13 bf16 FLOPs); the
# phase is entirely host-side I/O: reading the f32 source (memmap-backed in
# the benches), casting to bf16, and pushing 2 bytes/element through the
# ~20-55 MB/s tunnel link. So the fast path is simply residency.
# build_resident_bf16 — row-contiguous sequential reads, torch-vectorized
# cast, async uploads overlapping the next chunk's read — followed by a
# single fused Gram from the resident matrix. (A round-3 interim version
# feature-chunked the Gram to overlap compute with upload; with compute at
# 0.1% of the phase that structure only forced column-strided source reads,
# measured 79 MB/s vs GB/s sequential.)


@partial(jax.jit, static_argnames=('squared', 'self_dist'))
def _euclidean_resident_bf16(x_bf16, squared: bool, self_dist: bool):
    """Distances straight from a device-resident bf16 matrix: one MXU Gram
    with f32 accumulation, norms via an f32-accumulated einsum (no f32 copy
    of the matrix ever materializes). Input rounding matches what the
    streamed path's bf16 Gram already applies to the products."""
    sq = jnp.einsum('nf,nf->n', x_bf16, x_bf16,
                    preferred_element_type=jnp.float32)
    g = jnp.matmul(x_bf16, x_bf16.T, preferred_element_type=jnp.float32)
    d2 = jnp.maximum(sq[:, None] + sq[None, :] - 2.0 * g, 0.0)
    d = d2 if squared else jnp.sqrt(d2)
    if self_dist:
        d = d * (1.0 - jnp.eye(d.shape[0], dtype=d.dtype))
    return d


def _rows_sharding(mesh):
    from jax.sharding import NamedSharding, PartitionSpec as P
    return NamedSharding(mesh, P('data', None))


def _pad_rows_for(mesh, x):
    """Zero-pad the leading dim to a multiple of the 'data' axis size so
    the row-sharded builds actually split memory (core.mesh.pad_rows_to_axis
    has the GSPMD rationale)."""
    from ..core.mesh import axis_size, pad_rows_to_axis
    return pad_rows_to_axis(x, axis_size(mesh, 'data'))


@partial(jax.jit, static_argnames=('squared', 'rows'))
def _euclidean_sharded(x, y, squared: bool, rows):
    """Row-sharded Gram distance: each chip holds its rows of x and the whole
    y, producing its row block of the (padded) N x M output. The caller pads
    x's rows to the axis size (see _pad_rows_for) and slices the pad back
    off."""
    x = jax.lax.with_sharding_constraint(x, rows)
    y_sq = jnp.sum(y * y, axis=1)
    xb_sq = jnp.sum(x * x, axis=1)[:, None]
    d2 = xb_sq + y_sq[None, :] - 2.0 * (x @ y.T)
    d2 = jax.lax.with_sharding_constraint(jnp.maximum(d2, 0.0), rows)
    return d2 if squared else jnp.sqrt(d2)


def _pairwise_euclidean_impl(x, y=None, squared=False, block=4096, mesh=None):
    from ..core.hostmat import densify, ensure_col_major, is_scipy_sparse

    self_dist = y is None
    # Inputs already ON DEVICE never take the host-streaming paths: the
    # feature-chunked builder would FETCH each column block back through
    # the tunnel only to re-upload it (caught live at the 100k atlas —
    # its cell->landmark blocks are device-decoded CSR, 655 MB each, and
    # the fetch ran at the pool's ~1-10 MB/s). They are in HBM; compute
    # directly.
    device_in = isinstance(x, jax.Array) and (y is None
                                              or isinstance(y, jax.Array))
    if (not device_in and np.ndim(x) == 2
            and x.shape[0] * x.shape[1] > _FEATURE_CHUNK_THRESHOLD):
        if self_dist:
            from ..core.residency import device_bf16
            # One bf16 upload shared with the PCA phase (cached), then one
            # fused Gram straight from HBM. Sparse x streams through the
            # same row-chunked build (densified per chunk). Pass ndarrays
            # (incl. memmaps) through AS-IS: np.asarray on a memmap returns
            # a fresh base-class view, which drops .filename (disabling the
            # on-disk encode cache) and changes id() per call (defeating
            # the cross-phase residency cache) — caught in round 4 when the
            # warm bench still paid the full 60 s host encode.
            xdev = device_bf16(
                x if isinstance(x, np.ndarray) or is_scipy_sparse(x)
                else np.asarray(x))
            if xdev is not None:
                return _euclidean_resident_bf16(xdev, squared, True)
        xs = x if isinstance(x, jax.Array) else ensure_col_major(x)
        ys = (xs if y is None
              else y if isinstance(y, jax.Array) else ensure_col_major(y))
        return _pairwise_euclidean_feature_chunked(
            xs, ys, squared, self_dist)
    if is_scipy_sparse(x):
        x = densify(x)          # sub-threshold: <=400 MB dense f32
    y = x if y is None else y
    if is_scipy_sparse(y):
        y = densify(y)
    x = jnp.asarray(x, jnp.float32)
    y = jnp.asarray(y, jnp.float32)
    if mesh is not None:
        xp, pad = _pad_rows_for(mesh, x)
        d = _euclidean_sharded(xp, y, squared, _rows_sharding(mesh))
        if pad:
            d = d[:x.shape[0]]
        if self_dist:
            d = d * (1.0 - jnp.eye(x.shape[0], dtype=d.dtype))
        return d
    n = x.shape[0]
    bs = _block_rows(n, block)
    if bs == n:
        # Single fused dispatch (norms + Gram + epilogue + diag zeroing:
        # the Gram trick leaves O(eps * ||x||^2) residue on the diagonal)
        return _euclidean_full(x, y, squared, self_dist)
    y_sq = jnp.sum(y * y, axis=1)
    out = []
    for start in range(0, n, bs):
        xb = x[start:start + bs]
        out.append(_euclidean_block(xb, y, y_sq, squared))
    d = jnp.concatenate(out, axis=0)
    if self_dist:
        d = d * (1.0 - jnp.eye(n, dtype=d.dtype))
    return d


@jax.jit
def _cosine_dist(x, y=None):
    y = x if y is None else y
    xn = x / jnp.maximum(jnp.linalg.norm(x, axis=1, keepdims=True), 1e-12)
    yn = y / jnp.maximum(jnp.linalg.norm(y, axis=1, keepdims=True), 1e-12)
    return jnp.clip(1.0 - xn @ yn.T, 0.0, 2.0)


@jax.jit
def _correlation_dist(x, y=None):
    y = x if y is None else y
    xc = x - jnp.mean(x, axis=1, keepdims=True)
    yc = y - jnp.mean(y, axis=1, keepdims=True)
    xn = xc / jnp.maximum(jnp.linalg.norm(xc, axis=1, keepdims=True), 1e-12)
    yn = yc / jnp.maximum(jnp.linalg.norm(yc, axis=1, keepdims=True), 1e-12)
    return jnp.clip(1.0 - xn @ yn.T, 0.0, 2.0)


@partial(jax.jit, static_argnames=('center', 'rows', 'n_real'))
def _angular_sharded(x, center: bool, rows, n_real: int):
    """cosine/correlation distance with row-sharded output (GSPMD). The
    input arrives pre-padded to the mesh (see _pad_rows_for); the pad rows
    are sliced off after the sharded product."""
    if center:
        x = x - jnp.mean(x, axis=1, keepdims=True)
    xn = x / jnp.maximum(jnp.linalg.norm(x, axis=1, keepdims=True), 1e-12)
    xs = jax.lax.with_sharding_constraint(xn, rows)
    d = jnp.clip(1.0 - xs @ xn.T, 0.0, 2.0)
    d = jax.lax.with_sharding_constraint(d, rows)
    return d[:n_real, :n_real]


@jax.jit
def _corrcoef_similarity(x):
    """Row-row Pearson correlation matrix (np.corrcoef semantics)."""
    xc = x - jnp.mean(x, axis=1, keepdims=True)
    norm = jnp.maximum(jnp.linalg.norm(xc, axis=1, keepdims=True), 1e-12)
    xn = xc / norm
    return xn @ xn.T


@jax.jit
def _rank_rows(x: jnp.ndarray) -> jnp.ndarray:
    """Average ranks per row (scipy.stats.rankdata method='average').

    Exact tie-averaging via sort + searchsorted: each tie group's average
    rank is (left_edge + right_edge + 1) / 2 of its span in the sorted row.
    O(F log F) time and O(F) memory per row — no F x F equality matrix, so
    reference shapes (e.g. scMNC-Visual 3654 x 1302) rank in one shot."""
    def rank1(row):
        order = jnp.argsort(row)
        s = row[order]
        lo = jnp.searchsorted(s, s, side='left')
        hi = jnp.searchsorted(s, s, side='right')
        avg = (lo + hi + 1).astype(jnp.float32) / 2.0
        return jnp.zeros_like(avg).at[order].set(avg)
    return jax.vmap(rank1)(x)


# --------------------------------------------------------------------------
# Boolean set-membership metrics dropped by modern sklearn/scipy.
# The reference advertises the pinned-old-sklearn metric list
# (jamie/jamie.py:117-127) including kulsinski / sokalmichener /
# wminkowski, all removed upstream (kulsinski: scipy 1.11; wminkowski:
# scipy 1.8; sokalmichener: scipy 1.17; sklearn 1.9 rejects all three).
# Implemented natively with the removed versions' formulas — the boolean
# pair counts come from ONE bool Gram matmul (c_TT = B B^T, c_TF/c_FT from
# row sums), which rides the MXU instead of scipy's per-pair loops.
# --------------------------------------------------------------------------


@jax.jit
def _kulsinski_dist(x):
    """scipy<=1.10 kulsinski: (c_TF + c_FT - c_TT + n) / (c_FT + c_TF + n),
    booleans taken as (x != 0)."""
    b = (x != 0).astype(jnp.float32)
    n = jnp.float32(x.shape[1])
    s = jnp.sum(b, axis=1)
    ctt = b @ b.T
    r = s[:, None] + s[None, :] - 2.0 * ctt        # c_TF + c_FT
    return (r - ctt + n) / (r + n)


@jax.jit
def _sokalmichener_dist(x):
    """scipy<=1.16 sokalmichener: 2R / (S + 2R) with R = c_TF + c_FT and
    S = c_FF + c_TT, booleans taken as (x != 0)."""
    b = (x != 0).astype(jnp.float32)
    n = jnp.float32(x.shape[1])
    s = jnp.sum(b, axis=1)
    ctt = b @ b.T
    r = s[:, None] + s[None, :] - 2.0 * ctt
    s_agree = n - r                                 # c_FF + c_TT
    return jnp.where(r > 0, 2.0 * r / (s_agree + 2.0 * r), 0.0)


@partial(jax.jit, static_argnames=('p',))
def _wminkowski_block(xb, y, w, p: float):
    d = jnp.sum(jnp.abs((xb[:, None, :] - y[None, :, :]) * w) ** p, axis=-1)
    return d ** (1.0 / p)


def _wminkowski_dist(x, p: float = 2.0, w=None, block: int = 256):
    """scipy<1.8 wminkowski: (sum_i |w_i (u_i - v_i)|^p)^(1/p). w defaults
    to ones (plain minkowski; old callers had to pass w explicitly — the
    reference never does, it only advertises the name). Row-blocked so the
    (B, N, F) broadcast intermediate stays bounded."""
    xj = jnp.asarray(x, jnp.float32)
    n = xj.shape[0]
    wj = (jnp.ones((xj.shape[1],), jnp.float32) if w is None
          else jnp.asarray(w, jnp.float32))
    parts = [_wminkowski_block(xj[s:s + block], xj, wj, p)
             for s in range(0, n, block)]
    return jnp.concatenate(parts, axis=0) if len(parts) > 1 else parts[0]


def pairwise_distance(x, metric: str = 'euclidean', block: int = 4096,
                      mesh=None):
    """N x N distance matrix for one dataset (device for hot metrics).

    mesh: optional jax.sharding.Mesh with a 'data' axis; rows of x (and the
    output) shard over it so the O(N^2) build splits across chips."""
    if metric in ('euclidean', 'l2'):
        return _pairwise_euclidean_impl(x, squared=False, block=block,
                                        mesh=mesh)
    if metric == 'sqeuclidean':
        return _pairwise_euclidean_impl(x, squared=True, block=block,
                                        mesh=mesh)
    from ..core.hostmat import densify, is_scipy_sparse
    if is_scipy_sparse(x):
        # Only the euclidean family streams sparse blocks; the angular /
        # host-fallback metrics are used at widths where dense is fine.
        x = densify(x)
    if metric in ('cosine', 'correlation'):
        xj = jnp.asarray(x, jnp.float32)
        if mesh is not None:
            xp, _ = _pad_rows_for(mesh, xj)
            return _angular_sharded(xp, metric == 'correlation',
                                    _rows_sharding(mesh), xj.shape[0])
        return (_cosine_dist if metric == 'cosine' else _correlation_dist)(xj)
    if metric == 'kulsinski':
        return _kulsinski_dist(jnp.asarray(x, jnp.float32))
    if metric == 'sokalmichener':
        return _sokalmichener_dist(jnp.asarray(x, jnp.float32))
    if metric == 'wminkowski':
        return _wminkowski_dist(x)
    if metric in _HOST_FALLBACK_METRICS:
        from sklearn.metrics.pairwise import pairwise_distances
        try:
            return jnp.asarray(
                pairwise_distances(np.asarray(x), metric=metric),
                jnp.float32)
        except (ValueError, TypeError) as e:
            raise ValueError(
                f'metric {metric!r} is advertised for parity with the '
                f'reference (jamie/jamie.py:117-127) but the installed '
                f'sklearn/scipy no longer implements it: {e}') from e
    raise ValueError(f'Unknown metric {metric!r}')


def _knn_graph(dist: np.ndarray, k: int) -> 'np.ndarray':
    """Symmetric kNN distance graph from a dense distance matrix."""
    n = dist.shape[0]
    idx = np.argpartition(dist, min(k + 1, n - 1), axis=1)[:, :k + 1]
    graph = np.zeros_like(dist)
    rows = np.repeat(np.arange(n), idx.shape[1])
    cols = idx.ravel()
    graph[rows, cols] = dist[rows, cols]
    np.fill_diagonal(graph, 0)
    graph = np.maximum(graph, graph.T)
    return graph


def geodesic_distances(data: np.ndarray, kmax: int = 40,
                       kmin: int = 5, kstep: int = 5, mesh=None) -> np.ndarray:
    """Geodesic (kNN-graph shortest-path) distances.

    Mirrors unioncom.utils.geodesic_distances semantics (imported at
    jamie/jamie.py:19-23, used at :851-857): grow k from kmin by kstep until
    the kNN graph is connected (capped at kmax); then all-pairs shortest
    path. The dense pairwise Euclidean base matrix is computed on device;
    graph connectivity + Dijkstra run on host scipy.
    """
    from scipy.sparse import csr_matrix
    from scipy.sparse.csgraph import connected_components, shortest_path

    dist = np.asarray(pairwise_distance(data, 'euclidean', mesh=mesh))
    n = dist.shape[0]
    if n == 1:
        return np.zeros((1, 1), np.float32)
    graph = None
    for k in range(kmin, max(kmax, kmin) + 1, kstep):
        graph = _knn_graph(dist, min(k, n - 1))
        n_comp, _ = connected_components(csr_matrix(graph), directed=False)
        if n_comp == 1:
            break
    else:
        # Still disconnected at kmax: bridge components at their closest pair
        from ..nn_funcs import connect_graph
        graph = connect_graph(graph, dist)
    sp = shortest_path(csr_matrix(graph), method='D', directed=False)
    # Unreachable pairs (shouldn't happen post-connect) -> max finite distance
    finite_max = np.nanmax(np.where(np.isinf(sp), np.nan, sp))
    sp = np.where(np.isinf(sp), finite_max, sp)
    return sp.astype(np.float32)


def dataset_distance_matrix(data, distance_mode: str = 'euclidean',
                            kmax: int = 40, mesh=None) -> np.ndarray:
    """Distance matrix dispatch, matching compute_distances' modes
    (jamie/jamie.py:851-885). scipy-sparse data passes through to the
    sparse-aware euclidean streaming paths; the rank/correlation modes
    densify (they need the full dense matrix on device anyway)."""
    from ..core.hostmat import as_f32_ndarray, densify, is_scipy_sparse
    if is_scipy_sparse(data):
        if distance_mode in ('spearman', 'pearson'):
            data = densify(data)
    else:
        # identity/subclass-preserving: np.asarray here stripped memmap
        # .filename and destabilized id() (see hostmat.as_f32_ndarray)
        data = as_f32_ndarray(data)
    if distance_mode == 'geodesic':
        return geodesic_distances(data, kmax=kmax, mesh=mesh)
    if distance_mode == 'spearman':
        if data.shape[0] == 1:
            return np.zeros((1, 1), np.float32)
        ranks = _rank_rows(jnp.asarray(data, jnp.float32))
        sim = _corrcoef_similarity(ranks)
        sim_np = np.asarray(sim)
        if np.isnan(sim_np).any():
            raise ValueError(
                'Data is not well conditioned for spearman method '
                '(rank correlation returned nan)')
        return ((1.0 - sim_np) / 2.0).astype(np.float32)
    if distance_mode == 'pearson':
        if data.shape[0] == 1:
            return np.zeros((1, 1), np.float32)
        sim = np.asarray(_corrcoef_similarity(jnp.asarray(data, jnp.float32)))
        return ((1.0 - sim) / 2.0).astype(np.float32)
    # Device metrics return the device array: the solver consumes it next,
    # and a host round-trip costs 2x the matrix over the transfer link
    return pairwise_distance(data, metric=distance_mode, mesh=mesh)
