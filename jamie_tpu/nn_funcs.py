"""Graph/kNN utilities and legacy manifold-alignment losses.

Reference parity: jamie/nn_funcs.py —
- `knn_dist` (nn_funcs.py:7-33): connected kNN affinity with Gaussian kernel
- `knn_sim` (nn_funcs.py:36-60): bipartite kNN on a correspondence matrix
- `connect_graph` (nn_funcs.py:63-84): bridge disconnected components at
  their closest cross pair
- legacy losses `uc_loss` (:87-101), `nlma_loss` incl. Laplacian-trace fast
  path (:104-149), naive Gromov-Wasserstein `gw_loss` (:152-166). Retained
  API from earlier reference versions; not called by the training path.

Device/host split: dense distance bases and the losses run on device (jnp);
connected-components stays on host scipy (tiny, sequential).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np
from scipy.sparse.csgraph import connected_components

from .ops.distances import pairwise_sq_euclidean


def connect_graph(mat: np.ndarray, value_mat: np.ndarray = None) -> np.ndarray:
    """Connect disparate connected components in `mat` (nn_funcs.py:63-84)."""
    if value_mat is None:
        value_mat = mat
    mat = np.asarray(mat).copy()
    n_components, labels = connected_components(mat, directed=False)
    for i in range(n_components - 1):
        g1_idx = np.arange(mat.shape[0])[np.array(labels) == i]
        g2_idx = np.arange(mat.shape[0])[np.array(labels) == i + 1]
        sub_dist = np.asarray(value_mat)[g1_idx][:, g2_idx]
        min_dist = np.unravel_index(np.argmin(sub_dist, axis=None),
                                    sub_dist.shape)
        g1_new = g1_idx[min_dist[0]]
        g2_new = g2_idx[min_dist[1]]
        mat[g1_new, g2_new] = sub_dist[min_dist]
        mat[g2_new, g1_new] = sub_dist[min_dist]
    return mat


def knn_dist(data: np.ndarray, k: int = 5) -> np.ndarray:
    """Connected kNN affinity, Gaussian-kernelized (nn_funcs.py:7-33)."""
    dist = np.asarray(pairwise_sq_euclidean(np.asarray(data, np.float32)))
    adj = np.zeros(dist.shape, np.float32)
    idxs = np.argsort(dist)[:, :k + 1]
    for idx in idxs:
        adj[idx[0], idx[1:]] = dist[idx[0], idx[1:]]
        adj[idx[1:], idx[0]] = dist[idx[1:], idx[0]]
    adj = connect_graph(adj, dist)
    adj[adj > 0] = np.exp(-adj[adj > 0])
    return adj


def knn_sim(data: np.ndarray, k: int = 5) -> np.ndarray:
    """Bipartite kNN on an F/correspondence matrix (nn_funcs.py:36-60)."""
    data = np.asarray(data)
    sim = np.block([
        [np.zeros(2 * (data.shape[0],)), data],
        [np.transpose(data), np.zeros(2 * (data.shape[1],))],
    ])
    adj = np.zeros(sim.shape)
    idxs = np.argsort(-sim, axis=1)[:, :k]
    for i, idx in enumerate(idxs):
        adj[i, idx] = -sim[i, idx]
        adj[idx, i] = -sim[idx, i]
    adj = connect_graph(adj, -sim)
    return -adj[:data.shape[0]][:, data.shape[0]:]


def uc_loss(primes, F):
    """UnionCom alignment term ||P0 - F P1||^2 (nn_funcs.py:87-101)."""
    norm = primes[0] - F @ primes[1]
    return jnp.sum(jnp.square(norm))


def nlma_loss(primes, Wx, Wy, Wxy, mu):
    """NLMA loss via the Laplacian trace fast path (nn_funcs.py:133-149)."""
    num_cells = Wxy.shape[0]
    Dx = jnp.sum(Wx, axis=0)
    Dy = jnp.sum(Wy, axis=0)
    D = jnp.diag(jnp.concatenate((Dx, Dy), axis=0))
    W = jnp.block([
        [Wx, Wxy],
        [Wxy.T, Wy],
    ])
    # The reference builds block_diag(Wx, Wy) then adds Wxy off-diagonals —
    # identical to the dense block assembly above.
    del num_cells
    L = D - W
    P = jnp.concatenate(primes, axis=0)
    return jnp.trace(P.T @ L @ P)


def gw_loss(primes):
    """Naive Gromov-Wasserstein distance (nn_funcs.py:152-166), vectorized:
    sum over pairs of (||xi - xj|| - ||yi - yj||)^2."""
    assert all(len(primes[0]) == len(p) for p in primes), (
        'Datasets must be aligned')
    d0 = jnp.sqrt(jnp.maximum(pairwise_sq_euclidean(primes[0]), 0))
    d1 = jnp.sqrt(jnp.maximum(pairwise_sq_euclidean(primes[1]), 0))
    return jnp.sum(jnp.square(d0 - d1))
