"""Graph/kNN utilities and legacy manifold-alignment losses.

Reference parity (behavior, not structure): jamie/nn_funcs.py —
`knn_dist` (:7-33) connected kNN affinity with Gaussian kernel, `knn_sim`
(:36-60) bipartite kNN on a correspondence matrix, `connect_graph` (:63-84)
component bridging, and the legacy losses `uc_loss` (:87-101), `nlma_loss`
(:104-149), `gw_loss` (:152-166) retained as API from earlier reference
versions (not called by the training path).

Device/host split: dense distance bases and the losses run on device (jnp);
the adjacency scatter is a vectorized numpy fancy-assign (tiny, host);
connected-components stays on host scipy (sequential by nature).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np
from scipy.sparse.csgraph import connected_components

from .ops.distances import pairwise_sq_euclidean


def connect_graph(adj: np.ndarray, weights: np.ndarray = None) -> np.ndarray:
    """Bridge disconnected components of `adj` into one.

    Components are chained in label order: each consecutive pair (c, c+1)
    gains one symmetric edge at the cheapest cross entry of `weights`
    (defaults to `adj` itself). Returns a copy; see reference
    jamie/nn_funcs.py:63-84 for the matching semantics.
    """
    adj = np.array(adj)
    weights = adj if weights is None else np.asarray(weights)
    n_comp, labels = connected_components(adj, directed=False)
    groups = [np.flatnonzero(labels == c) for c in range(n_comp)]
    for a, b in zip(groups[:-1], groups[1:]):
        block = weights[np.ix_(a, b)]
        flat = int(np.argmin(block))
        i, j = a[flat // len(b)], b[flat % len(b)]
        adj[i, j] = adj[j, i] = block.flat[flat]
    return adj


def _symmetric_knn_adjacency(scores: np.ndarray,
                             neighbors: np.ndarray) -> np.ndarray:
    """Scatter per-row neighbor scores into a symmetrized dense adjacency.

    `neighbors` is (n, k) column indices per row; both (i -> j) and
    (j -> i) slots are written so the graph is undirected.
    """
    n, k = neighbors.shape
    rows = np.repeat(np.arange(n), k)
    cols = neighbors.ravel()
    adj = np.zeros_like(scores)
    adj[rows, cols] = scores[rows, cols]
    adj[cols, rows] = scores[cols, rows]
    return adj


def knn_dist(data: np.ndarray, k: int = 5) -> np.ndarray:
    """Connected kNN affinity with a Gaussian kernel (ref nn_funcs.py:7-33).

    Squared-euclidean base distances run on device (MXU Gram path); each
    sample links to its k nearest others (self-distance 0 sorts first and
    is skipped), components are bridged, and surviving edges map through
    exp(-d).
    """
    d2 = np.asarray(pairwise_sq_euclidean(np.asarray(data, np.float32)))
    nearest = np.argsort(d2, axis=1, kind='stable')[:, 1:k + 1]
    graph = _symmetric_knn_adjacency(d2, nearest)
    graph = connect_graph(graph, d2)
    edges = graph > 0
    graph[edges] = np.exp(-graph[edges])
    return graph


def knn_sim(corr: np.ndarray, k: int = 5) -> np.ndarray:
    """Bipartite kNN over a correspondence matrix (ref nn_funcs.py:36-60).

    The (n0, n1) similarity matrix becomes a (n0+n1)² bipartite graph in
    negated-similarity ("cost") form; each node keeps its k most-similar
    cross-side partners, components are bridged, and the top-right block
    returns to similarity sign.
    """
    corr = np.asarray(corr)
    n0, n1 = corr.shape
    cost = np.zeros((n0 + n1, n0 + n1), corr.dtype)
    cost[:n0, n0:] = -corr
    cost[n0:, :n0] = -corr.T
    strongest = np.argsort(cost, axis=1, kind='stable')[:, :k]
    graph = _symmetric_knn_adjacency(cost, strongest)
    graph = connect_graph(graph, cost)
    return -graph[:n0, n0:]


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
