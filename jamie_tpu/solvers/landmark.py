"""Landmark (Nystrom-style) correspondence: prime-dual F past one chip's N².

The reference's hot loop (jamie/jamie.py:314-414) holds five dense (N0, N1)
f32 arrays — ~200 GB at 100k cells — so unsupervised correspondence simply
cannot run at atlas scale, dense OR row-sharded. This solver bounds the
whole estimation at O(N L + L²):

1. sample L landmark cells per modality (uniform; L defaults to 2048),
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


@partial(jax.jit, static_argnames=('k', 'n_landmarks'))
def _interp_weights(d2, k: int, n_landmarks: int):
    """Row-stochastic kNN-Gaussian weights from squared cell->landmark
    distances: keep each row's k nearest landmarks, weight by
    exp(-d2 / mean_knn_d2) (per-row bandwidth), normalize to sum 1."""
    neg, idx = jax.lax.top_k(-d2, k)
    knn_d2 = -neg                                    # (n, k), ascending
    bw = jnp.maximum(jnp.mean(knn_d2, axis=1, keepdims=True), 1e-12)
    w = jnp.exp(-knn_d2 / bw)
    w = w / jnp.sum(w, axis=1, keepdims=True)
    a = jnp.zeros((d2.shape[0], n_landmarks), jnp.float32)
    rows = jnp.arange(d2.shape[0])[:, None]
    return a.at[rows, idx].set(w)


def _cell_to_landmark_weights(x, landmarks, k: int, block: int = 8192):
    """A (n, L) built in row blocks so the (n, L) distance intermediate
    stays bounded; x and landmarks may be host or device arrays."""
    lm = jnp.asarray(np.asarray(landmarks), jnp.float32)
    n = x.shape[0]
    L = lm.shape[0]
    parts = []
    for s in range(0, n, block):
        xb = jnp.asarray(np.asarray(x[s:s + block]), jnp.float32)
        d2 = pairwise_sq_euclidean(xb, lm)
        parts.append(_interp_weights(d2, min(k, L), L))
    return jnp.concatenate(parts, axis=0) if len(parts) > 1 else parts[0]


def landmark_correspondence(
    X, Y,
    n_landmarks: int = 2048,
    k_interp: int = 8,
    distance_mode: str = 'euclidean',
    seed: int = 666,
    mesh=None,
    kmax: int = 40,
    **prime_dual_kwargs,
) -> LowRankF:
    """Low-rank unsupervised correspondence between datasets X (N0, f0) and
    Y (N1, f1). See module docstring; `prime_dual_kwargs` forward to the
    exact solver (epoch_pd, rho, epsilon, delay, log_pd, verbose, ...)."""
    from ..ops.distances import dataset_distance_matrix

    n0, n1 = int(X.shape[0]), int(Y.shape[0])
    L0, L1 = min(int(n_landmarks), n0), min(int(n_landmarks), n1)
    rng = np.random.RandomState(seed)
    lx = np.sort(rng.choice(n0, L0, replace=False))
    ly = np.sort(rng.choice(n1, L1, replace=False))
    Xl = np.asarray(X)[lx]
    Yl = np.asarray(Y)[ly]

    # Exact solver on the landmark subproblem. Graph-based modes (geodesic)
    # are computed on the landmark subset's own graph — at L=2048 that is a
    # denser sampling than most full datasets the reference ever ran.
    Kx = dataset_distance_matrix(Xl, distance_mode, kmax=kmax)
    Ky = dataset_distance_matrix(Yl, distance_mode, kmax=kmax)
    F_L = prime_dual(Kx, Ky, dx=int(X.shape[1]), dy=int(Y.shape[1]),
                     mesh=mesh, **prime_dual_kwargs)

    A_x = _cell_to_landmark_weights(X, Xl, k_interp)
    A_y = _cell_to_landmark_weights(Y, Yl, k_interp)
    # U carries the solved landmark correspondences mixed by each row
    # cell's weights; V is the column side's affinity. (A_x F_L) is one
    # (N0, L0) x (L0, L1) MXU matmul.
    U = A_x @ F_L
    return LowRankF(U, A_y)
