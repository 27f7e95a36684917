"""TPU-native UMAP embedding for the nonlinear preclass.

Reference parity: model_pca='umap' delegates to umap-learn's
``UMAP(n_components=dim).fit_transform`` (jamie/jamie.py:444-451). That
package is unavailable here, and its Numba kernels would run on host
anyway — so the whole algorithm runs on device instead: exact kNN from
the MXU pairwise distances, a vmapped smooth-kNN sigma calibration
(binary search, same shape as the t-SNE perplexity search), fuzzy
simplicial-set symmetrization (``W + W.T - W∘W.T``), and one jitted SGD
layout loop using the UMAP force model with the fitted low-dimensional
curve ``1 / (1 + a d^{2b})``.

Documented deviations from umap-learn (all in the layout loop, which is
stochastic anyway):
- Attraction is computed densely each epoch, weighted by the membership
  strength — the *expectation* of umap-learn's one-edge-every-1/w-epochs
  sampling schedule — rather than per-edge Bernoulli draws. On TPU the
  dense force pass is two MXU matmuls per epoch; the sequential per-edge
  SGD would not vectorize.
- Repulsion keeps umap-learn's negative sampling (``neg_rate`` uniform
  partners per vertex per epoch).
- Init is PCA scaled to the same [-10, 10] box umap-learn scales its
  spectral init into (umap supports init='pca'; spectral would cost an
  O(n^3) eigendecomposition per fit for no quality gain at preclass
  sizes).
"""

from __future__ import annotations

import warnings
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

# curve_fit(psi, ...) result for the default (min_dist=0.1, spread=1.0) —
# the pair umap-learn ships as its default force curve.
_AB_DEFAULT = (0.1, 1.0, 1.5769434603113077, 0.8950608779109733)


def fit_ab(min_dist: float = 0.1, spread: float = 1.0):
    """Fit (a, b) of the low-dim similarity 1/(1 + a d^{2b}) to the target
    membership curve: 1 for d <= min_dist, exp(-(d - min_dist)/spread)
    beyond (umap-learn find_ab_params semantics)."""
    if (min_dist, spread) == _AB_DEFAULT[:2]:
        return _AB_DEFAULT[2:]
    from scipy.optimize import curve_fit

    d = np.linspace(0.0, 3.0 * spread, 300)
    target = np.where(d <= min_dist, 1.0,
                      np.exp(-(d - min_dist) / spread))
    (a, b), _ = curve_fit(lambda x, a, b: 1.0 / (1.0 + a * x ** (2.0 * b)),
                          d, target, p0=(1.0, 1.0), maxfev=10_000)
    return float(a), float(b)


@partial(jax.jit, static_argnames=('iters',))
def _smooth_knn(knn_d, iters: int = 64):
    """Per-point (rho, sigma): rho is the nearest-neighbor distance; sigma
    solves sum_j exp(-max(0, d_j - rho)/sigma) = log2(k) by binary search
    (umap-learn smooth_knn_dist, SMOOTH_K_TOLERANCE folded into the fixed
    iteration count)."""
    k = knn_d.shape[1]
    rho = knn_d[:, 0]
    target = jnp.log2(jnp.float32(k))
    shifted = jnp.maximum(knn_d - rho[:, None], 0.0)

    def weight_sum(sigma):
        return jnp.sum(jnp.exp(-shifted / sigma[:, None]), axis=1)

    def body(_, carry):
        sigma, lo, hi = carry
        too_big = weight_sum(sigma) > target    # weights too heavy: shrink
        hi = jnp.where(too_big, sigma, hi)
        lo = jnp.where(too_big, lo, sigma)
        sigma = jnp.where(
            too_big, (lo + sigma) / 2.0,
            jnp.where(jnp.isinf(hi), sigma * 2.0, (sigma + hi) / 2.0))
        return sigma, lo, hi

    n = knn_d.shape[0]
    sigma0 = jnp.ones((n,), jnp.float32)
    sigma, _, _ = jax.lax.fori_loop(
        0, iters, body,
        (sigma0, jnp.zeros((n,)), jnp.full((n,), jnp.inf)))
    # umap-learn floors sigma at 1e-3 x mean distance to avoid collapse on
    # duplicate-heavy rows
    sigma = jnp.maximum(sigma, 1e-3 * jnp.mean(knn_d))
    return rho, sigma


@partial(jax.jit, static_argnames=('k',))
def _fuzzy_graph(dist, k: int):
    """Dense symmetrized fuzzy simplicial set from a full distance matrix:
    per-row membership exp(-(d - rho)/sigma) on the k nearest neighbors,
    then probabilistic t-conorm W + W.T - W∘W.T."""
    n = dist.shape[0]
    d_noself = jnp.where(jnp.eye(n, dtype=bool), jnp.inf, dist)
    neg_knn, idx = jax.lax.top_k(-d_noself, k)
    knn_d = -neg_knn
    rho, sigma = _smooth_knn(knn_d)
    w = jnp.exp(-jnp.maximum(knn_d - rho[:, None], 0.0) / sigma[:, None])
    rows = jnp.repeat(jnp.arange(n), k)
    A = jnp.zeros((n, n), jnp.float32).at[rows, idx.ravel()].set(w.ravel())
    return A + A.T - A * A.T


@partial(jax.jit, static_argnames=('n_epochs', 'neg_rate'))
def _optimize_layout(W, Y, key, n_epochs: int, a: float, b: float,
                     neg_rate: int = 5, lr0: float = 1.0,
                     gamma: float = 1.0):
    """Jitted UMAP layout SGD: dense expected attraction + sampled
    repulsion, learning rate annealing linearly to zero (umap-learn
    optimize_layout_euclidean force model).

    The attraction pass is written in matmul form — d² from the Gram
    matrix and the force as (diag(C·1) − C) @ Y — so the hot loop is MXU
    matmuls with O(n²) memory; a broadcast (n, n, dim) difference tensor
    would be ~200 GB at preclass sizes (n≈9k, dim 512). umap-learn clips
    each force *component* to ±4; the matmul form instead clips the pair
    coefficient to |C| ≤ 4/d, which bounds every component by 4 too
    (|y_i − y_j|_∞ ≤ d) — a conservative variant of the same safeguard."""
    n = Y.shape[0]

    def body(i, carry):
        Y, key = carry
        key, kneg = jax.random.split(key)
        alpha = lr0 * (1.0 - i / n_epochs)
        sq = jnp.sum(Y * Y, axis=1)
        d2 = jnp.maximum(sq[:, None] + sq[None, :] - 2.0 * (Y @ Y.T),
                         1e-12)
        # attractive: -2ab d^{2(b-1)} / (1 + a d^{2b}); negative => pulls
        att = (-2.0 * a * b * d2 ** (b - 1.0)) / (a * d2 ** b + 1.0)
        lim = 4.0 * jax.lax.rsqrt(d2)
        C = jnp.clip(att * W, -lim, lim)
        g = jnp.sum(C, axis=1)[:, None] * Y - C @ Y
        # repulsive: neg_rate uniform negative samples per vertex (small
        # (n, neg, dim) tensors — explicit per-component clip kept here)
        idx = jax.random.randint(kneg, (n, neg_rate), 0, n)
        diffn = Y[:, None, :] - Y[idx]
        d2n = jnp.maximum(jnp.sum(diffn * diffn, axis=-1), 1e-12)
        rep = (2.0 * gamma * b) / ((0.001 + d2n) * (a * d2n ** b + 1.0))
        g = g + jnp.sum(jnp.clip(rep[:, :, None] * diffn, -4.0, 4.0),
                        axis=1)
        return Y + alpha * g, key

    Y, _ = jax.lax.fori_loop(0, n_epochs, body, (Y, key))
    return Y


def umap_embed(data, n_components: int = 2, n_neighbors: int = 15,
               min_dist: float = 0.1, spread: float = 1.0,
               n_epochs: Optional[int] = None, neg_rate: int = 5,
               seed: int = 0) -> np.ndarray:
    """Embed one dataset with UMAP, fully on device.

    The TPU-native counterpart of the reference's preclass
    model_pca='umap' (umap.UMAP(n_components=dim), jamie/jamie.py:446-447),
    with umap-learn's defaults for every exposed knob."""
    from ..ops.distances import pairwise_distance

    X = np.asarray(data, np.float32)
    n = X.shape[0]
    if n < 3:
        warnings.warn('umap on <3 samples: returning zero embedding')
        return np.zeros((n, n_components), np.float32)
    k = int(min(n_neighbors, n - 1))
    if n_epochs is None:
        n_epochs = 500 if n <= 10_000 else 200   # umap-learn's size rule

    dist = jnp.asarray(pairwise_distance(X, 'euclidean'))
    W = _fuzzy_graph(dist, k)
    a, b = fit_ab(float(min_dist), float(spread))

    # PCA init scaled into the [-10, 10] box + tie-breaking noise
    from ..preprocess import PCA
    dim = int(min(n_components, min(X.shape)))
    Y0 = np.zeros((n, n_components), np.float32)
    Y0[:, :dim] = PCA(n_components=dim).fit_transform(X)[:, :dim]
    Y0 *= 10.0 / max(np.abs(Y0).max(), 1e-12)
    key = jax.random.PRNGKey(seed)
    key, knoise = jax.random.split(key)
    Y0 = jnp.asarray(Y0) + 1e-4 * jax.random.normal(
        knoise, (n, n_components), jnp.float32)

    Y = _optimize_layout(W, Y0, key, int(n_epochs), float(a), float(b),
                         neg_rate=int(neg_rate))
    return np.asarray(Y)
