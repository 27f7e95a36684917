"""Legacy t-SNE joint-projection path (project_mode='tsne').

Reference parity: the UnionCom-inherited `project_tsne` flow used by
fit_transform when project_mode='tsne' (jamie/jamie.py:184-195):
`joint_probabilities(dist, perplexity)` per dataset, then a paired t-SNE
that embeds both datasets while pulling the hungarian-matched pairs
together. The reference delegates to unioncom's numpy implementation; here
both pieces run on device — the perplexity calibration is a vmapped binary
search, and the whole t-SNE optimization (O(N^2) student-t kernel per step)
is one jitted `lax.fori_loop` of MXU/VPU work.
"""

from __future__ import annotations

from functools import partial
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


@partial(jax.jit, static_argnames=('tol_iters',))
def _calibrate_beta(D, perplexity: float, tol_iters: int = 50):
    """Per-row precision (beta) binary search hitting the target entropy."""
    n = D.shape[0]
    log_perp = jnp.log(perplexity)
    eye = jnp.eye(n, dtype=bool)

    def entropy_and_p(beta):
        P = jnp.exp(-D * beta[:, None])
        P = jnp.where(eye, 0.0, P)
        sum_p = jnp.maximum(jnp.sum(P, axis=1), 1e-12)
        H = jnp.log(sum_p) + beta * jnp.sum(D * P, axis=1) / sum_p
        return H, P / sum_p[:, None]

    def body(_, carry):
        beta, beta_min, beta_max = carry
        H, _ = entropy_and_p(beta)
        too_high = H > log_perp  # entropy too high -> increase beta
        beta_min = jnp.where(too_high, beta, beta_min)
        beta_max = jnp.where(too_high, beta_max, beta)
        new_beta = jnp.where(
            too_high,
            jnp.where(jnp.isinf(beta_max), beta * 2, (beta + beta_max) / 2),
            jnp.where(jnp.isneginf(beta_min) | (beta_min == 0),
                      beta / 2, (beta + beta_min) / 2))
        return new_beta, beta_min, beta_max

    beta0 = jnp.ones((n,), jnp.float32)
    beta, _, _ = jax.lax.fori_loop(
        0, tol_iters, body,
        (beta0, jnp.zeros((n,)), jnp.full((n,), jnp.inf)))
    _, P = entropy_and_p(beta)
    return P


def joint_probabilities(dist, perplexity: float = 30.0) -> np.ndarray:
    """Symmetrized, perplexity-calibrated joint probabilities
    (unioncom.utils.joint_probabilities semantics; imported at
    jamie/jamie.py:19-23, used at :188)."""
    D = jnp.asarray(dist, jnp.float32) ** 2
    P = _calibrate_beta(D, float(perplexity))
    P = (P + P.T) / (2 * P.shape[0])
    P = jnp.maximum(P, 1e-12)
    return np.asarray(P / jnp.sum(P))


@partial(jax.jit, static_argnames=('n_iters', 'exaggeration_iters'))
def _tsne_optimize(P1, P2, Y1, Y2, pairs_x, pairs_y, align_weight,
                   n_iters: int, exaggeration_iters: int = 250,
                   lr: float = 0.5, exaggeration: float = 12.0):
    """Paired t-SNE: KL(P1||Q1) + KL(P2||Q2) + align on matched pairs.

    Optimized with Adam (scale-invariant steps) rather than the classic
    gains+momentum schedule — fewer knobs, no divergence, same embeddings."""
    import optax

    def kl_grad(P, Y):
        d2 = jnp.sum((Y[:, None, :] - Y[None, :, :]) ** 2, axis=-1)
        num = 1.0 / (1.0 + d2)
        num = num * (1.0 - jnp.eye(Y.shape[0]))
        Q = jnp.maximum(num / jnp.sum(num), 1e-12)
        PQ = (P - Q) * num
        grad = 4.0 * (jnp.diag(jnp.sum(PQ, axis=1)) - PQ) @ Y
        return grad

    tx = optax.adam(lr)
    opt_state = tx.init((Y1, Y2))

    def body(i, carry):
        (Y1, Y2), opt_state = carry
        # anneal the early exaggeration linearly over its window instead of
        # a hard step - smoother global->local structure handoff
        frac = jnp.clip(i / max(exaggeration_iters, 1), 0.0, 1.0)
        exag = exaggeration + (1.0 - exaggeration) * frac
        g1 = kl_grad(P1 * exag, Y1)
        g2 = kl_grad(P2 * exag, Y2)
        # alignment on matched pairs
        diff = Y1[pairs_x] - Y2[pairs_y]
        g1 = g1.at[pairs_x].add(2.0 * align_weight * diff
                                / pairs_x.shape[0])
        g2 = g2.at[pairs_y].add(-2.0 * align_weight * diff
                                / pairs_x.shape[0])
        updates, opt_state = tx.update((g1, g2), opt_state, (Y1, Y2))
        Y1, Y2 = optax.apply_updates((Y1, Y2), updates)
        Y1 = Y1 - jnp.mean(Y1, axis=0)
        Y2 = Y2 - jnp.mean(Y2, axis=0)
        return (Y1, Y2), opt_state

    (Y1, Y2), _ = jax.lax.fori_loop(0, n_iters, body, ((Y1, Y2), opt_state))
    return Y1, Y2


@partial(jax.jit, static_argnames=('n_iters', 'exaggeration_iters'))
def _tsne_single(P, Y, n_iters: int, exaggeration_iters: int = 250,
                 lr: float = 0.5):
    """Single-dataset t-SNE: one jitted Adam loop over the KL gradient."""
    import optax

    def kl_grad(P, Y):
        d2 = jnp.sum((Y[:, None, :] - Y[None, :, :]) ** 2, axis=-1)
        num = 1.0 / (1.0 + d2)
        num = num * (1.0 - jnp.eye(Y.shape[0]))
        Q = jnp.maximum(num / jnp.sum(num), 1e-12)
        PQ = (P - Q) * num
        return 4.0 * (jnp.diag(jnp.sum(PQ, axis=1)) - PQ) @ Y

    tx = optax.adam(lr)
    opt_state = tx.init(Y)

    def body(i, carry):
        Y, opt_state = carry
        exag = jnp.where(i < exaggeration_iters, 12.0, 1.0)
        g = kl_grad(P * exag, Y)
        updates, opt_state = tx.update(g, opt_state, Y)
        Y = optax.apply_updates(Y, updates)
        return Y - jnp.mean(Y, axis=0), opt_state

    Y, _ = jax.lax.fori_loop(0, n_iters, body, (Y, opt_state))
    return Y


def tsne_embed(data, n_components: int = 2, perplexity: float = 30.0,
               n_iters: int = 750, seed: int = 0) -> np.ndarray:
    """Embed one dataset with t-SNE, fully on device.

    The TPU-native counterpart of the reference's preclass
    model_pca='tsne' (sklearn TSNE(method='exact'), jamie/jamie.py:449-451):
    perplexity calibration is a vmapped binary search and the optimization
    is one jitted fori_loop of O(N^2) student-t kernel steps."""
    from ..ops.distances import pairwise_distance

    dist = pairwise_distance(np.asarray(data, np.float32), 'euclidean')
    P = jnp.asarray(joint_probabilities(dist, perplexity), jnp.float32)
    key = jax.random.PRNGKey(seed)
    Y0 = 1e-4 * jax.random.normal(key, (P.shape[0], n_components),
                                  jnp.float32)
    return np.asarray(_tsne_single(P, Y0, int(n_iters)))


def project_tsne(
    datasets: Sequence[np.ndarray],
    P_joint: Sequence[np.ndarray],
    pairs_x: np.ndarray,
    pairs_y: np.ndarray,
    output_dim: int = 2,
    n_iters: int = 1000,
    align_weight: float = 10.0,
    seed: int = 0,
    exaggeration: float = 12.0,
    exaggeration_iters: int = 250,
    lr: float = 0.5,
) -> Tuple[np.ndarray, np.ndarray]:
    """Embed both datasets with pair-aligned t-SNE; returns [Y1, Y2].

    exaggeration / exaggeration_iters / lr expose the annealing schedule
    (the early-exaggeration factor decays linearly over its window)."""
    key = jax.random.PRNGKey(seed)
    k1, k2 = jax.random.split(key)
    n1, n2 = P_joint[0].shape[0], P_joint[1].shape[0]
    Y1 = 1e-4 * jax.random.normal(k1, (n1, output_dim), jnp.float32)
    Y2 = 1e-4 * jax.random.normal(k2, (n2, output_dim), jnp.float32)
    Y1, Y2 = _tsne_optimize(
        jnp.asarray(P_joint[0], jnp.float32),
        jnp.asarray(P_joint[1], jnp.float32),
        Y1, Y2,
        jnp.asarray(np.asarray(pairs_x), jnp.int32),
        jnp.asarray(np.asarray(pairs_y), jnp.int32),
        float(align_weight), int(n_iters),
        exaggeration_iters=int(exaggeration_iters), lr=float(lr),
        exaggeration=float(exaggeration))
    return [np.asarray(Y1), np.asarray(Y2)]
