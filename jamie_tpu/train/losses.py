"""The four-term JAMIE training objective.

Reference parity (jamie/jamie.py:614-728):
  (i)   KL, mean-reduced, sigmoid-annealed with midpoint min_epochs/2 and
        scale 32e-3 (jamie/jamie.py:619-633)
  (ii)  MSE reconstruction (jamie/jamie.py:637-642)
  (iii) latent-consistency ("cosine") loss: squared diagonal of the
        difference between each modality's sampled latent and its combined
        latent, x32, dim-normalized (jamie/jamie.py:649-660; sim_diff_func
        at :483-502 with 'cosine'/'euclidean' variants)
  (iv)  F-reconstruction loss ||combined0 - F @ combined1||^2
        (jamie/jamie.py:663-667)

TPU note: the reference builds full BxB similarity matrices and keeps only
the diagonal (jamie/jamie.py:649-657). Only matched rows contribute, so here
the diagonal is computed directly — O(B*d) instead of O(B^2*d), numerically
identical.
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp

LOSS_NAMES = ('KL', 'Rec', 'CosSim', 'F')


def kl_anneal(epoch, min_epochs: int, epoch_dnn: int):
    """Sigmoid annealing weight in [0, 1] with midpoint c (jamie.py:630-631)."""
    c = (min_epochs / 2) if min_epochs > 0 else (epoch_dnn / 2)
    return 1.0 / (1.0 + jnp.exp(-5.0 * (epoch - c) / c))


def kl_divergence(mus: Sequence[jnp.ndarray], logvars: Sequence[jnp.ndarray]):
    """Sum over modalities of mean-reduced KL(q||N(0,1)) (jamie.py:619-628).

    Documented deviation: the reference's `refactor` returns a single
    `logvar` (the LAST modality's, jamie/model.py:225-243), so its KL at
    jamie.py:619-628 pairs every modality's mu with rows of modality-1's
    logvar — an upstream indexing bug. We compute the per-modality KL as
    intended; loss_history['KL'] therefore cannot match reference runs
    term-for-term."""
    total = 0.0
    for mu, logvar in zip(mus, logvars):
        total += jnp.mean(
            -0.5 * jnp.mean(1 + logvar - jnp.square(mu) - jnp.exp(logvar), axis=1))
    return total


def reconstruction_loss(reconstructed: Sequence[jnp.ndarray],
                        data: Sequence[jnp.ndarray]):
    """Sum over modalities of MSE (jamie.py:637-642)."""
    total = 0.0
    for rec, x in zip(reconstructed, data):
        total += jnp.mean(jnp.mean(jnp.square(rec - x.astype(rec.dtype)), axis=1))
    return total


def _diag_sq_diff(a: jnp.ndarray, b: jnp.ndarray, method: str):
    """Squared row-matched difference; the squared diagonal of the
    reference's sim_diff_func output (jamie/jamie.py:483-502) without forming
    the BxB matrix. The euclidean path never takes a sqrt — the loss only
    consumes diff^2, and sqrt at 0 has a NaN gradient exactly when a row's
    correspondence is empty (combined == embedded)."""
    if method == 'cosine':
        sim = jnp.sum(a * b, axis=1) / (
            jnp.linalg.norm(a, axis=1) * jnp.linalg.norm(b, axis=1))
        return jnp.square(1.0 - sim)
    elif method == 'euclidean':
        return jnp.sum(jnp.square(a - b), axis=1)
    raise ValueError(f'Unknown dist_method {method!r}')


def latent_consistency_loss(embedded: Sequence[jnp.ndarray],
                            combined: Sequence[jnp.ndarray],
                            dist_method: str = 'euclidean'):
    """Dim-normalized squared matched-row difference, x32 applied by caller's
    weight table (jamie.py:654-658 keeps the x32 inline; we do too)."""
    d0 = _diag_sq_diff(embedded[0], combined[0], dist_method)
    d1 = _diag_sq_diff(embedded[1], combined[1], dist_method)
    return 32.0 * (
        jnp.mean(d0) / embedded[0].shape[1]
        + jnp.mean(d1) / embedded[1].shape[1])


def f_reconstruction_loss(combined0: jnp.ndarray, combined1: jnp.ndarray,
                          F: jnp.ndarray):
    """||combined0 - F @ combined1||^2, mean-reduced (jamie.py:663-667)."""
    diff = combined0 - F.astype(combined1.dtype) @ combined1
    return jnp.mean(jnp.mean(jnp.square(diff), axis=1))


def row_normalize(M: jnp.ndarray):
    """Row-normalize with zero-row guard (jamie.py:586-599)."""
    s = jnp.sum(M, axis=1)
    s = jnp.where(s == 0, 1.0, s)
    return M / s[:, None]


def col_normalize(M: jnp.ndarray):
    """Column-normalize with zero-column guard.

    The reference's final-embedding normalization (jamie.py:795-796) divides
    by raw column sums; a zero column there would produce NaN. The guard is a
    deliberate, documented deviation that leaves nonzero columns identical.
    """
    s = jnp.sum(M, axis=0)
    s = jnp.where(s == 0, 1.0, s)
    return M / s[None, :]
