"""Batch sampling for the three correspondence regimes.

Reference parity (jamie/jamie.py:517-583):
- 'diag'   — P is the identity: one index set shared by both modalities,
             drawn without replacement when the batch fits (jamie.py:554-557).
- 'hybrid' — partial priors: ~true_ratio (0.8) of each batch drawn from the
             nonzero-P matched pairs, remainder drawn independently at random
             (jamie.py:559-573). NOTE: the reference's indexing at
             jamie.py:525-526 (`corr_samples[0]` length, `corr_samples[i][idx]`)
             indexes coordinates of the *first* matched pair instead of the
             pair list — an upstream indexing bug. We implement the documented
             intent: sample whole matched pairs.
- 'zeros'  — no priors: fully independent sampling per modality
             (jamie.py:575-579).

All samplers are fixed-shape and jit-safe: data-dependent corr counts are
realized as per-slot Bernoulli(true_ratio) masks, preserving the reference's
batch statistics without dynamic shapes.
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def detect_sampling_method(P: np.ndarray) -> str:
    """Pick the regime from the prior matrix P (jamie.py:518-534)."""
    P = np.asarray(P)
    if P.shape[0] == P.shape[1] and np.abs(P - np.eye(P.shape[0])).sum() == 0:
        return 'diag'
    if np.abs(P).sum() != 0:
        return 'hybrid'
    return 'zeros'


def _draw(key, n_rows: int, batch_size: int):
    """Sample batch_size indices in [0, n_rows); without replacement when the
    batch fits (permutation prefix), with replacement otherwise."""
    if batch_size <= n_rows:
        return jax.random.permutation(key, n_rows)[:batch_size]
    return jax.random.randint(key, (batch_size,), 0, n_rows)


def make_sampler(
    method: str,
    rows: Sequence[int],
    batch_size: int,
    corr_pairs: Optional[np.ndarray] = None,
    true_ratio: float = 0.8,
) -> Callable[[jax.Array], Tuple[jnp.ndarray, jnp.ndarray]]:
    """Return sample(key) -> (idx0, idx1), each of shape (batch_size,)."""
    rows = tuple(int(r) for r in rows)

    # Samplers accept the matched-pair table as a call-time argument so a
    # jitted caller can pass it as a traced operand (device arrays closed
    # over as jaxpr constants defeat executable caching); standalone callers
    # may omit it and fall back to the build-time table.
    if method == 'diag':
        def sample(key, pairs=None):
            idx = _draw(key, rows[0], batch_size)
            return idx, idx
        return sample

    if method == 'zeros':
        def sample(key, pairs=None):
            k0, k1 = jax.random.split(key)
            return _draw(k0, rows[0], batch_size), _draw(k1, rows[1], batch_size)
        return sample

    if method == 'hybrid':
        assert corr_pairs is not None and len(corr_pairs) > 0, (
            'hybrid sampling requires nonzero-P matched pairs')
        default_pairs = np.asarray(corr_pairs, dtype=np.int32)
        num_corr = default_pairs.shape[0]

        def sample(key, pairs=None):
            if pairs is None:
                pairs = default_pairs
            k_mask, k_pair, k0, k1 = jax.random.split(key, 4)
            take_corr = jax.random.uniform(k_mask, (batch_size,)) < true_ratio
            pair_idx = jax.random.randint(k_pair, (batch_size,), 0, num_corr)
            r0 = jax.random.randint(k0, (batch_size,), 0, rows[0])
            r1 = jax.random.randint(k1, (batch_size,), 0, rows[1])
            idx0 = jnp.where(take_corr, pairs[pair_idx, 0], r0)
            idx1 = jnp.where(take_corr, pairs[pair_idx, 1], r1)
            return idx0, idx1
        return sample

    raise ValueError(f'Sampling method {method} does not exist')


def make_epoch_sampler(
    method: str,
    rows: Sequence[int],
    batch_size: int,
    len_dataloader: int,
    corr_pairs: Optional[np.ndarray] = None,
    true_ratio: float = 0.8,
) -> Callable[[jax.Array], Tuple[jnp.ndarray, jnp.ndarray]]:
    """All of an epoch's batch indices in ONE draw: sample_epoch(key, pairs)
    -> (idx0, idx1), each (len_dataloader, batch_size).

    Why: the per-step samplers above draw a fresh without-replacement batch
    via `jax.random.permutation(key, N)` — a full N-element device sort
    per STEP. At N~9k that sort dominates the train step (~2x the entire
    fwd/bwd/Adam work measured at the BrainChromatin shape), and a 6k-epoch
    fit runs ~10^5 of them. Here diag/zeros draw one permutation per EPOCH
    and slice it into consecutive wrap-around windows — torch
    DataLoader(shuffle=True, drop_last=True) semantics: every batch is
    still without-replacement, and no cell repeats within an epoch until
    the permutation wraps. With the trainer's L = floor(max(rows)/B) the
    larger modality's windows never wrap, so its tail `n mod B` cells sit
    out that epoch (a different random subset each epoch — exactly torch's
    drop_last behavior); a smaller modality under 'zeros' wraps and reuses
    its head. The reference instead draws each batch independently
    (jamie/jamie.py:554-557) — deviation documented here and
    quality-validated in RESULTS.md. hybrid keeps its exact per-step
    distribution (it was always randint-based); it is simply drawn as one
    (L, B) batch of randints.
    """
    rows = tuple(int(r) for r in rows)
    L, B = int(len_dataloader), int(batch_size)

    def _epoch_windows(key, n):
        if B > n:   # with-replacement regime, as _draw
            return jax.random.randint(key, (L, B), 0, n)
        perm = jax.random.permutation(key, n)
        pos = jnp.arange(L * B) % n   # B consecutive ints mod n are distinct
        return jnp.take(perm, pos.reshape(L, B), axis=0)

    if method == 'diag':
        def sample_epoch(key, pairs=None):
            idx = _epoch_windows(key, rows[0])
            return idx, idx
        return sample_epoch

    if method == 'zeros':
        def sample_epoch(key, pairs=None):
            k0, k1 = jax.random.split(key)
            return _epoch_windows(k0, rows[0]), _epoch_windows(k1, rows[1])
        return sample_epoch

    if method == 'hybrid':
        assert corr_pairs is not None and len(corr_pairs) > 0, (
            'hybrid sampling requires nonzero-P matched pairs')
        default_pairs = np.asarray(corr_pairs, dtype=np.int32)
        num_corr = default_pairs.shape[0]

        def sample_epoch(key, pairs=None):
            if pairs is None:
                pairs = default_pairs
            k_mask, k_pair, k0, k1 = jax.random.split(key, 4)
            take_corr = jax.random.uniform(k_mask, (L, B)) < true_ratio
            pair_idx = jax.random.randint(k_pair, (L, B), 0, num_corr)
            r0 = jax.random.randint(k0, (L, B), 0, rows[0])
            r1 = jax.random.randint(k1, (L, B), 0, rows[1])
            pairs = jnp.asarray(pairs)
            idx0 = jnp.where(take_corr, pairs[pair_idx, 0], r0)
            idx1 = jnp.where(take_corr, pairs[pair_idx, 1], r1)
            return idx0, idx1
        return sample_epoch

    raise ValueError(f'Sampling method {method} does not exist')
