"""Low-rank correspondence layout: F = U V^T, never materialized.

The prime-dual solver's dense (N0, N1) F is the one O(N^2) object that
cannot be sharded away at atlas scale (100k cells -> 40 GB plus 4x that in
solver state). The landmark solver (solvers/landmark.py) produces F as a
rank-L factorization instead — U (N0, L) carries each row cell's mixture
over landmark correspondences, V (N1, L) carries each column cell's
landmark affinities — and every consumer only ever needs:

- batch subsets F[idx0][:, idx1] (the trainer's per-step gather):
  U[idx0] @ V[idx1]^T, two MXU matmuls per batch;
- column-normalized action (final_corr): a row scaling of V;
- a top-k sparse compression (serving / figure paths): computed in row
  blocks on device, never the full dense matrix.

Reference context: jamie/jamie.py:314-414 materializes F dense; the
reference never ran past ~9k cells (SURVEY §6). This layout is the
TPU-native answer to SURVEY §7 hard part 6 (atlas-scale F).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


@partial(jax.jit, static_argnames=('k',))
def _block_topk(u_blk, v, k: int):
    scores = u_blk @ v.T                      # (B, N1) on the MXU
    vals, cols = jax.lax.top_k(scores, k)
    return vals, cols


class LowRankF:
    """F = u @ v.T with logical shape (u.shape[0], v.shape[0])."""

    def __init__(self, u, v):
        self.u = jnp.asarray(u, jnp.float32)
        self.v = jnp.asarray(v, jnp.float32)
        assert self.u.ndim == 2 and self.v.ndim == 2
        assert self.u.shape[1] == self.v.shape[1], (
            f'rank mismatch: {self.u.shape} vs {self.v.shape}')
        self.shape = (int(self.u.shape[0]), int(self.v.shape[0]))
        self.rank = int(self.u.shape[1])

    # ------------------------------------------------------------- consumers
    def gather_batch(self, idx0, idx1):
        """F[idx0][:, idx1] without materializing F (jit-safe)."""
        return jnp.take(self.u, idx0, axis=0) @ jnp.take(
            self.v, idx1, axis=0).T

    def col_sums(self):
        """F^T @ 1 as a length-N1 vector: (sum_i u_i) . v_j."""
        return self.v @ jnp.sum(self.u, axis=0)

    def col_normalized(self) -> 'LowRankF':
        """Columns scaled to sum 1 (zero columns left at zero), still
        rank-L: col-normalization of u v^T is a row scaling of v."""
        s = self.col_sums()
        scale = jnp.where(s > 0, 1.0 / jnp.maximum(s, 1e-12), 0.0)
        return LowRankF(self.u, self.v * scale[:, None])

    def to_dense(self, max_entries: int = 200_000_000) -> np.ndarray:
        n = self.shape[0] * self.shape[1]
        if n > max_entries:
            raise ValueError(
                f'refusing to densify {self.shape} low-rank F ({n} entries);'
                ' use top_k() or gather_batch()')
        return np.asarray(self.u @ self.v.T)

    def top_k(self, k: int, block: int = 4096):
        """Largest-k entries per row as SparseRows, computed in row blocks
        on device — the dense (N0, N1) product never exists whole."""
        from .sparse import SparseRows
        n0, n1 = self.shape
        k = min(int(k), n1)
        cols_out = np.empty((n0, k), np.int32)
        vals_out = np.empty((n0, k), np.float32)
        for s in range(0, n0, block):
            vals, cols = _block_topk(self.u[s:s + block], self.v, k)
            vals_out[s:s + block] = np.asarray(vals)
            cols_out[s:s + block] = np.asarray(cols)
        keep = vals_out > 0
        return SparseRows(np.where(keep, cols_out, -1),
                          np.where(keep, vals_out, 0.0), self.shape)

    @property
    def T(self) -> 'LowRankF':
        """Transpose stays factorized (the estimator's match-matrix
        assembly transposes F for the (j, i) slot)."""
        return LowRankF(self.v, self.u)

    def __repr__(self):
        return f'LowRankF(shape={self.shape}, rank={self.rank})'


def is_lowrank(x) -> bool:
    return isinstance(x, LowRankF)
