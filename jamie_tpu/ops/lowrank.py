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


@partial(jax.jit, static_argnames=('n_cols',))
def _scatter_rows(idx, w, n_cols: int):
    """Dense (B, n_cols) from per-row k-sparse (idx, w). top_k indices are
    distinct per row, so .add == .set; .add stays correct under ties."""
    a = jnp.zeros((idx.shape[0], n_cols), jnp.float32)
    rows = jnp.arange(idx.shape[0])[:, None]
    return a.at[rows, idx].add(w)


@jax.jit
def _mix_rows(idx, w, f_l):
    """(A F_L) for k-sparse rows: each output row is a w-weighted mixture of
    k rows of f_l — a (B, k, L1) gather + einsum, no (B, L0) intermediate."""
    fb = jnp.take(f_l, idx.reshape(-1), axis=0)
    fb = fb.reshape(idx.shape + (f_l.shape[1],))
    return jnp.einsum('bk,bkl->bl', w, fb)


@partial(jax.jit, static_argnames=('k',))
def _topk_merge(best_v, best_c, scores, col0, k: int):
    """Fold one (B, C) score block into a running per-row top-k."""
    if scores.shape[1] < k:
        scores = jnp.pad(scores, ((0, 0), (0, k - scores.shape[1])),
                         constant_values=-jnp.inf)
    v2, c2 = jax.lax.top_k(scores, k)
    cand_v = jnp.concatenate([best_v, v2], axis=1)
    cand_c = jnp.concatenate([best_c, c2 + col0], axis=1)
    v3, sel = jax.lax.top_k(cand_v, k)
    return v3, jnp.take_along_axis(cand_c, sel, axis=1)


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


class SparseLandmarkF(LowRankF):
    """F = (A_x F_L) A_y^T with k-sparse interpolation factors.

    The dense LowRankF factors u = A_x F_L (N0, L) and v = A_y (N1, L) are
    themselves the memory wall past ~250k cells (three (N, 2048) f32 arrays
    are 12 GB at N=500k). But A_x/A_y are exactly k-sparse by construction
    (each cell mixes its k nearest landmarks, solvers/landmark.py), so this
    layout stores only the (N, k) landmark indices + weights plus the (L0,
    L1) solved landmark correspondence — O(N k + L^2) bytes, 64 MB at N=1M
    k=8 — and re-mixes batch rows on the fly (a (B, k, L) gather-einsum per
    batch, trivial next to the VAE fwd/bwd).

    Same math as the dense layout: every method agrees with
    LowRankF(A_x F_L, A_y) up to f32 summation order (pinned by
    tests/test_lowrank_sparse.py). Reference context: jamie/jamie.py:314-414
    holds F dense and caps at ~9k cells; this is the second rung of the
    atlas-scale ladder after LowRankF itself.
    """

    def __init__(self, ix, wx, iy, wy, f_l):
        self.ix = jnp.asarray(ix, jnp.int32)      # (N0, k) landmark ids
        self.wx = jnp.asarray(wx, jnp.float32)    # (N0, k) mixture weights
        self.iy = jnp.asarray(iy, jnp.int32)      # (N1, k)
        self.wy = jnp.asarray(wy, jnp.float32)    # (N1, k)
        self.f_l = jnp.asarray(f_l, jnp.float32)  # (L0, L1) landmark F
        assert self.ix.shape == self.wx.shape and self.ix.ndim == 2
        assert self.iy.shape == self.wy.shape and self.iy.ndim == 2
        assert self.f_l.ndim == 2
        self.shape = (int(self.ix.shape[0]), int(self.iy.shape[0]))
        self.rank = int(self.f_l.shape[1])

    # Dense factors, materialized on demand (small-N compat paths only —
    # to_dense guards the size; the trainer never touches these for the
    # sparse layout).
    @property
    def u(self):
        return _mix_rows(self.ix, self.wx, self.f_l)

    @property
    def v(self):
        return _scatter_rows(self.iy, self.wy, self.rank)

    def gather_batch(self, idx0, idx1):
        u_b = _mix_rows(jnp.take(self.ix, idx0, axis=0),
                        jnp.take(self.wx, idx0, axis=0), self.f_l)
        v_b = _scatter_rows(jnp.take(self.iy, idx1, axis=0),
                            jnp.take(self.wy, idx1, axis=0), self.rank)
        return u_b @ v_b.T

    def col_sums(self):
        # 1^T A_x lands in L0 bins (one segment-sum over N0 k entries),
        # flows through f_l, then mixes out through each column cell's
        # k weights.
        cx = jnp.zeros((self.f_l.shape[0],), jnp.float32)
        cx = cx.at[self.ix.reshape(-1)].add(self.wx.reshape(-1))
        t = cx @ self.f_l                            # (L1,)
        return jnp.sum(jnp.take(t, self.iy) * self.wy, axis=1)

    def col_normalized(self) -> 'SparseLandmarkF':
        s = self.col_sums()
        scale = jnp.where(s > 0, 1.0 / jnp.maximum(s, 1e-12), 0.0)
        return SparseLandmarkF(self.ix, self.wx, self.iy,
                               self.wy * scale[:, None], self.f_l)

    def top_k(self, k: int, block: int = 4096, col_block: int = 65536):
        """Double-blocked: row blocks mix u on the fly; column blocks
        scatter v on the fly; a running top-k merge keeps the live state at
        (block, k). Neither dense factor ever exists whole."""
        from .sparse import SparseRows
        n0, n1 = self.shape
        k = min(int(k), n1)
        cols_out = np.empty((n0, k), np.int32)
        vals_out = np.empty((n0, k), np.float32)
        for s in range(0, n0, block):
            u_b = _mix_rows(self.ix[s:s + block], self.wx[s:s + block],
                            self.f_l)
            best_v = jnp.full((u_b.shape[0], k), -jnp.inf, jnp.float32)
            best_c = jnp.zeros((u_b.shape[0], k), jnp.int32)
            for c in range(0, n1, col_block):
                v_b = _scatter_rows(self.iy[c:c + col_block],
                                    self.wy[c:c + col_block], self.rank)
                best_v, best_c = _topk_merge(
                    best_v, best_c, u_b @ v_b.T, c, k)
            vals_out[s:s + block] = np.asarray(best_v)
            cols_out[s:s + block] = np.asarray(best_c)
        keep = vals_out > 0
        return SparseRows(np.where(keep, cols_out, -1),
                          np.where(keep, vals_out, 0.0), self.shape)

    @property
    def T(self) -> 'SparseLandmarkF':
        return SparseLandmarkF(self.iy, self.wy, self.ix, self.wx,
                               self.f_l.T)

    def __repr__(self):
        return (f'SparseLandmarkF(shape={self.shape}, '
                f'k={self.ix.shape[1]}, landmarks={self.f_l.shape})')


def is_lowrank(x) -> bool:
    return isinstance(x, LowRankF)
