"""Scan-compiled training loop for the coupled VAE.

Reference parity: the body of `project_jamie` (jamie/jamie.py:546-804) —
per-epoch minibatch sampling in three regimes, per-batch row-normalization of
P/F subsets, `PF_Ratio`-weighted correspondence aggregation, the 4-term loss,
global-norm-1 gradient clipping, Adam(model_lr), per-batch or per-epoch
stepping (`batch_step`, jamie.py:736-749), early stopping after `min_epochs`
on `max_steps_without_increment` non-improving steps (jamie.py:777-792), and
the final full-dataset eval-mode embedding with column-normalized
correspondence (jamie.py:794-799).

TPU-first design: the whole dataset stays HBM-resident; an epoch is a
`lax.scan` over fixed-shape minibatch steps, and epochs are scanned in chunks
inside one jitted function — the host only sees per-epoch loss telemetry at
chunk boundaries, where it applies logging and the (already device-computed)
early-stop decision. Once the stop flag latches, remaining epochs in the
chunk are skipped via `lax.cond` so a late stop costs ~nothing. On a mesh,
batches are sharded over the `data` axis and gradient psums ride ICI
implicitly through pjit.
"""

from __future__ import annotations

import contextlib
import time
import warnings
from collections import deque
from typing import Any, Dict, List, Optional, Sequence

import flax
import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec

from ..config import JamieConfig
from ..core.dtypes import resolve_dtype
from ..core.mesh import axis_size, shard_rows
from .losses import (
    LOSS_NAMES, col_normalize, f_reconstruction_loss, kl_anneal,
    kl_divergence, latent_consistency_loss, reconstruction_loss,
    row_normalize,
)
from .sampling import (detect_sampling_method, make_epoch_sampler,
                       make_sampler)


def _maybe_shard_rows(x, mesh):
    """Row-shard a concrete array over the 'data' axis, zero-padding the
    leading dim up to a multiple of the axis size first (core.mesh.
    pad_rows_to_axis explains why the pad is mandatory). Consumers gather
    by row index (< true N) or slice the pad back off, so the zero rows
    are inert."""
    if axis_size(mesh, 'data') <= 1:
        # Still move host arrays to device: returning numpy here would make
        # every jitted chunk call re-transfer the full array (a pure-TP
        # mesh with data axis 1 hit this; the mesh=None path already uses
        # jnp.asarray).
        return jnp.asarray(x)
    return shard_rows(mesh, x)


@flax.struct.dataclass
class TrainState:
    params: Any
    batch_stats: Any
    opt_state: Any
    rng: jax.Array
    epoch: jax.Array                 # int32, next epoch to run
    best_running_loss: jax.Array     # float32
    streak: jax.Array                # int32
    stopped: jax.Array               # bool


class JamieTrainer:
    """Owns the jitted train/eval functions for one fit."""

    def __init__(
        self,
        config: JamieConfig,
        model,
        dataset: Sequence[np.ndarray],
        P: np.ndarray,
        F: np.ndarray,
        mesh: Optional[Mesh] = None,
    ):
        assert len(dataset) == 2, 'Currently only compatible with 2 modalities.'
        self.config = config
        self.model = model
        self.mesh = mesh
        cdtype = resolve_dtype(config.compute_dtype)

        self.rows = [int(d.shape[0]) for d in dataset]
        self.cols = [int(d.shape[1]) for d in dataset]

        if mesh is not None:
            # Keep the HBM-resident dataset row-sharded across the mesh so
            # per-chip memory scales as ceil(N/devices); non-divisible N is
            # zero-padded (see _maybe_shard_rows) and the pad rows are never
            # gathered (sampler indices < N) — final_embed slices them off.
            self.data = [_maybe_shard_rows(
                np.asarray(d, np.float32) if isinstance(d, np.ndarray) else d,
                mesh) for d in dataset]
            self.data = [d.astype(jnp.float32) for d in self.data]
        else:
            # jnp.asarray keeps device-resident inputs in place (no host hop)
            self.data = [jnp.asarray(d, dtype=jnp.float32) for d in dataset]

        # P/F accept sentinels and sparse layouts so atlas-scale fits
        # (100k+ cells) never materialize the N x N prior:
        # 'identity' / 'zeros' strings, a 1-D P interpreted as a diagonal
        # prior mask, or a SparseRows / scipy.sparse / coordinate-tuple
        # (general off-diagonal partial priors, and top-k-compressed F);
        # batch subsets are then synthesized on the fly from the indices.
        from ..ops.sparse import as_sparse_rows, is_sparse_input
        self._p_identity = isinstance(P, str) and P == 'identity'
        self._f_zeros = isinstance(F, str) and F == 'zeros'
        self._p_diag_mask = None
        self._p_sparse = None
        self._f_sparse = None
        if self._p_identity:
            assert self.rows[0] == self.rows[1], (
                "P='identity' requires equal-sized modalities")
            self.P = None
        elif is_sparse_input(P):
            self._p_sparse = as_sparse_rows(P, shape=tuple(self.rows))
            assert self._p_sparse.shape == tuple(self.rows), (
                f'sparse P shape {self._p_sparse.shape} != dataset rows '
                f'{tuple(self.rows)}')
            self.P = None
        elif not isinstance(P, str) and np.ndim(P) == 1:
            assert self.rows[0] == self.rows[1], (
                'diagonal prior mask requires equal-sized modalities')
            self._p_diag_mask = np.asarray(P, np.float32)
            self.P = None
        else:
            self.P = jnp.asarray(P, dtype=jnp.float32)
        from ..ops.lowrank import LowRankF
        self._f_lowrank = None
        if self._f_zeros:
            self.F = None
        elif isinstance(F, LowRankF):
            # Landmark correspondence: F = U V^T stays factorized; batch
            # subsets are two small matmuls (solvers/landmark.py)
            assert F.shape == tuple(self.rows), (
                f'low-rank F shape {F.shape} != dataset rows '
                f'{tuple(self.rows)}')
            self._f_lowrank = F
            self.F = None
        elif is_sparse_input(F):
            self._f_sparse = as_sparse_rows(F, shape=tuple(self.rows))
            assert self._f_sparse.shape == tuple(self.rows), (
                f'sparse F shape {self._f_sparse.shape} != dataset rows '
                f'{tuple(self.rows)}')
            self.F = None
        else:
            self.F = jnp.asarray(F, dtype=jnp.float32)
        if mesh is not None:
            # The O(N^2) prior/correspondence matrices are the largest state
            # at scale — shard their rows across the mesh too.
            if self.P is not None and self.P.ndim == 2:
                self.P = _maybe_shard_rows(self.P, mesh)
            if self.F is not None and self.F.ndim == 2:
                self.F = _maybe_shard_rows(self.F, mesh)

        def _ell_device(sp):
            """ELL arrays uploaded once (row-sharded on a mesh); a (1,1)
            placeholder keeps the jitted operand tuple fixed-shape."""
            if sp is None:
                return (jnp.zeros((1, 1), jnp.int32),
                        jnp.zeros((1, 1), jnp.float32))
            cols, vals = jnp.asarray(sp.cols), jnp.asarray(sp.vals)
            if mesh is not None:
                cols = _maybe_shard_rows(cols, mesh)
                vals = _maybe_shard_rows(vals, mesh)
            return (cols, vals)

        self._p_ell = _ell_device(self._p_sparse)
        self._f_ell = _ell_device(self._f_sparse)
        from ..ops.lowrank import SparseLandmarkF
        self._f_lr_sparse = isinstance(self._f_lowrank, SparseLandmarkF)
        if self._f_lr_sparse:
            # k-sparse landmark factors: the dense (N, L) U/V never exist
            # (the 500k+ cell regime); batch rows re-mix on the fly.
            lr = self._f_lowrank
            arrs = [lr.ix, lr.wx, lr.iy, lr.wy]
            if mesh is not None:
                arrs = [_maybe_shard_rows(a, mesh) for a in arrs]
            self._f_lrs = (*arrs, jnp.asarray(lr.f_l))
            self._f_lr = (jnp.zeros((1, 1), jnp.float32),
                          jnp.zeros((1, 1), jnp.float32))
        elif self._f_lowrank is not None:
            u, v = self._f_lowrank.u, self._f_lowrank.v
            if mesh is not None:
                u = _maybe_shard_rows(u, mesh)
                v = _maybe_shard_rows(v, mesh)
            self._f_lr = (u, v)
        else:
            self._f_lr = (jnp.zeros((1, 1), jnp.float32),
                          jnp.zeros((1, 1), jnp.float32))
        if not self._f_lr_sparse:
            self._f_lrs = (jnp.zeros((1, 1), jnp.int32),
                           jnp.zeros((1, 1), jnp.float32),
                           jnp.zeros((1, 1), jnp.int32),
                           jnp.zeros((1, 1), jnp.float32),
                           jnp.zeros((1, 1), jnp.float32))
        # Row budget when final_corr must compress a low-rank F to sparse
        self._final_corr_top_k = int(config.f_top_k or 32)

        # Batch-size setup, from UnionCom via jamie.py:511-514
        self.batch_size = int(config.batch_size)
        self.len_dataloader = int(max(self.rows) / self.batch_size)
        if self.len_dataloader == 0:
            self.len_dataloader = 1
            self.batch_size = int(max(self.rows))

        # Sampling regime (jamie.py:517-534)
        if self._p_identity:
            self.sampling_method = 'diag'
            corr_pairs = None
        elif self._p_sparse is not None:
            sp = self._p_sparse
            if sp.nnz == 0:
                self.sampling_method = 'zeros'
                corr_pairs = None
            elif (self.rows[0] == self.rows[1] and sp.nnz == self.rows[0]
                  and sp.is_diagonal()
                  and np.allclose(sp.row_sums(), 1.0)):
                self.sampling_method = 'diag'
                corr_pairs = None
            else:
                self.sampling_method = 'hybrid'
                corr_pairs = sp.pairs()
        elif self._p_diag_mask is not None:
            mask = self._p_diag_mask
            # 'diag' only for the exact identity prior, matching the dense
            # (P == eye exactly) and sparse (diagonal AND unit row sums)
            # forms — a uniformly-weighted 0.5 mask must pick 'hybrid' like
            # its dense np.diag(0.5s) equivalent, not fully-matched batches.
            if (mask == 1).all():
                self.sampling_method = 'diag'
                corr_pairs = None
            elif (mask > 0).any():
                self.sampling_method = 'hybrid'
                nz = np.flatnonzero(mask > 0)
                corr_pairs = np.stack([nz, nz], axis=1)
            else:
                self.sampling_method = 'zeros'
                corr_pairs = None
        else:
            P_np = np.asarray(P)
            self.sampling_method = detect_sampling_method(P_np)
            corr_pairs = None
            if self.sampling_method == 'hybrid':
                corr_pairs = np.argwhere(P_np > 0)
        self.sampler = make_sampler(
            self.sampling_method, self.rows, self.batch_size,
            corr_pairs=corr_pairs, true_ratio=config.true_ratio)
        # Per-epoch vectorized index generation (one permutation/epoch
        # instead of a full N-element sort per step — see make_epoch_sampler)
        self.epoch_sampler = make_epoch_sampler(
            self.sampling_method, self.rows, self.batch_size,
            self.len_dataloader, corr_pairs=corr_pairs,
            true_ratio=config.true_ratio)
        self._pairs = (jnp.asarray(corr_pairs, jnp.int32)
                       if corr_pairs is not None
                       else jnp.zeros((1, 2), jnp.int32))

        self.pf_ratio = 1.0 if config.PF_Ratio is None else float(config.PF_Ratio)
        if config.loss_weights is not None:
            assert len(config.loss_weights) == len(LOSS_NAMES), (
                f'There are {len(LOSS_NAMES)} losses and '
                f'{len(config.loss_weights)} weights')
            self.loss_weights = jnp.asarray(config.loss_weights, jnp.float32)
        else:
            self.loss_weights = jnp.ones((len(LOSS_NAMES),), jnp.float32)

        # Grad-clip 1.0 then Adam, matching torch clip->step (jamie.py:736-742).
        # Unsharded fits flatten the chain over one concatenated parameter
        # vector: the elementwise clip/moment/update tail runs as a few big
        # fused kernels instead of ~26 per-tensor ones — measured +4.3%
        # step throughput at the bench config (1.236M -> 1.289M
        # cell-samples/s; the hand-folded single-pass clip+Adam in
        # ops/ab_archive.clip_adam measured NO win over the plain chain — XLA
        # already fuses the intermediate — so flatten is the one that
        # ships). Updates are bit-identical either way. On a mesh the
        # flatten would gather TP-sharded kernels into one replicated
        # vector, so sharded fits keep the per-tensor chain.
        chain = optax.chain(
            optax.clip_by_global_norm(1.0),
            optax.adam(config.model_lr, b1=0.9, b2=0.999, eps=1e-8),
        )
        self.tx = chain if mesh is not None else optax.flatten(chain)

        if mesh is not None:
            self._batch_sharding = NamedSharding(mesh, PartitionSpec('data', None))
        else:
            self._batch_sharding = None
        self._compute_dtype = cdtype
        self._chunk_fn_cache: Dict[int, Any] = {}
        self._p_diag_mask_dev = None   # lazy one-time device upload

    # ------------------------------------------------------------------ init
    @contextlib.contextmanager
    def _prng_scope(self):
        """Apply config.prng_impl for the duration of a call, then restore.

        jax's default PRNG impl is a process-global config and raw PRNGKey
        arrays are re-interpreted under whatever impl is current at use
        time — so the impl must be identical whenever this trainer's keys
        are created or consumed (init_state and fit both enter this scope),
        and must NOT leak into later, unrelated trainers constructed with
        prng_impl=None (the round-2 behavior this replaces)."""
        impl = self.config.prng_impl
        if impl is None:
            yield
            return
        prev = jax.config.jax_default_prng_impl
        jax.config.update('jax_default_prng_impl', impl)
        try:
            yield
        finally:
            jax.config.update('jax_default_prng_impl', prev)

    def init_state(self, seed: Optional[int] = None) -> TrainState:
        with self._prng_scope():
            return self._init_state(seed)

    def _init_state(self, seed: Optional[int] = None) -> TrainState:
        seed = self.config.manual_seed if seed is None else seed
        root = jax.random.PRNGKey(seed)
        k_init, k_drop, k_rep, k_run = jax.random.split(root, 4)
        dummy = [jnp.zeros((2, c), jnp.float32) for c in self.cols]
        dummy_corr = jnp.eye(2, dtype=jnp.float32)
        # jit the init: run eagerly it dispatches ~100 one-op executables
        # (param uniforms, batchnorm, the init forward), each a full
        # remote-compile round-trip on tunneled backends
        variables = jax.jit(self.model.init, static_argnames='train')(
            {'params': k_init, 'dropout': k_drop, 'reparam': k_rep},
            dummy, dummy_corr, train=True)
        params = variables['params']
        batch_stats = variables.get('batch_stats', {})
        opt_state = self.tx.init(params)
        if self.mesh is not None:
            from ..core.mesh import model_axis_size, shard_params_tree
            if model_axis_size(self.mesh) > 1:
                # Tensor parallelism for wide modalities: the encoder/decoder
                # kernels (F x 2F at no-pca feature counts) shard over the
                # 'model' axis; Adam moments and batchnorm stats follow the
                # same layout so per-chip parameter memory is O(F^2/devices).
                wt = int(self.config.tp_wide_threshold)
                params = shard_params_tree(params, self.mesh, wt)
                batch_stats = shard_params_tree(batch_stats, self.mesh, wt)
                opt_state = shard_params_tree(opt_state, self.mesh, wt)
        return TrainState(
            params=params,
            batch_stats=batch_stats,
            opt_state=opt_state,
            rng=k_run,
            epoch=jnp.asarray(0, jnp.int32),
            best_running_loss=jnp.asarray(np.inf, jnp.float32),
            streak=jnp.asarray(0, jnp.int32),
            stopped=jnp.asarray(False, jnp.bool_),
        )

    # ----------------------------------------------------------- batch step
    def _constrain(self, x):
        if self._batch_sharding is not None:
            return jax.lax.with_sharding_constraint(x, self._batch_sharding)
        return x

    def _operands(self):
        """Device operands threaded through the jitted chunk fn as ARGUMENTS.
        Closing over device arrays would bake them into the executable as
        constants — defeating the compilation cache across datasets and
        forcing device->host constant fetches at lowering time."""
        dummy = jnp.zeros((1, 1), jnp.float32)
        if self._p_diag_mask_dev is None:
            # Upload the (N,) mask once — jnp.asarray of a host np array
            # re-transfers on every chunk dispatch (100+ per fit).
            self._p_diag_mask_dev = (
                jnp.asarray(self._p_diag_mask)
                if self._p_diag_mask is not None
                else jnp.zeros((1,), jnp.float32))
        mask = self._p_diag_mask_dev

        return (self.data[0], self.data[1],
                dummy if self.P is None else self.P,
                dummy if self.F is None else self.F,
                self._pairs, mask, self._p_ell, self._f_ell, self._f_lr,
                self._f_lrs)

    def _batch_loss_and_grads(self, params, batch_stats, key, epoch_idx, ops,
                              idx0, idx1):
        from ..ops.sparse import sparse_gather_batch
        cfg = self.config
        data0, data1, P, F, pairs, mask, p_ell, f_ell, f_lr, f_lrs = ops
        k_d, k_r = jax.random.split(key)
        x0 = self._constrain(jnp.take(data0, idx0, axis=0))
        x1 = self._constrain(jnp.take(data1, idx1, axis=0))
        if self._p_identity:
            P_sub = (idx0[:, None] == idx1[None, :]).astype(jnp.float32)
        elif self._p_sparse is not None:
            P_sub = sparse_gather_batch(p_ell[0], p_ell[1], idx0, idx1)
        elif self._p_diag_mask is not None:
            P_sub = (mask[idx0][:, None]
                     * (idx0[:, None] == idx1[None, :]).astype(jnp.float32))
        else:
            P_sub = jnp.take(jnp.take(P, idx0, axis=0), idx1, axis=1)
        if self._f_zeros:
            F_sub = jnp.zeros((self.batch_size, self.batch_size), jnp.float32)
        elif self._f_lr_sparse:
            # k-sparse landmark factors: mix the row batch through F_L
            # ((B, k, L1) gather-einsum), scatter the column batch dense
            # (B, L1), one MXU matmul — O(N k) resident instead of O(N L)
            from ..ops.lowrank import _mix_rows, _scatter_rows
            u_b = _mix_rows(jnp.take(f_lrs[0], idx0, axis=0),
                            jnp.take(f_lrs[1], idx0, axis=0), f_lrs[4])
            v_b = _scatter_rows(jnp.take(f_lrs[2], idx1, axis=0),
                                jnp.take(f_lrs[3], idx1, axis=0),
                                f_lrs[4].shape[1])
            F_sub = u_b @ v_b.T
        elif self._f_lowrank is not None:
            # Low-rank landmark F: two (B, L) gathers + one MXU matmul
            F_sub = (jnp.take(f_lr[0], idx0, axis=0)
                     @ jnp.take(f_lr[1], idx1, axis=0).T)
        elif self._f_sparse is not None:
            F_sub = sparse_gather_batch(f_ell[0], f_ell[1], idx0, idx1)
        else:
            F_sub = jnp.take(jnp.take(F, idx0, axis=0), idx1, axis=1)
        Pn = row_normalize(P_sub)
        Fn = row_normalize(F_sub)
        corr = self._constrain(self.pf_ratio * Pn + (1 - self.pf_ratio) * Fn)

        def loss_fn(p):
            outputs, mutated = self.model.apply(
                {'params': p, 'batch_stats': batch_stats},
                [x0, x1], corr, train=True,
                rngs={'dropout': k_d, 'reparam': k_r},
                mutable=['batch_stats'])
            zs, combined, x_hat, mus, logvars = outputs
            kl = (32e-3
                  * kl_anneal(epoch_idx, cfg.min_epochs, cfg.epoch_DNN)
                  * kl_divergence(mus, logvars))
            rec = reconstruction_loss(x_hat, [x0, x1])
            cos = latent_consistency_loss(zs, combined, cfg.dist_method)
            fl = f_reconstruction_loss(combined[0], combined[1], Fn)
            vec = jnp.stack([kl, rec, cos, fl]) * self.loss_weights
            return jnp.sum(vec), (mutated['batch_stats'], vec)

        (loss, (new_bs, vec)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        return loss, vec, new_bs, grads

    # ----------------------------------------------------------- epoch body
    def _epoch_body(self, state: TrainState, epoch_idx, ops):
        cfg = self.config

        def run(state):
            new_rng, key_epoch, key_sample = jax.random.split(state.rng, 3)
            batch_keys = jax.random.split(key_epoch, self.len_dataloader)
            # One vectorized draw for the whole epoch (diag/zeros: one
            # permutation sliced into windows; hybrid: one (L, B) randint
            # batch) — the per-step N-element sort was ~2x the fwd/bwd work
            # at N~9k (RESULTS.md round 3)
            idx0_all, idx1_all = self.epoch_sampler(key_sample, ops[4])
            xs = (batch_keys, idx0_all, idx1_all)

            if cfg.batch_step:
                def batch_body(carry, x):
                    key, idx0, idx1 = x
                    params, bstats, opt = carry
                    loss, vec, bstats, grads = self._batch_loss_and_grads(
                        params, bstats, key, epoch_idx, ops, idx0, idx1)
                    updates, opt = self.tx.update(grads, opt, params)
                    params = optax.apply_updates(params, updates)
                    return (params, bstats, opt), (loss, vec)

                (params, bstats, opt), (batch_losses, vecs) = jax.lax.scan(
                    batch_body,
                    (state.params, state.batch_stats, state.opt_state),
                    xs)
            else:
                zero_grads = jax.tree.map(jnp.zeros_like, state.params)

                def batch_body(carry, x):
                    key, idx0, idx1 = x
                    params, bstats, acc = carry
                    loss, vec, bstats, grads = self._batch_loss_and_grads(
                        params, bstats, key, epoch_idx, ops, idx0, idx1)
                    acc = jax.tree.map(jnp.add, acc, grads)
                    return (params, bstats, acc), (loss, vec)

                (params, bstats, acc), (batch_losses, vecs) = jax.lax.scan(
                    batch_body,
                    (state.params, state.batch_stats, zero_grads),
                    xs)
                updates, opt = self.tx.update(acc, state.opt_state, params)
                params = optax.apply_updates(params, updates)

            epoch_loss = jnp.sum(batch_losses) / self.len_dataloader
            best_batch_loss = jnp.min(batch_losses)
            active = best_batch_loss if cfg.batch_step else epoch_loss

            # Early stopping bookkeeping (jamie.py:777-792)
            past_min = epoch_idx > cfg.min_epochs
            improved = (state.best_running_loss - active) > cfg.min_increment
            new_best = jnp.where(past_min & improved, active,
                                 state.best_running_loss)
            new_streak = jnp.where(
                past_min, jnp.where(improved, 0, state.streak + 1), state.streak)
            stop = past_min & (new_streak >= cfg.max_steps_without_increment) \
                & bool(cfg.use_early_stop)

            new_state = TrainState(
                params=params, batch_stats=bstats, opt_state=opt,
                rng=new_rng, epoch=epoch_idx + 1,
                best_running_loss=new_best, streak=new_streak, stopped=stop)
            # History records the last batch's weighted losses (jamie.py:752-761)
            return new_state, (epoch_loss, vecs[-1], stop,
                               jnp.asarray(True, jnp.bool_))

        def skip(state):
            nanvec = jnp.full((len(LOSS_NAMES),), jnp.nan, jnp.float32)
            return state, (jnp.asarray(jnp.nan, jnp.float32), nanvec,
                           jnp.asarray(True, jnp.bool_),
                           jnp.asarray(False, jnp.bool_))

        return jax.lax.cond(state.stopped, skip, run, state)

    def _chunk_fn(self, chunk: int):
        if chunk not in self._chunk_fn_cache:
            def body(state, data0, data1, P, F, pairs, mask, p_ell, f_ell,
                     f_lr, f_lrs):
                ops = (data0, data1, P, F, pairs, mask, p_ell, f_ell, f_lr,
                       f_lrs)
                epochs = state.epoch + jnp.arange(chunk, dtype=jnp.int32)
                return jax.lax.scan(
                    lambda st, ep: self._epoch_body(st, ep, ops),
                    state, epochs)
            # Donate the TrainState: params/Adam moments/batch stats update
            # in place, halving the optimizer's HBM traffic (the train
            # loop's dominant cost — RESULTS.md round-2 A/B). Callers never
            # reuse the donated state object; fit() reassigns it per chunk.
            jitted = jax.jit(body, donate_argnums=(0,))
            self._chunk_jit_cache = getattr(self, '_chunk_jit_cache', {})
            self._chunk_jit_cache[chunk] = jitted
            self._chunk_fn_cache[chunk] = \
                lambda state: jitted(state, *self._operands())
        return self._chunk_fn_cache[chunk]

    def _chunk_cost_analysis(self, chunk: int):
        """XLA cost analysis of the compiled epoch-chunk executable
        ({'flops': ..., ...}) — the auditable basis for the bench
        artifact's achieved-TFLOPs/MFU figure. Requires _chunk_fn(chunk)
        to have run at least once (the jit cache traces on first call);
        returns None when the backend exposes no cost analysis."""
        jitted = getattr(self, '_chunk_jit_cache', {}).get(chunk)
        if jitted is None:
            return None
        try:
            state = self.init_state()
            compiled = jitted.lower(state, *self._operands()).compile()
            ca = compiled.cost_analysis()
            if isinstance(ca, (list, tuple)):
                ca = ca[0] if ca else None
            return dict(ca) if ca else None
        except Exception:
            return None

    # ------------------------------------------------------------------ fit
    def fit(self, state: Optional[TrainState] = None,
            seed: Optional[int] = None,
            checkpoint_dir: Optional[str] = None,
            checkpoint_every: int = 0,
            metrics_path: Optional[str] = None) -> TrainState:
        """Run the training loop (optionally resuming from `state`).

        The TrainState buffers are DONATED to the jitted epoch chunks
        (params/Adam moments/batch stats update in place, halving optimizer
        HBM traffic); a caller-supplied `state` is therefore copied on entry
        so the caller's object — e.g. a restored checkpoint kept around for
        comparison — stays valid after fit returns.

        checkpoint_dir/checkpoint_every: periodic full-TrainState snapshots
        every N epochs (rounded to chunk boundaries) — the preemption-safety
        net the reference lacks (its only restartability is notebook-level
        model caching, SURVEY.md section 5). Also reachable from the public
        API via the JamieConfig fields of the same names.
        metrics_path: optional JSONL file; one structured record per chunk
        (epoch range, per-loss means, wall seconds, device HBM stats) —
        the structured replacement for the reference's print logging
        (jamie.py:763-775).
        """
        with self._prng_scope():
            return self._fit(state, seed, checkpoint_dir, checkpoint_every,
                             metrics_path)

    def _fit(self, state, seed, checkpoint_dir, checkpoint_every,
             metrics_path) -> TrainState:
        import json
        from ..core.timing import device_memory_stats
        cfg = self.config
        if state is None:
            state = self._init_state(seed)
        else:
            # Donation protection: keep the caller's buffers alive.
            state = jax.tree.map(
                lambda x: jnp.array(x) if hasattr(x, 'shape') else x, state)
        last_ckpt_epoch = int(state.epoch)
        metrics_f = open(metrics_path, 'a') if metrics_path else None
        chunk_t0 = time.perf_counter()

        self.loss_history: Dict[str, List[float]] = {n: [] for n in LOSS_NAMES}
        self.epoch_losses: List[float] = []
        self.epochs_run = 0
        t0 = time.perf_counter()

        # Pipelined dispatch: jitted chunk calls are async — the blocking
        # step is the host readback of each chunk's (tiny) loss outputs,
        # a full device->host round-trip (~0.35 s through the axon tunnel)
        # that would otherwise serialize with compute. Keep up to
        # `dispatch_lookahead` chunks in flight beyond the one being read
        # back: the device runs ahead while the host waits on the fetch.
        # Early stop stays exact — the chunk body's lax.cond makes every
        # post-stop epoch a device no-op (`valid` False, state unchanged),
        # so the <= lookahead extra chunks dispatched before the host sees
        # the stop flag contribute nothing. Mid-fit checkpointing forces
        # sequential dispatch: a snapshot needs the state AT the processed
        # boundary, and pipelining only ever holds the frontier state (the
        # intermediate ones are donated away).
        lookahead = (0 if (checkpoint_dir and checkpoint_every)
                     else max(int(cfg.dispatch_lookahead), 0))
        inflight: deque = deque()
        dispatched = int(state.epoch)
        stop_seen = False
        while inflight or (dispatched < cfg.epoch_DNN and not stop_seen):
            while (dispatched < cfg.epoch_DNN and not stop_seen
                   and len(inflight) <= lookahead):
                chunk = min(cfg.epoch_chunk, cfg.epoch_DNN - dispatched)
                state, outs = self._chunk_fn(chunk)(state)
                inflight.append((dispatched, chunk, outs))
                dispatched += chunk
            epoch, chunk, (ep_losses, loss_mat, stops, ran) = \
                inflight.popleft()
            ep_losses = np.asarray(ep_losses)
            loss_mat = np.asarray(loss_mat)
            stops = np.asarray(stops)
            valid = np.asarray(ran)
            if stop_seen and not valid.any():
                # A chunk dispatched before the host saw the stop flag: every
                # epoch was a device no-op. Drop it — history, logging, and
                # the metrics JSONL stay identical to sequential dispatch.
                continue

            if cfg.record_loss:
                for j, name in enumerate(LOSS_NAMES):
                    self.loss_history[name].extend(loss_mat[valid, j].tolist())
            self.epoch_losses.extend(ep_losses[valid].tolist())
            self.epochs_run += int(valid.sum())
            if valid.any() and not np.isfinite(ep_losses[valid]).all():
                warnings.warn(
                    'Non-finite training loss encountered; if this persists '
                    'your lr is likely too high (reference guidance, '
                    'jamie/model.py:236-238).')

            for k in range(chunk):
                if not valid[k]:
                    break
                e = epoch + k
                if (e + 1) % cfg.log_debug == 0 and cfg.debug:
                    print(f'Epoch: {e + 1:d} - ' + '  '.join(
                        f'{LOSS_NAMES[j]}: {loss_mat[k, j]:.4f}'
                        for j in range(len(LOSS_NAMES))))
                if (e + 1) % cfg.log_DNN == 0:
                    print(f'epoch:[{e + 1:d}/{cfg.epoch_DNN}]: '
                          f'loss:{ep_losses[k]:4f}')
            epoch += chunk
            if metrics_f is not None:
                now = time.perf_counter()
                record = {
                    'epoch_start': epoch - chunk,
                    'epoch_end': epoch - chunk + int(valid.sum()),
                    'epoch_loss_mean': float(np.mean(ep_losses[valid]))
                    if valid.any() else None,
                    'losses': {
                        name: float(np.mean(loss_mat[valid, j]))
                        for j, name in enumerate(LOSS_NAMES)
                    } if valid.any() else {},
                    'seconds': round(now - chunk_t0, 4),
                    'memory': device_memory_stats(),
                }
                metrics_f.write(json.dumps(record) + '\n')
                metrics_f.flush()
                chunk_t0 = now
            if (checkpoint_dir and checkpoint_every
                    and epoch - last_ckpt_epoch >= checkpoint_every):
                self.save_fit_state(
                    f'{checkpoint_dir}/epoch_{epoch}', state)
                last_ckpt_epoch = epoch
            if bool(stops[-1]):
                stop_seen = True

        if metrics_f is not None:
            metrics_f.close()
        self.fit_seconds = time.perf_counter() - t0
        return state

    # ----------------------------------------------------------- inference
    def final_corr(self, max_dense_entries: int = 50_000_000):
        """Column-normalized correspondence for the full-set embed
        (jamie.py:795-797). Note the reference's returned embeddings are the
        pre-combine latents (model(...)[0], jamie.py:798) so this matrix
        never affects the output — kept for parity/testing.

        Never materializes N x N beyond `max_dense_entries`: sentinel and
        sparse P/F are combined in SparseRows form and returned sparse when
        the dense matrix would not fit the budget."""
        from ..ops.sparse import SparseRows
        n0, n1 = self.rows
        dense_ok = n0 * n1 <= max_dense_entries

        def p_sparse_form():
            if self._p_sparse is not None:
                return self._p_sparse
            if self._p_diag_mask is not None:
                nz = np.flatnonzero(self._p_diag_mask)
                return SparseRows.from_coo(
                    nz, nz, self._p_diag_mask[nz], (n0, n1))
            if self._p_identity:
                idx = np.arange(n0)
                return SparseRows.from_coo(
                    idx, idx, np.ones(n0, np.float32), (n0, n1))
            return None  # dense P

        def f_sparse_form():
            if self._f_sparse is not None:
                return self._f_sparse
            if self._f_zeros:
                return SparseRows.from_coo([], [], [], (n0, n1))
            if self._f_lowrank is not None and not dense_ok:
                # Column-normalize in factored form (a row scaling of V),
                # then keep each row's top correspondences — the dense
                # (N0, N1) product never exists
                return self._f_lowrank.col_normalized().top_k(
                    self._final_corr_top_k)
            return None  # dense F (or small low-rank, densified below)

        Psp, Fsp = p_sparse_form(), f_sparse_form()
        if Psp is not None and Fsp is not None and not dense_ok:
            # Fully sparse combination: scale each side's col-normalized
            # values and concatenate the slot tables.
            Pn, Fn = Psp.col_normalized(), Fsp.col_normalized()
            cols = np.concatenate([Pn.cols, Fn.cols], axis=1)
            vals = np.concatenate([self.pf_ratio * Pn.vals,
                                   (1 - self.pf_ratio) * Fn.vals], axis=1)
            return SparseRows(cols, vals, (n0, n1))
        # [:n0] drops any sharding pad rows (zero rows leave column sums —
        # and so col_normalize — unchanged)
        P = (jnp.asarray(Psp.to_dense()) if Psp is not None
             else self.P[:n0])
        if Fsp is not None:
            F = jnp.asarray(Fsp.to_dense())
        elif self._f_lowrank is not None:
            F = jnp.asarray(self._f_lowrank.to_dense())
        else:
            F = self.F[:n0]
        return self.pf_ratio * col_normalize(P) \
            + (1 - self.pf_ratio) * col_normalize(F)

    def final_embed(self, state: TrainState) -> List[np.ndarray]:
        """Eval-mode full-dataset embeddings per modality (jamie.py:794-799).

        The reference runs the full forward and keeps output[0] — the
        pre-combine latents, which do not depend on corr (eval-mode z = mu
        from refactor(encode(x))). Computing them via the mu heads directly
        is numerically identical and skips the N x N corr and the decoders."""
        variables = {'params': state.params, 'batch_stats': state.batch_stats}
        if not hasattr(self, '_embed_jit'):
            self._embed_jit = jax.jit(
                lambda v, x, i: self.model.apply(
                    v, x, i, train=False, method=type(self.model).embed_one),
                static_argnames='i')
        # [:rows[i]] drops the zero rows _maybe_shard_rows padded on
        return [np.asarray(self._embed_jit(variables, x, i),
                           dtype=np.float32)[:self.rows[i]]
                for i, x in enumerate(self.data)]

    # ------------------------------------------------ mid-training resume
    # The reference cannot resume a fit (its checkpoint is a whole-module
    # pickle without optimizer state, jamie.py:967-972). Here the complete
    # TrainState — params, batch stats, Adam moments, RNG, epoch counter,
    # early-stop bookkeeping — round-trips through orbax, so a preempted
    # atlas-scale run continues exactly where it stopped.
    def save_fit_state(self, path: str, state: TrainState) -> None:
        import os

        import orbax.checkpoint as ocp
        # orbax rejects relative paths — a relative checkpoint_dir would
        # crash the fit at the first periodic snapshot
        with ocp.StandardCheckpointer() as ckpt:
            ckpt.save(os.path.abspath(path), jax.tree.map(np.asarray, state),
                      force=True)

    def restore_fit_state(self, path: str) -> TrainState:
        import os

        import orbax.checkpoint as ocp
        template = jax.tree.map(np.asarray, self.init_state())
        with ocp.StandardCheckpointer() as ckpt:
            restored = ckpt.restore(os.path.abspath(path), template)
        return jax.tree.map(jnp.asarray, restored)
