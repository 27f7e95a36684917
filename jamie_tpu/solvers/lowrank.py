"""Experimental low-rank correspondence estimator.

Reference parity: `JAMIE.com_corr` (jamie/jamie.py:252-312) — a WIP low-rank
factorization alternative (Tx, Ty, F optimized by RMSprop with dropout-style
masking, then top-k binarization). The reference itself warns it "does not
produce reliable results" (jamie.py:242-246); it is kept for API parity.

TPU rewrite: both optimization phases run as jitted lax.fori_loops with optax
RMSprop; masks come from jax PRNG.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import optax


@partial(jax.jit, static_argnames=('epochs', 'dim', 'keep_prob'))
def _cluster_phase(Kx, Ky, key, epochs: int, dim: int, keep_prob: float):
    n, m = Kx.shape[0], Ky.shape[0]
    k_tx, k_ty, k_loop = jax.random.split(key, 3)
    Tx = jax.random.uniform(k_tx, (dim, n))
    Ty = jax.random.uniform(k_ty, (dim, m))
    tx_opt = optax.rmsprop(0.01)
    state = tx_opt.init((Tx, Ty))

    def loss_fn(params, kx_mask, ky_mask):
        Tx, Ty = params
        tx = Tx * kx_mask[None, :]
        ty = Ty * ky_mask[None, :]
        diff = tx @ Kx @ tx.T - ty @ Ky @ ty.T
        return jnp.sum(jnp.square(diff))

    def step(i, carry):
        params, state = carry
        k = jax.random.fold_in(k_loop, i)
        k1, k2 = jax.random.split(k)
        mx = (jax.random.uniform(k1, (n,)) > (1 - keep_prob)).astype(jnp.float32)
        my = (jax.random.uniform(k2, (m,)) > (1 - keep_prob)).astype(jnp.float32)
        grads = jax.grad(loss_fn)(params, mx, my)
        updates, state = tx_opt.update(grads, state, params)
        return optax.apply_updates(params, updates), state

    (Tx, Ty), _ = jax.lax.fori_loop(0, epochs, step, ((Tx, Ty), state))
    return Tx, Ty


@partial(jax.jit, static_argnames=('epochs', 'dim'))
def _cast_phase(Kx, Ky, Tx, Ty, key, epochs: int, dim: int):
    k_a, k_f = jax.random.split(key)
    a = jax.random.uniform(k_a, (1,))
    F = jax.random.uniform(k_f, (dim, dim))
    tx_opt = optax.rmsprop(0.1)
    state = tx_opt.init((a, F))

    def loss_fn(params):
        a, F = params
        Fc = Tx.T @ F @ Ty
        return jnp.sum(jnp.square(a * Kx - Fc @ Ky @ Fc.T))

    def step(i, carry):
        params, state = carry
        grads = jax.grad(loss_fn)(params)
        updates, state = tx_opt.update(grads, state, params)
        return optax.apply_updates(params, updates), state

    (a, F), _ = jax.lax.fori_loop(0, epochs, step, ((a, F), state))
    return Tx.T @ F @ Ty


def lowrank_corr(Kx: np.ndarray, Ky: np.ndarray, dim: int = 20,
                 keep_prob: float = 0.35, epochs: int = 10001,
                 topk: int = 5, seed: int = 0) -> np.ndarray:
    Kx = jnp.asarray(np.asarray(Kx), jnp.float32)
    Ky = jnp.asarray(np.asarray(Ky), jnp.float32)
    n, m = Kx.shape[0], Ky.shape[0]
    key = jax.random.PRNGKey(seed)
    k1, k2 = jax.random.split(key)
    print('Clustering')
    Tx, Ty = _cluster_phase(Kx, Ky, k1, epochs, dim, keep_prob)
    print('Casting')
    corr = _cast_phase(Kx, Ky, Tx, Ty, k2, epochs, dim)
    corr = np.asarray(corr)
    # top-k binarization per row (jamie.py:308-312, intent: mark the k most
    # corresponding columns of each row)
    out = np.zeros((n, m), np.float32)
    idx = np.argsort(-corr, axis=1)[:, :topk]
    np.put_along_axis(out, idx, 1.0, axis=1)
    return out
