"""Folded clip+Adam: one optimizer pass instead of optax's two.

The train step is elementwise/HBM-bound (RESULTS.md round 2: Adam+clip is
~0.11 ms of the 0.41 ms step at the bench config). optax's
chain(clip_by_global_norm, adam) is two gradient transformations: the clip
materializes a scaled-gradient tree that adam then re-reads. Inside one jit
XLA often fuses that intermediate away, but the fusion is at the compiler's
mercy across ~26 parameter tensors; this transformation removes it by
construction — the clip scale is a scalar folded directly into the moment
updates:

    mu  <- b1*mu + (1-b1) * (g*s)
    nu  <- b2*nu + (1-b2) * (g*s)^2
    upd <- -lr * mu_hat / (sqrt(nu_hat) + eps)

Semantics match optax.chain(optax.clip_by_global_norm(clip),
optax.adam(lr)) bit-for-bit up to float reassociation; the A/B against the
chained version lives in examples/train_step_bench.py (VERDICT round-2
item 4 asks for the honest comparison either way).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax


class ClipAdamState(NamedTuple):
    count: jax.Array
    mu: optax.Updates
    nu: optax.Updates


def clip_adam(learning_rate: float, b1: float = 0.9, b2: float = 0.999,
              eps: float = 1e-8,
              clip_norm: float = 1.0) -> optax.GradientTransformation:
    """Global-norm clip folded into a single-pass Adam update."""

    def init(params):
        return ClipAdamState(
            count=jnp.zeros((), jnp.int32),
            mu=jax.tree.map(jnp.zeros_like, params),
            nu=jax.tree.map(jnp.zeros_like, params))

    def update(updates, state, params=None):
        del params
        g_norm = optax.global_norm(updates)
        # identical guard to optax.clip_by_global_norm
        scale = jnp.minimum(1.0, clip_norm / jnp.maximum(g_norm, 1e-16))
        count = state.count + 1
        c1 = 1 - b1 ** count.astype(jnp.float32)
        c2 = 1 - b2 ** count.astype(jnp.float32)

        mu = jax.tree.map(lambda g, m: b1 * m + (1 - b1) * (g * scale),
                          updates, state.mu)
        nu = jax.tree.map(
            lambda g, v: b2 * v + (1 - b2) * jnp.square(g * scale),
            updates, state.nu)
        upd = jax.tree.map(
            lambda m, v: -learning_rate * (m / c1) / (jnp.sqrt(v / c2) + eps),
            mu, nu)
        return upd, ClipAdamState(count=count, mu=mu, nu=nu)

    return optax.GradientTransformation(init, update)
