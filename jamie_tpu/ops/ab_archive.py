"""A/B archive: hand-written kernels that LOST to XLA's fused output.

NONE of this module is on any production path. Every entry here was built,
measured on the real v5e against the plain-XLA equivalent, and kept ONLY so
the negative result stays reproducible (VERDICT round-3 "what's weak" item 5
asked for exactly this consolidation). The production code paths are:
`solvers/prime_dual.py` (plain XLA tail), `train/trainer.py` (optax chain),
`ops/distances.py` (jnp Gram matmul). Committed A/B numbers (RESULTS.md):

1. `fused_pd_update` / `fused_pd_grad_update` — Pallas prime-dual
   iteration tail (Adam moments + projection + damped F update, optionally
   with gradient assembly fused in; reference jamie/jamie.py:375-384).
   Measured 65 eff. TFLOPs at N=8981 vs 82 for the XLA tail it replaces —
   XLA already fuses the whole elementwise chain into the second matmul's
   epilogue, and the Pallas version forces an extra HBM round-trip at the
   kernel boundary. Reachable via `Prime_Dual(..., use_pallas=True)`;
   default False.

2. `clip_adam` — global-norm clip folded into a single-pass Adam
   (semantically optax.chain(clip_by_global_norm(1), adam) up to float
   reassociation). Measured +-0% vs the chained optax version at the bench
   config: the train step is 0.41 ms and XLA's fusion already eliminates
   the intermediate scaled-gradient tree. A/B harness:
   examples/train_step_bench.py ('fused' variant).

3. `pairwise_sq_euclidean_pallas` — tiled ||x||^2 + ||y||^2 - 2 x y^T with
   the epilogue fused into the matmul's final K-step. The plain jnp Gram
   path in ops/distances.py compiles to the same fusion; no measured win.

Closed by arithmetic, not just measurement (CLAUDE.md "remaining
candidates"): the bench model is ~4.3M params, so even a ONE-pass fused
optimizer moves 7 trees x 17.2 MB = 120 MB = 0.147 ms at the v5e's 819
GB/s, and XLA's fused tail already measures ~0.11 ms — there is no
headroom for a hand kernel at these shapes.

Kernels run compiled on TPU and fall back to `interpret=True` elsewhere
(CPU tests exercise identical code paths through the interpreter).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _interpret() -> bool:
    return jax.default_backend() != 'tpu'


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


# ---------------------------------------------------------------------------
# 1. Fused prime-dual Adam/projection update
# ---------------------------------------------------------------------------
def _pd_update_kernel(scalars_ref, f_ref, m1_ref, m2_ref, g_ref,
                      f_out, m1_out, m2_out):
    # scalars: [bias1, bias2, epsilon] with bias_k = 1 - pho_k^i
    bias1 = scalars_ref[0]
    bias2 = scalars_ref[1]
    eps = scalars_ref[2]
    pho1, pho2, delta = 0.9, 0.999, 1e-7

    grad = g_ref[...]
    m1 = pho1 * m1_ref[...] + (1 - pho1) * grad
    m2 = pho2 * m2_ref[...] + (1 - pho2) * grad * grad
    step = (m1 / bias1) / (jnp.sqrt(m2 / bias2) + delta)
    f = f_ref[...]
    f_tmp = jnp.maximum(f - step, 0.0)
    f_out[...] = (1 - eps) * f + eps * f_tmp
    m1_out[...] = m1
    m2_out[...] = m2


def _pd_grad_update_kernel(scalars_ref, f_ref, m1_ref, m2_ref, mm4_ref,
                           kxfky_ref, rowvec_ref, colvec_ref,
                           f_out, m1_out, m2_out):
    """Gradient assembly + Adam + projection in one pass.

    grad = 4*mm4 - 4a*KxFKy + rowvec + colvec, where the caller pre-folds
    the cheap vector terms: rowvec = Mu + rho*rowsum(F) (m,1) and
    colvec = Lambda^T + rho*(colsum(F) + (S-2)^T) (1,n). Fusing here means
    the (m, n) gradient never round-trips HBM.
    """
    bias1 = scalars_ref[0]
    bias2 = scalars_ref[1]
    eps = scalars_ref[2]
    a = scalars_ref[3]
    pho1, pho2, delta = 0.9, 0.999, 1e-7

    grad = (4.0 * mm4_ref[...] - 4.0 * a * kxfky_ref[...]
            + rowvec_ref[...] + colvec_ref[...])
    m1 = pho1 * m1_ref[...] + (1 - pho1) * grad
    m2 = pho2 * m2_ref[...] + (1 - pho2) * grad * grad
    step = (m1 / bias1) / (jnp.sqrt(m2 / bias2) + delta)
    f = f_ref[...]
    f_tmp = jnp.maximum(f - step, 0.0)
    f_out[...] = (1 - eps) * f + eps * f_tmp
    m1_out[...] = m1
    m2_out[...] = m2


@functools.partial(jax.jit, static_argnames=('epsilon', 'rho'))
def fused_pd_grad_update(F, M1, M2, mm4, KxFKy, Mu, Lambda, S, rowsum,
                         colsum, a, i, epsilon: float, rho: float):
    """One fused prime-dual iteration tail: gradient assembly (from the two
    matmul products), Adam moments, bias correction, normalized step,
    nonneg projection, damped F update. Returns (F', M1', M2')."""
    m, n = F.shape
    i_f = i.astype(jnp.float32)
    scalars = jnp.stack([
        1.0 - jnp.power(0.9, i_f),
        1.0 - jnp.power(0.999, i_f),
        jnp.asarray(epsilon, jnp.float32),
        a.astype(jnp.float32),
    ])
    rowvec = Mu + rho * rowsum                        # (m, 1)
    colvec = Lambda.T + rho * (colsum + (S - 2.0).T)  # (1, n)

    tile_m = min(_round_up(m, 8), 256)
    tile_n = min(_round_up(n, 128), 512)
    grid = (pl.cdiv(m, tile_m), pl.cdiv(n, tile_n))

    def tiled():
        return pl.BlockSpec((tile_m, tile_n), lambda a_, b_: (a_, b_),
                            memory_space=pltpu.VMEM)

    out_shape = jax.ShapeDtypeStruct((m, n), jnp.float32)
    return pl.pallas_call(
        _pd_grad_update_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # scalars
            tiled(), tiled(), tiled(), tiled(), tiled(),
            pl.BlockSpec((tile_m, 1), lambda a_, b_: (a_, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_n), lambda a_, b_: (0, b_),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(tiled(), tiled(), tiled()),
        out_shape=(out_shape, out_shape, out_shape),
        interpret=_interpret(),
    )(scalars, F, M1, M2, mm4, KxFKy, rowvec, colvec)


@functools.partial(jax.jit, static_argnames=('epsilon',))
def fused_pd_update(F, M1, M2, grad, i, epsilon: float):
    """One fused prime-dual state update; returns (F', M1', M2').

    i is the 1-based Adam timestep (traced scalar).
    """
    m, n = F.shape
    i_f = i.astype(jnp.float32)
    scalars = jnp.stack([
        1.0 - jnp.power(0.9, i_f),
        1.0 - jnp.power(0.999, i_f),
        jnp.asarray(epsilon, jnp.float32),
    ])

    # 7 live (tile_m, tile_n) f32 buffers, double-buffered by the pipeline:
    # keep tiles at 256x512 so total VMEM stays well under the 16 MB budget.
    tile_m = min(_round_up(m, 8), 256)
    tile_n = min(_round_up(n, 128), 512)
    grid = (pl.cdiv(m, tile_m), pl.cdiv(n, tile_n))

    def tiled(shape=None):
        return pl.BlockSpec(
            (tile_m, tile_n), lambda a, b: (a, b),
            memory_space=pltpu.VMEM)

    out_shape = jax.ShapeDtypeStruct((m, n), jnp.float32)
    return pl.pallas_call(
        _pd_update_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # scalars
            tiled(), tiled(), tiled(), tiled(),
        ],
        out_specs=(tiled(), tiled(), tiled()),
        out_shape=(out_shape, out_shape, out_shape),
        interpret=_interpret(),
    )(scalars, F, M1, M2, grad)


# ---------------------------------------------------------------------------
# 2. Tiled pairwise squared-euclidean distance
# ---------------------------------------------------------------------------
def _pairwise_kernel(x_ref, y_ref, xsq_ref, ysq_ref, out_ref, acc_ref):
    k = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(k == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    acc_ref[...] += jnp.dot(x_ref[...], y_ref[...].T,
                            preferred_element_type=jnp.float32)

    @pl.when(k == nk - 1)
    def _():
        d2 = xsq_ref[...] + ysq_ref[...] - 2.0 * acc_ref[...]
        out_ref[...] = jnp.maximum(d2, 0.0)


def pairwise_sq_euclidean_pallas(x, y=None, tile_m: int = 256,
                                 tile_n: int = 256, tile_k: int = 512):
    """N x M squared distances with the epilogue fused into the matmul."""
    self_dist = y is None
    y = x if y is None else y
    x = jnp.asarray(x, jnp.float32)
    y = jnp.asarray(y, jnp.float32)
    m, f = x.shape
    n = y.shape[0]

    # Pad every dim to tile multiples (zero rows produce distances that we
    # slice away; zero features contribute nothing).
    mp, np_, fp = _round_up(m, tile_m), _round_up(n, tile_n), _round_up(f, tile_k)
    xp = jnp.pad(x, ((0, mp - m), (0, fp - f)))
    yp = jnp.pad(y, ((0, np_ - n), (0, fp - f)))
    xsq = jnp.sum(xp * xp, axis=1, keepdims=True)        # (mp, 1)
    ysq = jnp.sum(yp * yp, axis=1, keepdims=True).T      # (1, np)

    grid = (mp // tile_m, np_ // tile_n, fp // tile_k)
    out = pl.pallas_call(
        _pairwise_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile_m, tile_k), lambda i, j, k: (i, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_n, tile_k), lambda i, j, k: (j, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_m, 1), lambda i, j, k: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_n), lambda i, j, k: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile_m, tile_n), lambda i, j, k: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((mp, np_), jnp.float32),
        scratch_shapes=[pltpu.VMEM((tile_m, tile_n), jnp.float32)],
        interpret=_interpret(),
    )(xp, yp, xsq, ysq)
    out = out[:m, :n]
    if self_dist:
        out = out * (1.0 - jnp.eye(m, dtype=out.dtype))
    return out


# ---------------------------------------------------------------------------
# 3. Folded clip+Adam (single-pass optimizer; A/B'd +-0% vs optax chain)
# ---------------------------------------------------------------------------
class ClipAdamState(NamedTuple):
    count: jax.Array
    mu: 'optax.Updates'
    nu: 'optax.Updates'


def clip_adam(learning_rate: float, b1: float = 0.9, b2: float = 0.999,
              eps: float = 1e-8,
              clip_norm: float = 1.0) -> 'optax.GradientTransformation':
    """Global-norm clip folded into a single-pass Adam update.

    Semantics match optax.chain(optax.clip_by_global_norm(clip_norm),
    optax.adam(learning_rate)) bit-for-bit up to float reassociation:
    the clip scale is a scalar folded directly into the moment updates,
    so the scaled-gradient intermediate tree is never materialized. A/B
    (examples/train_step_bench.py): no measurable win — XLA fuses the
    optax chain's intermediate away already. Archived, not production.
    """

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

        mu = jax.tree.map(lambda g, m_: b1 * m_ + (1 - b1) * (g * scale),
                          updates, state.mu)
        nu = jax.tree.map(
            lambda g, v: b2 * v + (1 - b2) * jnp.square(g * scale),
            updates, state.nu)
        upd = jax.tree.map(
            lambda m_, v: -learning_rate * (m_ / c1) / (jnp.sqrt(v / c2) + eps),
            mu, nu)
        return upd, ClipAdamState(count=count, mu=mu, nu=nu)

    return optax.GradientTransformation(init, update)
