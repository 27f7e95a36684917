"""Prime–dual correspondence solver (the F-estimator).

Reference parity: `JAMIE.Prime_Dual` (jamie/jamie.py:314-414) — UnionCom-
style prime–dual iteration with hand-rolled Adam moments estimating the
cross-dataset matching matrix F from two intra-dataset distance matrices:
nonnegativity projection, slack variable S, dual variables Mu/Lambda, and an
adaptive scale `a = tr(Kx F Ky F^T) / tr(Kx Kx)` updated after `delay`
iterations.

This is hot loop #1 of the whole pipeline (60-90% of reference wall time at
N >= 3.5k cells, SURVEY.md section 6). TPU-first rewrite:

- the entire epoch_pd loop runs on device inside one jitted `lax.fori_loop`
  per log chunk; the host only sees (err, alpha) telemetry at log_pd points;
- of the reference's eight N x N matmuls per iteration, four are broadcasts
  in disguise (products with all-ones matrices/vectors, jamie.py:360-371)
  and are computed as row/col sums; the adaptive-`a` trace
  (jamie.py:399-401) reuses the F@Ky product carried into the next
  iteration, so one iteration costs exactly 4 MXU matmuls:
      inner = F^T (F Ky);  FKy inner;  F'Ky;  Kx (F'Ky)
- matmul precision is configurable ('default' rides the MXU in bf16x3 / f32
  accumulation; 'highest' for strict parity checks).
"""

from __future__ import annotations

import warnings
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

_PRECISIONS = {
    'default': None,
    'high': jax.lax.Precision.HIGH,
    'highest': jax.lax.Precision.HIGHEST,
    'float32': jax.lax.Precision.HIGHEST,
    'bfloat16': jax.lax.Precision.DEFAULT,
}


@jax.jit
def _to_f32_jit(x):
    return x.astype(jnp.float32)


def _mm(a, b, precision):
    if precision is None:
        # MXU-native: bf16 inputs, f32 accumulation — explicit cast so the
        # fast path doesn't depend on the ambient default_matmul_precision
        return jnp.matmul(a.astype(jnp.bfloat16), b.astype(jnp.bfloat16),
                          preferred_element_type=jnp.float32)
    return jnp.matmul(a, b, precision=precision)


@partial(jax.jit, static_argnames=('n_iters', 'rho', 'epsilon', 'delay',
                                   'precision_name', 'use_pallas',
                                   'rows_sharding', 'm_real',
                                   'state_dtype'))
def _run_chunk(carry, i0, Kx, Ky, tr_kx_kx, n_iters: int, rho: float,
               epsilon: float, delay: int, precision_name: str,
               use_pallas: bool = False, rows_sharding=None,
               m_real: int = 0, state_dtype: str = 'float32'):
    precision = _PRECISIONS[precision_name]
    # bf16 state (VERDICT round-4 item 6): the first moment and the carried
    # products (M1, FKy, KxFKy) persist in bf16 between iterations; every
    # step's arithmetic upcasts to f32 first, so only the STORAGE rounds.
    # Two closed negative results keep the rest f32:
    #  - F: its (1-eps) F + eps F_tmp update moves ~eps=1e-3 relative per
    #    step, below bf16's 2^-8 ulp -> a bf16 F freezes (corr 0.13 vs the
    #    f32 trajectory at 2k iters).
    #  - M2: both its decay (0.1%/step) and its increments ((1-pho2) g^2)
    #    are sub-ulp once M2 > ~0.26 g^2, so M2 freezes near steady state
    #    (corr 0.988, 11% fro error — an effective-lr bias, not noise).
    # M1 is increment-dominated ((1-pho1)=0.1 of g per step) and measures
    # IDENTICAL to the accepted default-vs-highest matmul noise (corr
    # 1.0000 / argmax 0.97); the products add ~5e-4 relative (corr 0.9995).
    # a / S / Mu / Lambda (O(m+n)) stay f32. Quality on real data:
    # examples/pd_state_bf16_ab.py.
    st_dt = jnp.bfloat16 if state_dtype == 'bfloat16' else jnp.float32
    big_store = lambda x: x.astype(st_dt)
    big_load = lambda x: x.astype(jnp.float32)
    pho1, pho2, dlt = 0.9, 0.999, 1e-7  # 10e-8 in the reference (jamie.py:349)

    if rows_sharding is not None:
        # Row-shard the five O(m*n) state arrays (and Kx) over the mesh via
        # GSPMD annotation. The caller pads m to a multiple of the axis size:
        # on non-divisible dims with_sharding_constraint silently REPLICATES
        # (measured on jax 0.9 — there is no internal padding), which would
        # turn the scale-out path into 8 full copies without a warning.
        # The small vectors S/Mu/Lambda stay replicated.
        shard = lambda x: jax.lax.with_sharding_constraint(x, rows_sharding)
        Kx = shard(Kx)
    else:
        shard = lambda x: x

    m_pad = carry[0].shape[0]
    if m_real and m_real < m_pad:
        # Zero-keep mask for the padded rows: the gradient's broadcast terms
        # (Mu, Lambda^T, rho-penalties) are nonzero on pad rows, so without
        # masking F's pad rows drift positive and contaminate the column
        # sums, S, Lambda, and the a-trace.
        pad_keep = (jax.lax.broadcasted_iota(jnp.int32, (m_pad, 1), 0)
                    < m_real).astype(jnp.float32)
    else:
        pad_keep = None

    def step(t, carry):
        F, S, Mu, Lambda, M1, M2, a, FKy, KxFKy = carry
        F, M2 = shard(F), shard(M2)
        M1, FKy, KxFKy = (shard(big_load(M1)), shard(big_load(FKy)),
                          shard(big_load(KxFKy)))
        i = i0 + t + 1  # 1-based Adam timestep (incremented pre-update, :374)

        inner = _mm(F.T, FKy, precision)            # (n, n)
        mm4 = _mm(FKy, inner, precision)            # (m, n)
        rowsum = jnp.sum(F, axis=1, keepdims=True)  # F @ Inn
        colsum = jnp.sum(F, axis=0, keepdims=True)  # Im^T F

        if use_pallas:
            from ..ops.ab_archive import fused_pd_grad_update
            F, M1, M2 = fused_pd_grad_update(
                F, M1, M2, mm4, KxFKy, Mu, Lambda, S, rowsum, colsum, a, i,
                epsilon, rho)
        else:
            grad = (
                4.0 * mm4
                - 4.0 * a * KxFKy
                + Mu                                 # Mu @ In^T broadcast
                + Lambda.T                           # Im @ Lambda^T broadcast
                + rho * (rowsum + colsum + (S - 2.0).T)
            )
            M1 = pho1 * M1 + (1 - pho1) * grad
            M2 = pho2 * M2 + (1 - pho2) * grad * grad
            i_f = i.astype(jnp.float32)
            hat1 = M1 / (1 - jnp.power(pho1, i_f))
            hat2 = M2 / (1 - jnp.power(pho2, i_f))
            g = hat1 / (jnp.sqrt(hat2) + dlt)
            F_tmp = jnp.maximum(F - g, 0.0)
            F = (1 - epsilon) * F + epsilon * F_tmp
        if pad_keep is not None:
            F = F * pad_keep

        col_sum = jnp.sum(F, axis=0)[:, None]        # F^T @ Im
        grad_s = Lambda + rho * (col_sum - 1.0 + S)
        S = (1 - epsilon) * S + epsilon * jnp.maximum(S - grad_s, 0.0)
        Mu = Mu + epsilon * (jnp.sum(F, axis=1, keepdims=True) - 1.0)
        Lambda = Lambda + epsilon * (col_sum - 1.0 + S)

        # Refresh carried products with the updated F; they serve both the
        # adaptive-a trace below and the next iteration's gradient.
        FKy = _mm(F, Ky, precision)
        KxFKy = _mm(Kx, FKy, precision)
        # tr(Kx (F Ky) F^T) = sum(Kx @ (F Ky) * F)
        a_new = jnp.sum(KxFKy * F) / tr_kx_kx
        a = jnp.where(i >= delay, a_new, a)
        return (F, S, Mu, Lambda, big_store(M1), M2,
                a, big_store(FKy), big_store(KxFKy))

    return jax.lax.fori_loop(0, n_iters, step, carry)


def prime_dual(
    Kx: np.ndarray,
    Ky: np.ndarray,
    dx: int,
    dy: int,
    epoch_pd: int = 2000,
    rho: float = 10.0,
    epsilon: float = 0.001,
    delay: int = 0,
    log_pd: int = 500,
    verbose: bool = True,
    precision: str = 'default',
    use_pallas: bool = None,
    mesh=None,
    state_dtype: str = 'float32',
) -> np.ndarray:
    """Estimate the (m, n) correspondence matrix F.

    Kx, Ky: intra-dataset distance matrices; dx, dy: raw feature dims used
    for the initial scale a = sqrt(dy/dx) (jamie.py:335).

    mesh: optional jax.sharding.Mesh with a 'data' axis. Rows of the F state
    (and Kx) shard over it so the O(N^2) state splits across chips; GSPMD
    inserts the all-gathers/psums for the cross-shard contractions. This is
    the scale-out path for cell counts whose N^2 state exceeds one chip's
    HBM — the reference simply ate the memory on host (31.9 GB at 9.2k
    cells, SURVEY.md section 6).

    state_dtype: 'bfloat16' persists the first moment + carried products
    (M1, FKy, KxFKy) and the K operands in bf16 between iterations —
    per-step arithmetic stays f32; F and M2 stay f32 (their updates are
    below bf16 ulp — closed negative results in _run_chunk). 28 -> 18
    bytes per N^2 entry = 1.56x the one-chip dense-N entry ceiling.
    Quality A/B: examples/pd_state_bf16_ab.py.
    """
    if Kx.shape == (1, 1) and Ky.shape == (1, 1):
        warnings.warn('1x1 distance matrix, escaping...')
        return np.ones((1, 1), np.float32)

    N = int(max(Kx.shape[0], Ky.shape[0]))
    m, n = int(Kx.shape[0]), int(Ky.shape[0])

    rows_sharding = None
    m_pad = m
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P
        rows_sharding = NamedSharding(mesh, P('data', None))
        n_dev = int(mesh.shape.get('data', 1))
        # Explicit zero-padding of the sharded (row) dim (same GSPMD
        # rationale as core.mesh.pad_rows_to_axis; here the pad happens
        # INSIDE the jitted prep and on both dims of the square Kx), and
        # the pad rows are masked out of F every iteration in step().
        m_pad = -(-m // n_dev) * n_dev

    # One jitted prep: normalization, padding, trace, and all carry zeros —
    # materialized SHARDED when a mesh is given, so the five O(m*n) state
    # arrays never exist whole on one chip. Eagerly these are ~10 one-op
    # dispatches, each a remote-compile round-trip on tunneled backends.
    # bf16 state halves every O(N^2) buffer; the K operands only join when
    # the matmul path is the bf16 MXU default anyway ('highest'-precision
    # parity checks keep f32 operands).
    st_dt = (jnp.bfloat16 if state_dtype == 'bfloat16' else jnp.float32)
    k_dt = st_dt if precision == 'default' else jnp.float32

    @partial(jax.jit, static_argnames=('m_pad', 'n', 'N'))
    def _prep(Kx, Ky, a0, m_pad, n, N):
        shard = ((lambda x: jax.lax.with_sharding_constraint(x, rows_sharding))
                 if rows_sharding is not None else (lambda x: x))
        Kx = Kx.astype(jnp.float32) / N
        Ky = Ky.astype(jnp.float32) / N
        tr = jnp.sum(Kx * Kx.T)
        dm = m_pad - Kx.shape[0]
        if dm:
            Kx = jnp.pad(Kx, ((0, dm), (0, dm)))
        Kx = shard(Kx.astype(k_dt))
        Ky = Ky.astype(k_dt)
        zeros_mn = lambda dt=st_dt: shard(jnp.zeros((m_pad, n), dt))
        carry = (
            zeros_mn(jnp.float32),                # F (f32 ALWAYS — above)
            jnp.zeros((n, 1), jnp.float32),       # S
            jnp.zeros((m_pad, 1), jnp.float32),   # Mu
            jnp.zeros((n, 1), jnp.float32),       # Lambda
            zeros_mn(),                           # first moment
            zeros_mn(jnp.float32),                # second moment (f32 ALWAYS)
            a0.astype(jnp.float32),               # a
            zeros_mn(),                           # FKy
            zeros_mn(),                           # Kx FKy
        )
        return Kx, Ky, tr, carry

    # jnp.asarray keeps already-device-resident distance matrices in place
    # (the estimator hands them over without a host round-trip)
    Kx, Ky, tr_kx_kx, carry = _prep(
        jnp.asarray(Kx), jnp.asarray(Ky),
        jnp.asarray(np.sqrt(dy / dx)), m_pad, n, N)

    if use_pallas is None:
        # Measured on the v5e (N=4096, round 2): XLA's own fusion of the
        # elementwise tail runs the full iteration at 82 effective TFLOPs
        # vs 65 with the hand-written pallas update — the pallas kernel
        # breaks XLA's ability to fuse the tail into the surrounding
        # matmul epilogues. Keep it available for A/B but default off.
        use_pallas = False
    if mesh is not None:
        # GSPMD cannot auto-partition a pallas_call; the sharded path keeps
        # the XLA elementwise chain (fused by XLA per shard anyway).
        use_pallas = False

    i = 0
    log_every = max(int(log_pd), 1)
    # Cap the WORK per dispatched program, independent of log_pd: a single
    # program that runs for minutes gets killed by remote-execution
    # transports (the axon tunnel kills ~100 s programs with "TPU worker
    # process crashed" — reproduced at N=9190 x 2000 iterations). ~3e15
    # bf16 FLOPs ≈ 20-30 s on a v5e; large-N solves split into several
    # programs with no readback between them (only log_every boundaries
    # fetch), so the cap costs nothing when it does not trigger.
    flops_per_iter = 8.0 * m_pad * n * max(m_pad, n)
    max_chunk = max(int(3e15 / max(flops_per_iter, 1.0)), 1)
    while i < epoch_pd:
        # Align chunks to log_every boundaries: a bare min(log_every,
        # max_chunk) advance would step i past every multiple of log_every
        # whenever max_chunk < log_every (large N), silently killing the
        # reference-parity progress output below.
        chunk = min(log_every - i % log_every, epoch_pd - i, max_chunk)
        carry = _run_chunk(carry, jnp.asarray(i, jnp.int32), Kx, Ky,
                           tr_kx_kx, chunk, float(rho), float(epsilon),
                           int(delay), precision, bool(use_pallas),
                           rows_sharding, m if m_pad > m else 0,
                           state_dtype)
        i += chunk
        if verbose and i % log_every == 0:
            F, _, _, _, _, _, a, FKy, _ = carry
            norm2 = jnp.linalg.norm(a * Kx - FKy @ F.T)
            print('epoch:[{:d}/{:d}] err:{:.4f} alpha:{:.4f}'.format(
                i, epoch_pd, float(norm2), float(a)))

    # Device array out: the trainer consumes F as a jitted operand, so a
    # host round-trip of the N x N matrix (338 MB at 9k cells) is pure
    # transfer waste; np consumers fetch transparently via __array__.
    F = carry[0]
    if F.dtype != jnp.float32:
        F = _to_f32_jit(F)   # consumers (trainer operands, np) expect f32
    if m_pad > m:
        F = F[:m]  # drop the sharding pad rows (they are exactly zero)
    return F
