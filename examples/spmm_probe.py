"""Chip probe: CSR block consumers — scatter decode vs scatter-free SpMM.

Round-4 probe (RESULTS.md) measured the on-chip sorted-scatter decode at
~9.2 M nnz/s (8.03M-nnz block: 873.6 ms) — per-element serialized on TPU —
while the decoded block's consumer matmul takes 4.5 ms. VERDICT round-4
item 1 asks for an SpMM formulation with >=3x throughput on the same
probe shape. Candidates:

  decode+mm   : DeviceCSR.rows (flat sorted scatter) then dense matmul
                (the round-4 baseline)
  spmm[t]     : DeviceCSR.matmul — windowed one-hot matmul SpMM
                (gather M rows by col + (span, w) @ (w, k) MXU products),
                swept over span_target t
  seg_sum     : gather M rows + jax.ops.segment_sum(indices_are_sorted)
  bcoo        : jax.experimental.sparse BCOO dot_general
  tmatmul     : X^T @ Q via the on-device CSC (argsort build cost reported
                separately) — the PCA projection pass
  row_sq      : per-row squared sums (cumsum-diff)

Run solo on the real chip:
  PYTHONPATH=/root/repo:/root/.axon_site python examples/spmm_probe.py
"""

import argparse
import time

import numpy as np
import scipy.sparse as sp


def timed(fn, reps=5):
    import jax
    out = fn()
    jax.block_until_ready(out)            # warmup + compile
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(fn())
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts)), out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--rows', type=int, default=13421)
    ap.add_argument('--feats', type=int, default=20000)
    ap.add_argument('--density', type=float, default=0.03)
    ap.add_argument('--k', type=int, default=522)
    ap.add_argument('--reps', type=int, default=5)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from jamie_tpu.core.residency import DeviceCSR

    rng = np.random.RandomState(0)
    print(f'building CSR block {args.rows} x {args.feats} '
          f'@ {args.density} ...', flush=True)
    X = sp.random(args.rows, args.feats, density=args.density,
                  format='csr', random_state=rng, dtype=np.float32)
    X.sort_indices()
    nnz = int(X.nnz)
    M = rng.randn(args.feats, args.k).astype(np.float32)
    Mdev = jnp.asarray(M)
    Q = rng.randn(args.rows, args.k).astype(np.float32)
    Qdev = jnp.asarray(Q)

    d = DeviceCSR(X)
    print(f'nnz={nnz} ({nnz / args.rows:.0f}/row), k={args.k}, '
          f'device={jax.devices()[0].platform}', flush=True)

    # reference for correctness (bf16-rounded operands)
    import ml_dtypes
    Xb = X.toarray().astype(ml_dtypes.bfloat16).astype(np.float32)
    Mb = M.astype(ml_dtypes.bfloat16).astype(np.float32)
    ref = Xb @ Mb

    def check(name, out):
        out = np.asarray(out)
        err = np.max(np.abs(out - ref)) / max(np.max(np.abs(ref)), 1e-9)
        print(f'  {name}: rel max err {err:.2e}')

    results = {}

    # --- baseline: scatter decode + matmul -------------------------------
    def decode_mm():
        return d.rows(0, args.rows) @ Mdev
    t, out = timed(decode_mm, args.reps)
    results['decode+mm'] = t
    print(f'decode+mm      : {t * 1e3:9.1f} ms  '
          f'({nnz / t / 1e6:8.1f} M nnz/s)', flush=True)
    check('decode+mm', out)

    # --- windowed one-hot SpMM, span_target sweep -------------------------
    for st in (32, 64, 128, 256):
        def spmm():
            return d._spmm(d._indptr_np, d.indptr, d.cols, d.vals,
                           Mdev, 0, args.rows, span_target=st)
        t, out = timed(spmm, args.reps)
        results[f'spmm[{st}]'] = t
        print(f'spmm[st={st:3d}] : {t * 1e3:9.1f} ms  '
              f'({nnz / t / 1e6:8.1f} M nnz/s)', flush=True)
        check(f'spmm[{st}]', out)

    # --- gather + segment_sum (sorted) ------------------------------------
    from functools import partial

    @partial(jax.jit, static_argnames=('r',))
    def seg(indptr, cols, vals, M, r):
        n_nz = cols.shape[0]
        rows = (jnp.searchsorted(indptr,
                                 jnp.arange(n_nz, dtype=jnp.int32),
                                 side='right').astype(jnp.int32) - 1)
        G = jnp.take(M, cols.astype(jnp.int32), axis=0) \
            * vals.astype(jnp.float32)[:, None]
        return jax.ops.segment_sum(G, rows, num_segments=r,
                                   indices_are_sorted=True)

    try:
        t, out = timed(lambda: seg(d.indptr, d.cols, d.vals, Mdev,
                                   r=args.rows), args.reps)
        results['seg_sum'] = t
        print(f'seg_sum        : {t * 1e3:9.1f} ms  '
              f'({nnz / t / 1e6:8.1f} M nnz/s)', flush=True)
        check('seg_sum', out)
    except Exception as e:     # OOM at (nnz, k) f32 is plausible
        print(f'seg_sum        : FAILED ({type(e).__name__}: {e})')

    # --- BCOO dot_general --------------------------------------------------
    try:
        from jax.experimental import sparse as jsparse
        coo = X.tocoo()
        bcoo = jsparse.BCOO(
            (jnp.asarray(coo.data),
             jnp.asarray(np.stack([coo.row, coo.col], axis=1))),
            shape=X.shape)

        @jax.jit
        def bc(b, M):
            return b @ M
        t, out = timed(lambda: bc(bcoo, Mdev), args.reps)
        results['bcoo'] = t
        print(f'bcoo           : {t * 1e3:9.1f} ms  '
              f'({nnz / t / 1e6:8.1f} M nnz/s)', flush=True)
        out = np.asarray(out)
        err = (np.max(np.abs(out - X.toarray() @ M))
               / max(np.max(np.abs(ref)), 1e-9))
        print(f'  bcoo: rel max err {err:.2e} (f32 vals)')
    except Exception as e:
        print(f'bcoo           : FAILED ({type(e).__name__}: {e})')

    # --- transposed product (PCA projection pass) --------------------------
    t0 = time.perf_counter()
    d._ensure_csc()
    print(f'csc build      : {(time.perf_counter() - t0) * 1e3:9.1f} ms '
          '(one-time per matrix; on-device argsort)', flush=True)
    t, out = timed(lambda: d.tmatmul(Qdev), args.reps)
    results['tmatmul'] = t
    print(f'tmatmul        : {t * 1e3:9.1f} ms  '
          f'({nnz / t / 1e6:8.1f} M nnz/s)', flush=True)
    reft = Xb.T @ Q.astype(ml_dtypes.bfloat16).astype(np.float32)
    err = (np.max(np.abs(np.asarray(out) - reft))
           / max(np.max(np.abs(reft)), 1e-9))
    print(f'  tmatmul: rel max err {err:.2e}')

    # --- row squared sums ---------------------------------------------------
    t, out = timed(lambda: d.row_sq_sums(), args.reps)
    print(f'row_sq         : {t * 1e3:9.1f} ms', flush=True)

    best = min((v, k) for k, v in results.items() if k != 'decode+mm')
    base = results['decode+mm']
    print(f'\nbest SpMM: {best[1]} at {best[0] * 1e3:.1f} ms = '
          f'{base / best[0]:.1f}x the scatter decode baseline '
          f'(target >=3x)', flush=True)


if __name__ == '__main__':
    main()
