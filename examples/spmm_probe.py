"""Chip probe: CSR block consumers — scatter decode vs the production
row-split ELL SpMM (DeviceCSR.matmul / tmatmul / row_sq_sums).

Round-4 probe (RESULTS.md) measured the on-chip sorted-scatter decode at
~9.2 M nnz/s (8.03M-nnz block: 873.6 ms) — per-element serialized on
TPU — while the decoded block's consumer matmul takes 4.5 ms. The round-5
formulation sweep (this file's history + examples/ell_probe.py) settled
the candidates:

  windowed one-hot matmul  ~9 M nnz/s  (span*w*k FLOP blowup)
  gather + segment_sum     ~8 M nnz/s  (TPU serializes scatter-add)
  BCOO dot_general         OOM at the probe shape ((nnz, k) transient)
  uniform ELL + einsum    156 M nnz/s  (batched row gather + dense reduce)

so production DeviceCSR.matmul is the row-split ELL (uniform width chosen
to minimize padded slots, long rows split across consecutive subrows,
partials combined by S masked row-gathers). This probe times the
production paths against the decode baseline on the atlas block shape.

Run solo on the real chip:
  PYTHONPATH=/root/repo:/root/.axon_site python examples/spmm_probe.py
  ... --skew lognormal   # deep-cell row-nnz skew
"""

import argparse
import time

import numpy as np
import scipy.sparse as sp

_RT = [0.0]     # measured scalar-fetch round-trip, subtracted from timings


def timed(fn, reps=5):
    """block_until_ready is a WEAK barrier through the axon tunnel (round-4
    probe evidence: identical decode timed 0.3 ms with block_until_ready
    vs 0.92 s with a forced scalar fetch) — force completion with a tiny
    readback per rep and subtract the measured round-trip cost."""
    # Force with a DEVICE-side reduce + scalar fetch: np.asarray(out)
    # would ship the whole output through the ~10-65 MB/s tunnel and
    # dominate the timing (a 28 MB output costs 0.4-2.8 s per rep).
    force = lambda o: float(o.sum()) if hasattr(o, 'sum') \
        else float(o[0].sum())
    out = fn()
    force(out)                                 # warmup + compile
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        force(fn())
        ts.append(time.perf_counter() - t0)
    return max(float(np.median(ts)) - _RT[0], 1e-9), out


def measure_rt(reps=7):
    import jax.numpy as jnp
    x = jnp.zeros((8,), jnp.float32)
    float(x.sum())                        # compile the sum executable
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(x.sum())
        ts.append(time.perf_counter() - t0)
    _RT[0] = float(np.median(ts))
    print(f'scalar-fetch round-trip: {_RT[0] * 1e3:.1f} ms '
          '(subtracted from every timing)', flush=True)


def lognormal_csr(rng, n, f, mean_nnz, sigma=0.9):
    raw = rng.lognormal(mean=0.0, sigma=sigma, size=n)
    per_row = np.minimum(np.maximum(
        (raw / raw.mean() * mean_nnz).astype(np.int64), 1), f)
    indptr = np.zeros(n + 1, np.int64)
    np.cumsum(per_row, out=indptr[1:])
    nnz = int(indptr[-1])
    cols = np.empty(nnz, np.int32)
    for i in range(n):
        cols[indptr[i]:indptr[i + 1]] = np.sort(
            rng.choice(f, int(per_row[i]), replace=False))
    return sp.csr_matrix((rng.randn(nnz).astype(np.float32), cols, indptr),
                         shape=(n, f))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--rows', type=int, default=13421)
    ap.add_argument('--feats', type=int, default=20000)
    ap.add_argument('--density', type=float, default=0.03)
    ap.add_argument('--k', type=int, default=522)
    ap.add_argument('--reps', type=int, default=5)
    ap.add_argument('--skew', choices=['uniform', 'lognormal'],
                    default='uniform')
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from jamie_tpu.core.residency import DeviceCSR

    rng = np.random.RandomState(0)
    print(f'building {args.skew} CSR block {args.rows} x {args.feats} '
          f'@ {args.density} ...', flush=True)
    if args.skew == 'uniform':
        X = sp.random(args.rows, args.feats, density=args.density,
                      format='csr', random_state=rng, dtype=np.float32)
        X.sort_indices()
    else:
        X = lognormal_csr(rng, args.rows, args.feats,
                          int(args.feats * args.density))
    nnz = int(X.nnz)
    row_nnz = np.diff(X.indptr)
    M = rng.randn(args.feats, args.k).astype(np.float32)
    Mdev = jnp.asarray(M)
    Q = rng.randn(args.rows, args.k).astype(np.float32)
    Qdev = jnp.asarray(Q)

    t0 = time.perf_counter()
    d = DeviceCSR(X)
    t_up = time.perf_counter() - t0
    slots = int(d._ell_start_np[-1]) * d.ell_w
    print(f'nnz={nnz} (row nnz mean={row_nnz.mean():.0f} '
          f'max={row_nnz.max()}), k={args.k}, '
          f'device={jax.devices()[0].platform}', flush=True)
    print(f'upload+ELL build: {t_up * 1e3:.1f} ms  w={d.ell_w}  '
          f'padding +{(slots / max(nnz, 1) - 1) * 100:.0f}%  '
          f'{d.nbytes / 1e6:.1f} MB on the link', flush=True)
    measure_rt()

    # reference for correctness (bf16-rounded operands at this scale)
    import ml_dtypes
    Xb = X.toarray().astype(ml_dtypes.bfloat16).astype(np.float32)
    Mb = M.astype(ml_dtypes.bfloat16).astype(np.float32)
    ref = Xb @ Mb

    def check(name, out, r=None):
        out = np.asarray(out)
        rr = ref if r is None else r
        err = np.max(np.abs(out - rr)) / max(np.max(np.abs(rr)), 1e-9)
        print(f'  {name}: rel max err {err:.2e}', flush=True)

    # --- production ELL SpMM ------------------------------------------------
    t, out = timed(lambda: d.matmul(Mdev), args.reps)
    t_ell = t
    print(f'ell_matmul     : {t * 1e3:9.1f} ms  '
          f'({nnz / t / 1e6:8.1f} M nnz/s)', flush=True)
    check('ell_matmul', out)

    # block calls (the landmark Gram loop shape)
    def prod_blocks():
        outs = [d.matmul(Mdev, s, min(s + 4096, args.rows))
                for s in range(0, args.rows, 4096)]
        return jnp.concatenate(outs, axis=0)
    t, out = timed(prod_blocks, args.reps)
    print(f'ell 4096-blocks: {t * 1e3:9.1f} ms  '
          f'({nnz / t / 1e6:8.1f} M nnz/s)', flush=True)
    check('ell_blocks', out)

    # --- transposed product (PCA projection pass) ---------------------------
    t0 = time.perf_counter()
    d._ensure_csc()
    print(f'csc twin build : {(time.perf_counter() - t0) * 1e3:9.1f} ms '
          '(one-time, host tocsc + ELL)', flush=True)
    t, out = timed(lambda: d.tmatmul(Qdev), args.reps)
    print(f'tmatmul        : {t * 1e3:9.1f} ms  '
          f'({nnz / t / 1e6:8.1f} M nnz/s)', flush=True)
    reft = Xb.T @ Q.astype(ml_dtypes.bfloat16).astype(np.float32)
    check('tmatmul', out, reft)

    # --- row squared sums ---------------------------------------------------
    t, out = timed(lambda: d.row_sq_sums(), args.reps)
    print(f'row_sq         : {t * 1e3:9.1f} ms', flush=True)
    check('row_sq', out, (Xb ** 2).sum(axis=1))

    # --- baseline: scatter decode + matmul (ships the flat layout lazily) ---
    t, out = timed(lambda: d.rows(0, args.rows) @ Mdev, args.reps)
    print(f'decode+mm      : {t * 1e3:9.1f} ms  '
          f'({nnz / t / 1e6:8.1f} M nnz/s)', flush=True)
    check('decode+mm', out)

    print(f'\nell_matmul = {t / t_ell:.1f}x the scatter decode baseline '
          '(target >=3x)', flush=True)


if __name__ == '__main__':
    main()
