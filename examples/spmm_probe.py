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


_RT = [0.0]     # measured scalar-fetch round-trip, subtracted from timings


def timed(fn, reps=5):
    """block_until_ready is a WEAK barrier through the axon tunnel (round-4
    probe evidence: identical decode timed 0.3 ms with block_until_ready
    vs 0.92 s with a forced scalar fetch) — force completion with a tiny
    readback per rep and subtract the measured round-trip cost."""
    out = fn()
    float(out.sum())                      # warmup + compile + force
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(fn().sum())
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
    measure_rt()

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

    # --- ELL row-gather + fused reduce -------------------------------------
    # out[i] = sum_n vals[i, n] * M[cols[i, n]] — 2*k FLOPs per nnz (the
    # gather floor, no one-hot span blowup). Rows padded to the max row
    # nnz (col 0 / val 0); scanned over row blocks to bound the (B,
    # nnz_max, k) transient. Production would bucket rows by nnz to bound
    # padding on skewed real data; synthetic rows here are ~uniform.
    row_nnz = np.diff(X.indptr)
    nnz_max = int(row_nnz.max())
    ell_cols = np.zeros((args.rows, nnz_max), np.int32)
    ell_vals = np.zeros((args.rows, nnz_max), np.float32)
    for i in range(args.rows):
        lo, hi = X.indptr[i], X.indptr[i + 1]
        ell_cols[i, :hi - lo] = X.indices[lo:hi]
        ell_vals[i, :hi - lo] = X.data[lo:hi]
    pad_frac = ell_vals.size / max(nnz, 1) - 1.0
    ec = jnp.asarray(ell_cols)
    ev = jnp.asarray(ell_vals.astype(np.float32)).astype(jnp.bfloat16)
    print(f'ELL: nnz_max={nnz_max}, padding +{pad_frac * 100:.0f}%',
          flush=True)

    from functools import partial as _part

    @_part(jax.jit, static_argnames=('block',))
    def ell_mm(ec, ev, M, block):
        Mb = M.astype(jnp.bfloat16)
        r = ec.shape[0]
        pad = (-r) % block
        ecp = jnp.pad(ec, ((0, pad), (0, 0)))
        evp = jnp.pad(ev, ((0, pad), (0, 0)))

        def step(_, blk):
            c, v = blk
            g = jnp.take(Mb, c, axis=0)              # (B, nnz_max, k)
            o = jnp.einsum('bn,bnk->bk', v, g,
                           preferred_element_type=jnp.float32)
            return None, o

        _, out = jax.lax.scan(
            step, None,
            (ecp.reshape(-1, block, ecp.shape[1]),
             evp.reshape(-1, block, evp.shape[1])))
        return out.reshape(-1, out.shape[-1])[:r]

    for blk in (256, 1024, 4096):
        try:
            t, out = timed(lambda b=blk: ell_mm(ec, ev, Mdev, b), args.reps)
            results[f'ell[{blk}]'] = t
            print(f'ell[blk={blk:4d}]: {t * 1e3:9.1f} ms  '
                  f'({nnz / t / 1e6:8.1f} M nnz/s)', flush=True)
            check(f'ell[{blk}]', out)
        except Exception as e:
            print(f'ell[blk={blk}] : FAILED ({type(e).__name__}: '
                  f'{repr(e)[:120]})', flush=True)

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

    # --- row-aligned nnz chunks + segment_sum ------------------------------
    # Bound the (w, k) transient by splitting at row boundaries every
    # ~CHUNK nnz; each chunk's segment_sum covers a contiguous row span.
    CHUNK = 1 << 20
    bnds = [0]
    for i in range(args.rows):
        if X.indptr[i + 1] - X.indptr[bnds[-1]] > CHUNK:
            bnds.append(i)
    bnds.append(args.rows)

    @partial(jax.jit, static_argnames=('w', 'span'))
    def seg_chunk(indptr, cols, vals, M, s, w, span):
        lo = indptr[s]
        start = jnp.clip(lo, 0, cols.shape[0] - w)
        c = jax.lax.dynamic_slice(cols, (start,), (w,)).astype(jnp.int32)
        v = jax.lax.dynamic_slice(vals, (start,), (w,))
        k = start + jnp.arange(w, dtype=jnp.int32)
        rows = (jnp.searchsorted(indptr, k, side='right').astype(jnp.int32)
                - 1 - s)
        rows = jnp.where((k < lo) | (rows >= span), span, rows)
        g = jnp.take(M.astype(jnp.bfloat16), c, axis=0).astype(jnp.float32)
        g = g * v.astype(jnp.float32)[:, None]
        return jax.ops.segment_sum(g, rows, num_segments=span + 1,
                                   indices_are_sorted=True)[:span]

    wmax = int(max(X.indptr[bnds[i + 1]] - X.indptr[bnds[i]]
                   for i in range(len(bnds) - 1)))
    spanmax = int(max(bnds[i + 1] - bnds[i] for i in range(len(bnds) - 1)))

    def seg_chunked():
        outs = []
        for i in range(len(bnds) - 1):
            o = seg_chunk(d.indptr, d.cols, d.vals, Mdev, bnds[i],
                          w=wmax, span=spanmax)
            outs.append(o[:bnds[i + 1] - bnds[i]])
        return jnp.concatenate(outs, axis=0)

    try:
        t, out = timed(seg_chunked, args.reps)
        results['seg_chunk'] = t
        print(f'seg_chunk      : {t * 1e3:9.1f} ms  '
              f'({nnz / t / 1e6:8.1f} M nnz/s)  '
              f'[{len(bnds) - 1} chunks]', flush=True)
        check('seg_chunk', out)
    except Exception as e:
        print(f'seg_chunk      : FAILED ({type(e).__name__}: '
              f'{repr(e)[:120]})', flush=True)

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
