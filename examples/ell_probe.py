"""Chip probe 2: productionizing the ELL SpMM (follow-up to spmm_probe).

spmm_probe measured the ELL row-gather + einsum at 156 M nnz/s = 17.7x the
scatter decode (the windowed one-hot and segment_sum candidates were all
~9 M nnz/s — the one-hot's span*w*k FLOP blowup and TPU's serialized
scatter respectively). Before wiring ELL into DeviceCSR.matmul, this
probe quantifies the two production unknowns on chip:

1. BUILD — converting the already-resident flat CSR to ELL on device is
   an elementwise gather of nnz scalars (idx = indptr[i] + j): if that
   gather runs at decode-like M nnz/s it is a one-time ~1 s cost
   amortized over the 3+ matmul passes every consumer makes; if it runs
   at HBM speed it is free. Host-built ELL (numpy fancy index + link
   upload) is the fallback.
2. SKEW — real scRNA/ATAC row-nnz is lognormal-ish (deep cells 10-20x
   the mean). Global-max padding explodes memory; this probe times the
   row-SPLIT variant (heavy rows split across multiple ELL rows of
   width w = pow2(4*mean), partial sums combined by a final row-granular
   scatter-add) against the uniform fixture, on a lognormal synthetic.

Run solo on the real chip:
  PYTHONPATH=/root/repo:/root/.axon_site python examples/ell_probe.py
"""

import argparse
import time

import numpy as np
import scipy.sparse as sp

_RT = [0.0]


def timed(fn, reps=5):
    # Device-side reduce + scalar fetch (np.asarray would time the
    # tunnel fetch of the whole output, not the kernel).
    force = lambda o: float(o.sum()) if hasattr(o, 'sum') \
        else float(o[0].sum())
    out = fn()
    force(out)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        force(fn())
        ts.append(time.perf_counter() - t0)
    return max(float(np.median(ts)) - _RT[0], 1e-9), out


def measure_rt(reps=7):
    import jax.numpy as jnp
    x = jnp.zeros((8,), jnp.float32)
    float(x.sum())
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(x.sum())
        ts.append(time.perf_counter() - t0)
    _RT[0] = float(np.median(ts))
    print(f'scalar-fetch round-trip: {_RT[0] * 1e3:.1f} ms', flush=True)


def lognormal_csr(rng, n, f, mean_nnz, sigma=0.9):
    """Row nnz ~ lognormal with the given mean — deep-cell skew."""
    raw = rng.lognormal(mean=0.0, sigma=sigma, size=n)
    nnz_per_row = np.maximum((raw / raw.mean() * mean_nnz).astype(np.int64),
                             1)
    nnz_per_row = np.minimum(nnz_per_row, f)
    indptr = np.zeros(n + 1, np.int64)
    np.cumsum(nnz_per_row, out=indptr[1:])
    nnz = int(indptr[-1])
    cols = np.empty(nnz, np.int32)
    for i in range(n):
        cols[indptr[i]:indptr[i + 1]] = np.sort(
            rng.choice(f, int(nnz_per_row[i]), replace=False))
    data = rng.randn(nnz).astype(np.float32)
    return sp.csr_matrix((data, cols, indptr), shape=(n, f))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--rows', type=int, default=13421)
    ap.add_argument('--feats', type=int, default=20000)
    ap.add_argument('--mean-nnz', type=int, default=600)
    ap.add_argument('--k', type=int, default=522)
    ap.add_argument('--reps', type=int, default=5)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from functools import partial

    rng = np.random.RandomState(0)
    print(f'building lognormal CSR {args.rows} x {args.feats} '
          f'mean_nnz={args.mean_nnz} ...', flush=True)
    X = lognormal_csr(rng, args.rows, args.feats, args.mean_nnz)
    nnz = int(X.nnz)
    row_nnz = np.diff(X.indptr)
    print(f'nnz={nnz}  row nnz mean={row_nnz.mean():.0f} '
          f'p50={np.median(row_nnz):.0f} p99={np.percentile(row_nnz, 99):.0f} '
          f'max={row_nnz.max()}', flush=True)
    M = rng.randn(args.feats, args.k).astype(np.float32)
    Mdev = jnp.asarray(M).astype(jnp.bfloat16)

    import ml_dtypes
    indptr = jnp.asarray(np.asarray(X.indptr, np.int32))
    cols_flat = jnp.asarray(np.asarray(X.indices, np.int32))
    vals_flat = jnp.asarray(
        np.asarray(X.data, np.float32).astype(ml_dtypes.bfloat16))
    jax.block_until_ready((indptr, cols_flat, vals_flat))
    print(f'device={jax.devices()[0].platform}', flush=True)
    measure_rt()

    ref = (X.toarray().astype(ml_dtypes.bfloat16).astype(np.float64)
           @ M.astype(ml_dtypes.bfloat16).astype(np.float64)).astype(
               np.float32)

    def check(name, out, rows_idx=None):
        out = np.asarray(out)
        r = ref if rows_idx is None else ref[rows_idx]
        err = np.max(np.abs(out - r)) / max(np.max(np.abs(r)), 1e-9)
        print(f'  {name}: rel max err {err:.2e}', flush=True)

    # ---- 1. on-device ELL build (row-split layout) -------------------------
    # Host plans the split (cheap indptr arithmetic); device gathers.
    w = 1
    while w < 4 * args.mean_nnz:
        w <<= 1
    n_sub = (row_nnz + w - 1) // w          # ELL rows per source row
    n_ell = int(n_sub.sum())
    out_row = np.repeat(np.arange(args.rows, dtype=np.int32), n_sub)
    sub_idx = (np.arange(n_ell, dtype=np.int64)
               - np.repeat(np.cumsum(n_sub) - n_sub, n_sub))
    ell_start = X.indptr[out_row] + sub_idx * w     # flat offset per ELL row
    ell_len = np.minimum(X.indptr[out_row + 1] - ell_start, w).astype(
        np.int32)
    pad_frac = n_ell * w / nnz - 1.0
    print(f'ELL split: w={w} n_ell={n_ell} (+{n_ell - args.rows} split '
          f'rows), padding +{pad_frac * 100:.0f}%', flush=True)

    ell_start_d = jnp.asarray(ell_start.astype(np.int32))
    ell_len_d = jnp.asarray(ell_len)
    out_row_d = jnp.asarray(out_row)

    @partial(jax.jit, static_argnames=('w',))
    def build_ell(cols_flat, vals_flat, starts, lens, w):
        j = jnp.arange(w, dtype=jnp.int32)
        idx = starts[:, None] + j[None, :]
        valid = j[None, :] < lens[:, None]
        idx = jnp.clip(idx, 0, cols_flat.shape[0] - 1)
        ec = jnp.where(valid, jnp.take(cols_flat, idx), 0)
        ev = jnp.where(valid, jnp.take(vals_flat, idx), 0)
        return ec, ev

    t, (ec, ev) = timed(
        lambda: build_ell(cols_flat, vals_flat, ell_start_d, ell_len_d, w),
        args.reps)
    print(f'ELL build (device gather): {t * 1e3:9.1f} ms  '
          f'({nnz / t / 1e6:8.1f} M nnz/s)', flush=True)
    ec, ev = jax.block_until_ready(
        build_ell(cols_flat, vals_flat, ell_start_d, ell_len_d, w))

    # host-built alternative (numpy fancy index), for reference
    t0 = time.perf_counter()
    jh = np.arange(w, dtype=np.int64)
    idxh = ell_start[:, None] + jh[None, :]
    validh = jh[None, :] < ell_len[:, None]
    np.clip(idxh, 0, nnz - 1, out=idxh)
    ech = np.where(validh, np.asarray(X.indices, np.int32)[idxh], 0)
    evh = np.where(validh,
                   np.asarray(X.data, np.float32)[idxh], 0).astype(
                       ml_dtypes.bfloat16)
    th = time.perf_counter() - t0
    print(f'ELL build (host numpy)   : {th * 1e3:9.1f} ms '
          f'+ {(ech.nbytes + evh.nbytes) / 1e6:.0f} MB link', flush=True)
    np.testing.assert_array_equal(np.asarray(ec), ech)

    # ---- 2. ELL einsum + row-granular scatter-add combine ------------------
    @partial(jax.jit, static_argnames=('block', 'n'))
    def ell_mm_split(ec, ev, out_rows, M, block, n):
        r = ec.shape[0]
        pad = (-r) % block
        ecp = jnp.pad(ec, ((0, pad), (0, 0)))
        evp = jnp.pad(ev, ((0, pad), (0, 0)))

        def step(_, blk):
            c, v = blk
            g = jnp.take(M, c, axis=0)
            o = jnp.einsum('bn,bnk->bk', v, g,
                           preferred_element_type=jnp.float32)
            return None, o

        _, out = jax.lax.scan(
            step, None,
            (ecp.reshape(-1, block, ecp.shape[1]),
             evp.reshape(-1, block, evp.shape[1])))
        out = out.reshape(-1, out.shape[-1])[:r]
        return jnp.zeros((n, out.shape[-1]), jnp.float32).at[out_rows].add(
            out)

    for blk in (256, 1024):
        t, out = timed(lambda b=blk: ell_mm_split(
            ec, ev, out_row_d, Mdev, b, args.rows), args.reps)
        print(f'ell_split[blk={blk:4d}]: {t * 1e3:9.1f} ms  '
              f'({nnz / t / 1e6:8.1f} M nnz/s)', flush=True)
        check(f'ell_split[{blk}]', out)

    # ---- 3. no-split baseline on the same data (global max w) -------------
    wmax = 1
    while wmax < int(row_nnz.max()):
        wmax <<= 1
    gm_pad = args.rows * wmax / nnz - 1.0
    print(f'global-max ELL would be w={wmax}, padding +{gm_pad * 100:.0f}% '
          '(the memory blowup the split avoids)', flush=True)

    # ---- 4. block-slab variant: per-256-row slabs, dynamic_slice gather ----
    # (no precomputed ELL arrays at all: gather straight from flat CSR per
    # slab inside the scan; ELL build amortization unnecessary if this is
    # fast)
    B = 256
    nslab = (args.rows + B - 1) // B
    slab_lo = X.indptr[:-1:B].astype(np.int64)
    slab_w = 1
    while slab_w < int((np.append(X.indptr[B::B], X.indptr[-1])
                        - slab_lo).max()):
        slab_w <<= 1

    @partial(jax.jit, static_argnames=('B', 'w', 'n'))
    def slab_mm(indptr, cols_flat, vals_flat, M, B, w, n):
        nsl = (n + B - 1) // B
        ispan = jnp.arange(B, dtype=jnp.int32)

        def step(_, s0):
            lo = indptr[s0]
            start = jnp.clip(lo, 0, cols_flat.shape[0] - w)
            c = jax.lax.dynamic_slice(cols_flat, (start,), (w,))
            v = jax.lax.dynamic_slice(vals_flat, (start,), (w,))
            kidx = start + jnp.arange(w, dtype=jnp.int32)
            rows = (jnp.searchsorted(indptr, kidx, side='right')
                    .astype(jnp.int32) - 1 - s0)
            hi = indptr[jnp.minimum(s0 + B, n)]
            valid = (kidx >= lo) & (kidx < hi)
            onehot = (rows[None, :] == ispan[:, None]) & valid[None, :]
            Sv = jnp.where(onehot, v[None, :], 0)
            G = jnp.take(M, c, axis=0)
            return None, jnp.matmul(Sv, G,
                                    preferred_element_type=jnp.float32)

        _, out = jax.lax.scan(
            step, None, jnp.arange(nsl, dtype=jnp.int32) * B)
        return out.reshape(-1, out.shape[-1])[:n]

    if slab_w <= (1 << 18):
        t, out = timed(lambda: slab_mm(indptr, cols_flat, vals_flat, Mdev,
                                       B, slab_w, args.rows), args.reps)
        print(f'slab_onehot[w={slab_w}]: {t * 1e3:9.1f} ms  '
              f'({nnz / t / 1e6:8.1f} M nnz/s)', flush=True)
        check('slab_onehot', out)
    else:
        print(f'slab_onehot: skipped (w={slab_w})', flush=True)

    # ---- 5. CSC-ELL for tmatmul -------------------------------------------
    Xc = X.tocsc()
    col_nnz = np.diff(Xc.indptr)
    print(f'CSC col nnz mean={col_nnz.mean():.0f} '
          f'p99={np.percentile(col_nnz, 99):.0f} max={col_nnz.max()}',
          flush=True)
    wc = 1
    while wc < max(4 * int(col_nnz.mean() + 1), 4):
        wc <<= 1
    n_sub_c = (col_nnz + wc - 1) // wc
    n_ell_c = int(n_sub_c.sum())
    out_col = np.repeat(np.arange(args.feats, dtype=np.int32), n_sub_c)
    sub_c = (np.arange(n_ell_c, dtype=np.int64)
             - np.repeat(np.cumsum(n_sub_c) - n_sub_c, n_sub_c))
    cstart = Xc.indptr[out_col] + sub_c * wc
    clen = np.minimum(Xc.indptr[out_col + 1] - cstart, wc).astype(np.int32)
    print(f'CSC ELL split: w={wc} n_ell={n_ell_c} padding '
          f'+{(n_ell_c * wc / nnz - 1) * 100:.0f}%', flush=True)

    crows = jnp.asarray(np.asarray(Xc.indices, np.int32))
    cvals = jnp.asarray(np.asarray(Xc.data, np.float32)
                        .astype(ml_dtypes.bfloat16))
    cs_d = jnp.asarray(cstart.astype(np.int32))
    cl_d = jnp.asarray(clen)
    oc_d = jnp.asarray(out_col)
    ecc, evc = jax.block_until_ready(build_ell(crows, cvals, cs_d, cl_d, wc))

    Q = rng.randn(args.rows, args.k).astype(np.float32)
    Qdev = jnp.asarray(Q).astype(jnp.bfloat16)
    t, out = timed(lambda: ell_mm_split(ecc, evc, oc_d, Qdev, 1024,
                                        args.feats), args.reps)
    print(f'tmatmul csc-ell  : {t * 1e3:9.1f} ms  '
          f'({nnz / t / 1e6:8.1f} M nnz/s)', flush=True)
    reft = (X.toarray().astype(ml_dtypes.bfloat16).astype(np.float64).T
            @ Q.astype(ml_dtypes.bfloat16).astype(np.float64)).astype(
                np.float32)
    err = np.max(np.abs(np.asarray(out) - reft)) / max(np.max(np.abs(reft)),
                                                       1e-9)
    print(f'  tmatmul: rel max err {err:.2e}', flush=True)


if __name__ == '__main__':
    main()
