"""Distance-phase profiling at the scGLUE ATAC shape (9190 x 241757).

Round-2 measured the whole Distance section at 288 s vs ~165-207 s for the
bf16 Gram roofline; this script splits the phase into its real parts so the
optimization (upload/compute overlap + triangular Gram) can be verified:

  synth      host data generation (not part of the fit's Distance section)
  cast       host f32 -> bf16 (ml_dtypes)
  upload     host -> HBM transfer of the bf16 matrix
  gram       the N x N distance build from the resident matrix
  total      dataset_distance_matrix end-to-end (what the fit pays)

Usage: PYTHONPATH=/root/repo:/root/.axon_site python examples/distance_bench.py
       [--cells 9190] [--features 241757]
"""

import argparse
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--cells', type=int, default=9190)
    ap.add_argument('--features', type=int, default=241757)
    ap.add_argument('--skip-parts', action='store_true',
                    help='only run the end-to-end build')
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jamie_tpu.core.residency import clear_residency_cache, device_bf16
    from jamie_tpu.ops.distances import dataset_distance_matrix

    # Warm the readback channel (first device->host fetch stalls erratically
    # through the tunnel) and note: block_until_ready through axon does NOT
    # reliably block — every timed region below ends with a small FETCH.
    np.asarray(jnp.ones(4) + 1)

    def force(dev_arr):
        return float(np.asarray(dev_arr[0, 1]))

    n, f = args.cells, args.features
    t0 = time.perf_counter()
    rng = np.random.default_rng(0)
    z = rng.standard_normal((n, 32), dtype=np.float32)
    x = np.empty((n, f), np.float32)
    chunk = 16384
    for s in range(0, f, chunk):
        e = min(s + chunk, f)
        w = rng.standard_normal((32, e - s), dtype=np.float32)
        x[:, s:e] = z @ w
    print(f'synth   {time.perf_counter() - t0:8.1f} s  ({n} x {f})')

    if not args.skip_parts:
        from jamie_tpu.core.residency import host_bf16
        t0 = time.perf_counter()
        xb = host_bf16(x)
        t_cast = time.perf_counter() - t0
        print(f'cast    {t_cast:8.1f} s  (host f32->bf16, host_bf16)')
        del xb

        t0 = time.perf_counter()
        xdev = device_bf16(x, budget_bytes=8 << 30)
        t_up = time.perf_counter() - t0
        print(f'upload  {t_up:8.1f} s  (incl. cast; '
              f'{n * f * 2 / max(t_up, 1e-9) / 1e6:.0f} MB/s)')

        from jamie_tpu.ops.distances import _euclidean_resident_bf16
        flops = 2.0 * n * n * f
        for tag in ('gram ', 'gram2'):
            t0 = time.perf_counter()
            d = _euclidean_resident_bf16(xdev, False, True)
            force(d)
            t_gram = time.perf_counter() - t0
            print(f'{tag}   {t_gram:8.1f} s  '
                  f'({flops / t_gram / 1e12:.0f} effective TFLOP/s)')
        del d, xdev
        clear_residency_cache()

    t0 = time.perf_counter()
    d = dataset_distance_matrix(x, 'euclidean')
    force(d)
    print(f'total   {time.perf_counter() - t0:8.1f} s  '
          f'(end-to-end build, current fast path)')
    clear_residency_cache()


if __name__ == '__main__':
    main()
