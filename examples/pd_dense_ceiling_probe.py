"""One-chip dense prime-dual ceiling probe with bf16 state storage.

VERDICT round-4 item 6 second half: if the bf16-state A/B is
quality-neutral, LANDMARK_AUTO_ENTRIES (estimator.py) should rise to the
MEASURED new dense ceiling, not the arithmetic one (28 -> 18 B per N^2
entry = 1.56x). This probe runs the real solver entry (pad + row-shard +
scan loop, solver_dtype bf16 matmuls) at a ladder of N on synthetic
distance matrices and reports peak HBM per arm, so the threshold commit
cites a chip measurement.

Run solo on the real chip:
  PYTHONPATH=/root/repo:/root/.axon_site \
      python -u examples/pd_dense_ceiling_probe.py --sizes 15811 17000 18000 19000
"""

import argparse
import json
import time

import numpy as np


def one(n, state_dtype, epochs):
    import jax

    from jamie_tpu.core.timing import device_memory_stats
    from jamie_tpu.solvers.prime_dual import prime_dual

    rng = np.random.RandomState(0)
    # Distance-matrix-shaped operands (symmetric, zero diag, non-negative)
    # built blockwise so the host stays within one core's patience.
    x = rng.randn(n, 8).astype(np.float32)
    sq = (x * x).sum(1)
    K = sq[:, None] + sq[None, :] - 2.0 * (x @ x.T)
    np.maximum(K, 0, out=K)
    np.sqrt(K, out=K)
    t0 = time.perf_counter()
    F = prime_dual(K, K, dx=8, dy=8, epoch_pd=epochs, verbose=False,
                   state_dtype=state_dtype)
    F.block_until_ready()
    dt = time.perf_counter() - t0
    stats = device_memory_stats()
    del F
    return {'n': n, 'state_dtype': state_dtype, 'epochs': epochs,
            'seconds': round(dt, 1), 'hbm': stats}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--sizes', type=int, nargs='+',
                    default=[15811, 17000, 18000, 19000])
    ap.add_argument('--epochs', type=int, default=50)
    ap.add_argument('--f32-floor', action='store_true',
                    help='also probe float32 state at the first size')
    args = ap.parse_args()

    if args.f32_floor:
        try:
            print(json.dumps(one(args.sizes[0], 'float32', args.epochs)),
                  flush=True)
        except Exception as e:
            print(json.dumps({'n': args.sizes[0], 'state_dtype': 'float32',
                              'error': repr(e)[:300]}), flush=True)
    for n in args.sizes:
        try:
            print(json.dumps(one(n, 'bfloat16', args.epochs)), flush=True)
        except Exception as e:
            print(json.dumps({'n': n, 'state_dtype': 'bfloat16',
                              'error': repr(e)[:300]}), flush=True)
            break


if __name__ == '__main__':
    main()
