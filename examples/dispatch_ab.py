"""A/B the trainer's pipelined chunk dispatch on the real TPU.

The fit loop used to block on every scan chunk's loss readback before
dispatching the next chunk — one full device->host round-trip (~0.35 s
through the axon tunnel) serialized with compute, ~100 times per fit.
`dispatch_lookahead` (default 3) keeps chunks in flight past the readback.
This harness measures the Mapping-phase wall clock at two reference-like
shapes for lookahead {0, 3} x epoch_chunk {100, 500} so the win (and any
residual per-dispatch cost worth chunk-size tuning) is a committed number,
not an estimate.

Run (one TPU process at a time):
    PYTHONPATH=/root/repo:/root/repo/examples:/root/.axon_site \
        python -u examples/dispatch_ab.py
"""

import argparse
import json
import time

import numpy as np


def make_pair(n, d0, d1, seed=0):
    rng = np.random.RandomState(seed)
    z = rng.randn(n, 16).astype(np.float32)
    x0 = (z @ rng.randn(16, d0) + 0.3 * rng.randn(n, d0)).astype(np.float32)
    x1 = (z @ rng.randn(16, d1) + 0.3 * rng.randn(n, d1)).astype(np.float32)
    return [x0, x1]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--epochs', type=int, default=10_000)
    ap.add_argument('--shapes', default='300x1000x500,1208x3000x1000')
    ap.add_argument('--lookaheads', default='0,3')
    ap.add_argument('--chunks', default='100,500')
    args = ap.parse_args()

    import faulthandler
    faulthandler.dump_traceback_later(3000, exit=True)
    import jax
    from jamie_tpu import JAMIE
    jax.block_until_ready(jax.numpy.ones(4) + 1)   # warm the channel

    rows = []
    for shape in args.shapes.split(','):
        n, d0, d1 = map(int, shape.split('x'))
        data = make_pair(n, d0, d1)
        for chunk in map(int, args.chunks.split(',')):
            for la in map(int, args.lookaheads.split(',')):
                jm = JAMIE(epoch_DNN=args.epochs, min_epochs=args.epochs,
                           use_early_stop=False, epoch_chunk=chunk,
                           dispatch_lookahead=la, log_DNN=10 ** 9,
                           epoch_pd=200, pca_dim=(256, 256),
                           distance_mode='euclidean', prng_impl='rbg',
                           model_matmul_dtype='bfloat16')
                t0 = time.perf_counter()
                jm.fit_transform(dataset=data)
                total = time.perf_counter() - t0
                row = {'shape': shape, 'epoch_chunk': chunk,
                       'lookahead': la, 'total_s': round(total, 2),
                       'phases': getattr(jm, 'phase_timings', None)}
                rows.append(row)
                print(json.dumps(row), flush=True)
    print(json.dumps({'dispatch_ab': rows}))


if __name__ == '__main__':
    main()
