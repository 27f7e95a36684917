"""Prime-dual solver micro-benchmark: seconds/iteration vs N.

Roofline: one iteration = 4 N^3-ish bf16 matmuls (~29 ms at N=9k on a v5e)
plus ~2.5 GB of elementwise HBM traffic (~4 ms). Use this to keep the
implementation near speed-of-light.
"""

import json
import time

import numpy as np


def main():
    import jax
    from jamie_tpu.ops.distances import pairwise_distance
    from jamie_tpu.solvers.prime_dual import prime_dual

    jax.block_until_ready(jax.numpy.ones((8, 128)) @ jax.numpy.ones((128, 8)))
    results = []
    for n in (1024, 2048, 4096, 8192):
        rng = np.random.RandomState(0)
        x = rng.randn(n, 16).astype(np.float32)
        Kx = np.asarray(pairwise_distance(x))
        # warmup/compile with a short run
        prime_dual(Kx, Kx, dx=16, dy=16, epoch_pd=10, log_pd=10,
                   verbose=False)
        iters = 200
        t0 = time.perf_counter()
        prime_dual(Kx, Kx, dx=16, dy=16, epoch_pd=iters, log_pd=iters,
                   verbose=False)
        dt = time.perf_counter() - t0
        ms_per_iter = 1e3 * dt / iters
        tflops = 8 * n ** 3 / (dt / iters) / 1e12
        results.append({'n': n, 'ms_per_iter': round(ms_per_iter, 2),
                        'effective_tflops': round(tflops, 1)})
        print(json.dumps(results[-1]))
    print(json.dumps(results))


if __name__ == '__main__':
    main()
