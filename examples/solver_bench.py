"""Prime-dual solver micro-benchmark: seconds/iteration vs N.

Roofline: one iteration = 4 N^3-ish bf16 matmuls (~29 ms at N=9k on a v5e)
plus ~2.5 GB of elementwise HBM traffic (~4 ms). Use this to keep the
implementation near speed-of-light.
"""

import json
import time

import numpy as np


def main(sizes=(1024, 2048, 4096, 8192, 8981), use_pallas=None):
    import jax
    from jamie_tpu.ops.distances import pairwise_distance
    from jamie_tpu.solvers.prime_dual import prime_dual

    jax.block_until_ready(jax.numpy.ones((8, 128)) @ jax.numpy.ones((128, 8)))
    results = []
    short, long_ = 100, 500
    for n in sizes:
        rng = np.random.RandomState(0)
        x = rng.randn(n, 16).astype(np.float32)
        Kx = pairwise_distance(x)   # device-resident, like the fit pipeline
        # Warmup with the SAME chunk size as the timed runs: log_pd is a
        # static arg of the jitted chunk, so a different warmup chunk
        # leaves the timed run paying the compile (the round-1 bench's
        # mistake — it reported compile+run as 20 TFLOPs). Per-iteration
        # cost is the DIFFERENCE of two run lengths, cancelling the fixed
        # per-call costs (final F readback rides the slow tunnel here).
        kw = dict(dx=16, dy=16, verbose=False, use_pallas=use_pallas,
                  log_pd=short)
        prime_dual(Kx, Kx, epoch_pd=short, **kw)
        t0 = time.perf_counter()
        prime_dual(Kx, Kx, epoch_pd=short, **kw)
        dt_short = time.perf_counter() - t0
        t0 = time.perf_counter()
        prime_dual(Kx, Kx, epoch_pd=long_, **kw)
        dt_long = time.perf_counter() - t0
        dt = (dt_long - dt_short) / (long_ - short)
        tflops = 8 * n ** 3 / dt / 1e12
        results.append({
            'n': n, 'ms_per_iter': round(1e3 * dt, 2),
            'effective_tflops': round(tflops, 1),
            'fixed_overhead_s': round(dt_short - short * dt, 2),
        })
        print(json.dumps(results[-1]))
    print(json.dumps(results))


if __name__ == '__main__':
    main()
