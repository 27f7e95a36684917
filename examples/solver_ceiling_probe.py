"""One-chip dense prime-dual N ceiling: f32 vs bf16 state (VERDICT item 6).

Runs a few solver iterations at increasing square N until HBM OOMs, for
both solver state dtypes. The measured ceilings calibrate
estimator.LANDMARK_AUTO_ENTRIES (the dense->landmark auto switch).

Byte model per N^2 entry: f32 state = 28 B (Kx, Ky, F, M1, M2, FKy,
KxFKy all f32) -> predicted ceiling ~sqrt(16e9/28) ~ 23.9k minus
transients (measured 16.6k in round 3); bf16 state = 18 B (M1/FKy/
KxFKy/Kx/Ky bf16) -> x1.25 N.

Run solo on the real chip:
  PYTHONPATH=/root/repo:/root/.axon_site python -u examples/solver_ceiling_probe.py
"""

import argparse
import json
import time


def try_n(n, state_dtype):
    import jax
    import jax.numpy as jnp

    from jamie_tpu.solvers.prime_dual import prime_dual

    # Synthetic distance matrices straight on device (uploading 2 x N^2 f32
    # through the tunnel at N=20k would be 3.2 GB; generate on chip).
    @jax.jit
    def make(key):
        x = jax.random.normal(key, (n, 32), jnp.float32)
        sq = jnp.sum(x * x, axis=1)
        d2 = sq[:, None] + sq[None, :] - 2.0 * (x @ x.T)
        return jnp.sqrt(jnp.maximum(d2, 0.0))

    Kx = make(jax.random.PRNGKey(0))
    Ky = make(jax.random.PRNGKey(1))
    # block_until_ready is a weak barrier through the axon tunnel; a
    # scalar fetch both forces completion and surfaces any OOM error
    float(Kx[0, 0] + Ky[0, 0])
    t0 = time.perf_counter()
    F = prime_dual(Kx, Ky, dx=32, dy=32, epoch_pd=30, log_pd=1000,
                   verbose=False, state_dtype=state_dtype)
    float(F[0, 0])
    return time.perf_counter() - t0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--ns', default='16000,18000,20000,22000,24000,26000')
    ap.add_argument('--dtypes', default='float32,bfloat16')
    args = ap.parse_args()

    out = {}
    for dtype in args.dtypes.split(','):
        ceiling = 0
        for n in [int(x) for x in args.ns.split(',')]:
            try:
                dt = try_n(n, dtype)
                ceiling = n
                print(json.dumps({'state_dtype': dtype, 'n': n,
                                  'seconds_30it': round(dt, 2),
                                  'ok': True}), flush=True)
            except Exception as e:
                print(json.dumps({'state_dtype': dtype, 'n': n, 'ok': False,
                                  'error': repr(e)[:160]}), flush=True)
                break
        out[dtype] = ceiling
    print(json.dumps({'ceilings': out,
                      'entries': {k: v * v for k, v in out.items()}}),
          flush=True)


if __name__ == '__main__':
    main()
