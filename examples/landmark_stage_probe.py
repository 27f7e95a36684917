"""Stage-level timing of landmark_correspondence on the 100k atlas pair.

The round-5 100k atlas runs spent 800-1100 s in Correspondence where
round 4's fixed-code run spent 279 s, with the logged weights pass fast
(0.8-0.9 s/block warm) — so the cost moved into the UNLOGGED pre-weights
stages (DeviceCSR build+upload, JL sketch SpMM, FPS, landmark gather,
geodesic, L x L prime-dual, interp weights). This probe times each stage
separately on the real data, with a blocking sync between stages, so the
regression (or pool noise) is attributable.

Run solo on the real chip:
  PYTHONPATH=/root/repo:/root/repo/examples:/root/.axon_site \
      python -u examples/landmark_stage_probe.py --cells 100000
"""

import argparse
import json
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--cells', type=int, default=100_000)
    ap.add_argument('--features', type=int, nargs=2, default=(20000, 40000))
    ap.add_argument('--density', type=float, default=0.03)
    ap.add_argument('--landmarks', type=int, default=2048)
    ap.add_argument('--epoch-pd', type=int, default=2000)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from synth import synthesize_sparse_pair
    rna, atac = synthesize_sparse_pair(args.cells, *args.features,
                                      density=args.density, seed=0)

    np.asarray(jnp.ones(4) + 1)          # warm the tunnel
    stages = {}

    def mark(name, t0):
        stages[name] = round(time.perf_counter() - t0, 1)
        print(json.dumps({name: stages[name]}), flush=True)

    from jamie_tpu.core import residency
    from jamie_tpu.solvers import landmark as lm

    rng = np.random.RandomState(0)

    for tag, X in (('rna', rna), ('atac', atac)):
        t0 = time.perf_counter()
        dcsr = residency.device_csr(X)
        jax.block_until_ready(dcsr.ev)
        mark(f'{tag}_devicecsr_build_upload', t0)

        t0 = time.perf_counter()
        proj = jnp.asarray(rng.randn(X.shape[1], 256).astype(np.float32))
        sk = dcsr.matmul(proj)
        jax.block_until_ready(sk)
        mark(f'{tag}_jl_sketch_spmm', t0)

        t0 = time.perf_counter()
        idx = lm._fps_indices_device(sk, 17, args.landmarks)
        idx = np.sort(np.asarray(idx))
        mark(f'{tag}_fps_loop', t0)

        t0 = time.perf_counter()
        Xl = np.asarray(X[idx].todense(), np.float32)
        mark(f'{tag}_landmark_row_gather_host', t0)

        t0 = time.perf_counter()
        from jamie_tpu.ops.distances import geodesic_distances
        K = geodesic_distances(Xl, kmax=40)
        mark(f'{tag}_geodesic_LxL', t0)
        stages[f'{tag}_K'] = K
        stages[f'{tag}_Xl'] = Xl

    t0 = time.perf_counter()
    from jamie_tpu.solvers.prime_dual import prime_dual
    F = prime_dual(stages['rna_K'], stages['atac_K'],
                   dx=args.features[0], dy=args.features[1],
                   epoch_pd=args.epoch_pd, verbose=False)
    F.block_until_ready()
    mark('prime_dual_LxL', t0)

    t0 = time.perf_counter()
    iw = lm._cell_to_landmark_weights(rna, stages['rna_Xl'], k=8,
                                      sparse=True)
    jax.block_until_ready(iw)
    mark('rna_weights_pass', t0)

    print(json.dumps({k: v for k, v in stages.items()
                      if isinstance(v, float)}), flush=True)


if __name__ == '__main__':
    main()
