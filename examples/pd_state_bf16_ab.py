"""A/B: prime-dual bf16 state storage (solver_state_dtype) on real data.

VERDICT round-4 item 6. The 'bfloat16' scheme persists M1 + the carried
products (FKy, KxFKy) + the K operands in bf16 between solver iterations
(F and M2 stay f32 — their per-step updates are below bf16 ulp; closed
negative results in solvers/prime_dual.py). 28 -> 18 bytes per N^2 entry
= 1.56x the one-chip dense-N entry ceiling.

Synthetic trajectory comparison (CPU, N=100, 2k iters):
  default-vs-highest (accepted baseline): corr 0.999998, argmax 0.97
  M1-only bf16                          : corr 1.0000,  argmax 0.97
  M1+products (this scheme)             : corr 0.9995,  argmax 0.73
  +M2 (rejected: ulp saturation)        : corr 0.9877,  argmax 0.56
  +F  (rejected: eps-damped update)     : corr 0.13

This harness measures what matters: end-metric quality (FOSCTTM / LTA)
through full fits on the real datasets, multi-seed.

Run solo on the real chip:
  PYTHONPATH=/root/repo:/root/repo/examples:/root/.axon_site \
      python examples/pd_state_bf16_ab.py --seeds 5
"""

import argparse
import json
import time

import numpy as np


def run_fit(data, types, state_dtype, seed, **kw):
    from jamie_tpu import JAMIE
    from jamie_tpu.evaluation import test_closer, test_LabelTA

    kw = {**kw, 'log_DNN': 100_000, 'log_pd': 2000}
    jm = JAMIE(manual_seed=seed, solver_state_dtype=state_dtype,
               prng_impl='rbg', model_matmul_dtype='bfloat16', **kw)
    t0 = time.perf_counter()
    emb = jm.fit_transform(dataset=data)
    dt = time.perf_counter() - t0
    f = float(test_closer(emb))
    lta = float(test_LabelTA(emb, types))
    return {'foscttm': f, 'lta': lta, 'seconds': round(dt, 1)}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--seeds', type=int, default=5)
    ap.add_argument('--dataset', default='scgem',
                    choices=['scgem', 'motor'])
    args = ap.parse_args()

    if args.dataset == 'scgem':
        from scgem import KWARGS, load_scgem    # examples/scgem.py
        data, types = load_scgem()
        kw = dict(KWARGS)
    else:
        from scmnc_motor import KWARGS, load_scmnc_motor
        data, types = load_scmnc_motor()
        kw = dict(KWARGS)

    out = {'dataset': args.dataset, 'arms': {}}
    for dtype in ('float32', 'bfloat16'):
        rows = [run_fit(data, types, dtype, seed, **kw)
                for seed in range(args.seeds)]
        out['arms'][dtype] = {
            'foscttm_mean': float(np.mean([r['foscttm'] for r in rows])),
            'foscttm_std': float(np.std([r['foscttm'] for r in rows])),
            'lta_mean': float(np.mean([r['lta'] for r in rows])),
            'lta_std': float(np.std([r['lta'] for r in rows])),
            'seconds_mean': float(np.mean([r['seconds'] for r in rows])),
            'rows': rows,
        }
        print(json.dumps({dtype: out['arms'][dtype]}), flush=True)
    d = out['arms']
    print(json.dumps({
        'verdict': {
            'lta_delta': round(d['bfloat16']['lta_mean']
                               - d['float32']['lta_mean'], 4),
            'foscttm_delta': round(d['bfloat16']['foscttm_mean']
                                   - d['float32']['foscttm_mean'], 6),
            'neutral_band': 'neutral if |lta_delta| <= pooled seed std',
            'pooled_lta_std': round(0.5 * (d['bfloat16']['lta_std']
                                           + d['float32']['lta_std']), 4),
        }}), flush=True)


if __name__ == '__main__':
    main()
