"""Quality A/B for the bf16-residency threshold (round-3 candidate).

The >500M-element fast path rounds the raw matrix to bf16 once and shares
it between the distance Gram and the PCA sketch. Mid-size matrices (e.g.
the scGLUE RNA modality, 9190 x 28930 = 266M elements) instead pay TWO f32
uploads (distances + PCA) through the ~20-55 MB/s tunnel link. Lowering
the threshold halves their transfer — IF quality is unchanged by the bf16
rounding of distances (and of the PCA basis where f > n).

This script forces the resident-bf16 path onto the real datasets (scGEM
177 x 230/27, scMNC-Motor 1208 x 1286/29 — far below any sane threshold)
and compares FOSCTTM/LTA across seeds against the default f32 path at
full reference configs. The deltas bound what the rounding can do at any
engaging shape, since relative bf16 error is scale-free.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python -u examples/bf16_threshold_ab.py [--seeds 3]
"""

import argparse
import json
import time

import numpy as np


def run(dataset, types, kwargs, seeds, force_bf16):
    import jamie_tpu.ops.distances as dmod
    import jamie_tpu.preprocess as pmod
    from jamie_tpu import JAMIE
    from jamie_tpu.core.residency import clear_residency_cache

    old = dmod._FEATURE_CHUNK_THRESHOLD, pmod._STREAM_THRESHOLD
    if force_bf16:
        dmod._FEATURE_CHUNK_THRESHOLD = 1_000
        pmod._STREAM_THRESHOLD = 1_000
    out = {'foscttm': [], 'lta': []}
    try:
        for seed in range(seeds):
            np.random.seed(seed)
            jm = JAMIE(manual_seed=seed, **kwargs)
            jm.fit_transform(dataset=dataset)
            emb = jm.transform(dataset=dataset)
            out['foscttm'].append(float(jm.test_closer(emb)))
            out['lta'].append(float(jm.test_LabelTA(emb, types)))
            clear_residency_cache()
    finally:
        dmod._FEATURE_CHUNK_THRESHOLD, pmod._STREAM_THRESHOLD = old
    return {k: (round(float(np.mean(v)), 5), round(float(np.std(v)), 5))
            for k, v in out.items()}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--seeds', type=int, default=3)
    args = ap.parse_args()

    import os
    import sys
    sys.path.insert(0, os.path.dirname(__file__))
    from scgem import KWARGS as SCGEM_KWARGS
    from scgem import load_scgem
    from scmnc_motor import KWARGS as MOTOR_KWARGS
    from scmnc_motor import load_scmnc_motor

    results = {}
    for name, loader, kwargs in (
            ('scGEM', load_scgem, SCGEM_KWARGS),
            ('scMNC-Motor', load_scmnc_motor, MOTOR_KWARGS)):
        dataset, types = loader()
        t0 = time.perf_counter()
        for tag, force in (('f32', False), ('bf16', True)):
            results[f'{name}_{tag}'] = run(dataset, types, dict(kwargs),
                                           args.seeds, force)
            print(name, tag, results[f'{name}_{tag}'], flush=True)
        results[f'{name}_seconds'] = round(time.perf_counter() - t0, 1)
    print(json.dumps(results))


if __name__ == '__main__':
    main()
