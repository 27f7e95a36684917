"""Comparison-method harness on real scGEM: JAMIE vs the paper baselines.

Mirrors the reference notebooks' comparison cells (scGEM.ipynb cells
14-18 via mmd_combine, accuracy table in cell 25):

  Algorithm     JAMIE      NLMA       LMA       CCA    MMD-MA  UnionCom
  FOSCTTM    0.006799  0.000048  0.102222  0.093715  0.193447  0.212567
  LTA        0.887006  0.875706  0.689266  0.768362  0.531073  0.604520
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from scgem import load_scgem  # noqa: E402

REFERENCE = {
    'JAMIE': {'foscttm': 0.006799, 'lta': 0.887006},
    'NLMA': {'foscttm': 0.000048, 'lta': 0.875706},
    'LMA': {'foscttm': 0.102222, 'lta': 0.689266},
    'CCA': {'foscttm': 0.093715, 'lta': 0.768362},
    'MMD-MA': {'foscttm': 0.193447, 'lta': 0.531073},
    'UnionCom': {'foscttm': 0.212567, 'lta': 0.604520},
}


def main(quick=False):
    from jamie_tpu import JAMIE
    from jamie_tpu.compare import compare_methods

    np.random.seed(42)
    dataset, labels = load_scgem()
    results = {}

    t0 = time.perf_counter()
    jm = JAMIE(output_dim=32, epoch_DNN=3000 if quick else 10000,
               min_epochs=1000 if quick else 2500, batch_size=128,
               pca_dim=None, log_DNN=1000, epoch_chunk=500)
    emb = jm.fit_transform(dataset=dataset)
    results['JAMIE'] = {'foscttm': round(jm.test_closer(emb), 5),
                        'lta': round(jm.test_LabelTA(emb, labels), 4),
                        'seconds': round(time.perf_counter() - t0, 1)}

    t0 = time.perf_counter()
    baselines = compare_methods(
        dataset, labels,
        methods=('NLMA', 'LMA', 'CCA', 'MMD-MA', 'UnionCom'),
        output_dim=32,
        method_kwargs={
            'MMD-MA': {'n_iters': 2001 if quick else 10001},
            'UnionCom': {'epoch_pd': 500 if quick else 20000,
                         'epoch_DNN': 100, 'log_pd': 100_000},
        })
    for name, entry in baselines.items():
        results[name] = {k: round(v, 5) for k, v in entry.items()
                         if k != 'embeddings'}
    results['baseline_seconds'] = round(time.perf_counter() - t0, 1)
    results['reference'] = REFERENCE
    print(json.dumps(results, indent=2))
    return results


if __name__ == '__main__':
    main(quick='--quick' in sys.argv)
