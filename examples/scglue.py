"""scGLUE parity pipeline: RNA + ATAC, 9190 cells (Chen 2019), the
reference's largest committed real-data fit.

Mirrors the reference's scGLUE notebook (examples/notebooks/scGLUE.ipynb
cells 3-10): the two `.h5ad` files load through jamie_tpu.io.read_h5ad
(natively on h5py — the notebook used scanpy), `obs.cell_type` labels,
per-feature z-scoring with NaN -> 0, JAMIE with the notebook's kwargs
(cell 5: batch 512, pca_dim [512, 512]), full + 75% + 50% diag priors.

Reference committed outputs (scGLUE.ipynb cell 26):
  FOSCTTM 0.000587, LTA 0.8461; LTA at 75% / 50% priors: 0.6705 / 0.6083.
  Total reference CPU fit: 52,557 s (time-and-memory.ipynb cell 33).

The raw matrices are stripped from this mount (examples/data/scGLUE holds
only READMEs), so the script exits gracefully here; wall-clock parity at
this exact shape runs synthetically in time_and_memory.py / bench.py.
"""

import json
import os
import sys
import time

import numpy as np

DATA = '/root/reference/examples/data/scGLUE/'

KWARGS = dict(
    output_dim=32, epoch_DNN=10000, min_epochs=2500, log_DNN=500,
    use_early_stop=True, batch_size=512, pca_dim=(512, 512),
    dist_method='euclidean', loss_weights=(1, 1, 1, 1), dropout=0,
    epoch_chunk=500,
)


def _zscore(x):
    """Per-feature standardization matching the notebook's
    preprocessing.scale(axis=0) + NaN -> 0, computed in float32 (the ATAC
    modality is 9190 x 241757; sklearn's float64 path would copy 17.8 GB)."""
    mean = x.mean(axis=0, dtype=np.float32)
    std = x.std(axis=0, dtype=np.float32)
    std[std == 0] = 1.0
    out = (x - mean) / std
    np.nan_to_num(out, copy=False)
    return out


def load_scglue():
    from jamie_tpu.io import read_h5ad
    rna_path = DATA + 'Chen-2019-RNA.h5ad'
    atac_path = DATA + 'Chen-2019-ATAC.h5ad'
    if not os.path.exists(rna_path):
        print('scGLUE h5ad data not found at', DATA,
              '(matrices are stripped from this mount; see '
              'time_and_memory.py --configs scglue for the synthetic '
              'wall-clock parity run at this exact shape)')
        sys.exit(0)
    rna = read_h5ad(rna_path, obs_columns=['cell_type'],
                    var_columns=['name'])
    atac = read_h5ad(atac_path, obs_columns=['cell_type'])
    dataset = [_zscore(rna.X), _zscore(atac.X)]
    types = [np.asarray(rna.obs['cell_type']),
             np.asarray(atac.obs['cell_type'])]
    return dataset, types


def main(quick: bool = False):
    from jamie_tpu import JAMIE

    np.random.seed(42)
    dataset, types = load_scglue()
    n = len(dataset[0])
    kwargs = dict(KWARGS)
    if quick:
        kwargs.update(epoch_DNN=2000, min_epochs=500, epoch_pd=500)

    results = {}

    # Full-correspondence integration (notebook cell 8)
    t0 = time.perf_counter()
    jm = JAMIE(**kwargs)
    jm.fit_transform(dataset=dataset)
    jm_data = jm.transform(dataset=dataset)
    results['fit_seconds'] = round(time.perf_counter() - t0, 1)
    results['foscttm'] = round(jm.test_closer(jm_data), 6)
    results['lta'] = round(jm.test_LabelTA(jm_data, types), 4)

    # Partial priors (cells 9-10): diag mask at 75% / 50%
    for frac, name in ((0.75, 'lta_75'), (0.5, 'lta_50')):
        idx = np.random.choice(n, int(frac * n), replace=False)
        mask = np.zeros(n)
        mask[idx] = 1
        jm_p = JAMIE(**kwargs)
        jm_p.fit_transform(dataset=dataset, P=np.diag(mask))
        p_data = jm_p.transform(dataset=dataset)
        results[name] = round(jm_p.test_LabelTA(p_data, types), 4)

    results['reference'] = {
        'foscttm': 0.000587, 'lta': 0.8461,
        'lta_75': 0.6705, 'lta_50': 0.6083,
        'fit_seconds_cpu': 52557.4,
    }
    print(json.dumps(results, indent=2))
    return results


if __name__ == '__main__':
    main(quick='--quick' in sys.argv)
