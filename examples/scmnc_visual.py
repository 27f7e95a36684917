"""scMNC mouse visual cortex parity pipeline: transcriptomics +
electrophysiology, 3654 cells (Patch-seq).

Mirrors the reference's scMNC-Visual notebook (examples/notebooks/
scMNC-Visual.ipynb cells 3-5): gene-expression matrix transposed to
cells x genes, e-features from column 3 on, per-feature z-scoring with
NaN -> 0, JAMIE with batch_size=512 / pca_dim=[512,512].

Reference committed outputs (scMNC-Visual.ipynb cell 25 / BASELINE.md):
  FOSCTTM 0.00264, LTA 0.9502; LTA at 75% / 50% priors: 0.9031 / 0.8623.
  Total reference CPU fit: 5629.7 s (distance 39.9 / F 4465.0 / train 1124.8).
"""

import json
import os
import sys
import time

import numpy as np

DATA = '/root/reference/examples/data/scMNC/mouse_visual_cortex/data/'

KWARGS = dict(
    output_dim=32, epoch_DNN=10000, min_epochs=2500, log_DNN=500,
    use_early_stop=True, batch_size=512, pca_dim=(512, 512),
    dist_method='euclidean', loss_weights=(1, 1, 1, 1), dropout=0,
    epoch_chunk=500,
)


def load_scmnc_visual():
    import pandas as pd
    if not os.path.exists(DATA + 'geneExp_filtered.csv'):
        print('scMNC visual data not found at', DATA)
        sys.exit(0)
    data1 = pd.read_csv(DATA + 'geneExp_filtered.csv')
    data2 = pd.read_csv(DATA + 'efeature_filtered.csv')
    sample_names1 = data1.columns[1:]
    sample_names2 = np.array(data2)[:, 0]
    assert (sample_names1 == sample_names2).all()
    data1 = np.transpose(np.array(data1)[:, 1:]).astype(np.float64)
    data2 = np.array(data2)[:, 3:].astype(np.float64)
    meta = pd.read_csv(DATA + '20200711_patchseq_metadata_mouse.csv')[
        ['transcriptomics_sample_id', 't_type']]
    meta = np.array(meta)
    meta_idx = [np.argwhere(meta[:, 0] == sample_names1[i])[0][0]
                for i in range(sample_names1.shape[0])]
    types = np.array([x.split(' ')[0] for x in meta[meta_idx, 1]])

    from sklearn import preprocessing
    data1 = preprocessing.scale(data1, axis=0)
    data2 = preprocessing.scale(data2, axis=0)
    data1[np.isnan(data1)] = 0
    data2[np.isnan(data2)] = 0
    return ([data1.astype(np.float32), data2.astype(np.float32)],
            [types, types])


def main(quick=False, partial=False):
    from jamie_tpu import JAMIE

    np.random.seed(42)
    dataset, types = load_scmnc_visual()
    print('shapes:', [d.shape for d in dataset])
    n = len(dataset[0])
    kwargs = dict(KWARGS)
    if quick:
        kwargs.update(epoch_DNN=3000, min_epochs=1000)

    results = {}
    t0 = time.perf_counter()
    jm = JAMIE(**kwargs)
    jm.fit_transform(dataset=dataset)
    results['fit_seconds'] = round(time.perf_counter() - t0, 1)
    jm_data = jm.transform(dataset=dataset)
    results['foscttm'] = round(jm.test_closer(jm_data), 5)
    results['lta'] = round(jm.test_LabelTA(jm_data, types), 4)
    results['epochs_run'] = jm.epochs_run

    if partial:
        for frac, name in ((0.75, 'lta_75'), (0.5, 'lta_50')):
            idx = np.random.choice(n, int(frac * n), replace=False)
            mask = np.zeros(n)
            mask[idx] = 1
            jm_p = JAMIE(**kwargs)
            jm_p.fit_transform(dataset=dataset, P=np.diag(mask))
            p_data = jm_p.transform(dataset=dataset)
            results[name] = round(jm_p.test_LabelTA(p_data, types), 4)

    results['reference'] = {
        'foscttm': 0.00264, 'lta': 0.9502,
        'lta_75': 0.9031, 'lta_50': 0.8623,
        'cpu_total_seconds': 5629.7,
    }
    print(json.dumps(results, indent=2))
    return results


if __name__ == '__main__':
    main(quick='--quick' in sys.argv, partial='--partial' in sys.argv)
