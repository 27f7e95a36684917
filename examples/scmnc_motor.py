"""scMNC mouse motor cortex parity pipeline: transcriptomics +
electrophysiology, 1208 cells (Patch-seq).

Mirrors the reference's scMNC-Motor notebook (examples/notebooks/
scMNC-Motor.ipynb cells 3-5): gene expression transposed to cells x genes,
29 e-features, per-feature z-scoring with NaN -> 0, labels = first word of
the metadata 'RNA family', JAMIE with batch_size=256 / pca_dim=[512,512].

The notebook reads geneExp_filtered.csv (stripped from this mount); the same
matrices ship in motor_data_filtered.rda, decoded by jamie_tpu.rdata.

Reference committed outputs (scMNC-Motor.ipynb cell 25):
  FOSCTTM 0.0025, LTA 0.8957; LTA at 75% / 50% priors: 0.8286 / 0.7599.
  Total reference CPU fit: 526.5 s (distance 1.45 / F 170.6 / train 354.4).
"""

import json
import os
import sys
import time

import numpy as np

DATA = '/root/reference/examples/data/scMNC/mouse_motor_cortex/data/'

KWARGS = dict(
    output_dim=32, epoch_DNN=10000, min_epochs=2500, log_DNN=500,
    use_early_stop=True, batch_size=256, pca_dim=(512, 512),
    dist_method='euclidean', loss_weights=(1, 1, 1, 1), dropout=0,
    epoch_chunk=500,
)


def load_scmnc_motor(normalize=None):
    """normalize: None -> the shipped log-CPM-1e4 default, or a callable
    applied to the raw cells x genes count matrix (the sweep harness,
    examples/scmnc_motor_sweep.py, passes the candidates)."""
    from jamie_tpu.rdata import load_rda
    path = DATA + 'motor_data_filtered.rda'
    if not os.path.exists(path):
        print('scMNC motor data not found at', DATA)
        sys.exit(0)
    d = load_rda(path)
    gdata = d['gdata']['matrix']                        # genes x cells
    sample_names = np.asarray(d['gdata']['dimnames'][1])
    edata = d['edata']
    efeat_names = [k for k in edata if k != '__row_names__']
    e_rows = np.asarray(edata['__row_names__'])
    assert (e_rows == sample_names).all()
    data1 = gdata.T.astype(np.float64)                  # cells x genes
    # The rda ships RAW counts (ints to 165k); the notebook's (stripped)
    # geneExp_filtered.csv was normalized. The round-3 provenance sweep
    # (examples/scmnc_motor_sweep.py; RESULTS.md table) covered 11 standard
    # transforms: every one lands at LTA 0.853-0.873 (4-seed winners
    # 0.869-0.870 +- 0.006) vs the notebook's single-seed 0.8957, while
    # FOSCTTM beats the reference 100x — the residual is attributed to the
    # stripped CSV's unknown transform, not a recoverable choice. Shipped
    # default: scanpy-style median-depth normalize_total + log1p, the best
    # mean (tied with sqrt-CPM-1e4) and the most plausible provenance.
    if normalize is None:
        normalize = lambda x: np.log1p(
            x / np.maximum(x.sum(1, keepdims=True), 1.0)
            * np.median(x.sum(1)))
    data1 = normalize(data1)
    data2 = np.stack([np.asarray(edata[k], np.float64)
                      for k in efeat_names], axis=1)
    meta = d['meta']
    cells = np.asarray(meta['Cell'])
    fam = np.asarray(meta['RNA family'])
    meta_idx = [np.argwhere(cells == s)[0][0] for s in sample_names]
    types = np.array([str(x).split()[0] for x in fam[meta_idx]])

    from sklearn import preprocessing
    data1 = preprocessing.scale(data1, axis=0)
    data2 = preprocessing.scale(data2, axis=0)
    data1[np.isnan(data1)] = 0
    data2[np.isnan(data2)] = 0
    return ([data1.astype(np.float32), data2.astype(np.float32)],
            [types, types])


def multi_seed(n_seeds=3, quick=False):
    """Full-prior quality over n_seeds seeds (mean +- sd)."""
    from jamie_tpu import JAMIE

    dataset, types = load_scmnc_motor()
    kwargs = dict(KWARGS)
    if quick:
        kwargs.update(epoch_DNN=3000, min_epochs=1000)
    per = {'foscttm': [], 'lta': []}
    t0 = time.perf_counter()
    for seed in range(n_seeds):
        np.random.seed(seed)
        jm = JAMIE(manual_seed=seed, **kwargs)
        jm.fit_transform(dataset=dataset)
        emb = jm.transform(dataset=dataset)
        per['foscttm'].append(jm.test_closer(emb))
        per['lta'].append(jm.test_LabelTA(emb, types))
        print(f'seed {seed}: foscttm={per["foscttm"][-1]:.5f} '
              f'lta={per["lta"][-1]:.4f}')
    results = {'n_seeds': n_seeds,
               'total_seconds': round(time.perf_counter() - t0, 1)}
    for k, v in per.items():
        results[k + '_mean'] = round(float(np.mean(v)), 5)
        results[k + '_sd'] = round(float(np.std(v)), 5)
        results[k + '_runs'] = [round(float(x), 5) for x in v]
    results['reference'] = {'foscttm': 0.0025, 'lta': 0.8957}
    print(json.dumps(results, indent=2))
    return results


def main(quick=False, partial=False):
    from jamie_tpu import JAMIE

    np.random.seed(42)
    dataset, types = load_scmnc_motor()
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
        'foscttm': 0.0025, 'lta': 0.8957,
        'lta_75': 0.8286, 'lta_50': 0.7599,
        'cpu_total_seconds': 526.5,
    }
    print(json.dumps(results, indent=2))
    return results


if __name__ == '__main__':
    if '--seeds' in sys.argv:
        k = sys.argv.index('--seeds')
        multi_seed(n_seeds=int(sys.argv[k + 1]),
                   quick='--quick' in sys.argv)
    else:
        main(quick='--quick' in sys.argv, partial='--partial' in sys.argv)
