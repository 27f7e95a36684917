"""scGEM parity pipeline: gene expression + DNA methylation, 177 cells.

Mirrors the reference's scGEM notebook (examples/notebooks/scGEM.ipynb):
per-feature z-scoring, JAMIE with the notebook's kwargs (cell 5), full /
75% / 50% priors, train/test imputation split, FOSCTTM + LTA + JS metrics.

Reference committed outputs (scGEM.ipynb cell 25 / BASELINE.md):
  FOSCTTM 0.00680, LTA 0.8870; LTA at 75% / 50% priors: 0.8362 / 0.7966.

Data is read from the read-only reference mount when present; the script
exits gracefully otherwise.
"""

import json
import os
import sys
import time

import numpy as np

DATA = '/root/reference/examples/data/UnionCom/scGEM/'

KWARGS = dict(
    output_dim=32, epoch_DNN=10000, min_epochs=2500, log_DNN=500,
    use_early_stop=True, batch_size=128, pca_dim=None,
    dist_method='euclidean', loss_weights=(1, 1, 1, 1), dropout=0,
    epoch_chunk=500,
)


def load_scgem():
    from jamie_tpu.io import load_matrix
    if not os.path.exists(DATA + 'GeneExpression.txt'):
        print('scGEM data not found at', DATA)
        sys.exit(0)
    data1 = load_matrix(DATA + 'GeneExpression.txt', dtype=np.float64)
    data2 = load_matrix(DATA + 'DNAmethylation.txt', dtype=np.float64)
    type1 = load_matrix(DATA + 'type1.txt', dtype=np.float64).astype(int)
    type2 = load_matrix(DATA + 'type2.txt', dtype=np.float64).astype(int)
    from sklearn import preprocessing
    data1 = preprocessing.scale(data1, axis=0)
    data2 = preprocessing.scale(data2, axis=0)
    data1[np.isnan(data1)] = 0
    data2[np.isnan(data2)] = 0
    return [data1.astype(np.float32), data2.astype(np.float32)], [type1, type2]


def reference_js_distance_mean(true, pred, labs, label_order):
    """Mean Jensen-Shannon DISTANCE over (label, feature) pairs, exactly as
    the notebook's plot_distribution_similarity prints it
    (jamie/evaluation.py:851-878: per-label per-feature JS between measured
    and imputed test cells; NaN -> distance 1; any exception — e.g. a label
    absent from the test subset — -> distance 0, i.e. counted as a perfect
    match; the printed 'Mean' is 1 - mean(similarities) = mean distance).

    The committed scGEM cell-29 outputs 0.4726 / 0.5317 are therefore mean
    DISTANCES (lower is better) — round 2 compared them against our mean
    similarity, inverting the sign of the comparison."""
    from jamie_tpu.utils import jensen_shannon_from_array
    sims = []
    for lab in label_order:
        for f in range(true.shape[1]):
            try:
                d = jensen_shannon_from_array(
                    [true[labs == lab, f], pred[labs == lab, f]])
                if np.isnan(d):
                    d = 1.0
            except Exception:
                d = 0.0
            sims.append(1.0 - d)
    return 1.0 - float(np.mean(sims))


def _imputation_metrics(jm_im, dataset, types, test_idx):
    """Per-feature Pearson r + reference-semantics mean JS distance for both
    modalities of a trained 80/20 imputation model."""
    out = {}
    imputed = [jm_im.modal_predict(dataset[(i + 1) % 2], (i + 1) % 2)
               for i in range(2)]
    label_order = np.unique(np.concatenate([np.asarray(t) for t in types]))
    for i in range(2):
        pred = imputed[i][test_idx]
        true = dataset[i][test_idx]
        rs = [np.corrcoef(pred[:, j], true[:, j])[0, 1]
              for j in range(true.shape[1]) if np.std(true[:, j]) > 0]
        out[f'imputation_r_mod{i + 1}'] = round(float(np.nanmean(rs)), 4)
        out[f'imputation_js_dist_mod{i + 1}'] = round(
            reference_js_distance_mean(true, pred,
                                       np.asarray(types[i])[test_idx],
                                       label_order), 4)
    return out


def imputation_multi_seed(n_seeds: int = 5, quick: bool = False,
                          reference_split: bool = False):
    """80/20-split imputation metrics over n_seeds seeds (VERDICT round-3
    item 6): mean +- sd of per-feature r and mean JS distance per modality,
    vs the committed cell-29 prints (0.4726 / 0.5317 mean JS distance).

    reference_split: reproduce the notebook's EXACT train/test split
    (np.random.seed(42), then train_idx is the first draw — scGEM.ipynb
    cells 2/4) and vary only the model seed, so the comparison against
    the committed single-draw numbers has no split variance in it."""
    from jamie_tpu import JAMIE

    dataset, types = load_scgem()
    n = len(dataset[0])
    kwargs = dict(KWARGS)
    if quick:
        kwargs.update(epoch_DNN=2000, min_epochs=500, epoch_pd=500)

    per = {}
    t0 = time.perf_counter()
    for seed in range(n_seeds):
        np.random.seed(42 if reference_split else seed)
        train_idx = np.random.choice(n, int(0.8 * n), replace=False)
        test_idx = np.array(sorted(set(range(n)) - set(train_idx)))
        jm_im = JAMIE(manual_seed=seed,
                      **{k: v for k, v in kwargs.items() if k != 'dropout'})
        jm_im.fit_transform(dataset=[d[train_idx] for d in dataset])
        m = _imputation_metrics(jm_im, dataset, types, test_idx)
        print(f'seed {seed}:', json.dumps(m), flush=True)
        for k, v in m.items():
            per.setdefault(k, []).append(v)

    results = {'n_seeds': n_seeds,
               'total_seconds': round(time.perf_counter() - t0, 1)}
    for k, v in per.items():
        results[k + '_mean'] = round(float(np.mean(v)), 4)
        results[k + '_sd'] = round(float(np.std(v)), 4)
        results[k + '_runs'] = v
    results['reference'] = {'imputation_js_dist_mod1': 0.4726,
                            'imputation_js_dist_mod2': 0.5317,
                            'note': 'committed cell-29 Mean prints are mean '
                                    'JS distances (lower better)'}
    print(json.dumps(results, indent=2))
    return results


def multi_seed(n_seeds: int = 5, quick: bool = False):
    """Full + partial-prior quality over n_seeds independent seeds
    (mean +- sd), making the parity claim robust to the 177-cell dataset's
    seed variance."""
    from jamie_tpu import JAMIE

    dataset, types = load_scgem()
    n = len(dataset[0])
    kwargs = dict(KWARGS)
    if quick:
        kwargs.update(epoch_DNN=2000, min_epochs=500, epoch_pd=500)

    per_seed = {'foscttm': [], 'lta': [], 'lta_75': [], 'lta_50': []}
    t0 = time.perf_counter()
    for seed in range(n_seeds):
        np.random.seed(seed)
        jm = JAMIE(manual_seed=seed, **kwargs)
        jm.fit_transform(dataset=dataset)
        jm_data = jm.transform(dataset=dataset)
        per_seed['foscttm'].append(jm.test_closer(jm_data))
        per_seed['lta'].append(jm.test_LabelTA(jm_data, types))
        for frac, name in ((0.75, 'lta_75'), (0.5, 'lta_50')):
            idx = np.random.choice(n, int(frac * n), replace=False)
            mask = np.zeros(n)
            mask[idx] = 1
            jm_p = JAMIE(manual_seed=seed, **kwargs)
            jm_p.fit_transform(dataset=dataset, P=np.diag(mask))
            p_data = jm_p.transform(dataset=dataset)
            per_seed[name].append(jm_p.test_LabelTA(p_data, types))
        print(f'seed {seed}: ' + ' '.join(
            f'{k}={per_seed[k][-1]:.4f}' for k in per_seed))

    results = {'n_seeds': n_seeds,
               'total_seconds': round(time.perf_counter() - t0, 1)}
    for k, v in per_seed.items():
        results[k + '_mean'] = round(float(np.mean(v)), 5)
        results[k + '_sd'] = round(float(np.std(v)), 5)
        results[k + '_runs'] = [round(float(x), 5) for x in v]
    results['reference'] = {'foscttm': 0.00680, 'lta': 0.8870,
                            'lta_75': 0.8362, 'lta_50': 0.7966}
    print(json.dumps(results, indent=2))
    return results


def ablation(n_seeds: int = 5, quick: bool = False):
    """Per-knob quality ablation on scGEM (VERDICT round-4 item 2): does any
    default of the round-3 perf stack cost quality at N=177? Arms are the
    full-config fit (FOSCTTM + LTA only) at n_seeds seeds each:

      default   f32 matmuls, default (threefry) prng   [= scgem.py KWARGS]
      rbg       prng_impl='rbg'                        [bench.py stack knob]
      bf16      model_matmul_dtype='bfloat16'          [bench.py stack knob]
      rbg+bf16  both                                   [the full bench stack]

    Compare each arm's band against the default arm (same seeds) and the
    reference point 0.887 LTA / 0.0068 FOSCTTM (scGEM.ipynb cell 25)."""
    from jamie_tpu import JAMIE

    dataset, types = load_scgem()
    kwargs = dict(KWARGS)
    if quick:
        kwargs.update(epoch_DNN=2000, min_epochs=500, epoch_pd=500)

    arms = {
        'default': {},
        'rbg': {'prng_impl': 'rbg'},
        'bf16': {'model_matmul_dtype': 'bfloat16'},
        'rbg+bf16': {'prng_impl': 'rbg', 'model_matmul_dtype': 'bfloat16'},
    }
    results = {'n_seeds': n_seeds,
               'reference': {'foscttm': 0.00680, 'lta': 0.8870}}
    t0 = time.perf_counter()
    for arm, extra in arms.items():
        fos, lta = [], []
        for seed in range(n_seeds):
            jm = JAMIE(manual_seed=seed, **{**kwargs, **extra})
            jm.fit_transform(dataset=dataset)
            jm_data = jm.transform(dataset=dataset)
            fos.append(float(jm.test_closer(jm_data)))
            lta.append(float(jm.test_LabelTA(jm_data, types)))
        results[arm] = {
            'foscttm_mean': round(float(np.mean(fos)), 5),
            'foscttm_sd': round(float(np.std(fos)), 5),
            'lta_mean': round(float(np.mean(lta)), 5),
            'lta_sd': round(float(np.std(lta)), 5),
            'lta_runs': [round(v, 5) for v in lta],
        }
        print(f'arm {arm}:', json.dumps(results[arm]), flush=True)
    results['total_seconds'] = round(time.perf_counter() - t0, 1)
    print(json.dumps(results, indent=2))
    return results


def main(quick: bool = False):
    from jamie_tpu import JAMIE

    np.random.seed(42)
    dataset, types = load_scgem()
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
    results['foscttm'] = round(jm.test_closer(jm_data), 5)
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

    # Imputation on an 80/20 split (cell 11), per-feature pearson r
    train_idx = np.random.choice(n, int(0.8 * n), replace=False)
    test_idx = np.array(sorted(set(range(n)) - set(train_idx)))
    jm_im = JAMIE(**{k: v for k, v in kwargs.items() if k != 'dropout'})
    jm_im.fit_transform(dataset=[d[train_idx] for d in dataset])
    results.update(_imputation_metrics(jm_im, dataset, types, test_idx))

    results['reference'] = {
        'foscttm': 0.00680, 'lta': 0.8870,
        'lta_75': 0.8362, 'lta_50': 0.7966,
    }
    print(json.dumps(results, indent=2))
    return results


if __name__ == '__main__':
    if '--ablation-seeds' in sys.argv:
        k = sys.argv.index('--ablation-seeds')
        ablation(n_seeds=int(sys.argv[k + 1]), quick='--quick' in sys.argv)
    elif '--imputation-seeds' in sys.argv:
        k = sys.argv.index('--imputation-seeds')
        imputation_multi_seed(n_seeds=int(sys.argv[k + 1]),
                              quick='--quick' in sys.argv,
                              reference_split='--reference-split'
                                              in sys.argv)
    elif '--seeds' in sys.argv:
        k = sys.argv.index('--seeds')
        multi_seed(n_seeds=int(sys.argv[k + 1]),
                   quick='--quick' in sys.argv)
    else:
        main(quick='--quick' in sys.argv)
