"""Imputation method comparison (reference: DM_rep4-Imp.ipynb shape).

Train/test split; JAMIE cross-modal imputation vs kNN regression and the
simple-NN baseline; per-feature correlation + AUROC comparison figures and
a summary JSON. Two modes:

  (default)          synthetic branching pair, single split — the quick
                     structural mirror of the notebook.
  --scgem [--seeds K]  the REAL scGEM 80/20 split repeated over K seeds
                     (VERDICT round-3 item 7): JAMIE vs kNN vs simple-NN
                     per-feature Pearson r on held-out cells, mean +- sd,
                     committed next to the JS numbers in RESULTS.md.
                     Reference baselines: jamie/utilities.py:423-474.
"""

import json
import sys
import time

import numpy as np

from sample import make_branching_pair


def main():
    import matplotlib
    matplotlib.use('Agg')
    import matplotlib.pyplot as plt

    from jamie_tpu import JAMIE
    from jamie_tpu.evaluation import plot_auroc_correlation
    from jamie_tpu.utils import predict_knn
    from jamie_tpu.models.baselines import predict_nn

    np.random.seed(42)
    dataset, types = make_branching_pair(n=400)
    n = len(dataset[0])
    train_idx = np.random.choice(n, int(0.8 * n), replace=False)
    test_idx = np.array(sorted(set(range(n)) - set(train_idx)))

    jm = JAMIE(epoch_DNN=2000, min_epochs=500, epoch_pd=500, batch_size=128,
               pca_dim=(64, 64), log_DNN=100000)
    jm.fit_transform(dataset=[d[train_idx] for d in dataset])
    jamie_pred = [jm.modal_predict(dataset[(i + 1) % 2], (i + 1) % 2)
                  for i in range(2)]

    knn_pred = [
        predict_knn(dataset[1][train_idx], dataset[0][train_idx],
                    val=dataset[1]),
        predict_knn(dataset[0][train_idx], dataset[1][train_idx],
                    val=dataset[0]),
    ]
    nn_pred = [
        predict_nn(dataset[1][train_idx], dataset[0][train_idx],
                   val=dataset[1], epochs=50),
        predict_nn(dataset[0][train_idx], dataset[1][train_idx],
                   val=dataset[0], epochs=50),
    ]

    def mean_r(pred, i):
        p, t = pred[i][test_idx], dataset[i][test_idx]
        rs = [np.corrcoef(p[:, j], t[:, j])[0, 1]
              for j in range(t.shape[1]) if np.std(t[:, j]) > 0]
        return round(float(np.nanmean(rs)), 4)

    results = {
        'jamie_r': [mean_r(jamie_pred, 0), mean_r(jamie_pred, 1)],
        'knn_r': [mean_r(knn_pred, 0), mean_r(knn_pred, 1)],
        'nn_r': [mean_r(nn_pred, 0), mean_r(nn_pred, 1)],
    }

    test_data = [d[test_idx] for d in dataset]
    test_imputed = [
        [jamie_pred[0][test_idx], jamie_pred[1][test_idx]],
        [knn_pred[0][test_idx], knn_pred[1][test_idx]],
    ]
    plt.figure(figsize=(9, 4))
    plot_auroc_correlation(test_imputed, test_data,
                           ['Modality 1', 'Modality 2'],
                           names=['JAMIE', 'kNN'])
    plt.savefig('/tmp/jamie_imputation_comparison.png', dpi=100)
    results['figure'] = '/tmp/jamie_imputation_comparison.png'
    print(json.dumps(results, indent=2))


def scgem_multi_seed(n_seeds: int = 5, quick: bool = False):
    """JAMIE vs kNN vs simple-NN cross-modal imputation on the real scGEM
    80/20 split, n_seeds independent splits. Per-feature Pearson r on test
    cells per modality (higher is better), mean +- sd per method."""
    from scgem import KWARGS, load_scgem

    from jamie_tpu import JAMIE
    from jamie_tpu.models.baselines import predict_nn
    from jamie_tpu.utils import predict_knn

    dataset, types = load_scgem()
    n = len(dataset[0])
    kwargs = {k: v for k, v in KWARGS.items() if k != 'dropout'}
    if quick:
        kwargs.update(epoch_DNN=2000, min_epochs=500, epoch_pd=500)

    def feature_rs(pred, i, test_idx):
        p, t = pred[test_idx], dataset[i][test_idx]
        return np.array([np.corrcoef(p[:, j], t[:, j])[0, 1]
                         for j in range(t.shape[1])
                         if np.std(t[:, j]) > 0])

    per = {}
    t0 = time.perf_counter()
    for seed in range(n_seeds):
        np.random.seed(seed)
        train_idx = np.random.choice(n, int(0.8 * n), replace=False)
        test_idx = np.array(sorted(set(range(n)) - set(train_idx)))
        train = [d[train_idx] for d in dataset]

        jm = JAMIE(manual_seed=seed, **kwargs)
        jm.fit_transform(dataset=train)
        preds = {
            'jamie': [jm.modal_predict(dataset[(i + 1) % 2], (i + 1) % 2)
                      for i in range(2)],
            'knn': [predict_knn(train[1], train[0], val=dataset[1]),
                    predict_knn(train[0], train[1], val=dataset[0])],
            'nn': [predict_nn(train[1], train[0], val=dataset[1],
                              epochs=200, seed=seed),
                   predict_nn(train[0], train[1], val=dataset[0],
                              epochs=200, seed=seed)],
        }
        row = {}
        rs = {method: [feature_rs(pr[i], i, test_idx) for i in range(2)]
              for method, pr in preds.items()}
        for method in preds:
            for i in range(2):
                row[f'{method}_r_mod{i + 1}'] = round(
                    float(np.nanmean(rs[method][i])), 4)
        # the reference figure's sign test (scGEM-Imp*.svg annotations):
        # features where JAMIE's per-feature r beats the baseline's
        for base in ('knn', 'nn'):
            for i in range(2):
                a, b = rs['jamie'][i], rs[base][i]
                row[f'jamie_gt_{base}_mod{i + 1}'] = (
                    f'{int(np.nansum(a > b))}/{int(np.nansum(b > a))}')
        print(f'seed {seed}:', json.dumps(row), flush=True)
        for k, v in row.items():
            per.setdefault(k, []).append(v)

    results = {'n_seeds': n_seeds, 'dataset': 'scGEM (real, 80/20)',
               'total_seconds': round(time.perf_counter() - t0, 1)}
    for k, v in per.items():
        if isinstance(v[0], str):     # sign-count strings: runs only
            results[k + '_runs'] = v
            continue
        results[k + '_mean'] = round(float(np.mean(v)), 4)
        results[k + '_sd'] = round(float(np.std(v)), 4)
        results[k + '_runs'] = v
    print(json.dumps(results, indent=2))
    return results


if __name__ == '__main__':
    if '--scgem' in sys.argv:
        k = (sys.argv.index('--seeds') + 1) if '--seeds' in sys.argv else None
        scgem_multi_seed(n_seeds=int(sys.argv[k]) if k else 5,
                         quick='--quick' in sys.argv)
    else:
        main()
