"""Imputation method comparison (reference: DM_rep4-Imp.ipynb shape).

Train/test split; JAMIE cross-modal imputation vs kNN regression and the
simple-NN baseline; per-feature correlation + AUROC comparison figures and
a summary JSON. Synthetic paired data unless real matrices are supplied.
"""

import json

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


if __name__ == '__main__':
    main()
