"""README-style walkthrough on synthetic branching data (the reference's
sample.ipynb shape: small paired modalities, fit -> integrate -> impute ->
visualize)."""

import numpy as np


def make_branching_pair(n=300, seed=42):
    """MMD-MA-style two-branch trajectory observed in two modalities."""
    rng = np.random.RandomState(seed)
    t = rng.rand(n)
    branch = rng.rand(n) > 0.5
    z = np.stack([t, t ** 2, np.where(branch, t, -t),
                  np.where(branch, 1.0, -1.0),
                  np.sin(3 * t), np.cos(3 * t)], axis=1)
    z += 0.05 * rng.randn(n, 6)
    x1 = z @ rng.randn(6, 2000) + 0.1 * rng.randn(n, 2000)
    x2 = z @ rng.randn(6, 1000) + 0.1 * rng.randn(n, 1000)
    labels = np.where(branch, 'branch-a', 'branch-b')
    return ([x1.astype(np.float32), x2.astype(np.float32)],
            [labels, labels])


def main():
    from jamie_tpu import JAMIE

    dataset, types = make_branching_pair()
    jm = JAMIE(min_epochs=500, epoch_DNN=2000, epoch_pd=500,
               batch_size=128, pca_dim=(64, 64), distance_mode='euclidean')
    integrated = jm.fit_transform(dataset=dataset)

    jm.test_closer(integrated)
    acc = jm.test_LabelTA(integrated, types)
    print('label transfer accuracy:', acc)

    imputed = jm.modal_predict(dataset[0], 0)
    r = np.nanmean([np.corrcoef(imputed[:, j], dataset[1][:, j])[0, 1]
                    for j in range(dataset[1].shape[1])])
    print('mean imputation r:', round(float(r), 3))

    jm.save_model('/tmp/jamie_sample_model.npz')
    print('saved to /tmp/jamie_sample_model.npz')

    try:
        import matplotlib
        matplotlib.use('Agg')
        import matplotlib.pyplot as plt
        from jamie_tpu.evaluation import plot_integrated
        plt.figure(figsize=(10, 4))
        plot_integrated(integrated, types, names=['Modality 1', 'Modality 2'],
                        method='pca', legend=True)
        plt.savefig('/tmp/jamie_sample_integrated.png', dpi=100)
        print('figure saved to /tmp/jamie_sample_integrated.png')
    except Exception as e:  # headless plotting is best-effort
        print('plotting skipped:', e)


if __name__ == '__main__':
    main()
