"""General utilities: triage, hashing, JS distance, tuning, legacy plots.

Reference parity: jamie/utilities.py —
- `outliers` (:20-45), `identity` (:48-50), `reduce_sample_data` (:53-58)
- `visualize_mapping` (:135-151), `uc_visualize` (:154-270)
- `ensure_list` (:273-276), `set_yticks` (:477-482)
- `tune_cm` random search over loss weights (:485-503)
- `sort_by_interest` feature triage (:506-607)
- `hash_kwargs` config hashing (:610-636)
- `jensen_shannon_from_array` (:639-651)
- `predict_knn` (:423-441) / `predict_nn` (:445-474) baselines (the NN
  baselines live in models/baselines.py)
- `time_logger` is TimeLogger in core/timing.py (re-exported here).
"""

from __future__ import annotations

import contextlib
import numpy as np
from scipy import stats
from scipy.spatial import distance as _sp_distance

from .core.timing import TimeLogger as time_logger  # noqa: N813 (ref name)
from .preprocess import identity  # noqa: F401 (re-export)


def outliers(x, leniency=1.5, aggregate=False, return_limits=False,
             verbose=False):
    """IQR box-and-whisker outlier detector (utilities.py:20-45)."""
    x = np.asarray(x)
    Q1 = np.percentile(x, 25, axis=0, keepdims=True)
    Q3 = np.percentile(x, 75, axis=0, keepdims=True)
    span = Q3 - Q1
    lower_bound = Q1 - leniency * span
    upper_bound = Q3 + leniency * span
    if verbose:
        print(f'Lower: {lower_bound}')
        print(f'Upper: {upper_bound}')
    result = (x < lower_bound) + (x > upper_bound)
    if aggregate:
        result = np.prod(result, axis=1)
    if return_limits:
        return result, (lower_bound, upper_bound, span)
    return result


def ensure_list(x):
    """Coerce scalars to arrays (utilities.py:273-276)."""
    if not (isinstance(x, np.ndarray) or isinstance(x, list)):
        return np.array([x])
    return np.array(x)


def reduce_sample_data(df, num_samples=1000, num_features=1000):
    """Reduce a sparse matrix's features by std (utilities.py:53-58)."""
    sample = df[:num_samples]
    std = sample.power(2).mean(axis=0) - np.power(sample.mean(axis=0), 2)
    ret_idx = np.squeeze(np.array(np.argsort(-std)))[:num_features]
    return df[:, ret_idx]


def set_yticks(ax, num_ticks):
    """Evenly spaced y ticks (utilities.py:477-482)."""
    yrange = (ax.get_ylim()[1] - ax.get_ylim()[0])
    bottom = ax.get_ylim()[0] + .1 * yrange
    top = ax.get_ylim()[1] - .1 * yrange
    ax.set_yticks(np.round(np.linspace(bottom, top, num_ticks), 1))


def jensen_shannon_from_array(datasets, resolution=1000, normalize=False):
    """Histogram-PDF Jensen-Shannon distance (utilities.py:639-651)."""
    data = [np.array(datasets[j]) for j in range(len(datasets))]
    if normalize:
        from sklearn import preprocessing
        data = [preprocessing.scale(d, axis=0) for d in datasets]
    X = np.linspace(np.min(data), np.max(data), resolution)
    hists = [np.histogram(data[j], bins='auto') for j in range(len(datasets))]
    rvs = [stats.rv_histogram(h) for h in hists]
    pdfs = [[rv.pdf(x) for x in X] for rv in rvs]
    return _sp_distance.jensenshannon(*pdfs)


def sort_by_interest(datasets, int_thresh=.8, limit=20, remove_outliers=True,
                     sort_type='entropy-corr'):
    """Rank (real, imputed) features for figure selection
    (utilities.py:506-607)."""
    assert sort_type in ('entropy-corr', 'js-mse', 'js', 'mse'), (
        f'Unknown sort type {sort_type}.')
    if limit is None:
        limit = datasets[0].shape[1]
    datasets = [np.asarray(d) for d in datasets]

    if sort_type == 'entropy-corr':
        if remove_outliers:
            dataset0_features = [
                datasets[0][~outliers(datasets[0][:, i]), i]
                for i in range(datasets[0].shape[1])]
        else:
            dataset0_features = [datasets[0][:, i]
                                 for i in range(datasets[0].shape[1])]
        distribution_true = [
            np.histogram(d, bins=np.linspace(np.min(d), np.max(d), 100))[0]
            for d in dataset0_features]
        entropy_arr = np.array([stats.entropy(t) for t in distribution_true])
        entropy_arr[np.isnan(entropy_arr)] = 0
        entropy_arr[np.isinf(entropy_arr)] = 0
        corr_arr = np.array([
            stats.pearsonr(datasets[0][:, i], datasets[1][:, i])[0]
            for i in range(datasets[0].shape[1])])
        corr_arr[np.isnan(corr_arr)] = -1
        temp_order = np.argsort(5e-1 * np.log(1 + entropy_arr) + corr_arr)[::-1]
    elif sort_type in ('js-mse', 'js'):
        js_arr = [jensen_shannon_from_array([d[:, i] for d in datasets])
                  for i in range(datasets[0].shape[1])]
        temp_order = np.argsort(js_arr)
    elif sort_type == 'mse':
        dist_arr = np.array([
            np.mean(np.sum(((datasets[0][:, i] - datasets[1][:, i])
                            / np.std(datasets[1][:, i])) ** 2))
            for i in range(datasets[0].shape[1])])
        dist_arr[np.isnan(dist_arr)] = np.inf
        temp_order = np.argsort(dist_arr)

    # Filter for interest and diversity (utilities.py:586-600)
    feature_idx = []
    for i in temp_order:
        if len(feature_idx) >= limit:
            break
        if len(feature_idx) == 0:
            feature_idx.append(i)
            continue
        corr = [stats.pearsonr(datasets[0][:, i], datasets[0][:, idx])[0]
                for idx in feature_idx]
        corr = [c for c in corr if not np.isnan(c)]
        if all(corr) or len(corr) == 0:
            feature_idx.append(i)
    feature_idx = np.array(feature_idx)
    return temp_order, feature_idx


def hash_kwargs(kwargs, dataset_name, dataset):
    """Canonical non-default-args string for cache filenames
    (utilities.py:610-636). Same output contract: (size_str, hash_str)."""
    DEFAULT_KWARGS = {
        'output_dim': 32,
        'epoch_DNN': 10000,
        'min_epochs': 2500,
        'log_DNN': 500,
        'use_early_stop': True,
        'batch_size': 512,
        'pca_dim': 2 * [512],
        'dist_method': 'euclidean',
        'loss_weights': [1, 1, 1, 1],
        'use_f_tilde': True,
        'dropout': .6,
    }
    kwargs = {k: v for k, v in kwargs.items()
              if k not in ('enable_memory_logging',)}
    fromChar = [' ', '),', '(', ')', ',', "'", '[', ']']
    toChar = ['', '--', '', '', '-', '', '(', ')']
    kwargs_str = str([kv for kv in sorted(kwargs.items())
                      if kv[1] != DEFAULT_KWARGS.get(kv[0], object())])[1:-1]
    for f, t in zip(fromChar, toChar):
        kwargs_str = kwargs_str.replace(f, t)
    size_str = '---'.join([
        dataset_name,
        '-'.join(str(s) for s in dataset[0].shape),
        '-'.join(str(s) for s in dataset[1].shape)])
    hash_str = ('---'.join([size_str, kwargs_str])
                if len(kwargs_str) > 0 else size_str)
    return size_str, hash_str


def tune_cm(cm, dataset, types, wt_size, num_search=20):
    """Random search over loss weights maximizing LTA (utilities.py:485-503)."""
    best_acc = 0
    best_wt = None
    best_cm_data = None
    wt_str = np.random.rand(wt_size * num_search)
    for i in range(num_search):
        wt = wt_str[wt_size * i:wt_size * (i + 1)]
        with contextlib.redirect_stdout(None):
            cm.config = cm.config.replace(loss_weights=tuple(wt))
            cm_data = cm.fit_transform(dataset=dataset)
            acc = cm.test_LabelTA(cm_data, types)
        if acc > best_acc:
            best_cm_data = cm_data
            best_acc = acc
            best_wt = wt
        print(f'Done:{100 * (i + 1) / num_search:.1f}%; Max:{best_acc:.3f}; '
              f'Curr:{acc:.3f}', end='\r')
    print()
    print(f'Best Weights: {best_wt}')
    return best_wt, best_cm_data


def predict_knn(input, output, val=None, k=5):
    """kNN regression imputation baseline (utilities.py:423-441)."""
    from sklearn.neighbors import KNeighborsRegressor
    knn = KNeighborsRegressor(n_neighbors=k)
    knn.fit(input, output)
    if val is not None:
        return knn.predict(val)
    return knn.predict(input)


def predict_nn(source, target, val=None, epochs=200, batch_size=32):
    """Simple-NN imputation baseline (utilities.py:445-474); flax version in
    models/baselines.py."""
    from .models.baselines import predict_nn as _predict_nn
    return _predict_nn(source, target, val=val, epochs=epochs,
                       batch_size=batch_size)


# ---------------------------------------------------------------- legacy viz
def visualize_mapping(mapping, primary=0):
    """PCA overlay of two mappings (utilities.py:135-151)."""
    import matplotlib.pyplot as plt
    from .preprocess import PCA
    assert len(mapping) == 2, (
        'Currently, ``visualize_mapping`` only supports 2 mappings')
    pca = PCA(n_components=2)
    pca.fit(mapping[primary])
    for i, m in enumerate(mapping):
        m_pca = pca.transform(m)
        label = f'Mapping {i + 1}'
        if i == primary:
            s, c = 20, 'orange'
        else:
            s, c = 2, 'blue'
        plt.scatter(m_pca[:, 0], m_pca[:, 1], label=label, s=s, c=c)
    plt.title('JAMIE PCA Plot')
    plt.legend(loc='best')


def uc_visualize(data, data_integrated, datatype=None, mode=None):
    """Two-panel integration plot, UnionCom-derived (utilities.py:154-270)."""
    import matplotlib.pyplot as plt
    from .preprocess import PCA
    assert (mode in ['PCA', 'UMAP', 'TSNE'] or mode is None), (
        "Mode has to be one of 'PCA', 'UMAP', 'TSNE', or None.")
    dataset_num = len(data)

    def embed_data(d):
        if mode == 'PCA':
            return PCA(n_components=2).fit(d).transform(d)
        elif mode == 'TSNE':
            from sklearn.manifold import TSNE
            return TSNE(n_components=2).fit_transform(d)
        elif mode == 'UMAP':
            try:
                import umap
                return umap.UMAP(n_components=2).fit_transform(d)
            except ImportError:
                import warnings
                warnings.warn('umap unavailable; using PCA.')
                return PCA(n_components=2).fit(d).transform(d)
        else:
            return d[:, :2]

    label_x, label_y = {
        'PCA': ('PCA-1', 'PCA-2'), 'TSNE': ('TSNE-1', 'TSNE-2'),
        'UMAP': ('UMAP-1', 'UMAP-2')}.get(mode, ('NONE-1', 'NONE-2'))

    embedding = [embed_data(data[i]) for i in range(dataset_num)]
    dataset_xyz = [f'data{i + 1}' for i in range(dataset_num)]

    plt.figure()
    for i in range(dataset_num):
        plt.subplot(1, dataset_num, i + 1)
        if datatype is not None:
            for j in set(datatype[i]):
                index = np.where(datatype[i] == j)
                plt.scatter(embedding[i][index, 0], embedding[i][index, 1],
                            s=5.)
        else:
            plt.scatter(embedding[i][:, 0], embedding[i][:, 1], s=5.)
        plt.title(dataset_xyz[i])
        plt.xlabel(label_x)
        plt.ylabel(label_y)
    plt.tight_layout()

    data_all = np.vstack(data_integrated)
    embedding_all = embed_data(data_all)
    num = np.cumsum([0] + [d.shape[0] for d in data_integrated])
    embedding = [embedding_all[num[i]:num[i + 1]] for i in range(dataset_num)]
    color = [[1, 0.5, 0], [0.2, 0.4, 0.1], [0.1, 0.2, 0.8],
             [0.5, 1, 0.5], [0.1, 0.8, 0.2]]

    plt.figure()
    if datatype is not None:
        datatype_all = np.hstack(datatype)
        plt.subplot(1, 2, 1)
        for i in range(dataset_num):
            plt.scatter(embedding[i][:, 0], embedding[i][:, 1], c=[color[i]],
                        s=5., alpha=0.8)
        plt.title('Integrated Embeddings')
        plt.xlabel(label_x)
        plt.ylabel(label_y)
        plt.subplot(1, 2, 2)
        for j in set(datatype_all):
            index = np.where(datatype_all == j)
            plt.scatter(embedding_all[index, 0], embedding_all[index, 1],
                        s=5., alpha=0.8)
        plt.title('Integrated Cell Types')
        plt.xlabel(label_x)
        plt.ylabel(label_y)
    else:
        for i in range(dataset_num):
            plt.scatter(embedding[i][:, 0], embedding[i][:, 1], c=[color[i]],
                        s=5., alpha=0.8)
        plt.title('Integrated Embeddings')
        plt.xlabel(label_x)
        plt.ylabel(label_y)
    plt.tight_layout()
