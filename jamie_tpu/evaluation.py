"""Evaluation metrics and figures.

Reference parity: jamie/evaluation.py — metrics `test_partial` (:28-62),
`test_closer` (:65-85), `test_label_dist` (:88-111), `test_LabelTA`
(:114-132); figure suite (:135-962); occlusion explanation `evaluate_impact`
(:965-1043).

TPU-first: FOSCTTM and kNN label transfer are O(N^2) distance jobs — they run
on device (MXU Gram matmuls + top_k). Plotting stays matplotlib on host.
Occlusion importance (`evaluate_impact`) is a batch-of-perturbations job; the
device path evaluates many occluded variants per dispatch.
"""

from __future__ import annotations

import contextlib
import math
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from .ops.distances import _pairwise_euclidean_impl, pairwise_distance

__all__ = [
    'test_partial', 'test_closer', 'test_label_dist', 'test_LabelTA',
    'knn_label_transfer_accuracy', 'evaluate_impact',
    'occlusion_impact_device', 'shap_explain',
    'plot_regular', 'plot_integrated', 'plot_accuracy',
    'plot_accuracy_table', 'plot_accuracy_graph', 'plot_silhouette',
    'plot_auroc', 'plot_correlation', 'plot_auroc_correlation',
    'plot_sample', 'plot_distribution', 'plot_distribution_alone',
    'plot_distribution_similarity', 'plot_impact',
]


# --------------------------------------------------------------------------
# Metrics
# --------------------------------------------------------------------------
@jax.jit
def _foscttm_device(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    d = _pairwise_euclidean_impl(a, b, squared=True)
    diag = jnp.diagonal(d)
    closer_ab = jnp.sum(d < diag[:, None])
    closer_ba = jnp.sum(d < diag[None, :])
    n = a.shape[0]
    return (closer_ab + closer_ba) / (2.0 * n * n)


def test_closer(integrated_data, distance_metric=None):
    """FOSCTTM (evaluation.py:65-85); device fast path by default."""
    assert len(integrated_data) == 2, 'Two datasets are supported for FOSCTTM'
    if distance_metric is not None:
        distances = distance_metric(np.concatenate(integrated_data, axis=0))
        size = integrated_data[0].shape[0]
        raw = 0
        for i in range(size):
            local = distances[i][size:]
            raw += np.sum(local < local[i])
            local = distances[size + i][:size]
            raw += np.sum(local < local[i])
        foscttm = raw / (2 * size ** 2)
    else:
        foscttm = float(_foscttm_device(
            jnp.asarray(integrated_data[0], jnp.float32),
            jnp.asarray(integrated_data[1], jnp.float32)))
    print(f'foscttm: {foscttm}')
    return foscttm


def test_label_dist(integrated_data, datatype, distance_metric=None,
                    verbose=True):
    """Average inter-label centroid distances (evaluation.py:88-111)."""
    assert len(integrated_data) == 2, (
        'Two datasets are supported for ``label_dist``')
    data = np.concatenate(integrated_data, axis=0)
    labels = np.concatenate(datatype)
    keys = np.unique(labels)
    centroids = np.stack(
        [np.average(data[labels == lab, :], axis=0) for lab in keys])
    if distance_metric is None:
        dist = np.asarray(pairwise_distance(centroids, 'euclidean'))
    else:
        dist = distance_metric(centroids)
    if verbose:
        print(f'Inter-label distances ({list(keys)}):')
        print(dist)
    return keys, dist


def knn_label_transfer_accuracy(integrated_data, datatype, k: Optional[int] = None):
    """kNN classifier transferring labels modality 1 -> 0 on device.

    Semantics of sklearn KNeighborsClassifier majority vote with the
    reference's auto-k rule (20% of average class size, jamie.py:946-949).
    """
    if k is None:
        total_size = min(*[len(d) for d in datatype])
        num_classes = len(np.unique(np.concatenate(datatype)).flatten())
        k = int(0.2 * total_size / num_classes)
    k = max(int(k), 1)
    fit_x = jnp.asarray(integrated_data[1], jnp.float32)
    query = jnp.asarray(integrated_data[0], jnp.float32)
    _, fit_labels = np.unique(np.asarray(datatype[1]), return_inverse=True)
    uniq = np.unique(np.asarray(datatype[1]))
    k = min(k, fit_x.shape[0])

    d = _pairwise_euclidean_impl(query, fit_x, squared=True)
    _, nn_idx = jax.lax.top_k(-d, k)
    votes = jnp.asarray(fit_labels)[nn_idx]                   # (Nq, k)
    onehot = jax.nn.one_hot(votes, uniq.shape[0])
    counts = jnp.sum(onehot, axis=1)                          # (Nq, C)
    pred = np.asarray(jnp.argmax(counts, axis=1))
    pred_labels = uniq[pred]
    acc = float(np.mean(pred_labels == np.asarray(datatype[0])))
    return acc, k


def test_LabelTA(integrated_data, datatype, k=5, return_k=False):
    """Label-transfer accuracy (evaluation.py:114-132; default k=5)."""
    acc, k = knn_label_transfer_accuracy(integrated_data, datatype, k=k)
    print(f'label transfer accuracy: {acc}')
    if return_k:
        return acc, k
    return acc


def test_partial(datasets, types, fraction_range=None, plot=True, **kwargs):
    """Partial-alignment sweep (evaluation.py:28-62): refit with diag priors
    masked to each fraction, track LTA + FOSCTTM."""
    from .estimator import JAMIE
    if fraction_range is None:
        fraction_range = np.linspace(0, 1, 3)
    assert len(datasets[0]) == len(datasets[1]), 'Datasets must be aligned.'

    types = [np.unique(t, return_inverse=True)[1] for t in types]
    num_samples = len(datasets[0])
    acc_list = {'lta': [], 'foscttm': []}
    for fraction in fraction_range:
        random_idx = np.random.choice(
            range(num_samples), int(fraction * num_samples), replace=False)
        random_diag = np.zeros(num_samples)
        random_diag[random_idx] = 1
        cm = JAMIE(P=np.diag(random_diag), **kwargs)
        with contextlib.redirect_stdout(None):
            cm_data = cm.fit_transform(dataset=datasets)
            acc_list['lta'].append(cm.test_LabelTA(cm_data, types))
            acc_list['foscttm'].append(cm.test_closer(cm_data))

    if plot:
        import matplotlib.pyplot as plt
        for key, v in acc_list.items():
            plt.plot(fraction_range, v, '.-', label=key)
        plt.xlabel('Fraction Assumed Aligned')
        plt.ylabel('Statistic')
        plt.legend()
    return acc_list, fraction_range


# --------------------------------------------------------------------------
# Occlusion-based feature importance
# --------------------------------------------------------------------------
def evaluate_impact(function, perf_function, in_data, true, features=None,
                    idx=None, mode='replace', sequential=False, scan=None,
                    scan_samples=500, seed=42):
    """Occlusion importance (evaluation.py:965-1043): replace each feature
    with the background mean, measure the performance delta. `scan` first
    ranks features on a subset, then evaluates the top `scan` in full."""
    assert mode in ['replace', 'keep']
    if seed is not None:
        np.random.seed(seed)

    testing_idx = idx if idx is not None else np.arange(in_data.shape[1])
    in_data = np.array(in_data)
    background = in_data.mean(0)

    logits = function(in_data)
    baseline = perf_function(logits, true)

    if scan is not None:
        print('Performing preliminary scan...')
        sample_idx = np.random.choice(in_data.shape[0],
                                      min(scan_samples, in_data.shape[0]),
                                      replace=False)
        true_mini = true[sample_idx] if true is not None else None
        performance = _evaluate_impact_helper(
            lambda x: function(x, idx=sample_idx), perf_function,
            in_data[sample_idx, :], true_mini, background, baseline,
            testing_idx, mode, sequential, features=features)
        if mode == 'keep':
            performance = -performance
        testing_idx = testing_idx[np.argsort(performance)[:scan]]
    print('Finding important features...')
    performance = _evaluate_impact_helper(
        function, perf_function, in_data, true, background, baseline,
        testing_idx, mode, sequential, features=features)
    print('Done!')
    return baseline, performance, testing_idx


def _evaluate_impact_helper(function, perf_function, in_data, true,
                            background, baseline, testing_idx, mode,
                            sequential, features=None, check_best=10):
    performance = []
    best_perf = -np.inf
    best_str = ''
    for i, idx in enumerate(testing_idx):
        if (i + 1) % check_best == 0 and len(performance) > 0:
            if mode == 'replace':
                best_i = int(np.argmax(-np.array(performance)))
            else:
                best_i = int(np.argmax(performance))
            best_perf = performance[best_i]
            best_str = (features[testing_idx[best_i]]
                        if features is not None else 'NA')
        prog = math.floor(50 * (i + 1) / len(testing_idx)) * '|'
        print(f'{i + 1:>{len(str(len(testing_idx)))}}/{len(testing_idx)} '
              f'[{prog:<50}] - Current Best: {best_perf:.5f}, {best_str}',
              end='\r')

        mod_data = in_data
        if mode == 'replace':
            replace_idx = idx
        else:
            replace_idx = [j != idx for j in range(mod_data.shape[1])]
        old_data = mod_data[:, replace_idx]
        if not sequential:
            old_data = old_data.copy()
        mod_data[:, replace_idx] = background[replace_idx]
        logits = function(mod_data)
        mod_data[:, replace_idx] = old_data
        perf = perf_function(logits, true)
        if np.isnan(perf):
            perf = np.inf
        performance.append(perf)
    print()
    return np.array(performance)


def occlusion_impact_device(estimator, in_data, true, modality: int = 0,
                            batch_features: int = 32, idx=None):
    """Device-vmapped occlusion importance for imputation.

    The reference's `evaluate_impact` re-runs the model once per feature on
    host (evaluation.py:995-1043). Here each dispatch evaluates
    `batch_features` occluded variants at once via vmap over the feature
    axis — the batch-of-perturbations formulation that actually uses the
    TPU. Returns (baseline_r, per-feature impact = baseline - occluded_r,
    testing_idx). `true` is the opposite-modality ground truth.
    """
    from .models.coupled_vae import CoupledVAE

    to_mod = (modality + 1) % 2
    pre_in = estimator.preprocessors[modality]
    pre_out = estimator.preprocessors[to_mod]
    x = jnp.asarray(pre_in.transform(np.asarray(in_data)), jnp.float32)
    background = jnp.mean(x, axis=0)
    true_t = jnp.asarray(pre_out.transform(np.asarray(true)), jnp.float32)
    variables = estimator._variables()
    model = estimator.model

    def impute(xv):
        return model.apply(variables, xv, modality, to_mod, train=False,
                           method=CoupledVAE.impute)

    def mean_r(pred):
        pc = pred - jnp.mean(pred, axis=0)
        tc = true_t - jnp.mean(true_t, axis=0)
        num = jnp.sum(pc * tc, axis=0)
        den = (jnp.linalg.norm(pc, axis=0) * jnp.linalg.norm(tc, axis=0))
        return jnp.mean(num / jnp.maximum(den, 1e-12))

    baseline = float(mean_r(impute(x)))

    testing_idx = np.asarray(idx if idx is not None
                             else np.arange(x.shape[1]))

    @jax.jit
    def occluded_batch(feat_ids):
        def one(fid):
            xo = x.at[:, fid].set(background[fid])
            return mean_r(impute(xo))
        return jax.vmap(one)(feat_ids)

    impacts = []
    pad = (-len(testing_idx)) % batch_features
    padded = np.concatenate([testing_idx,
                             np.zeros(pad, testing_idx.dtype)])
    for start in range(0, len(padded), batch_features):
        ids = jnp.asarray(padded[start:start + batch_features])
        impacts.append(np.asarray(occluded_batch(ids)))
    occluded_r = np.concatenate(impacts)[:len(testing_idx)]
    return baseline, baseline - occluded_r, testing_idx


def shap_explain(estimator, data, modality: int = 0, max_evals=500,
                 **kwargs):
    """SHAP explanation through modal_predict, as the reference notebooks do
    (scMNC-Visual.ipynb cells 35-42). The shap package is an optional extra;
    without it, use `occlusion_impact_device` (same question, occlusion
    formulation, runs on device)."""
    try:
        import shap
    except ImportError as e:
        raise ImportError(
            'shap is not installed in this environment; use '
            'jamie_tpu.evaluation.occlusion_impact_device for on-device '
            'occlusion importance instead.') from e
    explainer = shap.Explainer(
        lambda x: estimator.modal_predict(x, modality), data, **kwargs)
    return explainer(data, max_evals=max_evals)


# --------------------------------------------------------------------------
# Figures (host matplotlib; deferred imports so headless metric use is light)
# --------------------------------------------------------------------------
def _reduce_2d(data, method='pca', n_components=2, fit_data=None, seed=42,
               n_neighbors=None):
    """Shared 2d/3d reducer with gated UMAP (falls back to PCA if absent)."""
    from .preprocess import PCA
    if method in ('umap', 'hybrid'):
        try:
            import umap
            red = umap.UMAP(
                n_components=n_components,
                n_neighbors=(min(200, (fit_data if fit_data is not None
                                       else data).shape[0] - 1)
                             if n_neighbors is None else n_neighbors),
                min_dist=.5, random_state=seed)
            red.fit(fit_data if fit_data is not None else data)
            return red
        except ImportError:
            import warnings
            warnings.warn('umap unavailable; falling back to PCA projection.')
    red = PCA(n_components=n_components)
    red.fit(fit_data if fit_data is not None else data)
    return red


def plot_regular(*args, **kwargs):
    """Plot differing modalities (evaluation.py:135-137)."""
    plot_integrated(*args, **kwargs, separate_dim=True)


def plot_integrated(data, labels, names=None, legend=False,
                    remove_outliers=False, n_components=2,
                    hybrid_components=4096, separate_dim=False, square=False,
                    method='umap', n_neighbors=None, seed=42):
    """Scatter of integrated data (evaluation.py:140-221)."""
    import matplotlib.pyplot as plt
    from .utils import outliers
    assert method in ('pca', 'umap', 'hybrid')
    method_names = {'pca': 'PC', 'umap': 'UMAP', 'hybrid': 'PC-UMAP'}
    assert n_components in (2, 3), 'Only supports 2d and 3d at this time.'
    proj_method = '3d' if n_components == 3 else None

    if method == 'hybrid':
        from .preprocess import PCA
        nc = min(hybrid_components, *[min(d.shape) for d in data])
        red = PCA(n_components=nc)
        data = [red.fit(dat).transform(dat) for dat in data]

    axs = []
    red = None
    for i, (dat, lab) in enumerate(zip(data, labels)):
        ax = plt.gcf().add_subplot(1, len(data), i + 1, projection=proj_method)
        axs.append(ax)
        if i == 0 or separate_dim:
            fit_data = dat if separate_dim else np.concatenate(data, axis=0)
            red = _reduce_2d(dat, method=method, n_components=n_components,
                             fit_data=fit_data, seed=seed,
                             n_neighbors=n_neighbors)
        plot_data = red.transform(dat)
        if remove_outliers:
            filt = outliers(plot_data)
        for lab_val in np.unique(np.concatenate(labels)):
            data_subset = np.transpose(plot_data[lab == lab_val])
            if remove_outliers:
                data_subset = data_subset.copy()
                data_subset[:, np.any(filt[lab == lab_val], axis=1)] = np.nan
            ax.scatter(*data_subset, s=3e3 * (1 / dat.shape[0]), label=lab_val)
        if i == 1 and legend:
            ax.legend()
        if names is not None:
            ax.set_title(names[i])
        ax.set_xlabel(f'{method_names[method]}-1')
        ax.set_ylabel(f'{method_names[method]}-2')
        if n_components == 2 and square:
            ax.set_aspect('equal')
    if not separate_dim:
        axs_xlim = np.array([ax.get_xlim() for ax in axs])
        axs_ylim = np.array([ax.get_ylim() for ax in axs])
        new_xlim = (axs_xlim.min(axis=0)[0], axs_xlim.max(axis=0)[1])
        new_ylim = (axs_ylim.min(axis=0)[0], axs_ylim.max(axis=0)[1])
        for ax in axs:
            ax.set_xlim(new_xlim)
            ax.set_ylim(new_ylim)


def plot_accuracy(data, labels, names, colors=None):
    """Method-comparison barplots of LTA/FOSCTTM (evaluation.py:224-253)."""
    import matplotlib.pyplot as plt
    import pandas as pd
    import seaborn as sns
    types = [np.unique(t, return_inverse=True)[1] for t in labels]
    acc_dict = {'Algorithm': names, 'LTA': [], 'FOSCTTM': []}
    k = 5
    for i in range(len(data)):
        with contextlib.redirect_stdout(None):
            lta, k = test_LabelTA(data[i], types, return_k=True)
            acc_dict['LTA'].append(lta)
            acc_dict['FOSCTTM'].append(test_closer(data[i]))
    acc_dict[f'LTA (k={k})'] = acc_dict.pop('LTA')
    df = pd.DataFrame(acc_dict).melt(
        id_vars='Algorithm',
        value_vars=list(set(acc_dict.keys()) - {'Algorithm'}))
    for i, v in enumerate(np.unique(df['variable'])):
        ax = plt.gcf().add_subplot(2, 1, i + 1)
        sns.barplot(data=df[df['variable'] == v], x='Algorithm', y='value',
                    ax=ax, palette=colors)
        ax.set_ylabel(v)
        ax.set_xlabel(None)


def plot_accuracy_table(data, labels, names, exclude=()):
    """Method-comparison corrplot table (evaluation.py:256-317)."""
    import matplotlib.pyplot as plt
    import pandas as pd
    from matplotlib.collections import PatchCollection
    types = [np.unique(t, return_inverse=True)[1] for t in labels]
    acc_dict = {
        'Algorithm': [names[i] for i in range(len(data)) if i not in exclude],
        'LTA': [], 'FOSCTTM': [],
    }
    k = 5
    for i in range(len(data)):
        if i in exclude:
            continue
        with contextlib.redirect_stdout(None):
            lta, k = test_LabelTA(data[i], types, return_k=True)
            acc_dict['LTA'].append(lta)
            acc_dict['FOSCTTM'].append(test_closer(data[i]))
    acc_dict[f'LTA (k={k})'] = acc_dict.pop('LTA')
    df = pd.DataFrame(acc_dict)
    df.index = df['Algorithm']
    df = df[[c for c in df.columns if c != 'Algorithm']]
    df = df.transpose()
    raw_values = df.to_numpy().copy()
    df = df.transpose()
    df['FOSCTTM'] *= -1
    df = df.transpose()
    df = df.sub(df.min(axis=1), axis=0)
    denom = df.max(axis=1).replace(0, 1)
    df = df.div(denom, axis=0)

    ax = plt.gcf().add_subplot(1, 1, 1)
    df = df * .6 + .4
    df = df / 2
    x, y = np.meshgrid(np.arange(df.shape[1]), np.arange(df.shape[0]))
    circles = [plt.Circle((i, j), radius=r)
               for i, j, r in zip(x.flat, y.flat, df.to_numpy().flatten())]
    col = PatchCollection(circles, facecolor='lightsteelblue')
    for i, j, r in zip(x.flat, y.flat, raw_values.flatten()):
        plt.text(i, j, f'{r:.2f}', color='black', ha='center', va='center')
    ax.add_collection(col)
    ax.set(xticks=np.arange(df.shape[1]), yticks=np.arange(df.shape[0]),
           xticklabels=df.columns, yticklabels=df.index)
    ax.set_xticks(np.arange(df.shape[1] + 1) - 0.5, minor=True)
    ax.set_yticks(np.arange(df.shape[0] + 1) - 0.5, minor=True)
    ax.axis('square')
    ax.set_ylim(-.5, df.shape[0] - .5)
    ax.set_xlim(-.5, df.shape[1] - .5)
    ax.grid(which='minor')


def plot_accuracy_graph(data, labels, names, colors=None, shapes=None,
                        max_dist=.2, pad=.095, force_points=2., **kwargs):
    """FOSCTTM-vs-LTA scatter with broken axes (evaluation.py:320-428).

    brokenaxes/adjustText are optional; without them a plain scatter with
    text labels is drawn (same information, no axis breaks)."""
    import matplotlib.pyplot as plt
    import pandas as pd
    if colors is None:
        colors = len(data) * [None]
    if shapes is None:
        shapes = len(data) * [None]
    types = [np.unique(t, return_inverse=True)[1] for t in labels]
    acc_dict = {'Algorithm': names, 'FOSCTTM': [], 'LTA': []}
    k = 5
    for i in range(len(data)):
        with contextlib.redirect_stdout(None):
            acc_dict['FOSCTTM'].append(test_closer(data[i]))
            lta, k = test_LabelTA(data[i], types, return_k=True)
            acc_dict['LTA'].append(lta)
    df = pd.DataFrame(acc_dict)
    print(df)

    ax = plt.gca()
    for i, name in enumerate(names):
        ax.scatter(df['FOSCTTM'][i], df['LTA'][i], c=colors[i],
                   marker=shapes[i], s=200.)
        ax.annotate(str(name).replace('\n', ' '),
                    (df['FOSCTTM'][i], df['LTA'][i]),
                    ha='center', va='bottom')
    ax.invert_xaxis()
    ax.set_xlabel('FOSCTTM')
    ax.set_ylabel(f'LTA (k={k})')
    return ax


def plot_silhouette(data, labels, names, modal_names, colors=None):
    """Silhouette-width boxplots per method (evaluation.py:431-465)."""
    import matplotlib.pyplot as plt
    import pandas as pd
    import seaborn as sns
    from sklearn.metrics import silhouette_samples
    types = [np.unique(t, return_inverse=True)[1] for t in labels]

    axs = plt.gcf().subplots(1, len(data[0]))
    if len(data[0]) == 1:
        axs = [axs]
    for i, ax in enumerate(axs):
        rows = []
        for j in range(len(data)):
            coefs = silhouette_samples(data[j][i], types[i])
            for lab in np.unique(np.concatenate(labels)):
                for value in coefs[labels[i] == lab]:
                    rows.append({'Algorithm': names[j], 'Type': lab,
                                 'Silhouette Coefficient': value})
        df = pd.DataFrame(rows)
        sns.boxplot(data=df, x='Type', y='Silhouette Coefficient',
                    hue='Algorithm', ax=ax, palette=colors)
        for j in range(len(np.unique(np.concatenate(labels))) - 1):
            ax.axvline(x=j + .5, color='black', linestyle='--')
        ax.set_title(f'Silhouette Coefficients ({modal_names[i]})')
        ax.set_xlabel(None)
        ax.set_ylabel(None)
        ax.get_legend().remove()


def _plot_auroc(imputed_data, data, modal_names, ax, i=0, names=None,
                max_features=100_000, return_statistic=False):
    """AUROC by feature for imputation on binarized data
    (evaluation.py:468-489)."""
    import warnings as _w
    from sklearn.metrics import roc_auc_score
    total_features = min(data[i].shape[1], max_features)
    feat_idx = np.random.choice(data[i].shape[1], total_features,
                                replace=False)
    feat_auc = []
    for im in imputed_data:
        pred = im[i]
        true = data[i]
        true = 1 * (true > np.median(true))
        temp = []
        for pr, tr in zip(np.transpose(pred)[feat_idx],
                          np.transpose(true)[feat_idx]):
            if len(np.unique(tr)) == 2:
                with _w.catch_warnings():
                    _w.simplefilter('ignore')
                    temp.append(roc_auc_score(tr, pr))
        feat_auc.append(temp)
    _plot_auroc_correlation_template(ax, feat_auc, names, 'AUROC',
                                     modal_names[i])
    if return_statistic:
        return feat_auc


def _plot_correlation(imputed_data, data, modal_names, ax, i=0, names=None,
                      max_features=100_000, return_statistic=False):
    """Per-feature imputation Pearson r scatter (evaluation.py:491-513)."""
    import warnings as _w
    total_features = min(data[i].shape[1], max_features)
    feat_idx = np.random.choice(data[i].shape[1], total_features,
                                replace=False)
    feat_corr = []
    for im in imputed_data:
        pred = im[i]
        true = data[i]
        temp = []
        for pr, tr in zip(np.transpose(pred)[feat_idx],
                          np.transpose(true)[feat_idx]):
            if len(np.unique(tr)) > 1:
                with _w.catch_warnings():
                    _w.simplefilter('ignore')
                    c = np.corrcoef(pr, tr)[0, 1]
                    temp.append(c)
        feat_corr.append(temp)
    _plot_auroc_correlation_template(ax, feat_corr, names, 'Correlation',
                                     modal_names[i])
    if return_statistic:
        return feat_corr


def _plot_auroc_correlation_template(ax, feat, names, suptitle, modal_name,
                                     plot_type='scatter'):
    """Shared scatter + sign-test annotation (evaluation.py:516-570)."""
    assert plot_type in ('scatter', 'density')
    s = 3 if len(feat[0]) > 100 else 10
    ax.scatter(*feat, facecolor='black', edgecolor='none', s=s)
    ax.axis('square')
    lcolor = 'red'

    ax.set_title(f'{suptitle} - {modal_name}')
    ax.set_xlabel(names[0])
    ax.set_ylabel(names[1])
    lims = [max(ax.get_xlim()[0], ax.get_ylim()[0]),
            min(ax.get_xlim()[1], ax.get_ylim()[1])]
    ax.plot(lims, lims, '-', color=lcolor, alpha=0.75)

    gre = sum(np.greater(feat[1], feat[0]))
    ax.text(.05, .9, gre, ha='left', va='center', transform=ax.transAxes,
            backgroundcolor='white')
    les = sum(np.greater(feat[0], feat[1]))
    ax.text(.95, .2, les, ha='right', va='center', transform=ax.transAxes,
            backgroundcolor='white')
    n = gre + les
    # One-tailed sign test under a 50/50 null (evaluation.py:563-569)
    p_value = sum(2 ** (math.log(math.comb(n, i), 2) - n)
                  for i in range(n + 1) if i >= gre) if n > 0 else 1.0
    if p_value > .5:
        p_value = 1 - p_value
    p_value *= 2
    ax.text(.95, .1, f'p-value: {p_value:.2E}', ha='right', va='center',
            transform=ax.transAxes, backgroundcolor='white')


def plot_sample(true, imputed, name, modal_name, suptitle=None,
                sample_idx=None, color='blue', scale=None,
                plot_type='scatter'):
    """Per-cell measured-vs-imputed scatter (evaluation.py:573-649)."""
    import matplotlib.pyplot as plt
    from scipy import stats
    from sklearn.metrics import r2_score
    ax = plt.gca()
    feat = [np.asarray(true), np.asarray(imputed)]

    if sample_idx is None:
        r2, p_value = [], []
        for tru, imp in zip(*feat):
            r2.append(r2_score(tru, imp))
            p_value.append(stats.pearsonr(tru, imp)[1])
        r2 = np.array(r2)
        p_value = np.array(p_value)
        sample_idx = int(np.argmax(r2))
        r2 = r2[sample_idx]
        p_value = p_value[sample_idx]
    else:
        r2 = r2_score(feat[0][sample_idx], feat[1][sample_idx])
        _, p_value = stats.pearsonr(feat[0][sample_idx], feat[1][sample_idx])

    s = 5 if feat[0].shape[1] > 100 else 15
    ax.scatter(*[f[sample_idx] for f in feat], facecolor=color,
               edgecolor='none', s=s)
    ax.axis('square')
    ax.set_title(f'{suptitle} - {modal_name}' if suptitle is not None
                 else f'Cell - {modal_name}')
    ax.set_xlabel('Measured')
    ax.set_ylabel(name)
    maxlim = [min(ax.get_xlim()[0], ax.get_ylim()[0]),
              max(ax.get_xlim()[1], ax.get_ylim()[1])]
    ax.set_xlim(maxlim)
    ax.set_ylim(maxlim)
    if scale is not None:
        ax.set_xscale(scale)
        ax.set_yscale(scale)
    lims = [max(ax.get_xlim()[0], ax.get_ylim()[0]),
            min(ax.get_xlim()[1], ax.get_ylim()[1])]
    ax.plot(lims, lims, '--', color='black', alpha=0.75, zorder=-1)
    ax.text(.05, .8, f'$R^2$: {r2:.2E}', ha='left', va='center',
            transform=ax.transAxes, backgroundcolor='white')
    ax.text(.05, .9, f'p-value: {p_value:.2E}', ha='left', va='center',
            transform=ax.transAxes, backgroundcolor='white')
    return sample_idx


def plot_auroc(*args, **kwargs):
    import matplotlib.pyplot as plt
    axs = plt.gcf().subplots(1, 2)
    for i, ax in enumerate(axs):
        _plot_auroc(*args, ax=ax, i=i, **kwargs)


def plot_correlation(*args, **kwargs):
    import matplotlib.pyplot as plt
    axs = plt.gcf().subplots(1, 2)
    for i, ax in enumerate(axs):
        _plot_correlation(*args, ax=ax, i=i, **kwargs)


def plot_auroc_correlation(*args, index=0, **kwargs):
    import matplotlib.pyplot as plt
    axs = plt.gcf().subplots(1, 2)
    return (_plot_auroc(*args, ax=axs[0], i=index, **kwargs),
            _plot_correlation(*args, ax=axs[1], i=index, **kwargs))


def plot_distribution_alone(datasets, labels, label_order=None,
                            feature_limit=2, title=None, fnames=None,
                            gcf=None, rows=2, remove_outliers=True,
                            equal_axes=False, sort_type='entropy-corr',
                            feature_dict=None, **kwargs):
    """Cell-type distribution boxplots by feature (evaluation.py:675-796)."""
    import matplotlib.pyplot as plt
    import pandas as pd
    import seaborn as sns
    from .utils import jensen_shannon_from_array, outliers, set_yticks, \
        sort_by_interest
    feature_dict = feature_dict or {}
    datasets = [np.array(d) for d in datasets]
    if fnames is None:
        fnames = [None, None]
    fnames = [
        fnames[i] if fnames[i] is not None
        else np.array([f'Feature {j}' for j in range(datasets[i].shape[1])])
        for i in range(2)]
    if gcf is None:
        gcf = plt.gcf()

    names = ['Measured', 'Imputed']
    feature_limit = (feature_limit if feature_limit is not None
                     else datasets[0].shape[1])
    feature_idx = sort_by_interest(datasets, limit=feature_limit,
                                   remove_outliers=remove_outliers,
                                   sort_type=sort_type)[1]
    datasets = [data[:, feature_idx] for data in datasets]
    for i in range(len(fnames)):
        fnames[i] = np.asarray(fnames[i])[feature_idx]
        for j in range(len(fnames[i])):
            if fnames[i][j] in feature_dict:
                fnames[i][j] = feature_dict[fnames[i][j]]

    for i in range(datasets[0].shape[1]):
        print(f'{fnames[0][i]}: '
              f'{jensen_shannon_from_array([d[:, i] for d in datasets])}')

    axs = []
    ax = None
    for i in range(2):
        if i == 0:
            ax = gcf.add_subplot(rows, 1, rows - 1 + i)
        else:
            ax = gcf.add_subplot(rows, 1, rows - 1 + i, sharex=ax)
        axs.append(ax)
        df = pd.DataFrame(datasets[i])
        df.columns = np.asarray(fnames[i])
        df.columns.name = None
        df['_type'] = labels[i]
        df['_sample'] = df.index
        id_vars = ['_sample', '_type']
        df = df.melt(id_vars=id_vars,
                     value_vars=list(set(df.keys()) - set(id_vars)))
        df = df.rename(columns={'variable': 'Variable', 'value': 'Value',
                                '_type': 'Type'})
        order = (label_order if label_order is not None
                 else np.unique(labels))
        df['fsorted'] = [int(np.argwhere(np.array(order) == x)[0][0])
                         for x in df['Type']]
        df = df.sort_values('fsorted')
        sns.boxplot(data=df, x='Variable', y='Value', hue='Type', ax=ax)
        for j in range(feature_limit - 1):
            ax.axvline(x=j + .5, color='black', linestyle='--')
        ax.set_xlabel(None)
        if i == 0:
            ax.set_xticks([])
            ax.set_xticklabels([])
            ax.set_title(f'Sample Feature Distributions ({title})')
        else:
            ax.set_title(None)
        ax.set_ylabel(names[i])
        ax.legend([], [], frameon=False)

    if remove_outliers:
        for i in range(len(axs)):
            d = datasets[i]
            new_ylim = outliers(d, return_limits=True)[1]
            stretch = 1.5
            new_ylim = (np.min(new_ylim[0] - stretch * new_ylim[2]),
                        np.max(new_ylim[1] + stretch * new_ylim[2]))
            new_ylim = (max(new_ylim[0], axs[i].get_ylim()[0]),
                        min(new_ylim[1], axs[i].get_ylim()[1]))
            axs[i].set_ylim(new_ylim)
    if equal_axes:
        new_ylims = (min(ax.get_ylim()[0] for ax in axs),
                     max(ax.get_ylim()[1] for ax in axs))
        for ax in axs:
            ax.set_ylim(new_ylims)
    from .utils import set_yticks
    for ax in axs:
        set_yticks(ax, 4)
    plt.gcf().subplots_adjust(hspace=0)


def plot_distribution(datasets, labels, feature_limit=3, title=None,
                      **kwargs):
    """Distribution preview + similarity plot (evaluation.py:799-823)."""
    import matplotlib.pyplot as plt
    import matplotlib.gridspec as gridspec
    from .utils import set_yticks
    datasets = [np.array(d) for d in datasets]
    ax = plt.gcf().add_subplot(3, 1, 1)
    gs = gridspec.GridSpec(3, 1, height_ratios=[1, 2, 2])
    ax.set_subplotspec(gs[0])
    plot_distribution_similarity(datasets, labels, suptitle=title, ax=ax,
                                 square=False, legend=False, **kwargs)
    set_yticks(ax, 2)
    ax.set_xticks([])
    ax.set_xlim([0, 1])
    ax.set_ylabel('Simulated')
    plot_distribution_alone(datasets, labels, rows=3, title=None,
                            feature_limit=feature_limit, **kwargs)
    plt.gcf().subplots_adjust(hspace=0)


def plot_distribution_similarity(datasets, labels, label_order=None,
                                 suptitle=None, title=None, max_features=100,
                                 relative=True, label_cells=True, legend=True,
                                 square=True, ax=None, **kwargs):
    """JS-similarity percentile curves per cell type (evaluation.py:826-904)."""
    import matplotlib.pyplot as plt
    from .utils import jensen_shannon_from_array
    assert datasets[0].shape[1] == datasets[1].shape[1]
    datasets = [np.array(d) for d in datasets]
    total_features = min(datasets[0].shape[1], max_features)
    feat_idx = np.random.choice(datasets[0].shape[1], total_features,
                                replace=False)
    if ax is None:
        ax = plt.gcf().add_subplot(1, 1, 1)
    distances = {}
    for lab in (np.unique(labels) if label_order is None else label_order):
        distances[lab] = []
        for f in feat_idx:
            try:
                dist = jensen_shannon_from_array(
                    [datasets[i][labels[i] == lab, f]
                     for i in range(len(datasets))])
                if np.isnan(dist):
                    dist = 1
            except Exception:
                dist = 0
            distances[lab].append(1 - dist)

    total = 0
    for lab, v in distances.items():
        total = total + np.array(v)
    total = total / len(distances.keys())

    all_values = np.concatenate(list(distances.values()))
    print(f'Mean: {1 - np.mean(all_values)}')
    print(f'Std: {np.std(all_values)}')

    for lab, v in distances.items():
        pct = np.linspace(0, 1, len(v))
        sort_idx = np.argsort(v)
        ax.plot(pct, np.array(v)[sort_idx],
                label=lab if label_cells else '_nolegend_')
    pct = np.linspace(0, 1, len(total))
    sort_idx = np.argsort(total)
    ax.plot(pct, total[sort_idx], label='Cumulative', linewidth=6,
            color='black')
    ax.set_xlabel('Percentile')
    ax.set_ylabel(f'{title} Similarity')
    ax.set_xlim([0, 1])
    ax.set_ylim([0, 1])
    ax.set_title(suptitle)
    if square:
        ax.set_aspect('equal', adjustable='box')
    if legend:
        ax.legend()
    else:
        ax.legend([], [], frameon=False)


def plot_impact(values, fnames, baseline, ylabel='LTA', max_features=None,
                background_pct=.3, sort='mixed-min', color=None,
                max_name_len=10, seed=42):
    """Feature-importance bars (evaluation.py:907-962)."""
    import matplotlib.pyplot as plt
    import seaborn as sns
    if seed is not None:
        np.random.seed(seed)
    values = np.asarray(values)
    fnames = np.asarray(fnames)
    num_features = len(values) if max_features is None else max_features
    num_features = min(len(values), num_features)
    if sort is not None:
        if sort == 'min':
            order = np.argsort(values)
        elif sort == 'max':
            order = np.argsort(values)[::-1]
        elif sort.split('-')[0] == 'mixed':
            if sort.split('-')[1] == 'max':
                var1 = np.argsort(values)[::-1]
            elif sort.split('-')[1] == 'min':
                var1 = np.argsort(values)
            else:
                raise AssertionError(f"Invalid sort method '{sort}' provided.")
            var1 = var1[:int((1 - background_pct) * num_features)]
            var2 = np.random.choice(
                list(set(range(len(values))) - set(var1)),
                num_features - len(var1), replace=False)
            order = np.concatenate([var1, var2]).astype(int)
            np.random.shuffle(order)
        else:
            raise AssertionError(f"Invalid sort method '{sort}' provided.")
        values = values[order]
        fnames = fnames[order]
    values = values[:num_features]
    fnames = fnames[:num_features]
    fnames = [f[:max_name_len] for f in fnames]

    ax = plt.gcf().add_subplot(1, 1, 1)
    sns.barplot(x=fnames, y=values, ax=ax, color=color)
    plt.setp(ax.patches, linewidth=0)
    ax.axhline(y=baseline, color='red', linewidth=3, zorder=-1)
    ax.set_ylabel(ylabel)
    yrange = max(values) - min(values)
    ymin = max(min(values) - 1. * yrange, 0 if min(values) >= 0 else -1)
    ymax = min(max(values) + 1. * yrange, 1)
    if min(values) < 0:
        plt.axhline(y=0, color='black')
    ax.set_ylim([ymin, ymax])
    plt.xticks(rotation=80)
