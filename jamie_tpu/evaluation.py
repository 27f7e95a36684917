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
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from .ops.distances import _pairwise_euclidean_impl, pairwise_distance

__all__ = [
    'test_partial', 'test_closer', 'test_label_dist', 'test_LabelTA',
    'knn_label_transfer_accuracy', 'evaluate_impact',
    'occlusion_impact_device', 'shap_explain', 'kernel_shap', 'ShapValues',
    'plot_regular', 'plot_integrated', 'plot_accuracy',
    'plot_accuracy_table', 'plot_accuracy_graph', 'plot_silhouette',
    'plot_auroc', 'plot_correlation', 'plot_auroc_correlation',
    'plot_sample', 'plot_distribution', 'plot_distribution_alone',
    'plot_distribution_similarity', 'plot_impact',
    'plot_shap_summary', 'plot_shap_waterfall',
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


@jax.jit
def _foscttm_block(a_blk, b, diag_blk, diag, start):
    """One row block's contribution to both FOSCTTM directions: the (bs, n)
    distance block compared against the block's own true-match distances
    (a->b direction) and every column's (b->a direction). The block's
    self-pair entries are overwritten with the exact diag values so the
    strict < never flips on the Gram trick's ~1e-6 diagonal noise (a
    self-pair must count in neither direction)."""
    d = _pairwise_euclidean_impl(a_blk, b, squared=True)
    rows = jnp.arange(a_blk.shape[0])
    d = d.at[rows, start + rows].set(diag_blk)
    return jnp.sum(d < diag_blk[:, None]) + jnp.sum(d < diag[None, :])


# Single-dispatch FOSCTTM up to this many N x N entries (1 GB f32); larger
# sizes stream row blocks — exact, not subsampled, at any N.
_FOSCTTM_BLOCK_ENTRIES = 1 << 28


def test_closer(integrated_data, distance_metric=None):
    """FOSCTTM (evaluation.py:65-85); device fast path by default. Past
    ~268M matrix entries the N x N never materializes: row blocks stream
    against the full opposite modality (atlas-exact, e.g. N=100k needs
    40 GB as one matrix but ~1 GB per block)."""
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
        a = jnp.asarray(integrated_data[0], jnp.float32)
        b = jnp.asarray(integrated_data[1], jnp.float32)
        n = a.shape[0]
        if n * n <= _FOSCTTM_BLOCK_ENTRIES:
            foscttm = float(_foscttm_device(a, b))
        else:
            bs = max(_FOSCTTM_BLOCK_ENTRIES // n, 256)
            diag = jnp.sum((a - b) ** 2, axis=1)
            closer = 0
            for s in range(0, n, bs):
                closer += int(_foscttm_block(
                    a[s:s + bs], b, diag[s:s + bs], diag,
                    jnp.asarray(s, jnp.int32)))
            foscttm = closer / (2.0 * n * n)
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
    fit_labels = jnp.asarray(fit_labels)

    def _block_pred(q_blk):
        d = _pairwise_euclidean_impl(q_blk, fit_x, squared=True)
        _, nn_idx = jax.lax.top_k(-d, k)
        votes = fit_labels[nn_idx]                            # (bq, k)
        onehot = jax.nn.one_hot(votes, uniq.shape[0])
        return jnp.argmax(jnp.sum(onehot, axis=1), axis=1)

    nq, nf = query.shape[0], fit_x.shape[0]
    if nq * nf <= _FOSCTTM_BLOCK_ENTRIES:
        pred = np.asarray(_block_pred(query))
    else:
        # kNN is per-query-row: streaming row blocks is exact at atlas N
        bs = max(_FOSCTTM_BLOCK_ENTRIES // nf, 256)
        blocked = jax.jit(_block_pred)
        pred = np.concatenate([np.asarray(blocked(query[s:s + bs]))
                               for s in range(0, nq, bs)])
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
    """Occlusion importance with the reference API (evaluation.py:965-1043).

    mode='replace' occludes one feature at a time with the background
    (column mean); mode='keep' occludes everything BUT the feature.
    sequential=True accumulates occlusions across features instead of
    restoring between evaluations. `scan` first ranks all candidates on a
    row subsample (passing idx= to `function`, as the notebooks' closures
    expect) and then evaluates only the top `scan` in full.
    Returns (baseline_performance, per-feature performance, testing_idx).
    """
    assert mode in ['replace', 'keep']
    if seed is not None:
        np.random.seed(seed)
    data = np.array(in_data)
    testing_idx = np.asarray(idx) if idx is not None \
        else np.arange(data.shape[1])
    background = data.mean(axis=0)
    baseline = perf_function(function(data), true)

    if scan is not None:
        print('Performing preliminary scan...')
        rows = np.random.choice(data.shape[0],
                                min(scan_samples, data.shape[0]),
                                replace=False)
        quick = _occlusion_pass(
            lambda x: function(x, idx=rows), perf_function, data[rows],
            None if true is None else true[rows], background,
            testing_idx, mode, sequential)
        # keep the features whose occlusion hurts most: low performance in
        # 'replace', high in 'keep'
        order = np.argsort(quick if mode == 'replace' else -quick)
        testing_idx = testing_idx[order[:scan]]
    print('Finding important features...')
    performance = _occlusion_pass(function, perf_function, data, true,
                                  background, testing_idx, mode, sequential)
    print('Done!')
    return baseline, performance, testing_idx


def _occlusion_pass(function, perf_function, data, true, background,
                    testing_idx, mode, sequential, log_every=10):
    """One occlusion sweep over `testing_idx`; never mutates the caller's
    array (the reference mutated in place and restored through a view)."""
    work = data.copy()
    all_cols = np.arange(work.shape[1])
    scores = np.empty(len(testing_idx))
    for i, feat in enumerate(testing_idx):
        cols = np.array([feat]) if mode == 'replace' \
            else all_cols[all_cols != feat]
        saved = work[:, cols].copy()
        work[:, cols] = background[cols]
        p = perf_function(function(work), true)
        scores[i] = np.inf if np.isnan(p) else p
        # keep mode always restores: the reference's boolean-mask indexing
        # copies, so its "sequential" occlusion only ever accumulates in
        # replace mode (evaluation.py:1022-1036) — without this, after the
        # first feature the working matrix is almost fully background.
        if not sequential or mode == 'keep':
            work[:, cols] = saved
        if (i + 1) % log_every == 0 or i + 1 == len(testing_idx):
            frac = (i + 1) / len(testing_idx)
            print(f'occlusion {i + 1}/{len(testing_idx)} '
                  f'({100 * frac:.0f}%)', end='\r')
    print()
    return scores


def occlusion_impact_device(estimator, in_data, true, modality: int = 0,
                            batch_features: int = 32, idx=None,
                            space: str = 'input'):
    """Device-vmapped occlusion importance for imputation.

    The reference's `evaluate_impact` re-runs the model once per feature on
    host (evaluation.py:995-1043). Here each dispatch evaluates
    `batch_features` occluded variants at once via vmap over the feature
    axis — the batch-of-perturbations formulation that actually uses the
    TPU. Returns (baseline_r, per-feature impact = baseline - occluded_r,
    testing_idx). `true` is the opposite-modality ground truth.

    space='input' (default) occludes RAW input features — the reference's
    semantics, so testing_idx aligns with gene/peak names. With a PCA
    preclass the occluded activations are computed exactly by linearity
    (replacing raw column j with its mean shifts the standardized scores by
    (b_j - X[:, j]) / sigma outer the j-th component row) — no per-feature
    re-projection of the input matrix. A nonlinear preclass (tsne/umap) has
    no such shortcut: use the reference-parity `evaluate_impact`, or
    space='latent'.
    space='latent' occludes columns of the PREPROCESSED matrix (PCA
    components when pca_dim is set) — useful for probing the latent space
    but NOT feature importances; do not feed its indices into gene-named
    plots.
    """
    from .models.coupled_vae import CoupledVAE
    from .preprocess import NonlinearEmbedding

    assert space in ('input', 'latent')
    to_mod = (modality + 1) % 2
    pre_in = estimator.preprocessors[modality]
    pre_out = estimator.preprocessors[to_mod]
    raw = np.asarray(in_data, np.float32)
    x = jnp.asarray(pre_in.transform(raw), jnp.float32)
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

    if space == 'latent' or pre_in.pca is None:
        # No-PCA preclass is per-feature standardization, so occluding the
        # transformed column IS occluding the raw feature.
        if space == 'input' and pre_in.pca is None:
            tb = jnp.asarray(
                pre_in.transform(raw.mean(axis=0, keepdims=True))[0],
                jnp.float32)
        else:
            tb = jnp.mean(x, axis=0)
        n_feat = x.shape[1]

        def one(fid):
            xo = x.at[:, fid].set(tb[fid])
            return mean_r(impute(xo))
    elif isinstance(pre_in.pca, NonlinearEmbedding):
        raise ValueError(
            "space='input' needs a linear (PCA) preclass; this estimator "
            "used model_pca='tsne'/'umap'. Use evaluate_impact (host, "
            "exact) or space='latent'.")
    else:
        comps_t = jnp.asarray(pre_in.pca.components_).T   # (F, dim)
        sigma = jnp.maximum(jnp.float32(pre_in.sample_std), 1e-12)
        raw_dev = jnp.asarray(raw)
        b = jnp.mean(raw_dev, axis=0)
        n_feat = raw.shape[1]

        def one(fid):
            delta = (b[fid] - raw_dev[:, fid]) / sigma
            xo = x + delta[:, None] * comps_t[fid][None, :]
            return mean_r(impute(xo))

    testing_idx = np.asarray(idx if idx is not None else np.arange(n_feat))

    @jax.jit
    def occluded_batch(feat_ids):
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


def _shapley_kernel_sizes(n_feat: int, n_coalitions: int, rng):
    """Draw coalition sizes k in [1, n_feat-1] from the Shapley kernel
    distribution p(k) proportional to (n_feat - 1) / (k (n_feat - k)) —
    the size marginal of Lundberg & Lee's pi(z). The empty and full
    coalitions carry infinite weight and are handled exactly by the
    efficiency-constraint substitution, not sampled."""
    k = np.arange(1, n_feat)
    p = (n_feat - 1) / (k * (n_feat - k))
    p /= p.sum()
    return rng.choice(k, size=n_coalitions, p=p)


@jax.jit
def _kernel_shap_solve(Z, w, Y, total):
    """Weighted least squares with the efficiency constraint eliminated.

    Z: (S, F) 0/1 coalition matrix, w: (S,) Shapley kernel weights,
    Y: (S, B) centered model outputs f(masked) - f(background) for B
    explained (sample, output) columns, total: (B,) f(x) - f(background).
    Substituting phi_F = total - sum_{j<F} phi_j turns the constrained
    regression into an unconstrained one over the first F-1 features;
    ONE (F-1, F-1) solve serves every column because the coalition design
    is shared. Returns (F, B)."""
    A = Z[:, :-1] - Z[:, -1:]                      # (S, F-1)
    y = Y - Z[:, -1:] * total[None, :]             # (S, B)
    Aw = A * w[:, None]
    G = A.T @ Aw                                   # (F-1, F-1)
    G = G + 1e-8 * jnp.trace(G) / A.shape[1] * jnp.eye(A.shape[1])
    phi_head = jnp.linalg.solve(G, Aw.T @ y)       # (F-1, B)
    phi_last = total[None, :] - jnp.sum(phi_head, axis=0, keepdims=True)
    return jnp.concatenate([phi_head, phi_last], axis=0)


def kernel_shap(predict_fn, data, explain=None, background=None,
                n_coalitions: int = 512, features=None, seed: int = 0,
                batch_rows: int = 65536):
    """TPU-native KernelSHAP (Lundberg & Lee 2017) for a batched black-box
    `predict_fn` — the native replacement for the reference notebooks'
    `shap.Explainer(lambda x: model.modal_predict(x, m), data)` usage
    (scMNC-Visual.ipynb cells 35-42), with no external dependency.

    One coalition design (S, F) is shared by every explained row, so the
    whole job is two MXU-shaped passes: a single batched model evaluation
    over all masked inputs (streamed in `batch_rows` chunks), then ONE
    (F-1, F-1) weighted least-squares solve whose RHS stacks every
    (explained row, output) column. The empty/full coalitions are not
    sampled: the efficiency constraint sum(phi) = f(x) - f(background) is
    enforced exactly by substitution. For a linear model this recovers
    (x - background) * W exactly (pinned by test).

    predict_fn: maps (n, F_in) raw inputs to (n, D) outputs — e.g.
        ``lambda x: jm.modal_predict(x, modality)``.
    data: (N, F_in) raw inputs; also the default background source.
    explain: row indices to explain (default: all rows).
    background: (F_in,) reference vector; default data.mean(axis=0) —
        the same convention as `evaluate_impact`'s occlusion background.
    features: optional indices OR boolean mask — attribute only these,
        holding the rest at their true values (coalition play is over the
        subset; the efficiency total becomes f(x) - f(x with subset
        backgrounded)). The way to keep SHAP tractable on very wide
        modalities. Peak host memory is one (batch_rows, F_in) slab —
        masked inputs are built per eval batch, never all at once.
    Returns (phi, base): phi (n_explained, F_sel, D) attributions,
    base (n_explained, D) = f(x with selected features backgrounded).
    """
    data = np.asarray(data, np.float32)
    n, f_in = data.shape
    idx = np.arange(n) if explain is None else np.asarray(explain)
    bg = (data.mean(axis=0) if background is None
          else np.asarray(background, np.float32))
    if features is None:
        sel = np.arange(f_in)
    else:
        features = np.asarray(features)
        sel = (np.flatnonzero(features) if features.dtype == np.bool_
               else features.astype(np.int64))
    f_sel = sel.shape[0]
    assert f_sel >= 2, 'kernel_shap needs at least 2 features in play'
    S = int(n_coalitions)
    if S < f_sel + 2:
        # F-1 regression unknowns: fewer rows than that is rank-deficient
        # and the ridge would return an arbitrary solution that still sums
        # to the right total — confidently wrong. (shap errors at the same
        # place: max_evals < 2F+2.) Scope with features= or raise the budget.
        raise ValueError(
            f'n_coalitions={S} cannot identify {f_sel} features; need at '
            f'least f_sel+2={f_sel + 2} (2*f_sel+2 recommended). Pass more '
            f'coalitions or scope the game with features=.')
    rng = np.random.RandomState(seed)

    sizes = _shapley_kernel_sizes(f_sel, S, rng)
    Z = np.zeros((S, f_sel), np.float32)
    for s in range(S):
        Z[s, rng.choice(f_sel, size=sizes[s], replace=False)] = 1.0
    k = Z.sum(axis=1)
    w = ((f_sel - 1) / (k * (f_sel - k))).astype(np.float32)

    x = data[idx]                                   # (E, F_in)
    E = x.shape[0]
    x_sel = x[:, sel]                               # (E, F_sel)

    # x with the whole subset backgrounded (the phi baseline) and x itself
    x_base = x.copy(); x_base[:, sel] = bg[sel]
    ends = np.concatenate([x, x_base], axis=0)

    def _out2d(o, nrows):
        """Scalar-output models returning (n,) become one output column."""
        o = np.asarray(o)
        if o.ndim == 1:
            assert o.shape[0] == nrows, (
                f'predict_fn returned {o.shape} for {nrows} input rows')
            return o[:, None]
        return o

    def _eval(m):
        outs = [_out2d(predict_fn(m[s:s + batch_rows]),
                       min(batch_rows, m.shape[0] - s))
                for s in range(0, m.shape[0], batch_rows)]
        return np.concatenate(outs, axis=0)

    def _eval_masked():
        """Masked inputs for every (explained row, coalition) pair —
        selected features follow the coalition, everything else stays at
        x — built ONE batch_rows slab at a time: the full (E*S, F_in)
        matrix would be ~150 GB at notebook scale."""
        outs = []
        for start in range(0, E * S, batch_rows):
            r = np.arange(start, min(start + batch_rows, E * S))
            i, c = r // S, r % S                    # explained row, coalition
            slab = x[i]                             # copy via fancy index
            slab[:, sel] = (Z[c] * x_sel[i]
                            + (1.0 - Z[c]) * bg[sel][None, :])
            outs.append(_out2d(predict_fn(slab), len(r)))
        return np.concatenate(outs, axis=0)

    y_ends = _eval(ends)
    d_out = y_ends.shape[1]
    fx, f_base = y_ends[:E], y_ends[E:]             # (E, D) each
    y = _eval_masked().reshape(E, S, d_out)

    Y = jnp.asarray((y - f_base[:, None, :]).transpose(1, 0, 2)
                    .reshape(S, E * d_out))
    total = jnp.asarray((fx - f_base).reshape(E * d_out))
    phi = _kernel_shap_solve(jnp.asarray(Z), jnp.asarray(w), Y, total)
    phi = np.asarray(phi).reshape(f_sel, E, d_out).transpose(1, 0, 2)
    return phi, f_base


class ShapValues:
    """kernel_shap result in the shape downstream code expects from a shap
    Explanation: `.values` (n, F, D) attributions, `.base_values` (n, D)
    baseline outputs, `.data` the explained inputs; indexing returns the
    per-row triple (what plot_shap_waterfall consumes)."""

    def __init__(self, values, base_values, data):
        self.values, self.base_values, self.data = values, base_values, data

    def __getitem__(self, i):
        return ShapValues(self.values[i], self.base_values[i], self.data[i])

    def __len__(self):
        return len(self.values)


def shap_explain(estimator, data, modality: int = 0, max_evals=500,
                 **kwargs):
    """SHAP explanation through modal_predict, as the reference notebooks do
    (scMNC-Visual.ipynb cells 35-42). The shap package is an optional extra;
    without it this falls back to the native `kernel_shap` (same estimand,
    masked evaluations batched on device) and returns a `ShapValues` with
    the Explanation-style `.values`/`.base_values`/`.data` attributes."""
    try:
        import shap
    except ImportError:
        phi, base = kernel_shap(
            lambda x: estimator.modal_predict(x, modality), data,
            n_coalitions=max_evals, **kwargs)
        return ShapValues(phi, base, np.asarray(data))
    explainer = shap.Explainer(
        lambda x: estimator.modal_predict(x, modality), data, **kwargs)
    return explainer(data, max_evals=max_evals)


# --------------------------------------------------------------------------
# Figures live in figures.py (re-exported here for the reference-style API)
# --------------------------------------------------------------------------
from .figures import (  # noqa: E402,F401
    plot_accuracy, plot_accuracy_graph, plot_accuracy_table, plot_auroc,
    plot_auroc_correlation, plot_correlation, plot_distribution,
    plot_distribution_alone, plot_distribution_similarity, plot_impact,
    plot_shap_summary, plot_shap_waterfall,
    plot_integrated, plot_regular, plot_sample, plot_silhouette,
)
