"""Native KernelSHAP (evaluation.kernel_shap): exactness on linear models,
the efficiency property, feature subsetting, and the estimator path the
reference notebooks drive through shap.Explainer (scMNC-Visual.ipynb
cells 35-42)."""

import numpy as np
import pytest

from jamie_tpu.evaluation import kernel_shap, shap_explain


def _linear(W, c):
    return lambda x: np.asarray(x) @ W + c


def test_linear_model_exact():
    """For f(x) = xW + c, SHAP values are exactly (x_i - bg_i) * W_ij —
    kernel regression on a linear response recovers the coefficients
    regardless of which coalitions were sampled."""
    rng = np.random.RandomState(0)
    F, D, N = 8, 3, 20
    W = rng.randn(F, D).astype(np.float32)
    data = rng.randn(N, F).astype(np.float32)
    phi, base = kernel_shap(_linear(W, 1.5), data, n_coalitions=256, seed=1)
    assert phi.shape == (N, F, D)
    bg = data.mean(axis=0)
    expected = (data - bg)[:, :, None] * W[None, :, :]
    np.testing.assert_allclose(phi, expected, rtol=1e-3, atol=1e-3)


def test_efficiency_holds_for_nonlinear_model():
    """sum_i phi_i == f(x) - f(background) exactly (by substitution), even
    when the model has interactions the linear surrogate cannot fit."""
    rng = np.random.RandomState(2)
    F, N = 6, 12
    data = rng.rand(N, F).astype(np.float32)

    def f(x):
        x = np.asarray(x)
        return np.stack([np.sin(x[:, 0]) * x[:, 1] + x[:, 2:].sum(axis=1),
                         (x ** 2).sum(axis=1)], axis=1)

    phi, base = kernel_shap(f, data, n_coalitions=200, seed=3)
    totals = f(data) - base
    np.testing.assert_allclose(phi.sum(axis=1), totals, rtol=1e-4, atol=1e-4)


def test_feature_subset_conditions_on_rest():
    """With features=, non-selected features stay at their true values:
    for a linear model the attributions over the subset are unchanged and
    the baseline is f(x with only the subset backgrounded)."""
    rng = np.random.RandomState(4)
    F, D, N = 10, 2, 8
    W = rng.randn(F, D).astype(np.float32)
    data = rng.randn(N, F).astype(np.float32)
    sub = np.array([1, 4, 7])
    phi, base = kernel_shap(_linear(W, 0.0), data, features=sub,
                            n_coalitions=128, seed=5)
    assert phi.shape == (N, 3, D)
    bg = data.mean(axis=0)
    expected = (data[:, sub] - bg[sub])[:, :, None] * W[sub][None, :, :]
    np.testing.assert_allclose(phi, expected, rtol=1e-3, atol=1e-3)
    x_base = data.copy()
    x_base[:, sub] = bg[sub]
    np.testing.assert_allclose(base, x_base @ W, rtol=1e-4, atol=1e-4)


def test_explain_subset_of_rows():
    rng = np.random.RandomState(6)
    W = rng.randn(5, 2).astype(np.float32)
    data = rng.randn(30, 5).astype(np.float32)
    rows = np.array([3, 17])
    phi, base = kernel_shap(_linear(W, 0.0), data, explain=rows,
                            n_coalitions=96, seed=7)
    assert phi.shape == (2, 5, 2)
    bg = data.mean(axis=0)
    expected = (data[rows] - bg)[:, :, None] * W[None]
    np.testing.assert_allclose(phi, expected, rtol=1e-3, atol=1e-3)


def test_shap_explain_through_estimator(synthetic_pair):
    """shap_explain falls back to the native kernel_shap when the shap
    package is absent (it is, in this image) and attributes modal_predict
    through the whole preclass + model stack."""
    from jamie_tpu import JAMIE
    data, _labels = synthetic_pair
    jm = JAMIE(epoch_DNN=200, min_epochs=50, epoch_chunk=50, log_DNN=10_000,
               batch_size=64, pca_dim=None, distance_mode='euclidean',
               epoch_pd=100, use_early_stop=False, dropout=0.0)
    jm.fit_transform(dataset=data)
    res = shap_explain(jm, data[0][:6], modality=0, max_evals=96)
    phi = res.values   # Explanation-style access (ShapValues shim)
    assert phi.shape == (6, data[0].shape[1], data[1].shape[1])
    assert res.base_values.shape == (6, data[1].shape[1])
    assert len(res) == 6 and res[2].values.shape == phi[2].shape
    assert np.isfinite(phi).all()
    # efficiency against a direct modal_predict call
    pred = jm.modal_predict(data[0][:6], 0)
    bg = np.tile(data[0][:6].mean(axis=0), (6, 1))
    base = jm.modal_predict(bg, 0)
    np.testing.assert_allclose(phi.sum(axis=1), pred - base,
                               rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(res.base_values, base, rtol=1e-4, atol=1e-4)


def test_underdetermined_coalition_budget_rejected():
    """Fewer coalitions than features would make the WLS rank-deficient —
    finite, efficiency-satisfying, and confidently wrong; it must raise
    (shap errors at the same place) and name the features= escape hatch."""
    rng = np.random.RandomState(10)
    data = rng.randn(5, 40).astype(np.float32)
    with pytest.raises(ValueError, match='features='):
        kernel_shap(_linear(rng.randn(40, 2).astype(np.float32), 0.0),
                    data, n_coalitions=30)


def test_boolean_feature_mask():
    """A boolean mask for features= selects by mask, not by int-cast {0,1}
    indices."""
    rng = np.random.RandomState(11)
    F, D = 9, 2
    W = rng.randn(F, D).astype(np.float32)
    data = rng.randn(10, F).astype(np.float32)
    mask = np.zeros(F, bool); mask[[2, 5, 8]] = True
    phi, base = kernel_shap(_linear(W, 0.0), data, features=mask,
                            n_coalitions=64, seed=12)
    assert phi.shape == (10, 3, D)
    bg = data.mean(axis=0)
    expected = (data[:, mask] - bg[mask])[:, :, None] * W[mask][None]
    np.testing.assert_allclose(phi, expected, rtol=1e-3, atol=1e-3)


def test_masked_eval_streams_in_batches():
    """Masked inputs are built per eval slab, never as one (E*S, F) matrix:
    the predict_fn must only ever see batches <= batch_rows, and tiny
    batch_rows must still give the exact linear answer."""
    rng = np.random.RandomState(13)
    F, D = 6, 2
    W = rng.randn(F, D).astype(np.float32)
    data = rng.randn(7, F).astype(np.float32)
    seen = []

    def f(x):
        seen.append(len(x))
        return np.asarray(x) @ W

    phi, _ = kernel_shap(f, data, n_coalitions=64, seed=14, batch_rows=50)
    assert max(seen) <= 50
    bg = data.mean(axis=0)
    expected = (data - bg)[:, :, None] * W[None]
    np.testing.assert_allclose(phi, expected, rtol=1e-3, atol=1e-3)


def test_shap_plots_smoke():
    """Summary beeswarm + waterfall render from kernel_shap output."""
    import matplotlib
    matplotlib.use('Agg')
    import matplotlib.pyplot as plt
    from jamie_tpu.figures import plot_shap_summary, plot_shap_waterfall

    rng = np.random.RandomState(8)
    W = rng.randn(12, 3).astype(np.float32)
    data = rng.randn(25, 12).astype(np.float32)
    phi, base = kernel_shap(_linear(W, 0.5), data, n_coalitions=128, seed=9)
    plt.figure()
    plot_shap_summary(phi, data, max_features=8)
    plt.figure()
    plot_shap_waterfall(phi[0], base[0], max_features=5, output_index=1)
    plt.close('all')


def test_scalar_output_model():
    """predict_fn returning (n,) — a scalar-output model like the
    notebooks' per-feature lambdas — is treated as one output column."""
    rng = np.random.RandomState(15)
    F = 7
    wv = rng.randn(F).astype(np.float32)
    data = rng.randn(9, F).astype(np.float32)
    phi, base = kernel_shap(lambda x: np.asarray(x) @ wv, data,
                            n_coalitions=64, seed=16)
    assert phi.shape == (9, F, 1) and base.shape == (9, 1)
    bg = data.mean(axis=0)
    np.testing.assert_allclose(phi[:, :, 0], (data - bg) * wv,
                               rtol=1e-3, atol=1e-3)
