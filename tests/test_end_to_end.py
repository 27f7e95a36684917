"""End-to-end estimator tests on synthetic paired data.

These pin down the behaviors the reference's notebooks exercise
(SURVEY.md section 4): full fit_transform quality (FOSCTTM/LTA), imputation,
partial priors, save/load round-trip.
"""

import os

import numpy as np
import pytest

from jamie_tpu import JAMIE

FAST = dict(epoch_DNN=400, min_epochs=100, epoch_chunk=100, log_DNN=10_000,
            batch_size=64, pca_dim=None, distance_mode='euclidean',
            epoch_pd=300, use_early_stop=False, dropout=0.0)


@pytest.fixture(scope='module')
def fitted(synthetic_pair):
    data, labels = synthetic_pair
    jm = JAMIE(**FAST)
    integrated = jm.fit_transform(dataset=data)
    return jm, integrated, data, labels


def test_integration_quality(fitted):
    jm, integrated, data, labels = fitted
    foscttm = jm.test_closer(integrated)
    assert foscttm < 0.15, f'FOSCTTM too high: {foscttm}'
    acc = jm.test_LabelTA(integrated, labels)
    assert acc > 0.8, f'label transfer accuracy too low: {acc}'


def test_embeddings_aligned_across_modalities(fitted):
    jm, integrated, *_ = fitted
    # matched rows should be much closer than random pairs
    d_match = np.linalg.norm(integrated[0] - integrated[1], axis=1).mean()
    rng = np.random.RandomState(0)
    perm = rng.permutation(len(integrated[1]))
    d_rand = np.linalg.norm(integrated[0] - integrated[1][perm],
                            axis=1).mean()
    assert d_match < 0.5 * d_rand


def test_imputation_correlation(fitted):
    jm, integrated, data, labels = fitted
    imputed1 = jm.modal_predict(data[0], 0)  # predict modality 1 from 0
    assert imputed1.shape == data[1].shape
    r = [np.corrcoef(imputed1[:, j], data[1][:, j])[0, 1]
         for j in range(data[1].shape[1])]
    assert np.nanmean(r) > 0.5, f'mean imputation r too low: {np.nanmean(r)}'


def test_transform_matches_training_output_shapes(fitted):
    jm, integrated, data, labels = fitted
    re = jm.transform(data)
    assert re[0].shape == integrated[0].shape
    one = jm.transform_one(data[0], 0)
    assert one.shape == integrated[0].shape


def test_transform_equals_full_forward_output0(fitted):
    """transform() computes the mu heads directly; the reference instead
    runs the full forward with an N x N eye corr and returns output[0].
    In eval mode those are the same values — pin the equivalence that
    justifies never materializing the eye (40 GB at 100k cells)."""
    import jax.numpy as jnp

    jm, integrated, data, labels = fitted
    re = jm.transform(data)
    xs = [jnp.asarray(jm.preprocessors[i].transform(data[i]), jnp.float32)
          for i in range(2)]
    corr = jnp.eye(xs[0].shape[0], dtype=jnp.float32)
    outputs = jm.model.apply(jm._variables(), xs, corr, train=False)
    for a, b in zip(re, outputs[0]):
        np.testing.assert_allclose(a, np.asarray(b), rtol=1e-6, atol=1e-6)


def test_save_load_roundtrip(fitted, tmp_path):
    jm, integrated, data, labels = fitted
    path = os.path.join(tmp_path, 'model.npz')
    jm.save_model(path)
    jm2 = JAMIE(**FAST)
    jm2.load_model(path)
    imp1 = jm.modal_predict(data[0], 0)
    imp2 = jm2.modal_predict(data[0], 0)
    np.testing.assert_allclose(imp1, imp2, rtol=1e-5, atol=1e-5)
    emb1 = jm.transform_one(data[0], 0)
    emb2 = jm2.transform_one(data[0], 0)
    np.testing.assert_allclose(emb1, emb2, rtol=1e-5, atol=1e-5)


def test_partial_priors_hybrid_path(synthetic_pair):
    data, labels = synthetic_pair
    n = data[0].shape[0]
    rng = np.random.RandomState(0)
    mask = np.zeros(n)
    mask[rng.choice(n, int(0.5 * n), replace=False)] = 1
    jm = JAMIE(P=np.diag(mask), **{**FAST, 'epoch_DNN': 300})
    integrated = jm.fit_transform(dataset=data)
    assert jm.sampling_method == 'hybrid'
    acc = jm.test_LabelTA(integrated, labels)
    assert acc > 0.6, f'hybrid LTA too low: {acc}'


def test_use_f_tilde_false_skips_solver(synthetic_pair):
    data, labels = synthetic_pair
    jm = JAMIE(use_f_tilde=False, **FAST)
    integrated = jm.fit_transform(dataset=data)
    np.testing.assert_array_equal(jm.match_result[0], 0)
    assert np.isfinite(integrated[0]).all()


def test_precomputed_match_result(synthetic_pair):
    data, labels = synthetic_pair
    n = data[0].shape[0]
    jm = JAMIE(match_result=[np.eye(n, dtype=np.float32)], **FAST)
    integrated = jm.fit_transform(dataset=data)
    assert np.isfinite(integrated[0]).all()


def test_pca_path(synthetic_pair):
    data, labels = synthetic_pair
    jm = JAMIE(**{**FAST, 'pca_dim': (20, 20), 'epoch_DNN': 200})
    integrated = jm.fit_transform(dataset=data)
    assert integrated[0].shape == (data[0].shape[0], 32)
    imputed = jm.modal_predict(data[0], 0)
    assert imputed.shape == data[1].shape


def test_label_dist(fitted):
    jm, integrated, data, labels = fitted
    keys, dist = jm.test_label_dist(integrated, labels, verbose=False)
    assert len(keys) == 2
    assert dist.shape == (2, 2)


def test_test_partial_sweep(synthetic_pair):
    """Public partial-alignment sweep API (evaluation.py:28-62)."""
    import matplotlib
    matplotlib.use('Agg')
    from jamie_tpu.evaluation import test_partial
    data, labels = synthetic_pair
    np.random.seed(0)
    # fraction 0 (the default linspace(0,1,3) includes it) must route to
    # the 'zeros' regime, not crash the hybrid sampler on an empty pair set
    acc, fractions = test_partial(
        data, labels, fraction_range=np.array([0.0, 0.5, 1.0]), plot=False,
        epoch_DNN=150, min_epochs=50, epoch_chunk=50, batch_size=64,
        pca_dim=None, epoch_pd=100, use_early_stop=False, dropout=0.0,
        log_DNN=100000)
    assert len(acc['lta']) == 3
    assert len(acc['foscttm']) == 3
    assert all(np.isfinite(acc['foscttm']))


def test_visualize_smoke(fitted):
    import matplotlib
    matplotlib.use('Agg')
    import matplotlib.pyplot as plt
    jm, integrated, data, labels = fitted
    jm.Visualize(data, integrated, datatype=labels, mode='PCA')
    plt.close('all')


def test_tune_cm_smoke(synthetic_pair):
    from jamie_tpu import JAMIE
    from jamie_tpu.utils import tune_cm
    data, labels = synthetic_pair
    types = [np.unique(t, return_inverse=True)[1] for t in labels]
    jm = JAMIE(epoch_DNN=100, min_epochs=20, epoch_chunk=50, batch_size=64,
               pca_dim=None, epoch_pd=50, use_early_stop=False, dropout=0.0,
               log_DNN=100000)
    best_wt, best_data = tune_cm(jm, data, types, wt_size=4, num_search=2)
    assert best_wt is not None and len(best_wt) == 4


def test_memmap_inputs_kept_as_is(synthetic_pair, tmp_path, monkeypatch):
    """Memmap inputs must reach the residency layer AS-IS through a FULL
    fit: every np.asarray on the way (fit_transform entry,
    dataset_distance_matrix, PCA.fit/transform, Preprocessor.fit/transform)
    returned a fresh base-class view — .filename lost (the on-disk encode
    cache never engaged in any full-fit run) and id() unstable (the
    id-keyed residency cache re-uploaded the same matrix once per phase:
    the round-4 warm scGLUE leg shipped 1,651.8 MB, exactly two full
    resident builds)."""
    import os

    import jamie_tpu.ops.distances as dmod
    import jamie_tpu.preprocess as pmod
    from jamie_tpu.core import residency

    data, _labels = synthetic_pair
    paths = []
    for i, d in enumerate(data):
        p = tmp_path / f'm{i}.npy'
        np.save(p, d)
        paths.append(p)
    mm = [np.load(p, mmap_mode='r') for p in paths]

    # force the resident path at test shapes + count builds per source
    monkeypatch.setattr(dmod, '_FEATURE_CHUNK_THRESHOLD', 1000)
    monkeypatch.setattr(pmod, '_STREAM_THRESHOLD', 1000)
    monkeypatch.setattr(residency, 'ENCODE_CACHE_DIR', str(tmp_path / 'enc'))
    builds = []
    orig = residency.build_resident_bf16
    monkeypatch.setattr(
        residency, 'build_resident_bf16',
        lambda arr, **kw: (builds.append(
            (type(arr).__name__, getattr(arr, 'filename', None))),
            orig(arr, **kw))[1])
    residency.clear_residency_cache()

    jm = JAMIE(**{**FAST, 'epoch_DNN': 100, 'min_epochs': 20,
                  'epoch_chunk': 50, 'epoch_pd': 50,
                  'pca_dim': (20, 15)})
    jm.fit_transform(dataset=mm)
    for got, src in zip(jm.dataset, mm):
        assert got is src, type(got)
        assert str(getattr(got, 'filename', None)) == str(src.filename)
    # ONE resident build per modality, each seeing the memmap itself
    assert len(builds) == 2, builds
    assert all(t == 'memmap' and fn is not None for t, fn in builds), builds
    # and the on-disk encode cache engaged
    assert os.listdir(tmp_path / 'enc'), 'encode cache never engaged'
    residency.clear_residency_cache()
