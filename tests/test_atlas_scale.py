"""Atlas-scale path: implicit identity P / zero F, no N x N materialization."""

import numpy as np

from jamie_tpu.config import JamieConfig
from jamie_tpu.models import CoupledVAE
from jamie_tpu.train.trainer import JamieTrainer


def _data(n=64, d0=10, d1=8, seed=0):
    rng = np.random.RandomState(seed)
    z = rng.randn(n, 4).astype(np.float32)
    return [(z @ rng.randn(4, d0)).astype(np.float32),
            (z @ rng.randn(4, d1)).astype(np.float32)]


def _cfg(**kw):
    return JamieConfig(**{**dict(
        epoch_DNN=30, min_epochs=5, batch_size=32, epoch_chunk=10,
        log_DNN=1000, use_early_stop=False, pca_dim=None), **kw})


def test_sentinel_matches_dense():
    """Implicit identity/zeros produce the same fit as the dense arrays
    (same seeds -> identical batches -> identical params)."""
    data = _data()
    n = data[0].shape[0]
    cfg = _cfg()
    model = CoupledVAE((10, 8), cfg.output_dim, dropout=0.0)

    dense = JamieTrainer(cfg, model, data, np.eye(n, dtype=np.float32),
                         np.zeros((n, n), np.float32))
    s_dense = dense.fit()
    implicit = JamieTrainer(cfg, model, data, 'identity', 'zeros')
    s_impl = implicit.fit()

    assert implicit.sampling_method == 'diag'
    np.testing.assert_allclose(dense.epoch_losses, implicit.epoch_losses,
                               rtol=1e-5)
    e1 = dense.final_embed(s_dense)
    e2 = implicit.final_embed(s_impl)
    np.testing.assert_allclose(e1[0], e2[0], rtol=1e-4, atol=1e-6)


def test_estimator_atlas_flow():
    """Estimator end-to-end with use_f_tilde=False on 'large' rows (forced
    sentinel via monkeypatched threshold is unnecessary — just verify the
    sentinel path directly through fit_transform on small data by the
    trainer contract above; here check the normal path still works)."""
    from jamie_tpu import JAMIE
    data = _data(n=48)
    jm = JAMIE(use_f_tilde=False, epoch_DNN=20, min_epochs=5,
               batch_size=24, epoch_chunk=10, pca_dim=None,
               use_early_stop=False, log_DNN=1000)
    out = jm.fit_transform(dataset=data)
    assert out[0].shape == (48, 32)
    assert np.isfinite(out[0]).all()


def test_final_embed_is_corr_independent():
    """Pre-combine latents don't depend on corr (jamie.py:798 semantics)."""
    import jax.numpy as jnp
    data = _data(n=40)
    cfg = _cfg(epoch_DNN=10)
    model = CoupledVAE((10, 8), cfg.output_dim, dropout=0.0)
    tr = JamieTrainer(cfg, model, data, np.eye(40, dtype=np.float32),
                      np.zeros((40, 40), np.float32))
    state = tr.fit()
    emb = tr.final_embed(state)
    # full forward with an arbitrary corr gives the same output[0]
    variables = {'params': state.params, 'batch_stats': state.batch_stats}
    rng = np.random.RandomState(0)
    corr = jnp.asarray(rng.rand(40, 40), jnp.float32)
    outputs = model.apply(variables, tr.data, corr, train=False)
    np.testing.assert_allclose(emb[0], np.asarray(outputs[0][0]), atol=1e-5)
    np.testing.assert_allclose(emb[1], np.asarray(outputs[0][1]), atol=1e-5)


def test_diag_mask_prior_matches_dense():
    """1-D P (diagonal prior mask) reproduces the dense diag(P) fit."""
    rng = np.random.RandomState(5)
    data = _data(n=60)
    mask = (rng.rand(60) < 0.5).astype(np.float32)
    cfg = _cfg(epoch_DNN=20)
    model = CoupledVAE((10, 8), cfg.output_dim, dropout=0.0)
    F = np.zeros((60, 60), np.float32)

    dense = JamieTrainer(cfg, model, data, np.diag(mask), F)
    s_dense = dense.fit()
    sparse = JamieTrainer(cfg, model, data, mask, F)
    s_sparse = sparse.fit()

    assert dense.sampling_method == sparse.sampling_method == 'hybrid'
    np.testing.assert_allclose(dense.epoch_losses, sparse.epoch_losses,
                               rtol=1e-5)
    np.testing.assert_allclose(dense.final_embed(s_dense)[0],
                               sparse.final_embed(s_sparse)[0],
                               rtol=1e-4, atol=1e-6)


def test_diag_mask_all_ones_is_diag():
    data = _data(n=40)
    cfg = _cfg(epoch_DNN=6)
    model = CoupledVAE((10, 8), cfg.output_dim, dropout=0.0)
    tr = JamieTrainer(cfg, model, data, np.ones(40, np.float32), 'zeros')
    assert tr.sampling_method == 'diag'
    tr.fit()
    assert np.isfinite(tr.epoch_losses).all()


def test_diag_mask_through_estimator():
    from jamie_tpu import JAMIE
    data = _data(n=50)
    rng = np.random.RandomState(0)
    mask = (rng.rand(50) < 0.6).astype(np.float32)
    jm = JAMIE(P=mask, use_f_tilde=False, epoch_DNN=15, min_epochs=3,
               batch_size=25, epoch_chunk=5, pca_dim=None,
               use_early_stop=False, log_DNN=1000)
    out = jm.fit_transform(dataset=data)
    assert jm.sampling_method == 'hybrid'
    assert np.isfinite(out[0]).all()


def test_unaligned_atlas_P_never_densifies(monkeypatch):
    """Unequal-row datasets above the sentinel threshold must get a
    zero-nnz SparseRows P (the 'zeros' regime), not a dense rows0 x rows1
    zero matrix (~45 GB at 120k x 100k)."""
    import jamie_tpu.estimator as est_mod
    from jamie_tpu import JAMIE
    from jamie_tpu.ops.sparse import SparseRows

    monkeypatch.setattr(est_mod, 'SENTINEL_ENTRIES', 100)
    rng = np.random.RandomState(1)
    z0 = rng.randn(24, 4).astype(np.float32)
    z1 = rng.randn(18, 4).astype(np.float32)
    x0 = (z0 @ rng.randn(4, 10)).astype(np.float32)
    x1 = (z1 @ rng.randn(4, 8)).astype(np.float32)
    jm = JAMIE(epoch_DNN=10, min_epochs=5, epoch_chunk=5, batch_size=16,
               pca_dim=None, use_early_stop=False, dropout=0.0,
               log_DNN=1000, epoch_pd=50, log_pd=1000)
    out = jm.fit_transform(dataset=[x0, x1])
    assert isinstance(jm.P, SparseRows) and jm.P.shape == (24, 18)
    assert jm.trainer.sampling_method == 'zeros'
    assert out[0].shape == (24, jm.config.output_dim)


def test_sparse_synth_labels_align_with_pair(tmp_path, monkeypatch):
    """synthesize_sparse_labels re-derives the cluster assignments the pair
    generator drew (same rng sequence, stopping before the weight draws):
    rows sharing a label must be markedly closer in both modalities than
    rows across labels — and the derivation must not touch the pair cache."""
    import sys, os
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..',
                                    'examples'))
    import synth
    monkeypatch.setattr(synth, 'SYNTH_CACHE', str(tmp_path))
    m0, m1 = synth.synthesize_sparse_pair(300, 80, 60, density=0.2, seed=5)
    labels = synth.synthesize_sparse_labels(300, seed=5)
    assert labels.shape == (300,) and set(labels) <= set(range(12))
    for m in (m0, m1):
        x = np.asarray(m.todense(), np.float32)
        cent = np.stack([x[labels == c].mean(axis=0)
                         for c in np.unique(labels)])
        d = ((x[:, None, :] - cent[None]) ** 2).sum(-1)
        own = d[np.arange(300), np.searchsorted(np.unique(labels), labels)]
        assert (own <= d.min(axis=1) + 1e-4).mean() > 0.95
