"""Mid-training checkpoint/resume and occlusion-importance tests."""

import numpy as np
import pytest

from jamie_tpu.config import JamieConfig
from jamie_tpu.models import CoupledVAE
from jamie_tpu.train.trainer import JamieTrainer


def _trainer(**overrides):
    rng = np.random.RandomState(0)
    n = 48
    z = rng.randn(n, 4).astype(np.float32)
    x0 = (z @ rng.randn(4, 12)).astype(np.float32)
    x1 = (z @ rng.randn(4, 9)).astype(np.float32)
    cfg = JamieConfig(**{**dict(
        epoch_DNN=20, min_epochs=5, batch_size=24, epoch_chunk=5,
        log_DNN=1000, use_early_stop=False, pca_dim=None), **overrides})
    model = CoupledVAE((12, 9), cfg.output_dim, dropout=0.0)
    return JamieTrainer(cfg, model, [x0, x1], np.eye(n, dtype=np.float32),
                        np.zeros((n, n), np.float32))


def test_fit_state_roundtrip(tmp_path):
    trainer = _trainer()
    state = trainer.fit()
    path = str(tmp_path / 'ckpt')
    trainer.save_fit_state(path, state)
    restored = trainer.restore_fit_state(path)
    emb1 = trainer.final_embed(state)
    emb2 = trainer.final_embed(restored)
    np.testing.assert_allclose(emb1[0], emb2[0], rtol=1e-6)
    assert int(restored.epoch) == int(state.epoch)


def test_resume_continues_training(tmp_path):
    trainer = _trainer(epoch_DNN=10)
    state = trainer.fit()
    assert int(state.epoch) == 10
    # Bump the budget and resume from the saved state
    trainer2 = _trainer(epoch_DNN=20)
    path = str(tmp_path / 'ckpt2')
    trainer.save_fit_state(path, state)
    restored = trainer2.restore_fit_state(path)
    final = trainer2.fit(state=restored)
    assert int(final.epoch) == 20
    assert trainer2.epochs_run == 10  # only the new epochs ran


def test_occlusion_impact_device(synthetic_pair):
    from jamie_tpu import JAMIE
    from jamie_tpu.evaluation import occlusion_impact_device
    data, labels = synthetic_pair
    jm = JAMIE(epoch_DNN=150, min_epochs=50, epoch_chunk=50, batch_size=64,
               pca_dim=None, use_f_tilde=False, use_early_stop=False,
               dropout=0.0, log_DNN=10000)
    jm.fit_transform(dataset=data)
    baseline, impact, idx = occlusion_impact_device(
        jm, data[0], data[1], modality=0, batch_features=16)
    assert np.isfinite(baseline)
    assert impact.shape == (data[0].shape[1],)
    assert np.isfinite(impact).all()


def test_metrics_jsonl(tmp_path):
    import json
    trainer = _trainer(epoch_DNN=10)
    path = str(tmp_path / 'metrics.jsonl')
    trainer.fit(metrics_path=path)
    records = [json.loads(line) for line in open(path)]
    assert len(records) == 2  # 10 epochs / chunk 5
    assert records[0]['epoch_start'] == 0
    assert records[0]['epoch_end'] == 5
    assert set(records[0]['losses']) == {'KL', 'Rec', 'CosSim', 'F'}
    assert records[0]['seconds'] > 0

def test_checkpoint_and_metrics_via_config(tmp_path):
    """checkpoint_every/metrics_path ride the public config so plain
    JAMIE(...).fit_transform gets the preemption-safety net (round-2
    verdict item 5: trainer.fit accepted these but the estimator never
    exposed them)."""
    import json
    from jamie_tpu import JAMIE

    rng = np.random.RandomState(7)
    z = rng.randn(40, 4).astype(np.float32)
    data = [(z @ rng.randn(4, 10)).astype(np.float32),
            (z @ rng.randn(4, 8)).astype(np.float32)]
    mpath = str(tmp_path / 'metrics.jsonl')
    jm = JAMIE(epoch_DNN=10, min_epochs=2, batch_size=20, epoch_chunk=5,
               pca_dim=None, use_f_tilde=False, use_early_stop=False,
               dropout=0.0, log_DNN=1000,
               checkpoint_dir=str(tmp_path / 'ckpts'), checkpoint_every=5,
               metrics_path=mpath)
    jm.fit_transform(dataset=data)
    records = [json.loads(line) for line in open(mpath)]
    assert len(records) == 2
    ckpts = sorted((tmp_path / 'ckpts').iterdir())
    assert len(ckpts) >= 1
    restored = jm.trainer.restore_fit_state(str(ckpts[0]))
    assert int(restored.epoch) in (5, 10)


def test_fit_does_not_invalidate_caller_state(tmp_path):
    """fit(state=...) donates buffers internally but must not delete the
    caller's TrainState (e.g. a restored checkpoint kept for comparison) —
    ADVICE round 2."""
    trainer = _trainer(epoch_DNN=10)
    state = trainer.fit()
    path = str(tmp_path / 'ckpt3')
    trainer.save_fit_state(path, state)
    kept = trainer.restore_fit_state(path)
    trainer2 = _trainer(epoch_DNN=15)
    trainer2.fit(state=kept)
    # The caller's object is still alive and usable after fit
    emb = trainer2.final_embed(kept)
    assert np.isfinite(emb[0]).all()
    assert int(kept.epoch) == 10


def test_checkpoint_relative_path(tmp_path, monkeypatch):
    """orbax rejects relative paths; save_fit_state must absolutize so a
    relative checkpoint_dir doesn't crash the fit at the first snapshot."""
    monkeypatch.chdir(tmp_path)
    trainer = _trainer()
    state = trainer.fit()
    trainer.save_fit_state('ckpts/epoch_20', state)
    restored = trainer.restore_fit_state('ckpts/epoch_20')
    assert int(restored.epoch) == int(state.epoch)


def test_occlusion_input_space_matches_bruteforce(synthetic_pair):
    """space='input' (PCA preclass): the linear-shortcut occlusion must
    equal explicitly re-transforming the occluded raw matrix."""
    import jax.numpy as jnp

    from jamie_tpu import JAMIE
    from jamie_tpu.evaluation import occlusion_impact_device
    from jamie_tpu.models.coupled_vae import CoupledVAE

    data, labels = synthetic_pair
    jm = JAMIE(epoch_DNN=100, min_epochs=30, epoch_chunk=50, batch_size=64,
               pca_dim=(16, 12), use_f_tilde=False, use_early_stop=False,
               dropout=0.0, log_DNN=10000)
    jm.fit_transform(dataset=data)

    test_feats = np.array([0, 7, 33])
    baseline, impact, idx = occlusion_impact_device(
        jm, data[0], data[1], modality=0, batch_features=4, idx=test_feats)
    assert (idx == test_feats).all()

    # Brute force: occlude the raw column, re-run the full preclass
    pre_in, pre_out = jm.preprocessors
    raw = np.asarray(data[0], np.float32)
    true_t = jnp.asarray(pre_out.transform(np.asarray(data[1], np.float32)))
    variables = jm._variables()

    def mean_r(pred):
        pc = pred - jnp.mean(pred, axis=0)
        tc = true_t - jnp.mean(true_t, axis=0)
        num = jnp.sum(pc * tc, axis=0)
        den = jnp.linalg.norm(pc, axis=0) * jnp.linalg.norm(tc, axis=0)
        return float(jnp.mean(num / jnp.maximum(den, 1e-12)))

    for j, fid in enumerate(test_feats):
        occ = raw.copy()
        occ[:, fid] = occ[:, fid].mean()
        xo = jnp.asarray(pre_in.transform(occ), jnp.float32)
        pred = jm.model.apply(variables, xo, 0, 1, train=False,
                              method=CoupledVAE.impute)
        np.testing.assert_allclose(impact[j], baseline - mean_r(pred),
                                   atol=2e-5)

    # latent space still available, sized by the PCA dim
    _, lat_impact, lat_idx = occlusion_impact_device(
        jm, data[0], data[1], modality=0, batch_features=8, space='latent')
    assert lat_impact.shape == (16,) and np.isfinite(lat_impact).all()


def test_diag_mask_with_nonunit_weights_is_hybrid():
    """A 1-D diagonal prior of 0.5s must pick 'hybrid' like its dense
    np.diag(0.5s) equivalent — only the exact identity gets 'diag'."""
    trainer = _trainer_with_P(np.full(48, 0.5, np.float32))
    assert trainer.sampling_method == 'hybrid'
    trainer = _trainer_with_P(np.ones(48, np.float32))
    assert trainer.sampling_method == 'diag'


def _trainer_with_P(P):
    rng = np.random.RandomState(0)
    n = 48
    z = rng.randn(n, 4).astype(np.float32)
    x0 = (z @ rng.randn(4, 12)).astype(np.float32)
    x1 = (z @ rng.randn(4, 9)).astype(np.float32)
    cfg = JamieConfig(epoch_DNN=10, min_epochs=5, batch_size=24,
                      epoch_chunk=5, log_DNN=1000, use_early_stop=False,
                      pca_dim=None)
    model = CoupledVAE((12, 9), cfg.output_dim, dropout=0.0)
    return JamieTrainer(cfg, model, [x0, x1], P, np.zeros((n, n), np.float32))


def test_save_load_preserves_numerics_flags(tmp_path, synthetic_pair):
    """A model fitted with bf16 matmuls must serve bf16 matmuls after
    save_model/load_model round-trip."""
    from jamie_tpu import JAMIE

    data, labels = synthetic_pair
    jm = JAMIE(epoch_DNN=40, min_epochs=10, epoch_chunk=20, batch_size=64,
               pca_dim=None, use_f_tilde=False, use_early_stop=False,
               dropout=0.0, log_DNN=10000, model_matmul_dtype='bfloat16')
    jm.fit_transform(dataset=data)
    assert jm.model.matmul_bf16
    path = str(tmp_path / 'm.npz')
    jm.save_model(path)
    jm2 = JAMIE().load_model(path)
    assert jm2.model.matmul_bf16
    np.testing.assert_allclose(jm.modal_predict(data[0], 0),
                               jm2.modal_predict(data[0], 0), atol=1e-5)
