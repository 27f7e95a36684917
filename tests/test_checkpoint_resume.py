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
