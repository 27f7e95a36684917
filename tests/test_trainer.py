"""Trainer behavior: loss decreases, early stop, batch accumulation, resume."""

import numpy as np
import pytest

from jamie_tpu.config import JamieConfig
from jamie_tpu.models import CoupledVAE
from jamie_tpu.train.trainer import JamieTrainer


def _make_trainer(n=64, d0=12, d1=9, **overrides):
    rng = np.random.RandomState(0)
    z = rng.randn(n, 4).astype(np.float32)
    x0 = (z @ rng.randn(4, d0)).astype(np.float32)
    x1 = (z @ rng.randn(4, d1)).astype(np.float32)
    cfg = JamieConfig(**{**dict(
        epoch_DNN=40, min_epochs=10, batch_size=32, epoch_chunk=10,
        log_DNN=1000, use_early_stop=False, pca_dim=None,
        distance_mode='euclidean'), **overrides})
    model = CoupledVAE((d0, d1), cfg.output_dim, dropout=0.0)
    P = np.eye(n, dtype=np.float32)
    F = np.zeros((n, n), np.float32)
    return JamieTrainer(cfg, model, [x0, x1], P, F), cfg


def test_loss_decreases():
    trainer, _ = _make_trainer()
    state = trainer.fit()
    losses = trainer.epoch_losses
    assert len(losses) == 40
    assert np.mean(losses[-5:]) < np.mean(losses[:5])


def test_loss_history_recorded():
    trainer, _ = _make_trainer()
    trainer.fit()
    for name in ('KL', 'Rec', 'CosSim', 'F'):
        assert len(trainer.loss_history[name]) == 40
        assert np.isfinite(trainer.loss_history[name]).all()


def test_early_stop_triggers():
    trainer, _ = _make_trainer(
        epoch_DNN=200, min_epochs=5, use_early_stop=True,
        max_steps_without_increment=3, min_increment=1e10)  # never improves
    state = trainer.fit()
    # stops shortly after min_epochs + streak
    assert trainer.epochs_run < 40
    assert bool(state.stopped)


def test_no_early_stop_runs_full():
    trainer, _ = _make_trainer(epoch_DNN=30, use_early_stop=False)
    trainer.fit()
    assert trainer.epochs_run == 30


def test_epoch_step_mode():
    trainer, _ = _make_trainer(batch_step=False, epoch_DNN=20)
    trainer.fit()
    assert len(trainer.epoch_losses) == 20


def test_final_embed_shapes():
    trainer, cfg = _make_trainer()
    state = trainer.fit()
    emb = trainer.final_embed(state)
    assert emb[0].shape == (64, cfg.output_dim)
    assert emb[1].shape == (64, cfg.output_dim)
    assert np.isfinite(emb[0]).all()


def test_loss_weights_arity_check():
    with pytest.raises(AssertionError, match='weights'):
        _make_trainer(loss_weights=(1.0, 1.0))


def test_hybrid_mode_runs():
    rng = np.random.RandomState(3)
    n = 48
    mask = (rng.rand(n) < 0.6).astype(float)
    trainer, _ = _make_trainer()
    # rebuild with partial P
    from jamie_tpu.config import JamieConfig
    from jamie_tpu.models import CoupledVAE
    cfg = JamieConfig(epoch_DNN=10, min_epochs=2, batch_size=32,
                      epoch_chunk=5, use_early_stop=False, pca_dim=None,
                      PF_Ratio=0.7)
    z = rng.randn(n, 4).astype(np.float32)
    x0 = (z @ rng.randn(4, 10)).astype(np.float32)
    x1 = (z @ rng.randn(4, 8)).astype(np.float32)
    P = np.diag(mask).astype(np.float32)
    F = (rng.rand(n, n) * 0.1).astype(np.float32)
    model = CoupledVAE((10, 8), cfg.output_dim, dropout=0.0)
    tr = JamieTrainer(cfg, model, [x0, x1], P, F)
    assert tr.sampling_method == 'hybrid'
    state = tr.fit()
    assert np.isfinite(tr.epoch_losses).all()


def test_zeros_mode_runs():
    rng = np.random.RandomState(4)
    from jamie_tpu.config import JamieConfig
    from jamie_tpu.models import CoupledVAE
    cfg = JamieConfig(epoch_DNN=10, min_epochs=2, batch_size=16,
                      epoch_chunk=5, use_early_stop=False, pca_dim=None)
    x0 = rng.randn(30, 10).astype(np.float32)
    x1 = rng.randn(45, 8).astype(np.float32)
    P = np.zeros((30, 45), np.float32)
    F = np.zeros((30, 45), np.float32)
    model = CoupledVAE((10, 8), cfg.output_dim, dropout=0.0)
    tr = JamieTrainer(cfg, model, [x0, x1], P, F)
    assert tr.sampling_method == 'zeros'
    tr.fit()
    assert np.isfinite(tr.epoch_losses).all()


def test_prng_impl_rbg_runs():
    """prng_impl='rbg' (TPU hardware RNG knob) produces a finite fit; the
    global impl is restored afterwards so other tests keep threefry."""
    import jax

    from jamie_tpu.config import JamieConfig
    from jamie_tpu.models import CoupledVAE
    from jamie_tpu.train.trainer import JamieTrainer

    rng = np.random.RandomState(21)
    z = rng.randn(40, 4).astype(np.float32)
    data = [(z @ rng.randn(4, 10)).astype(np.float32),
            (z @ rng.randn(4, 8)).astype(np.float32)]
    old = jax.config.jax_default_prng_impl
    try:
        cfg = JamieConfig(epoch_DNN=10, min_epochs=2, batch_size=20,
                          epoch_chunk=5, use_early_stop=False, pca_dim=None,
                          log_DNN=1000, prng_impl='rbg', dropout=0.5)
        model = CoupledVAE((10, 8), cfg.output_dim, dropout=0.5)
        tr = JamieTrainer(cfg, model, data, np.eye(40, dtype=np.float32),
                          np.zeros((40, 40), np.float32))
        tr.fit()
        assert np.isfinite(tr.epoch_losses).all()
        # The impl is scoped to init/fit, not sticky: a later trainer with
        # prng_impl=None must not silently inherit 'rbg' (ADVICE round 2).
        assert jax.config.jax_default_prng_impl == old
    finally:
        jax.config.update('jax_default_prng_impl', old)


def test_clip_adam_matches_optax_chain():
    """The folded clip+Adam transformation (ops/ab_archive.clip_adam) matches
    optax.chain(clip_by_global_norm, adam) step for step, including steps
    where clipping activates."""
    import jax.numpy as jnp
    import optax

    from jamie_tpu.ops.ab_archive import clip_adam

    rng = np.random.RandomState(2)
    params = {'a': jnp.asarray(rng.randn(32, 8), jnp.float32),
              'b': jnp.asarray(rng.randn(8), jnp.float32)}
    ref_tx = optax.chain(optax.clip_by_global_norm(1.0), optax.adam(1e-3))
    new_tx = clip_adam(1e-3)
    s_ref, s_new = ref_tx.init(params), new_tx.init(params)
    p_ref = p_new = params
    for t in range(20):
        g = {'a': jnp.asarray(rng.randn(32, 8) * (5 if t % 3 else 0.1),
                              jnp.float32),
             'b': jnp.asarray(rng.randn(8), jnp.float32)}
        u1, s_ref = ref_tx.update(g, s_ref, p_ref)
        p_ref = optax.apply_updates(p_ref, u1)
        u2, s_new = new_tx.update(g, s_new, p_new)
        p_new = optax.apply_updates(p_new, u2)
    for k in params:
        np.testing.assert_allclose(p_ref[k], p_new[k], rtol=1e-6, atol=1e-7)


def test_pipelined_dispatch_matches_sequential():
    """dispatch_lookahead hides the per-chunk readback round-trip; it must
    not change a single recorded number. Run the same fit sequential
    (lookahead 0) and pipelined (lookahead 3) and pin loss history,
    epoch losses, epochs_run, and final params bit-for-bit."""
    runs = {}
    for la in (0, 3):
        trainer, _ = _make_trainer(epoch_DNN=40, epoch_chunk=10,
                                   dispatch_lookahead=la)
        state = trainer.fit(seed=0)
        runs[la] = (list(trainer.epoch_losses),
                    {k: list(v) for k, v in trainer.loss_history.items()},
                    trainer.epochs_run, state)
    assert runs[0][0] == runs[3][0]
    assert runs[0][1] == runs[3][1]
    assert runs[0][2] == runs[3][2] == 40
    import jax
    for a, b in zip(jax.tree.leaves(runs[0][3].params),
                    jax.tree.leaves(runs[3][3].params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_pipelined_dispatch_early_stop_matches_sequential():
    """An early stop discovered one chunk late must not leak the drained
    no-op chunks into history: pipelined and sequential fits stop at the
    same epoch with identical recorded losses."""
    kw = dict(epoch_DNN=200, min_epochs=5, use_early_stop=True,
              max_steps_without_increment=3, min_increment=1e10,
              epoch_chunk=10)
    out = {}
    for la in (0, 3):
        trainer, _ = _make_trainer(dispatch_lookahead=la, **kw)
        state = trainer.fit(seed=0)
        out[la] = (list(trainer.epoch_losses), trainer.epochs_run,
                   bool(state.stopped), int(state.epoch))
    assert out[0] == out[3]
    assert out[0][1] < 40 and out[0][2]


def test_checkpointing_forces_sequential_dispatch(tmp_path):
    """checkpoint_every needs the state at each processed boundary, which
    pipelining donates away — snapshots must land at exact epochs and
    restore to the same continuation regardless of dispatch_lookahead."""
    trainer, _ = _make_trainer(epoch_DNN=30, epoch_chunk=10,
                               dispatch_lookahead=3)
    trainer.fit(seed=0, checkpoint_dir=str(tmp_path / 'ck'),
                checkpoint_every=10)
    import os
    snaps = sorted(os.listdir(tmp_path / 'ck'))
    assert snaps == ['epoch_10', 'epoch_20', 'epoch_30']
