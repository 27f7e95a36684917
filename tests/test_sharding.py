"""Multi-device sharding tests on the 8-device virtual CPU mesh."""

import jax
import numpy as np
import pytest

from jamie_tpu.core.mesh import create_mesh, data_sharding
from jamie_tpu.ops.distances import pairwise_distance


@pytest.fixture(scope='module')
def mesh():
    assert len(jax.devices()) >= 8, 'conftest should spoof 8 CPU devices'
    return create_mesh(shape=(8,), axis_names=('data',))


def test_mesh_creation(mesh):
    assert mesh.shape == {'data': 8}


def test_sharded_trainer_matches_unsharded_setup(mesh):
    """A sharded training chunk runs and produces finite decreasing loss."""
    from jamie_tpu.config import JamieConfig
    from jamie_tpu.models import CoupledVAE
    from jamie_tpu.train.trainer import JamieTrainer

    rng = np.random.RandomState(0)
    n = 64
    z = rng.randn(n, 4).astype(np.float32)
    x0 = (z @ rng.randn(4, 16)).astype(np.float32)
    x1 = (z @ rng.randn(4, 12)).astype(np.float32)
    P = np.eye(n, dtype=np.float32)
    F = np.zeros((n, n), np.float32)
    cfg = JamieConfig(epoch_DNN=30, min_epochs=5, batch_size=32,
                      epoch_chunk=10, use_early_stop=False, pca_dim=None,
                      log_DNN=1000)
    model = CoupledVAE((16, 12), cfg.output_dim, dropout=0.0)
    trainer = JamieTrainer(cfg, model, [x0, x1], P, F, mesh=mesh)
    with mesh:
        trainer.fit()
    losses = trainer.epoch_losses
    assert len(losses) == 30
    assert np.isfinite(losses).all()
    assert np.mean(losses[-5:]) < np.mean(losses[:5])


def test_sharded_prime_dual_matches_unsharded(mesh):
    from jamie_tpu.solvers.prime_dual import prime_dual
    rng = np.random.RandomState(1)
    x = rng.randn(32, 6).astype(np.float32)
    Kx = np.asarray(pairwise_distance(x))
    F_ref = prime_dual(Kx, Kx, dx=6, dy=6, epoch_pd=100, verbose=False,
                       use_pallas=False)
    F_sharded = prime_dual(Kx, Kx, dx=6, dy=6, epoch_pd=100, verbose=False,
                           mesh=mesh)
    np.testing.assert_allclose(F_sharded, F_ref, rtol=1e-4, atol=1e-6)


def test_sharded_distance_matches_unsharded(mesh):
    rng = np.random.RandomState(2)
    x = rng.randn(41, 7).astype(np.float32)  # odd N: uneven shards
    for metric in ('euclidean', 'sqeuclidean', 'cosine', 'correlation'):
        d_ref = np.asarray(pairwise_distance(x, metric))
        d_sh = np.asarray(pairwise_distance(x, metric, mesh=mesh))
        np.testing.assert_allclose(d_sh, d_ref, rtol=1e-5, atol=1e-5)


def test_estimator_auto_mesh_parity(synthetic_pair):
    """Flag-free JAMIE() auto-shards every phase on a multi-device backend
    and matches an explicitly unsharded fit (VERDICT round-1 item 2)."""
    from jamie_tpu import JAMIE
    data, labels = synthetic_pair
    kwargs = dict(epoch_DNN=40, min_epochs=10, batch_size=60, pca_dim=None,
                  distance_mode='euclidean', epoch_pd=60, epoch_chunk=20,
                  log_pd=1000, log_DNN=1000, use_early_stop=False)
    jm_sharded = JAMIE(**kwargs)
    assert jm_sharded.mesh is not None, 'auto mesh should engage (8 devices)'
    emb_sh = jm_sharded.fit_transform(dataset=data)
    jm_plain = JAMIE(use_mesh=False, **kwargs)
    assert jm_plain.mesh is None
    emb_pl = jm_plain.fit_transform(dataset=data)
    # Same seed, same sampling stream; only matmul partitioning differs.
    for a, b in zip(emb_sh, emb_pl):
        np.testing.assert_allclose(a, b, rtol=5e-2, atol=5e-3)
    f_sh = jm_sharded.test_closer(emb_sh)
    f_pl = jm_plain.test_closer(emb_pl)
    assert abs(f_sh - f_pl) < 0.02


def test_graft_entry_dryrun():
    from __graft_entry__ import dryrun_multichip
    dryrun_multichip(8)


def test_graft_entry_single():
    from __graft_entry__ import entry
    fn, args = entry()
    out = jax.jit(fn)(*args)
    assert all(np.isfinite(np.asarray(o)).all() for o in out)
