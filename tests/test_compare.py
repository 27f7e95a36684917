"""Comparison-method baselines recover a shared latent structure."""

import numpy as np
import pytest

from jamie_tpu.compare import (
    cca_embed, compare_methods, lma_embed, mmdma_embed, nlma_embed,
)


@pytest.fixture(scope='module')
def pair():
    """Two modalities generated from one latent with distinct mixings."""
    rng = np.random.RandomState(0)
    z = rng.randn(80, 4).astype(np.float32)
    x0 = (z @ rng.randn(4, 30) + 0.05 * rng.randn(80, 30)).astype(np.float32)
    x1 = (z @ rng.randn(4, 20) + 0.05 * rng.randn(80, 20)).astype(np.float32)
    labels = (z[:, 0] > 0).astype(int).astype(str)
    return [x0, x1], [labels, labels]


def _foscttm(emb):
    from jamie_tpu.evaluation import test_closer
    return test_closer(emb)


def test_nlma_aligns(pair):
    data, _ = pair
    emb = nlma_embed(data, output_dim=8)
    assert emb[0].shape == (80, 8)
    assert _foscttm(emb) < 0.1   # random ~ 0.5


def test_lma_aligns(pair):
    data, _ = pair
    emb = lma_embed(data, output_dim=8)
    assert _foscttm(emb) < 0.2


def test_cca_aligns(pair):
    data, _ = pair
    emb = cca_embed(data, output_dim=4)
    assert _foscttm(emb) < 0.1


def test_cca_explicit_partial_prior(pair):
    """The Wang-framework CCA accepts an explicit (even partial) P — the
    diag mask couples only the matched rows, the rest ride the shared
    projection."""
    data, _ = pair
    rng = np.random.RandomState(1)
    mask = (rng.rand(80) < 0.6).astype(np.float32)
    emb = cca_embed(data, P=np.diag(mask), output_dim=4)
    assert emb[0].shape == (80, 4)
    assert _foscttm(emb) < 0.2


def test_mmdma_runs(pair):
    data, _ = pair
    emb = mmdma_embed(data, output_dim=4, n_iters=400)
    assert np.isfinite(emb[0]).all() and np.isfinite(emb[1]).all()
    # MMD-MA is the weakest reference baseline (ref FOSCTTM 0.19 on scGEM);
    # with a short budget just require better-than-random alignment
    assert _foscttm(emb) < 0.45


def test_compare_harness(pair):
    data, labels = pair
    out = compare_methods(data, labels, methods=('NLMA', 'CCA'),
                          output_dim=8)
    for name in ('NLMA', 'CCA'):
        assert 0 <= out[name]['foscttm'] < 0.5
        assert out[name]['lta'] > 0.6   # binary labels, chance = 0.5
