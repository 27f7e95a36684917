"""Loss-stack parity tests against hand-computed references."""

import jax.numpy as jnp
import numpy as np

from jamie_tpu.train.losses import (
    col_normalize, f_reconstruction_loss, kl_anneal, kl_divergence,
    latent_consistency_loss, reconstruction_loss, row_normalize,
)


def test_kl_divergence_matches_formula():
    rng = np.random.RandomState(0)
    mus = [jnp.asarray(rng.randn(6, 4), jnp.float32) for _ in range(2)]
    logvars = [jnp.asarray(rng.randn(6, 4) * 0.1, jnp.float32)
               for _ in range(2)]
    expected = sum(
        np.mean(-0.5 * np.mean(
            1 + np.asarray(lv) - np.asarray(m) ** 2 - np.exp(np.asarray(lv)),
            axis=1))
        for m, lv in zip(mus, logvars))
    np.testing.assert_allclose(kl_divergence(mus, logvars), expected,
                               rtol=1e-5)


def test_kl_anneal_curve():
    """Sigmoid with midpoint min_epochs/2, scale 5/c (jamie.py:630-631)."""
    c = 2500 / 2
    np.testing.assert_allclose(kl_anneal(c, 2500, 10000), 0.5, rtol=1e-6)
    assert float(kl_anneal(0, 2500, 10000)) < 0.01
    assert float(kl_anneal(2500, 2500, 10000)) > 0.99
    # min_epochs=0 -> midpoint epoch_DNN/2
    np.testing.assert_allclose(kl_anneal(5000, 0, 10000), 0.5, rtol=1e-6)


def test_reconstruction_loss():
    rng = np.random.RandomState(1)
    rec = [jnp.asarray(rng.randn(5, 3), jnp.float32),
           jnp.asarray(rng.randn(5, 2), jnp.float32)]
    data = [jnp.zeros((5, 3)), jnp.zeros((5, 2))]
    expected = (np.mean(np.asarray(rec[0]) ** 2)
                + np.mean(np.asarray(rec[1]) ** 2))
    np.testing.assert_allclose(
        reconstruction_loss(rec, data), expected, rtol=1e-5)


def test_latent_consistency_euclidean_matches_full_matrix():
    """Direct diagonal == diag of the reference's full cdist matrix."""
    rng = np.random.RandomState(2)
    emb = [jnp.asarray(rng.randn(7, 4), jnp.float32) for _ in range(2)]
    com = [jnp.asarray(rng.randn(7, 4), jnp.float32) for _ in range(2)]
    loss = latent_consistency_loss(emb, com, 'euclidean')
    # reference: full pairwise distance, diag, square, mean, /dim, x32
    expected = 0.0
    for e, c in zip(emb, com):
        d = np.linalg.norm(
            np.asarray(e)[:, None, :] - np.asarray(c)[None, :, :], axis=2)
        expected += np.mean(np.diag(d) ** 2) / e.shape[1]
    np.testing.assert_allclose(loss, 32 * expected, rtol=1e-4)


def test_latent_consistency_cosine():
    rng = np.random.RandomState(3)
    emb = [jnp.asarray(rng.randn(5, 4), jnp.float32) for _ in range(2)]
    loss = latent_consistency_loss(emb, emb, 'cosine')
    np.testing.assert_allclose(loss, 0.0, atol=1e-9)


def test_f_reconstruction_loss():
    rng = np.random.RandomState(4)
    c0 = jnp.asarray(rng.randn(5, 3), jnp.float32)
    c1 = jnp.asarray(rng.randn(6, 3), jnp.float32)
    F = jnp.asarray(rng.rand(5, 6), jnp.float32)
    expected = np.mean(
        (np.asarray(c0) - np.asarray(F) @ np.asarray(c1)) ** 2)
    np.testing.assert_allclose(
        f_reconstruction_loss(c0, c1, F), expected, rtol=1e-5)


def test_row_col_normalize_with_zero_guard():
    M = jnp.asarray([[1.0, 1.0], [0.0, 0.0]])
    out = row_normalize(M)
    np.testing.assert_allclose(out, [[0.5, 0.5], [0.0, 0.0]])
    out = col_normalize(jnp.asarray([[2.0, 0.0], [2.0, 0.0]]))
    np.testing.assert_allclose(out, [[0.5, 0.0], [0.5, 0.0]])
