"""Model parity tests: shapes, eval/train behavior, combine math, init."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from jamie_tpu.models import CoupledVAE, combine_latents


def _make_model(dims=(20, 12), out=8, dropout=0.0):
    model = CoupledVAE(input_dim=dims, output_dim=out, dropout=dropout)
    key = jax.random.PRNGKey(0)
    xs = [jnp.ones((4, d)) for d in dims]
    corr = jnp.eye(4)
    variables = model.init(
        {'params': key, 'dropout': key, 'reparam': key}, xs, corr, train=True)
    return model, variables, xs, corr


def test_forward_shapes():
    model, variables, xs, corr = _make_model()
    zs, combined, x_hat, mus, logvars = model.apply(variables, xs, corr,
                                                    train=False)
    assert all(z.shape == (4, 8) for z in zs)
    assert all(c.shape == (4, 8) for c in combined)
    assert x_hat[0].shape == (4, 20) and x_hat[1].shape == (4, 12)
    assert all(m.shape == (4, 8) for m in mus)
    assert all(lv.shape == (4, 8) for lv in logvars)


def test_eval_mode_is_deterministic_and_mu():
    """Eval mode returns mu (no sampling) — jamie/model.py:233-234."""
    model, variables, xs, corr = _make_model()
    out1 = model.apply(variables, xs, corr, train=False)
    out2 = model.apply(variables, xs, corr, train=False)
    np.testing.assert_array_equal(out1[0][0], out2[0][0])
    np.testing.assert_array_equal(out1[0][0], out1[3][0])  # z == mu


def test_train_mode_samples():
    model, variables, xs, corr = _make_model()
    k1, k2 = jax.random.split(jax.random.PRNGKey(1))
    out1, _ = model.apply(variables, xs, corr, train=True,
                          rngs={'dropout': k1, 'reparam': k1},
                          mutable=['batch_stats'])
    out2, _ = model.apply(variables, xs, corr, train=True,
                          rngs={'dropout': k2, 'reparam': k2},
                          mutable=['batch_stats'])
    assert not np.allclose(out1[0][0], out2[0][0])
    # z != mu in train mode
    assert not np.allclose(out1[0][0], out1[3][0])


def test_combine_identity_corr():
    """With corr=I, combined = (s0*z0 + s1*z1)/(s0+s1) rowwise."""
    z0 = jnp.asarray(np.random.RandomState(0).randn(5, 3), jnp.float32)
    z1 = jnp.asarray(np.random.RandomState(1).randn(5, 3), jnp.float32)
    sigma = jnp.asarray([2.0, 3.0])
    out = combine_latents([z0, z1], jnp.eye(5), sigma)
    expected0 = (2 * z0 + 3 * z1) / 5
    expected1 = (3 * z1 + 2 * z0) / 5
    np.testing.assert_allclose(out[0], expected0, rtol=1e-5)
    np.testing.assert_allclose(out[1], expected1, rtol=1e-5)


def test_combine_zero_corr_passthrough():
    """With corr=0, combined[i] = z[i] (denominator reduces to sigma[i])."""
    z0 = jnp.asarray(np.random.RandomState(0).randn(4, 3), jnp.float32)
    z1 = jnp.asarray(np.random.RandomState(1).randn(6, 3), jnp.float32)
    sigma = jnp.asarray([0.7, 1.3])
    out = combine_latents([z0, z1], jnp.zeros((4, 6)), sigma)
    np.testing.assert_allclose(out[0], z0, rtol=1e-5)
    np.testing.assert_allclose(out[1], z1, rtol=1e-5)


def test_default_dropout_rule():
    """dropout None -> 0.6 iff max(input_dim) > 64 (jamie/model.py:144-145)."""
    assert CoupledVAE((128, 10), 8)._dropout_rate() == 0.6
    assert CoupledVAE((64, 10), 8)._dropout_rate() == 0.0
    assert CoupledVAE((64, 10), 8, dropout=0.3)._dropout_rate() == 0.3


def test_torch_init_bounds():
    """Linear init ~ U(-1/sqrt(fan_in), 1/sqrt(fan_in)) like torch."""
    model, variables, _, _ = _make_model(dims=(100, 50))
    k = variables['params']['enc0_b0']['TorchDense_0']['kernel']
    bound = 1.0 / np.sqrt(100)
    assert np.abs(k).max() <= bound + 1e-6
    assert np.abs(k).max() > 0.5 * bound  # actually spread out
    assert k.shape == (100, 200)


def test_impute_shapes_and_determinism():
    model, variables, xs, _ = _make_model()
    out = model.apply(variables, xs[0], 0, 1, train=False,
                      method=CoupledVAE.impute)
    assert out.shape == (4, 12)
    out2 = model.apply(variables, xs[0], 0, 1, train=False,
                       method=CoupledVAE.impute)
    np.testing.assert_array_equal(out, out2)


def test_embed_one():
    model, variables, xs, _ = _make_model()
    mu = model.apply(variables, xs[0], 0, train=False,
                     method=CoupledVAE.embed_one)
    assert mu.shape == (4, 8)


def test_batchnorm_updates_running_stats():
    model, variables, xs, corr = _make_model()
    k = jax.random.PRNGKey(3)
    _, mutated = model.apply(variables, xs, corr, train=True,
                             rngs={'dropout': k, 'reparam': k},
                             mutable=['batch_stats'])
    before = jax.tree_util.tree_leaves(variables['batch_stats'])
    after = jax.tree_util.tree_leaves(mutated['batch_stats'])
    assert any(not np.allclose(b, a) for b, a in zip(before, after))


def test_matmul_bf16_close_to_f32():
    """matmul_bf16 perturbs only the matmul rounding; outputs stay close to
    the f32 model with identical params."""
    import jax
    import jax.numpy as jnp

    from jamie_tpu.models import CoupledVAE

    rng = np.random.RandomState(0)
    xs = [jnp.asarray(rng.randn(16, 20), jnp.float32),
          jnp.asarray(rng.randn(16, 12), jnp.float32)]
    corr = jnp.eye(16, dtype=jnp.float32)
    key = jax.random.PRNGKey(0)
    m32 = CoupledVAE((20, 12), 8, dropout=0.0)
    mbf = CoupledVAE((20, 12), 8, dropout=0.0, matmul_bf16=True)
    variables = m32.init({'params': key, 'dropout': key, 'reparam': key},
                         xs, corr, train=True)
    out32 = m32.apply(variables, xs, corr, train=False)
    outbf = mbf.apply(variables, xs, corr, train=False)
    for a, b in zip(out32[0], outbf[0]):   # latents
        assert np.asarray(a).dtype == np.float32
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=0.05, rtol=0.05)
