"""Tiny NN baseline predictors for imputation comparisons.

Reference parity: jamie/utilities.py:279-474 — `SimpleModel`,
`SimpleDualModel`, `SimpleCommonDualModel`, `BABELMini`, `SingleModel`, and
the `predict_nn` trainer (AdamW, MSE, random minibatches). All rebuilt as
flax modules trained under one jitted step.
"""

from __future__ import annotations

import math
import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import optax

from .coupled_vae import TorchDense


class SimpleModel(nn.Module):
    """fc -> dropout -> fc (utilities.py:279-298)."""
    input_dim: int
    output_dim: int
    hidden_dim: int = 16
    p: float = 0.6

    @nn.compact
    def __call__(self, x, train: bool = True):
        h = TorchDense(self.hidden_dim, name='fc1')(x)
        h = nn.Dropout(self.p, deterministic=not train)(h)
        return TorchDense(self.output_dim, name='fc2')(h)


class SingleModel(nn.Module):
    """dropout -> fc (utilities.py:402-420)."""
    input_dim: int
    output_dim: int
    p: float = 0.6

    @nn.compact
    def __call__(self, x, train: bool = True):
        h = nn.Dropout(self.p, deterministic=not train)(x)
        return TorchDense(self.output_dim, name='fc1')(h)


class SimpleDualModel(nn.Module):
    """Dual AE with a conv bridge (utilities.py:301-333)."""
    input_dim: int
    output_dim: int
    hidden_dim: int = 10
    p: float = 0.6

    def setup(self):
        self.fc1_1 = TorchDense(self.hidden_dim)
        self.fc1_2 = TorchDense(self.input_dim)
        self.fc2_1 = TorchDense(self.hidden_dim)
        self.fc2_2 = TorchDense(self.output_dim)
        self.conv = TorchDense(self.hidden_dim)
        self.drop = nn.Dropout(self.p)

    def __call__(self, x0, x1, train: bool = True):
        e1 = self.fc1_1(x0)
        e2 = self.fc2_1(x1)
        r1 = self.fc1_2(self.drop(e1, deterministic=not train))
        r2 = self.fc2_2(self.drop(e2, deterministic=not train))
        return r1, r2, self.conv(e1), e2

    def last_forward(self, x0):
        return self.fc2_2(self.conv(self.fc1_1(x0)))

    @staticmethod
    def loss(logits, y0, y1):
        return (jnp.mean((logits[0] - y0) ** 2)
                + jnp.mean((logits[1] - y1) ** 2)
                + jnp.mean((logits[2] - jax.lax.stop_gradient(logits[3])) ** 2))


class SimpleCommonDualModel(nn.Module):
    """Dual AE with a shared latent MSE tie (utilities.py:336-366)."""
    input_dim: int
    output_dim: int
    hidden_dim: int = 10
    p: float = 0.6

    def setup(self):
        self.fc1_1 = TorchDense(self.hidden_dim)
        self.fc1_2 = TorchDense(self.input_dim)
        self.fc2_1 = TorchDense(self.hidden_dim)
        self.fc2_2 = TorchDense(self.output_dim)
        self.drop = nn.Dropout(self.p)

    def __call__(self, x0, x1, train: bool = True):
        e1 = self.fc1_1(x0)
        e2 = self.fc2_1(x1)
        r1 = self.fc1_2(self.drop(e1, deterministic=not train))
        r2 = self.fc2_2(self.drop(e2, deterministic=not train))
        return r1, r2, e1, e2

    def last_forward(self, x0):
        return self.fc2_2(self.fc1_1(x0))

    @staticmethod
    def loss(logits, y0, y1):
        return (jnp.mean((logits[0] - y0) ** 2)
                + jnp.mean((logits[1] - y1) ** 2)
                + jnp.mean((logits[2] - logits[3]) ** 2))


class BABELMini(nn.Module):
    """Cross-decoding dual AE based on BABEL (utilities.py:369-399)."""
    input_dim: int
    output_dim: int
    hidden_dim: int = 16

    @nn.compact
    def __call__(self, x0, x1, train: bool = True):
        e1 = TorchDense(self.hidden_dim, name='fc1_1')(x0)
        e2 = TorchDense(self.hidden_dim, name='fc2_1')(x1)
        dec1 = TorchDense(self.input_dim, name='fc1_2')
        dec2 = TorchDense(self.output_dim, name='fc2_2')
        return dec1(e1), dec2(e2), dec2(e1), dec1(e2)

    @staticmethod
    def loss(logits, y0, y1):
        return (jnp.mean((logits[0] - y0) ** 2)
                + jnp.mean((logits[1] - y1) ** 2)
                + jnp.mean((logits[2] - y1) ** 2)
                + jnp.mean((logits[3] - y0) ** 2))


def predict_nn(source, target, val=None, epochs=200, batch_size=32, seed=0):
    """Train SimpleCommonDualModel on (source, target); predict target from
    source (utilities.py:445-474). AdamW default lr, MSE, random batches."""
    source = np.asarray(source, np.float32)
    target = np.asarray(target, np.float32)
    model = SimpleCommonDualModel(source.shape[1], target.shape[1])
    key = jax.random.PRNGKey(seed)
    k_init, k_drop, k_run = jax.random.split(key, 3)
    params = model.init({'params': k_init, 'dropout': k_drop},
                        source[:2], target[:2], train=True)['params']
    tx = optax.adamw(1e-3)
    opt_state = tx.init(params)
    xs = jnp.asarray(source)
    ys = jnp.asarray(target)
    n = len(source)
    batches = max(int(n / batch_size), 1)

    @jax.jit
    def step(params, opt_state, key):
        k_idx, k_drop = jax.random.split(key)
        idx = jax.random.choice(k_idx, n, (min(batch_size, n),), replace=False)
        xb, yb = xs[idx], ys[idx]

        def loss_fn(p):
            logits = model.apply({'params': p}, xb, yb, train=True,
                                 rngs={'dropout': k_drop})
            return SimpleCommonDualModel.loss(logits, xb, yb)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    loss = 0.0
    for epoch in range(epochs):
        prog = math.floor(25 * (epoch + 1) / epochs) * '|'
        for b in range(batches):
            k_run, k = jax.random.split(k_run)
            params, opt_state, loss = step(params, opt_state, k)
        print(f'{epoch + 1:>{len(str(epochs))}}/{epochs} [{prog:<25}]: '
              f'- Loss: {float(loss):.4f}', end='\r')
    print('\nDone!')

    inp = jnp.asarray(np.asarray(val, np.float32)) if val is not None else xs
    out = model.apply({'params': params}, inp,
                      method=SimpleCommonDualModel.last_forward)
    return np.asarray(out)
