"""Coupled variational autoencoder — the JAMIE model.

Behavioral parity with the reference `edModelVar` (jamie/model.py:116-282):

- per-modality encoder MLP `in -> 2*in -> in`, each block
  Linear + BatchNorm1d + LeakyReLU + Dropout (jamie/model.py:147-171)
- per-modality `fc_mus` / `fc_vars` heads `in -> out` (jamie/model.py:178-186)
- reparameterized sampling `Normal(mu, std + 1e-7).rsample()` in train mode,
  `mu` passthrough in eval mode (jamie/model.py:225-243)
- latent aggregation `combine()` mixing own latent with the
  correspondence-weighted other-modality latent, weighted by a trainable
  2-vector `sigma` (jamie/model.py:245-259)
- per-modality decoder MLP `out -> in -> 2*in -> in` (final layer linear,
  jamie/model.py:188-216)
- `impute()` = encode(from) -> refactor -> decode(to) (jamie/model.py:277-282)
- default dropout 0.6 if `max(input_dim) > 64` else 0 (jamie/model.py:144-145)

TPU-first design notes: all modalities run in one traced graph (XLA fuses the
elementwise BatchNorm/LeakyReLU/Dropout chains into the preceding matmuls);
parameters are float32 with configurable compute dtype; initialization mirrors
torch's kaiming-uniform(a=sqrt(5)) Linear default so training dynamics match.
"""

from __future__ import annotations

import math
from typing import Any, List, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


def _torch_linear_kernel_init(key, shape, dtype=jnp.float32):
    # torch.nn.Linear default: kaiming_uniform(a=sqrt(5)) ==
    # U(-1/sqrt(fan_in), 1/sqrt(fan_in)); flax kernels are (fan_in, fan_out)
    fan_in = shape[0]
    bound = 1.0 / math.sqrt(fan_in) if fan_in > 0 else 0.0
    return jax.random.uniform(key, shape, dtype, -bound, bound)


class TorchDense(nn.Module):
    """Dense layer with torch.nn.Linear's default init (incl. bias).

    matmul_bf16: run ONLY the matmul in bf16 with f32 accumulation (the
    MXU-native mode); activations, bias add, and everything downstream
    stay in compute_dtype. A much smaller quality perturbation than
    compute_dtype='bfloat16', at the same MXU rate."""
    features: int
    param_dtype: Any = jnp.float32
    compute_dtype: Any = jnp.float32
    matmul_bf16: bool = False

    @nn.compact
    def __call__(self, x):
        fan_in = x.shape[-1]
        kernel = self.param(
            'kernel', _torch_linear_kernel_init, (fan_in, self.features),
            self.param_dtype)
        bound = 1.0 / math.sqrt(fan_in) if fan_in > 0 else 0.0
        bias = self.param(
            'bias',
            lambda k, s, d: jax.random.uniform(k, s, d, -bound, bound),
            (self.features,), self.param_dtype)
        x = x.astype(self.compute_dtype)
        if self.matmul_bf16:
            y = jnp.matmul(x.astype(jnp.bfloat16),
                           kernel.astype(jnp.bfloat16),
                           preferred_element_type=jnp.float32
                           ).astype(self.compute_dtype)
        else:
            y = x @ kernel.astype(self.compute_dtype)
        return y + bias.astype(self.compute_dtype)


class _Block(nn.Module):
    """Linear + BatchNorm + LeakyReLU + Dropout (one reference MLP block)."""
    features: int
    dropout: float
    param_dtype: Any = jnp.float32
    compute_dtype: Any = jnp.float32
    matmul_bf16: bool = False

    @nn.compact
    def __call__(self, x, train: bool):
        x = TorchDense(self.features, self.param_dtype, self.compute_dtype,
                       self.matmul_bf16)(x)
        # torch BatchNorm1d defaults: eps=1e-5, momentum=0.1 (flax: 0.9)
        x = nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=self.compute_dtype, param_dtype=self.param_dtype)(x)
        x = nn.leaky_relu(x, negative_slope=0.01)
        x = nn.Dropout(rate=self.dropout, deterministic=not train)(x)
        return x


def combine_latents(zs: Sequence[jnp.ndarray], corr: jnp.ndarray,
                    sigma: jnp.ndarray) -> List[jnp.ndarray]:
    """Sigma-weighted latent aggregation (jamie/model.py:245-259).

    combined[i] = (sigma[i]*z[i] + sigma[j] * M_i @ z[j])
                / (sigma[i] + sigma[j] * corr.sum(other_axis)[:, None])
    with M_0 = corr, M_1 = corr.T.
    """
    z0, z1 = zs
    s0, s1 = sigma[0], sigma[1]
    dtype = z0.dtype
    corr = corr.astype(dtype)
    num0 = s0 * z0 + s1 * (corr @ z1)
    den0 = s0 + s1 * jnp.sum(corr, axis=1)[:, None]
    num1 = s1 * z1 + s0 * (corr.T @ z0)
    den1 = s1 + s0 * jnp.sum(corr, axis=0)[:, None]
    return [num0 / den0, num1 / den1]


class CoupledVAE(nn.Module):
    """Two coupled per-modality VAEs with correspondence-mixed latents.

    Call signature mirrors the reference forward (jamie/model.py:264-275):
    returns (zs, combined, reconstructed, mus, logvars).
    """
    input_dim: Tuple[int, ...]
    output_dim: int
    dropout: Optional[float] = None
    param_dtype: Any = jnp.float32
    compute_dtype: Any = jnp.float32
    matmul_bf16: bool = False

    @property
    def num_modalities(self) -> int:
        return len(self.input_dim)

    def _dropout_rate(self) -> float:
        if self.dropout is not None:
            return self.dropout
        return 0.6 if max(self.input_dim) > 64 else 0.0

    def setup(self):
        p = self._dropout_rate()
        pd, cd, mb = self.param_dtype, self.compute_dtype, self.matmul_bf16
        n = self.num_modalities

        self.encoder_blocks = [
            [_Block(2 * self.input_dim[i], p, pd, cd, mb, name=f'enc{i}_b0'),
             _Block(self.input_dim[i], p, pd, cd, mb, name=f'enc{i}_b1')]
            for i in range(n)
        ]
        self.fc_mus = [TorchDense(self.output_dim, pd, cd, mb,
                                  name=f'fc_mu{i}')
                       for i in range(n)]
        self.fc_vars = [TorchDense(self.output_dim, pd, cd, mb,
                                   name=f'fc_var{i}')
                        for i in range(n)]
        self.decoder_blocks = [
            [_Block(self.input_dim[i], p, pd, cd, mb, name=f'dec{i}_b0'),
             _Block(2 * self.input_dim[i], p, pd, cd, mb, name=f'dec{i}_b1'),
             TorchDense(self.input_dim[i], pd, cd, mb, name=f'dec{i}_out')]
            for i in range(n)
        ]
        # Trainable modality-mixing weights, init U[0,1) (jamie/model.py:220)
        self.sigma = self.param(
            'sigma', lambda k, s: jax.random.uniform(k, s, self.param_dtype), (n,))

    # --- pieces -----------------------------------------------------------
    def encode_one(self, x, i: int, train: bool):
        h = x.astype(self.compute_dtype)
        for block in self.encoder_blocks[i]:
            h = block(h, train)
        return h

    def encode(self, xs, train: bool):
        return [self.encode_one(xs[i], i, train) for i in range(self.num_modalities)]

    def refactor_one(self, h, i: int, train: bool):
        mu = self.fc_mus[i](h)
        logvar = self.fc_vars[i](h)
        if train:
            # std + 1e-7 rounding protection (jamie/model.py:236-239)
            std = jnp.exp(logvar / 2) + 1e-7
            eps = jax.random.normal(self.make_rng('reparam'), mu.shape, mu.dtype)
            z = mu + std * eps
        else:
            z = mu
        return z, mu, logvar

    def refactor(self, hs, train: bool, index=None):
        if index is None:
            index = range(self.num_modalities)
        zs, mus, logvars = [], [], []
        for h, i in zip(hs, index):
            z, mu, logvar = self.refactor_one(h, i, train)
            zs.append(z); mus.append(mu); logvars.append(logvar)
        return zs, mus, logvars

    def decode_one(self, z, i: int, train: bool):
        h = z.astype(self.compute_dtype)
        for block in self.decoder_blocks[i][:-1]:
            h = block(h, train)
        return self.decoder_blocks[i][-1](h)

    def decode(self, zs, train: bool):
        return [self.decode_one(zs[i], i, train) for i in range(self.num_modalities)]

    # --- reference API ----------------------------------------------------
    def __call__(self, xs, corr, train: bool = False):
        zs, mus, logvars = self.refactor(self.encode(xs, train), train)
        combined = combine_latents(zs, corr, self.sigma)
        x_hat = self.decode(combined, train)
        return zs, combined, x_hat, mus, logvars

    def impute(self, x, from_mod: int, to_mod: int, train: bool = False):
        """Cross-modal imputation: encode `from_mod`, decode `to_mod`
        (jamie/model.py:277-282). No combine step, mirrors the reference."""
        h = self.encode_one(x, from_mod, train)
        z, _, _ = self.refactor_one(h, from_mod, train)
        return self.decode_one(z, to_mod, train)

    def embed_one(self, x, i: int, train: bool = False):
        """Single-modality latent (reference transform_one, jamie/jamie.py:831):
        fc_mus[i](encoders[i](x)) — the mean head, no sampling."""
        h = self.encode_one(x, i, train)
        _, mu, _ = self.refactor_one(h, i, train)
        return mu
