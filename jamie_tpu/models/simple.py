"""Small non-variational coupled autoencoder.

Reference parity: `SimpleJAMIEModel` (jamie/utilities.py:681-718) — one
Linear+BatchNorm encoder and decoder per modality, latents mixed by the
(unweighted) correspondence average.
"""

from __future__ import annotations

from typing import Any, Tuple

import flax.linen as nn
import jax.numpy as jnp

from .coupled_vae import TorchDense


class SimpleCoupledAE(nn.Module):
    input_dim: Tuple[int, ...]
    output_dim: int
    param_dtype: Any = jnp.float32
    compute_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, xs, corr, train: bool = False):
        n = len(self.input_dim)
        assert n == 2 and corr is not None, '`corr` must be provided.'
        embedded = []
        for i in range(n):
            h = TorchDense(self.output_dim, self.param_dtype,
                           self.compute_dtype, name=f'enc{i}')(xs[i])
            h = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             epsilon=1e-5, dtype=self.compute_dtype,
                             param_dtype=self.param_dtype, name=f'enc{i}_bn')(h)
            embedded.append(h)
        combined = [
            (embedded[0] + corr @ embedded[1])
            / (1.0 + jnp.sum(corr, axis=1)[:, None]),
            (embedded[1] + corr.T @ embedded[0])
            / (1.0 + jnp.sum(corr, axis=0)[:, None]),
        ]
        reconstructed = []
        for i in range(n):
            h = TorchDense(self.input_dim[i], self.param_dtype,
                           self.compute_dtype, name=f'dec{i}')(combined[i])
            h = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             epsilon=1e-5, dtype=self.compute_dtype,
                             param_dtype=self.param_dtype, name=f'dec{i}_bn')(h)
            reconstructed.append(h)
        return embedded, reconstructed


# Reference name (jamie/utilities.py:681): same fields, flax module instead
# of a torch one — construct with the same (input_dim, output_dim) args.
SimpleJAMIEModel = SimpleCoupledAE
