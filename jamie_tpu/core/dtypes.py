"""Dtype policy: f32 parameters, configurable compute dtype.

TPU MXU prefers bfloat16 inputs with float32 accumulation. The reference is
all-float32 torch (jamie/jamie.py:333 `.float()`); we keep float32 as the
default for numerical parity and expose bfloat16 compute as a policy knob.
"""

from __future__ import annotations

import jax.numpy as jnp

_DTYPES = {
    'float32': jnp.float32,
    'bfloat16': jnp.bfloat16,
    'float16': jnp.float16,
    'float64': jnp.float64,
}


def resolve_dtype(name):
    if isinstance(name, str):
        return _DTYPES[name]
    return name
