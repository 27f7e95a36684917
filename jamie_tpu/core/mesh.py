"""Device mesh and sharding helpers.

The reference is single-process CPU torch with no parallelism whatsoever
(SURVEY.md section 2.3). Here scale-out is first-class: a named
`jax.sharding.Mesh` with a `data` axis (batch/cell sharding) and an optional
`model` axis (feature sharding for very wide modalities, e.g. 240k-feature
ATAC). All collectives ride XLA/ICI implicitly through shardings under jit.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def create_mesh(
    shape: Optional[Tuple[int, ...]] = None,
    axis_names: Tuple[str, ...] = ('data',),
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Create a device mesh.

    shape=None puts every visible device on the first axis. A 1-sized mesh on
    a single chip is valid and makes all shardings no-ops, so the same code
    path runs from 1 chip to a full pod.
    """
    if devices is None:
        devices = jax.devices()
    if shape is None:
        shape = (len(devices),) + (1,) * (len(axis_names) - 1)
    n = int(np.prod(shape))
    if n > len(devices):
        raise ValueError(f'mesh shape {shape} needs {n} devices, have {len(devices)}')
    dev_array = np.asarray(devices[:n]).reshape(shape)
    return Mesh(dev_array, axis_names)


def data_sharding(mesh: Mesh, ndim: int = 2, axis: str = 'data') -> NamedSharding:
    """Shard the leading (cell/batch) dimension over the data axis."""
    spec = [None] * ndim
    spec[0] = axis
    return NamedSharding(mesh, P(*spec))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_rows(mesh: Mesh, x, axis: str = 'data'):
    """Place an array with its rows sharded over `axis`, padding not required
    (XLA handles uneven shards for jnp ops; for pallas paths pad upstream)."""
    return jax.device_put(x, data_sharding(mesh, np.ndim(x), axis))
