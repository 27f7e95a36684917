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
import jax.numpy as jnp
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


def axis_size(mesh: Optional[Mesh], axis: str) -> int:
    if mesh is None or axis not in mesh.shape:
        return 1
    return int(mesh.shape[axis])


def pad_rows_to_axis(x, n_dev: int):
    """Zero-pad the leading dim to a multiple of `n_dev`, returning
    (padded, pad). The canonical pad for every row-sharded placement:
    GSPMD sharding constraints silently REPLICATE on non-divisible dims
    (measured on jax 0.9 — no internal padding), so uneven N must be
    padded explicitly or per-chip memory scales as N, not N/devices.
    Accepts numpy or jax arrays and pads in kind."""
    if n_dev <= 1:
        return x, 0
    pad = (-x.shape[0]) % n_dev
    if pad:
        is_np = isinstance(x, np.ndarray)
        zeros = np.zeros if is_np else jnp.zeros
        cat = np.concatenate if is_np else jnp.concatenate
        x = cat([x, zeros((pad,) + x.shape[1:], x.dtype)], axis=0)
    return x, pad


def shard_rows(mesh: Mesh, x, axis: str = 'data'):
    """Place an array with its rows sharded over `axis`, zero-padding the
    leading dim to the axis size first (see pad_rows_to_axis). The result
    may be longer than the input; consumers gather by true-N index or
    slice the pad back off."""
    x, _ = pad_rows_to_axis(x, axis_size(mesh, axis))
    return jax.device_put(x, data_sharding(mesh, np.ndim(x), axis))


def model_axis_size(mesh: Optional[Mesh], axis: str = 'model') -> int:
    return axis_size(mesh, axis)


def param_spec(shape: Tuple[int, ...], n_model: int,
               wide_threshold: int = 1024) -> P:
    """Tensor-parallel PartitionSpec for one parameter by shape alone.

    The coupled VAE's memory is dominated by the encoder/decoder kernels of
    wide modalities (no-pca ATAC: F x 2F, SURVEY.md section 2.3 TP row).
    Rule: shard the LARGEST dim that is >= wide_threshold and divisible by
    the model-axis size; 1-D feature vectors (bias / batchnorm scale) shard
    when they qualify too, so the whole wide block lives sharded. Everything
    else replicates. GSPMD then propagates activation shardings and inserts
    the all-reduces between column- and row-parallel layers."""
    if n_model <= 1 or not shape:
        return P()
    dims = [(d, i) for i, d in enumerate(shape)
            if d >= wide_threshold and d % n_model == 0]
    if not dims:
        return P()
    _, best = max(dims)
    spec = [None] * len(shape)
    spec[best] = 'model'
    return P(*spec)


def shard_params_tree(tree, mesh: Mesh, wide_threshold: int = 1024,
                      axis: str = 'model'):
    """device_put every leaf of a param/optimizer pytree with its
    tensor-parallel sharding (replicated when the rule yields P())."""
    n_model = model_axis_size(mesh, axis)

    def place(x):
        if not hasattr(x, 'shape'):
            return x
        spec = param_spec(tuple(x.shape), n_model, wide_threshold)
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree.map(place, tree)
