"""Device residency for large host matrices.

The wide-modality phases (pairwise distances, PCA) each stream the raw
cells x features matrix host->device in chunks. For scGLUE's 9190 x
241757 ATAC that is one f32 pass for the Gram distances plus two for the
randomized-PCA sketch — ~30 GB over the host link, which dominates the
fit at these shapes (RESULTS.md round 2: Mapping 906 s of a 1382 s
scGLUE fit). In bf16 the same matrix is 4.4 GB and fits v5e HBM whole,
and every consumer already does its matmuls in bf16 — so upload once,
keep it resident, and share it across the distance and PCA phases.

The cache is keyed by the host array's identity (weakref-validated) and
must be released before training claims HBM (estimator does this after
preprocessing).
"""

from __future__ import annotations

import weakref
from typing import Optional

import numpy as np

# Upload-whole budget: leave headroom on a 16 GB v5e for the N x N
# outputs and the training phase that follows.
DEFAULT_BUDGET_BYTES = 6 * 1024 ** 3

_cache: dict = {}   # id(arr) -> (weakref to arr, device bf16 array)


def device_bf16(arr, budget_bytes: Optional[int] = None):
    """The whole matrix as a device-resident bf16 array, or None when it
    would not fit the budget. Cached per host array so the distance and
    PCA phases share one upload."""
    import jax
    import jax.numpy as jnp

    if budget_bytes is None:
        budget_bytes = DEFAULT_BUDGET_BYTES  # resolved per call: patchable
    if not isinstance(arr, np.ndarray):
        return None
    if arr.size * 2 > budget_bytes:
        return None
    key = id(arr)
    hit = _cache.get(key)
    if hit is not None:
        ref, dev = hit
        if ref() is arr:
            return dev
        del _cache[key]
    try:
        ref = weakref.ref(arr)
    except TypeError:
        return None
    # Cast to bf16 on the HOST (ml_dtypes) so the link carries 2 bytes per
    # element — the transfer, not the cast, is the bottleneck. Row chunks
    # bound the staging buffers.
    import ml_dtypes
    n = arr.shape[0]
    rows = max(int((1 << 29) / max(arr.shape[1] * 2, 1)), 64)
    parts = [
        jnp.asarray(np.ascontiguousarray(arr[s:s + rows]).astype(
            ml_dtypes.bfloat16))
        for s in range(0, n, rows)
    ]
    dev = jnp.concatenate(parts, axis=0) if len(parts) > 1 else parts[0]
    dev = jax.block_until_ready(dev)
    _cache[key] = (ref, dev)
    return dev


def clear_residency_cache() -> None:
    """Drop every resident copy (call before the training phase claims
    HBM)."""
    _cache.clear()
