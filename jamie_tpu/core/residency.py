"""Device residency for large host matrices.

The wide-modality phases (pairwise distances, PCA) each stream the raw
cells x features matrix host->device in chunks. For scGLUE's 9190 x
241757 ATAC that is one f32 pass for the Gram distances plus two for the
randomized-PCA sketch — ~30 GB over the host link, which dominates the
fit at these shapes (RESULTS.md round 2: Mapping 906 s of a 1382 s
scGLUE fit). In bf16 the same matrix is 4.4 GB and fits v5e HBM whole,
and every consumer already does its matmuls in bf16 — so upload once,
keep it resident, and share it across the distance and PCA phases.

The cache is keyed by the host array's identity (weakref-validated, with
a collection callback so a dead host array releases its device copy
immediately rather than waiting for an id-collision lookup) and must be
released before training claims HBM (estimator does this after
preprocessing).

Contract: the host array must not be mutated in place while resident —
identity caching cannot see content changes, so a mutated array would
silently serve stale distances/PCA. Both in-tree consumers (distances,
preprocess) treat their inputs as read-only.
"""

from __future__ import annotations

import warnings
import weakref
from functools import partial
from typing import Optional

import numpy as np

# Upload-whole budget: leave headroom on a 16 GB v5e for the N x N
# outputs and the training phase that follows.
DEFAULT_BUDGET_BYTES = 6 * 1024 ** 3

_cache: dict = {}   # id(arr) -> (weakref to arr, device bf16 array)


def host_bf16(arr: np.ndarray) -> np.ndarray:
    """Fast host f32 -> bf16 cast (round-to-nearest-even, bit-exact with
    ml_dtypes). ml_dtypes' astype is a generic scalar loop (~0.1 GB/s
    measured — 132 s for scGLUE's 17.8 GB ATAC); torch's vectorized
    multithreaded cast runs ~10x faster and the uint16 views bridge it back
    to an ml_dtypes.bfloat16 numpy array without a copy."""
    import ml_dtypes
    arr = np.ascontiguousarray(arr, dtype=np.float32)
    try:
        import torch
        with warnings.catch_warnings():
            # reading a non-writable (e.g. memmap-backed) array through
            # torch is safe; from_numpy warns about writes we never do
            warnings.simplefilter('ignore', UserWarning)
            out = (torch.from_numpy(arr).to(torch.bfloat16)
                   .view(torch.uint16).numpy().view(ml_dtypes.bfloat16))
        return out.reshape(arr.shape)
    except ImportError:
        return arr.astype(ml_dtypes.bfloat16)


_insert_rows_jit = None


def _insert_rows(resident, xb, start):
    # One module-cached jitted executable (a fresh closure per call would
    # miss the jit cache and re-trace on every row chunk of the build);
    # created lazily so importing this module never imports jax.
    global _insert_rows_jit
    if _insert_rows_jit is None:
        import jax

        @partial(jax.jit, donate_argnums=(0,))
        def _ins(resident, xb, start):
            return jax.lax.dynamic_update_slice(resident, xb, (start, 0))
        _insert_rows_jit = _ins
    return _insert_rows_jit(resident, xb, start)


def build_resident_bf16(arr, chunk_bytes: int = 256 << 20):
    """Upload a big host f32 matrix as one device-resident bf16 array.

    Row-contiguous chunks: sequential reads (a column-strided pass over a
    row-major memmap measured 79 MB/s vs GB/s sequential), torch-vectorized
    host cast, async H2D dispatch, and a donated dynamic_update_slice into
    the preallocated resident matrix — so the link transfer of chunk k
    overlaps the read+cast of chunk k+1 and no jnp.concatenate transient
    ever doubles the footprint (at scGLUE scale that second 4.4 GB copy,
    stacked on both modalities' arrays, crashed the worker).

    scipy-sparse inputs (CSR preferred) densify per row chunk — the dense
    matrix never exists on host."""
    import jax
    import jax.numpy as jnp
    import ml_dtypes

    from .hostmat import dense_rows

    n, f = arr.shape
    rows = max(int(chunk_bytes / max(f * 2, 1)), 64)
    resident = jnp.zeros((n, f), ml_dtypes.bfloat16)
    for s in range(0, n, rows):
        xb = jnp.asarray(host_bf16(dense_rows(arr, s, s + rows)))
        resident = _insert_rows(resident, xb, jnp.asarray(s, jnp.int32))
    return jax.block_until_ready(resident)


def device_bf16(arr, budget_bytes: Optional[int] = None):
    """The whole matrix as a device-resident bf16 array, or None when it
    would not fit the budget. Cached per host array so the distance and
    PCA phases share one upload."""
    from .hostmat import is_scipy_sparse
    if budget_bytes is None:
        budget_bytes = DEFAULT_BUDGET_BYTES  # resolved per call: patchable
    if not (isinstance(arr, np.ndarray) or is_scipy_sparse(arr)):
        return None
    # The resident copy is DENSE bf16 either way, so the budget is the
    # dense element count (sparse .size would count nnz, not footprint).
    if int(arr.shape[0]) * int(arr.shape[1]) * 2 > budget_bytes:
        return None
    key = id(arr)
    hit = _cache.get(key)
    if hit is not None:
        ref, dev = hit
        if ref() is arr:
            return dev
        del _cache[key]
    try:
        # The callback evicts the entry (dropping the multi-GB device copy)
        # the moment the host array is garbage-collected; without it a dead
        # entry leaked HBM until an id-collision lookup happened to hit it.
        ref = weakref.ref(arr, lambda _r, _key=key: _cache.pop(_key, None))
    except TypeError:
        return None
    # Cast to bf16 on the HOST so the link carries 2 bytes per element —
    # the transfer, not the cast, is the bottleneck (see host_bf16).
    dev = build_resident_bf16(arr)
    _cache[key] = (ref, dev)
    return dev


def clear_residency_cache() -> None:
    """Drop every resident copy (call before the training phase claims
    HBM)."""
    _cache.clear()
