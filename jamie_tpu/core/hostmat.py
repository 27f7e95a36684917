"""Host-matrix helpers: uniform handling of dense and scipy-sparse inputs.

Atlas-scale single-cell matrices arrive sparse (io.read_h5ad(dense=False)
returns CSR; 10x matrices are born sparse) — densifying a 100k x 200k
matrix on host costs 80 GB before the pipeline even starts. The reference
densifies at load (scGLUE.ipynb cell 3 `.todense()`); here every streaming
device path (bf16 residency build, feature-chunked Gram, streamed PCA,
landmark selection) densifies only the row/column block it is about to
upload, so sparse inputs flow through `fit_transform` with peak host
memory O(block), not O(N F).

Conventions: row-streamed consumers want CSR (`ensure_row_major` — the
estimator normalizes inputs once), column-streamed consumers convert to
CSC themselves (`ensure_col_major`) so the O(nnz) transpose-copy happens
once, not per chunk.
"""

from __future__ import annotations

import numpy as np


def is_scipy_sparse(x) -> bool:
    """scipy.sparse matrix/array check without importing scipy."""
    return type(x).__module__.startswith('scipy.sparse')


def ensure_row_major(x):
    """CSR (cheap row slicing) for anything sparse; dense passes through."""
    if is_scipy_sparse(x) and x.format != 'csr':
        return x.tocsr()
    return x


def ensure_col_major(x):
    """CSC (cheap column slicing) for anything sparse; dense passes through.
    Column-streaming a CSR costs a full O(nnz) scan PER chunk — convert
    once before the chunk loop."""
    if is_scipy_sparse(x) and x.format != 'csc':
        return x.tocsc()
    return x


def densify(x, dtype=np.float32) -> np.ndarray:
    """Whole matrix as a C-contiguous dense ndarray."""
    if is_scipy_sparse(x):
        out = x.toarray()
        return out if dtype is None else np.ascontiguousarray(out, dtype)
    return np.ascontiguousarray(x, dtype=dtype)


def dense_rows(x, start: int, stop: int, dtype=np.float32) -> np.ndarray:
    """Rows [start:stop) as a C-contiguous dense f32 block."""
    return densify(x[start:stop], dtype)


def dense_cols(x, start: int, stop: int, dtype=np.float32) -> np.ndarray:
    """Columns [start:stop) as a C-contiguous dense f32 block (pass CSC for
    sparse inputs — see ensure_col_major)."""
    return densify(x[:, start:stop], dtype)


def as_f32_ndarray(x):
    """float32 host array that PRESERVES ndarray identity when x already is
    one (np.memmap included — it keeps .filename, the on-disk encode-cache
    key). np.asarray(memmap) returns a fresh base-class view per call:
    .filename is lost AND id() is unstable, so the id-keyed residency cache
    re-uploads the same matrix once per phase (caught in round 4: the warm
    scGLUE leg shipped 1,651.8 MB — exactly two full resident builds)."""
    if isinstance(x, np.ndarray) and x.dtype == np.float32:
        return x
    return np.asarray(x, np.float32)
