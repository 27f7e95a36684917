"""Dataset IO helpers.

The reference loads data ad hoc in notebooks (np.loadtxt / pd.read_csv /
anndata, e.g. scGEM.ipynb cell 3, scMNC-Visual.ipynb cell 3). Here the same
formats load through one helper with optional-dependency gating, plus
memory-mapped .npy support so atlas-scale matrices stream from disk without
a resident copy.
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np


def load_matrix(path: str, transpose: bool = False, mmap: bool = False,
                dtype=np.float32) -> np.ndarray:
    """Load a cells x features matrix from .txt/.csv/.npy/.npz/.h5ad/.mtx."""
    ext = os.path.splitext(path)[1].lower()
    if ext == '.npy':
        out = np.load(path, mmap_mode='r' if mmap else None)
    elif ext == '.npz':
        with np.load(path) as z:
            out = z[z.files[0]]
    elif ext in ('.txt', '.tsv'):
        out = np.loadtxt(path)
    elif ext == '.csv':
        import pandas as pd
        df = pd.read_csv(path, index_col=0)
        out = df.to_numpy()
    elif ext == '.h5ad':
        try:
            import anndata as ad
        except ImportError as e:
            raise ImportError(
                f'loading {path} requires the anndata extra') from e
        adata = ad.read_h5ad(path)
        out = adata.X
        if hasattr(out, 'toarray'):
            out = out.toarray()
    elif ext == '.mtx':
        from scipy.io import mmread
        out = mmread(path).toarray()
    else:
        raise ValueError(f'unsupported matrix format: {ext}')
    if transpose:
        out = out.T
    if mmap and isinstance(out, np.memmap):
        # Casting would materialize the whole matrix in RAM, defeating the
        # point of mmap — return the stored dtype and say so rather than
        # silently ignoring the requested one.
        if dtype is not None and out.dtype != np.dtype(dtype):
            import warnings
            warnings.warn(
                f'load_matrix(mmap=True): returning stored dtype '
                f'{out.dtype} (casting to {np.dtype(dtype)} would load the '
                'matrix into RAM); pass dtype=None to silence.', UserWarning)
        return out
    return np.asarray(out).astype(dtype, copy=False)


def load_labels(path: str, column: Optional[str] = None) -> np.ndarray:
    """Load a per-cell label vector from .txt/.csv."""
    ext = os.path.splitext(path)[1].lower()
    if ext in ('.txt', '.tsv'):
        try:
            return np.loadtxt(path)
        except ValueError:
            return np.loadtxt(path, dtype=str)
    if ext == '.csv':
        import pandas as pd
        df = pd.read_csv(path)
        col = column if column is not None else df.columns[-1]
        return df[col].to_numpy()
    raise ValueError(f'unsupported label format: {ext}')
