"""Checkpointing: params + batch stats + preprocessing as plain arrays.

Reference parity: `save_model` / `load_model` (jamie/jamie.py:967-972) pickle
the whole torch module including preprocessing closures. Here a checkpoint is
a single .npz of flattened arrays plus a JSON header — no pickled code, fully
portable, and (unlike the reference) round-trips through `np.load` on any
machine. The estimator also exposes orbax-style fit resume because the full
TrainState (incl. optimizer state) can be saved, which the reference cannot do.
"""

from __future__ import annotations

import io
import json
from typing import Any, Dict, Optional, Tuple

import numpy as np
from flax import traverse_util


def _flatten(tree: Any, prefix: str) -> Dict[str, np.ndarray]:
    if tree is None or tree == {}:
        return {}
    flat = traverse_util.flatten_dict(tree, sep='/')
    return {f'{prefix}/{k}': np.asarray(v) for k, v in flat.items()}


def _unflatten(arrays: Dict[str, np.ndarray], prefix: str) -> Dict:
    sub = {k[len(prefix) + 1:]: v for k, v in arrays.items()
           if k.startswith(prefix + '/')}
    if not sub:
        return {}
    return traverse_util.unflatten_dict(sub, sep='/')


def save_checkpoint(
    path: str,
    params: Any,
    batch_stats: Any,
    preprocessors: Tuple,
    header: Dict[str, Any],
    opt_state_arrays: Optional[Dict[str, np.ndarray]] = None,
) -> None:
    arrays: Dict[str, np.ndarray] = {}
    arrays.update(_flatten(params, 'params'))
    arrays.update(_flatten(batch_stats, 'batch_stats'))
    for i, pre in enumerate(preprocessors):
        for k, v in pre.to_dict().items():
            arrays[f'pre{i}/{k}'] = np.asarray(v)
    if opt_state_arrays:
        arrays.update(opt_state_arrays)
    arrays['__header__'] = np.frombuffer(
        json.dumps(header).encode(), dtype=np.uint8)
    with open(path, 'wb') as f:
        np.savez(f, **arrays)


def load_checkpoint(path: str):
    from .preprocess import Preprocessor
    with np.load(path, allow_pickle=False) as z:
        arrays = {k: z[k] for k in z.files}
    header = json.loads(bytes(arrays.pop('__header__').tolist()).decode())
    params = _unflatten(arrays, 'params')
    batch_stats = _unflatten(arrays, 'batch_stats')
    pres = []
    i = 0
    while any(k.startswith(f'pre{i}/') for k in arrays):
        d = {k[len(f'pre{i}/'):]: v for k, v in arrays.items()
             if k.startswith(f'pre{i}/')}
        pres.append(Preprocessor.from_dict(d))
        i += 1
    return params, batch_stats, tuple(pres), header
