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

import time
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


_insert_jits: dict = {}

# Package-wide continuous-data link policy pivot: below this many DENSE
# elements (n*f) a matrix's values ship exact f32; at or above, bf16
# (quality-neutral on real data — examples/bf16_threshold_ab.py). The
# distance/preprocess stream thresholds are the same number.
BF16_LINK_ELEMS = 100_000_000

# Link-transfer accounting for the resident builds (VERDICT round-3 item 3:
# report MB actually shipped so pool noise can't fake a Distance-phase win).
# bytes = what the link carried; bf16_equiv_bytes = what the round-3
# always-bf16 build would have carried for the same data; read_s = host
# time reading/densifying source chunks; encode_s = host time classifying
# + packing + casting them (splits a slow Distance phase into disk, CPU,
# and link components).
_transfer = {'bytes': 0, 'bf16_equiv_bytes': 0, 'read_s': 0.0,
             'encode_s': 0.0}


def transfer_stats() -> dict:
    return dict(_transfer)


def reset_transfer_stats() -> None:
    _transfer.update(bytes=0, bf16_equiv_bytes=0, read_s=0.0, encode_s=0.0)


def _get_insert_jits():
    # Module-cached jitted executables (a fresh closure per call would miss
    # the jit cache and re-trace on every row chunk of the build); created
    # lazily so importing this module never imports jax.
    if _insert_jits:
        return _insert_jits
    import jax
    import jax.numpy as jnp
    import ml_dtypes

    bf16 = ml_dtypes.bfloat16

    @partial(jax.jit, donate_argnums=(0,))
    def ins_bf16(resident, xb, start):
        return jax.lax.dynamic_update_slice(resident, xb, (start, 0))

    @partial(jax.jit, donate_argnums=(0,))
    def ins_u8(resident, xb, start):
        return jax.lax.dynamic_update_slice(
            resident, xb.astype(bf16), (start, 0))

    @partial(jax.jit, donate_argnums=(0,))
    def ins_bits(resident, packed, scale, start):
        # unpack big-endian bit order (np.packbits default): byte b yields
        # columns 8b..8b+7 from MSB down
        r, fb = packed.shape
        shifts = jnp.arange(7, -1, -1, dtype=jnp.uint8)
        bits = (packed[:, :, None] >> shifts) & jnp.uint8(1)
        xb = bits.reshape(r, fb * 8)[:, :resident.shape[1]].astype(bf16)
        xb = xb * scale.astype(bf16)
        return jax.lax.dynamic_update_slice(resident, xb, (start, 0))

    @partial(jax.jit, donate_argnums=(0,))
    def ins_bits2(resident, packed, lo, hi, start):
        # per-column two-valued data (z-scored binary: every reference
        # notebook z-scores its modalities, turning 0/1 ATAC peaks into
        # two values PER COLUMN): bit selects between the column's bf16
        # lo/hi, so the resident rows are bit-identical to what the plain
        # bf16 ship would have produced.
        r, fb = packed.shape
        shifts = jnp.arange(7, -1, -1, dtype=jnp.uint8)
        bits = (packed[:, :, None] >> shifts) & jnp.uint8(1)
        bits = bits.reshape(r, fb * 8)[:, :resident.shape[1]]
        xb = jnp.where(bits.astype(bool), hi[None, :], lo[None, :])
        return jax.lax.dynamic_update_slice(resident, xb, (start, 0))

    def _csr_flat(indptr, cols, r, f):
        # Flat scatter index with sorted+unique promises: rows from the
        # indptr are nondecreasing, cols are canonical-sorted within each
        # row (the encoder calls sort_indices), so flat = row*(f+1)+col is
        # strictly increasing over valid entries. TPU scatter with the
        # indices_are_sorted/unique_indices hints lowers to a vectorized
        # path; the generic 2D scatter-add serialized at atlas-scale nnz.
        # Pad entries (cols == f) are spread past r*(f+1) so the unique
        # promise holds for dropped entries too. r*(f+1) < 2^31 because
        # chunks are sized <= 1 GB of f32.
        rows = jnp.searchsorted(indptr, jnp.arange(cols.shape[0]),
                                side='right').astype(jnp.int32) - 1
        flat = rows * (f + 1) + cols
        return flat + jnp.where(
            cols == f, jnp.arange(cols.shape[0], dtype=jnp.int32), 0)

    @partial(jax.jit, donate_argnums=(0,))
    def ins_csr(resident, indptr, cols, vals, start):
        n, f = resident.shape
        r = indptr.shape[0] - 1
        flat = _csr_flat(indptr, cols, r, f)
        blk = jnp.zeros((r * (f + 1),), bf16)
        blk = blk.at[flat].set(vals.astype(bf16), mode='drop',
                               unique_indices=True, indices_are_sorted=True)
        return jax.lax.dynamic_update_slice(
            resident, blk.reshape(r, f + 1)[:, :f], (start, 0))

    @partial(jax.jit, donate_argnums=(0,))
    def ins_csr_const(resident, indptr, cols, scale, start):
        n, f = resident.shape
        r = indptr.shape[0] - 1
        flat = _csr_flat(indptr, cols, r, f)
        vals = jnp.full(cols.shape, 1, bf16) * scale.astype(bf16)
        blk = jnp.zeros((r * (f + 1),), bf16)
        blk = blk.at[flat].set(vals, mode='drop', unique_indices=True,
                               indices_are_sorted=True)
        return jax.lax.dynamic_update_slice(
            resident, blk.reshape(r, f + 1)[:, :f], (start, 0))

    _insert_jits.update(bf16=ins_bf16, u8=ins_u8, bits=ins_bits,
                        bits2=ins_bits2, csr=ins_csr,
                        csr_const=ins_csr_const)
    return _insert_jits


def _classify_dense_chunk(x: np.ndarray):
    """Cheapest exact link format for a dense f32 chunk: ('bits', c) for
    two-valued {0, c} data (1 bit/elem, 16x under bf16 — raw binarized
    ATAC), ('bits2', (lo, hi)) for per-column two-valued data (1 bit/elem
    + 4 bytes/col — what z-scoring binary columns produces, and every
    reference notebook z-scores its modalities before JAMIE), ('u8', None)
    for integers in [0, 255] (2x — counts), ('bf16', None) otherwise.
    Small samples reject continuous data before a full-chunk scan pays
    anything."""
    flat = x.ravel()
    sample = flat[:4096]
    nz = sample[sample != 0]
    c = float(nz[0]) if nz.size else 1.0
    if np.all((sample == 0) | (sample == c)):
        if np.all((flat == 0) | (flat == c)):
            return 'bits', c
    if x.shape[0] >= 8:
        head = x[:8]
        m8, M8 = head.min(axis=0), head.max(axis=0)
        if np.all((head == m8) | (head == M8)):
            lo, hi, eq_hi, ok = _aminmax_verify(x)
            if ok:
                return 'bits2', (lo, hi, eq_hi)
    if np.all((sample >= 0) & (sample <= 255)
              & (sample == np.rint(sample))):
        if np.all((flat >= 0) & (flat <= 255) & (flat == np.rint(flat))):
            return 'u8', None
    return 'bf16', None


def _aminmax_verify(x: np.ndarray):
    """(lo, hi, eq_hi, two_valued) for the bits2 encode in the fewest
    full passes the exactness contract allows: a fused per-column
    min+max, one hi-equality pass (reused by packbits), and one verify
    pass. torch's SIMD reductions measure well above numpy's on the
    single host core; numpy fallback is semantically identical."""
    try:
        import torch
        with warnings.catch_warnings():
            warnings.simplefilter('ignore', UserWarning)
            xt = torch.from_numpy(np.ascontiguousarray(x))
            lo_t, hi_t = torch.aminmax(xt, dim=0)
            eq_hi = xt == hi_t
            ok = bool(torch.logical_or(eq_hi, xt == lo_t).all())
        return lo_t.numpy(), hi_t.numpy(), eq_hi.numpy(), ok
    except ImportError:
        lo, hi = x.min(axis=0), x.max(axis=0)
        eq_hi = x == hi
        return lo, hi, eq_hi, bool(np.all(eq_hi | (x == lo)))


def _classify_vals(data: np.ndarray):
    """Same triage for a sparse chunk's nonzero values: ('const', c) |
    ('u8', None) | ('bf16', None)."""
    if data.size == 0:
        return 'const', 1.0
    c = float(data[0])
    sample = data[:4096]
    if np.all(sample == c) and np.all(data == c):
        return 'const', c
    if np.all((sample >= 0) & (sample <= 255)
              & (sample == np.rint(sample))) \
            and np.all((data >= 0) & (data <= 255)
                       & (data == np.rint(data))):
        return 'u8', None
    return 'bf16', None


def _nnz_bucket(nnz: int) -> int:
    """Round nnz up to a power of two (>=256) so the padded-CSR insert
    compiles O(log) variants, not one per chunk."""
    b = 256
    while b < nnz:
        b <<= 1
    return b


class _Backpressure:
    """Bound the host bytes pinned by in-flight async uploads.

    Every dispatch through the tunnel is async: nothing in a streamed
    chunk loop blocks, so the loop can enqueue EVERY chunk's transfer,
    each pinning its host buffer until the device consumes it. The 100k-
    cell atlas fit queued ~60 GB of dense f32 PCA chunks this way and was
    host-OOM-killed at 131 GB RSS (round 4). Registering each uploaded
    device operand here and blocking on the oldest once the window is
    full keeps a transfer in flight (overlap preserved) while bounding
    pinned memory to ~limit_bytes."""

    def __init__(self, limit_bytes: int = 1 << 30):
        from collections import deque
        self.limit = int(limit_bytes)
        self._q = deque()
        self._bytes = 0

    def add(self, *devs) -> None:
        import jax
        for d in devs:
            nb = int(np.prod(d.shape)) * d.dtype.itemsize
            self._q.append((d, nb))
            self._bytes += nb
        while self._bytes > self.limit and len(self._q) > 1:
            d, nb = self._q.popleft()
            jax.block_until_ready(d)
            self._bytes -= nb

    def drain(self) -> None:
        import jax
        while self._q:
            jax.block_until_ready(self._q.popleft()[0])
        self._bytes = 0


def _encode_dense_chunk(x, exact=False):
    """Host-side link encoding of a dense f32 chunk: (kind, payload numpy
    arrays, link_bytes). Pure function of the chunk's values — cacheable.

    exact=True ships continuous data as f32 instead of bf16 — the link
    policy for matrices under BF16_LINK_ELEMS dense elements (the 'bf16'
    kind's decoder is dtype-agnostic; bits/u8 formats are exact anyway)."""
    kind, scale = _classify_dense_chunk(x)
    if kind == 'bits':
        packed = np.packbits(x != 0, axis=1)
        return 'bits', (packed, np.float32(scale)), packed.nbytes
    if kind == 'bits2':
        lo, hi, eq_hi = scale
        packed = np.packbits(eq_hi, axis=1)
        lo_b, hi_b = host_bf16(lo), host_bf16(hi)
        return ('bits2', (packed, lo_b, hi_b),
                packed.nbytes + lo_b.nbytes + hi_b.nbytes)
    if kind == 'u8':
        xb = np.ascontiguousarray(x, np.uint8)
        return 'u8', (xb,), xb.nbytes
    xb = (np.ascontiguousarray(x, np.float32) if exact else host_bf16(x))
    return 'bf16', (xb,), xb.nbytes


def _ship_encoded(resident, kind, payload, link_bytes, s, jits, jnp,
                  bp=None):
    if kind == 'bits' and not payload[0].any():
        return resident   # all-zero chunk: resident is already zeros
    _transfer['bytes'] += link_bytes
    start = jnp.asarray(s, jnp.int32)
    devs = [jnp.asarray(p) for p in payload]
    if bp is not None:
        bp.add(*devs)
    return jits[kind](resident, *devs, start)


def _ship_dense_chunk(resident, x, s, jits, jnp, bp=None):
    t0 = time.perf_counter()
    kind, payload, link_bytes = _encode_dense_chunk(x)
    _transfer['encode_s'] += time.perf_counter() - t0
    return _ship_encoded(resident, kind, payload, link_bytes, s, jits, jnp,
                         bp)


def _encode_csr_chunk(chunk, f, exact=False):
    """Host-side link encoding of a scipy CSR row block: ('csr'|'csr_const',
    payload numpy arrays, link_bytes) — or None when a dense format would
    put fewer bytes on the link (the caller falls through).

    exact=True ships continuous values as f32 instead of bf16 (the
    below-threshold link policy; const/u8 values are exact either way)."""
    import ml_dtypes

    nnz = int(chunk.nnz)
    r = chunk.shape[0]
    if not chunk.has_canonical_format:
        # Duplicate (row, col) entries would be OVERWRITTEN by the decode
        # scatter (unique_indices=True) while the dense/densify path SUMS
        # them; sum_duplicates() merges (and sorts — the decode's
        # sorted-scatter relies on that too). In-place is safe here: every
        # caller passes a fresh scipy slice of the source matrix.
        chunk.sum_duplicates()
        nnz = int(chunk.nnz)
    vkind, c = _classify_vals(chunk.data)
    # uint16 column indices when the width (and the f drop-sentinel) fit —
    # halves the dominant payload for <=65k-feature modalities
    cdt = np.uint16 if f < 65535 else np.int32
    fdt_bytes = 4 if exact else 2
    val_bytes = {'const': 0, 'u8': 1, 'bf16': fdt_bytes}[vkind]
    csr_bytes = (np.dtype(cdt).itemsize * _nnz_bucket(nnz) + 4 * (r + 1)
                 + _nnz_bucket(nnz) * val_bytes)
    dense_bytes = (r * ((f + 7) // 8) if vkind == 'const'
                   else r * f if vkind == 'u8' else fdt_bytes * r * f)
    if csr_bytes >= dense_bytes:
        return None

    pad = _nnz_bucket(nnz)
    cols = np.full(pad, f, cdt)               # f = out-of-bounds -> dropped
    cols[:nnz] = chunk.indices
    indptr = np.asarray(chunk.indptr, np.int32)
    if vkind == 'const':
        return ('csr_const', (indptr, cols, np.float32(c)),
                cols.nbytes + indptr.nbytes)
    if vkind == 'u8':
        vals = np.zeros(pad, np.uint8)
        vals[:nnz] = chunk.data
    elif exact:
        vals = np.zeros(pad, np.float32)
        vals[:nnz] = chunk.data
    else:
        vals = np.zeros(pad, ml_dtypes.bfloat16)
        vals[:nnz] = host_bf16(np.asarray(chunk.data, np.float32))
    return ('csr', (indptr, cols, vals),
            cols.nbytes + indptr.nbytes + vals.nbytes)


# --------------------------------------------------------------------------
# Encode cache: file-backed sources (np.load(..., mmap_mode='r') memmaps)
# key their per-chunk link payloads on (realpath, mtime, size, shape,
# chunk_rows). A repeat resident build of the same file skips the
# dominant host cost — the exactness scans + packbits measured 56.8 s of
# the 67.6 s scGLUE Distance phase on the single host core — and replays
# the identical payloads (the transfer counters still record every byte
# shipped). Only the VALUES on the link are cached, nothing derived:
# the resident matrix is bit-identical either way.
# --------------------------------------------------------------------------
ENCODE_CACHE_DIR: Optional[str] = None   # set by enable_encode_cache()
_ENCODE_CACHE_MAX_BYTES = 4 << 30


def enable_encode_cache(path: Optional[str] = '~/.cache/jamie_tpu_enc'):
    """Enable (or with None, disable) the on-disk encode cache."""
    global ENCODE_CACHE_DIR
    import os
    ENCODE_CACHE_DIR = None if path is None else os.path.expanduser(path)
    return ENCODE_CACHE_DIR


def content_fingerprint(arr) -> str:
    """Cheap content-sample hash of a host matrix (dense or scipy CSR/CSC):
    shape/dtype/strides plus the raw bytes of ~16 sampled rows (or sampled
    indptr/data/index slices for sparse). Used to (a) catch in-place
    mutation of an identity-cached array (the id()-keyed device caches
    cannot see content changes — VERDICT round-4 item 8) and (b) key the
    on-disk encode cache by view CONTENT, so two equal-shaped views of the
    same file (mm[:n] vs mm[n:2n], or an offset memmap) can never replay
    each other's payloads (round-4 advisor finding). Reads a few KB, never
    the whole matrix."""
    import hashlib
    h = hashlib.sha1()
    data = getattr(arr, 'data', None)
    indptr = getattr(arr, 'indptr', None)
    if indptr is not None and not isinstance(arr, np.ndarray):
        # scipy CSR/CSC: sparsity structure + value samples
        h.update(f'{arr.shape}|{arr.dtype}|{arr.nnz}'.encode())
        h.update(np.ascontiguousarray(
            indptr[::max(1, len(indptr) // 64)]).tobytes())
        for v in (data, arr.indices):
            v = np.asarray(v)
            h.update(np.ascontiguousarray(v[:256]).tobytes())
            h.update(np.ascontiguousarray(v[-256:]).tobytes())
            h.update(np.ascontiguousarray(
                v[:: max(1, v.shape[0] // 16)][:32]).tobytes())
    else:
        a = arr
        h.update(f'{a.shape}|{a.dtype}|{getattr(a, "strides", None)}|'
                 f'{getattr(a, "offset", 0)}'.encode())
        n = a.shape[0]
        step = max(1, n // 16)
        width = min(a.shape[1], 512) if a.ndim == 2 else None
        for i in list(range(0, n, step))[:17] + ([n - 1] if n else []):
            row = a[i, :width] if width is not None else a[i]
            h.update(np.ascontiguousarray(row).tobytes())
    return h.hexdigest()


def _encode_cache_path(arr, rows: int) -> Optional[str]:
    import os
    fn = getattr(arr, 'filename', None)
    if not fn or ENCODE_CACHE_DIR is None:
        return None
    try:
        import hashlib
        st = os.stat(fn)
        # content_fingerprint distinguishes views of the same file (byte
        # offset, strides, sampled bytes) — (realpath, mtime, size, shape)
        # alone let mm[:n] and mm[n:2n] replay each other's payloads.
        key = hashlib.sha1(
            f'{os.path.realpath(fn)}|{st.st_mtime_ns}|{st.st_size}|'
            f'{arr.shape}|{arr.dtype}|{rows}|'
            f'{content_fingerprint(arr)}|v2'.encode()).hexdigest()[:20]
        return os.path.join(ENCODE_CACHE_DIR, key + '.npz')
    except OSError:
        return None


def _save_encoded(path: str, chunks) -> None:
    import os
    total = sum(lb for _, _, lb in chunks)
    if total > _ENCODE_CACHE_MAX_BYTES:
        return
    import ml_dtypes
    arrs = {'kinds': np.array([k for k, _, _ in chunks]),
            'lbs': np.array([lb for _, _, lb in chunks], np.int64)}
    for i, (_, payload, _) in enumerate(chunks):
        for j, p in enumerate(payload):
            p = np.asarray(p)
            if p.dtype == ml_dtypes.bfloat16:   # npz can't store bf16
                arrs[f'c{i}_{j}F'] = p.view(np.uint16)
            else:
                arrs[f'c{i}_{j}N'] = p
    try:
        os.makedirs(os.path.dirname(path), exist_ok=True)
        tmp = path + '.tmp.npz'
        np.savez(tmp, **arrs)
        os.replace(tmp, path)
        _prune_encode_cache(os.path.dirname(path))
    except OSError:
        pass


def _prune_encode_cache(
        cache_dir: str, total_limit: int = _ENCODE_CACHE_MAX_BYTES * 4
) -> None:
    """Keep the cache DIRECTORY bounded (per-entry saves are capped, but a
    long-lived workstation accumulates one entry per distinct source file):
    drop least-recently-USED entries (atime where tracked, else mtime)
    until the total is under 4x the per-entry cap."""
    import os
    try:
        entries = []
        with os.scandir(cache_dir) as it:
            for e in it:
                if e.name.endswith('.npz'):
                    st = e.stat()
                    entries.append((max(st.st_atime, st.st_mtime),
                                    st.st_size, e.path))
        total = sum(sz for _, sz, _ in entries)
        for _, sz, p in sorted(entries):
            if total <= total_limit:
                break
            os.unlink(p)
            total -= sz
    except OSError:
        pass


def _load_encoded(path: str):
    import os
    if not os.path.exists(path):
        return None
    import ml_dtypes
    try:
        with np.load(path) as z:
            kinds = [str(k) for k in z['kinds']]
            lbs = [int(b) for b in z['lbs']]
            out = []
            for i, (kind, lb) in enumerate(zip(kinds, lbs)):
                payload = []
                for j in range(8):
                    if f'c{i}_{j}F' in z:
                        payload.append(
                            z[f'c{i}_{j}F'].view(ml_dtypes.bfloat16))
                    elif f'c{i}_{j}N' in z:
                        payload.append(z[f'c{i}_{j}N'])
                    else:
                        break
                out.append((kind, tuple(payload), lb))
        try:
            os.utime(path)   # mark recency for the LRU prune (relatime
        except OSError:      # filesystems rarely update atime on read)
            pass
        return out
    except Exception:
        return None   # unreadable/corrupt cache: rebuild


def _ship_csr_chunk(resident, chunk, s, f, jits, jnp, bp=None):
    """Ship a scipy CSR row chunk as indices (+values unless constant),
    densifying on device — or fall through to the dense-chunk formats
    when they'd put fewer bytes on the link."""
    if int(chunk.nnz) == 0:
        return resident   # already zeros
    t0 = time.perf_counter()
    enc = _encode_csr_chunk(chunk, f)
    _transfer['encode_s'] += time.perf_counter() - t0
    if enc is None:
        from .hostmat import densify
        return _ship_dense_chunk(resident, densify(chunk), s, jits, jnp, bp)
    kind, payload, link_bytes = enc
    _transfer['bytes'] += link_bytes
    start = jnp.asarray(s, jnp.int32)
    devs = [jnp.asarray(p) for p in payload]
    if bp is not None:
        bp.add(*devs)
    return jits[kind](resident, *devs, start)


def build_resident_bf16(arr, chunk_bytes: int = 256 << 20):
    """Upload a big host matrix as one device-resident bf16 array, with a
    dtype-aware link format per row chunk (VERDICT round-3 item 3).

    Row-contiguous chunks: sequential reads (a column-strided pass over a
    row-major memmap measured 79 MB/s vs GB/s sequential), then the
    cheapest EXACT encoding the chunk admits — packed bits for two-valued
    data (16x under bf16; u8/bit values are exactly representable in bf16
    so the resident matrix is bit-identical to the round-3 all-bf16
    build), u8 for small integers (2x), CSR indices+values for sparse
    chunks whose nnz makes that smaller still — decoded on device by the
    donated insert kernel. The link transfer of chunk k overlaps the
    read+classify of chunk k+1, and no jnp.concatenate transient ever
    doubles the footprint (at scGLUE scale that second 4.4 GB copy,
    stacked on both modalities' arrays, crashed the worker).

    Reference cost being attacked: the Distance/upload phase was 58% of
    the round-3 pipeline leg (BENCH_r03) while jamie/jamie.py:839-890
    ships nothing (CPU-local) — the transfer only exists on the
    accelerator port, so it must be minimal."""
    import jax
    import jax.numpy as jnp
    import ml_dtypes

    from .hostmat import dense_rows, is_scipy_sparse

    jits = _get_insert_jits()
    n, f = arr.shape
    rows = max(int(chunk_bytes / max(f * 2, 1)), 64)
    resident = jnp.zeros((n, f), ml_dtypes.bfloat16)
    sparse_in = is_scipy_sparse(arr) and arr.format == 'csr'
    if sparse_in:
        # A device-resident CSR (shared with the landmark/PCA passes, or
        # created now if it fits the budget) decodes on chip: the dense
        # build costs ZERO further link traffic instead of re-shipping
        # the whole CSR payload. Same bf16 values either way (the decode
        # places the same bf16 vals the csr insert would).
        dcsr = device_csr(arr)
        if dcsr is not None:
            ins_dev = _get_insert_dev_jit()
            for s in range(0, n, rows):
                _transfer['bf16_equiv_bytes'] += 2 * min(rows, n - s) * f
                resident = ins_dev(resident, dcsr.rows(s, s + rows),
                                   jnp.asarray(s, jnp.int32))
            return jax.block_until_ready(resident)
    bp = _Backpressure(2 * chunk_bytes)
    cache_path = None if sparse_in else _encode_cache_path(arr, rows)
    cached = _load_encoded(cache_path) if cache_path else None
    if cached is not None and len(cached) != (n + rows - 1) // rows:
        cached = None   # stale layout: rebuild
    to_save = [] if (cache_path and cached is None) else None
    for i, s in enumerate(range(0, n, rows)):
        _transfer['bf16_equiv_bytes'] += 2 * min(rows, n - s) * f
        if sparse_in:
            t0 = time.perf_counter()
            chunk = arr[s:s + rows]
            _transfer['read_s'] += time.perf_counter() - t0
            resident = _ship_csr_chunk(resident, chunk, s, f, jits, jnp, bp)
        elif cached is not None:
            kind, payload, lb = cached[i]
            resident = _ship_encoded(resident, kind, payload, lb, s, jits,
                                     jnp, bp)
        else:
            t0 = time.perf_counter()
            x = dense_rows(arr, s, s + rows)
            _transfer['read_s'] += time.perf_counter() - t0
            t0 = time.perf_counter()
            enc = _encode_dense_chunk(x)
            _transfer['encode_s'] += time.perf_counter() - t0
            if to_save is not None:
                to_save.append(enc)
            resident = _ship_encoded(resident, *enc, s, jits, jnp, bp)
    if to_save is not None:
        _save_encoded(cache_path, to_save)
    return jax.block_until_ready(resident)


_ins_dev_jit = None


def _get_insert_dev_jit():
    """Insert an already-on-device f32 block into the resident bf16 matrix
    (the DeviceCSR-backed resident build — no host payload involved)."""
    global _ins_dev_jit
    if _ins_dev_jit is None:
        import jax
        import jax.numpy as jnp
        import ml_dtypes

        @partial(jax.jit, donate_argnums=(0,))
        def ins_dev(resident, xb, start):
            return jax.lax.dynamic_update_slice(
                resident, xb.astype(ml_dtypes.bfloat16), (start, 0))
        _ins_dev_jit = ins_dev
    return _ins_dev_jit


_decode_jits: dict = {}


def _get_decode_jits():
    """Jitted link-format decoders returning a standalone dense f32 block
    (the streamed-PCA twin of the resident-insert kernels). The feature
    width is static; the row count is carried by the payload shapes."""
    if _decode_jits:
        return _decode_jits
    import jax
    import jax.numpy as jnp

    @partial(jax.jit, static_argnames=('f',))
    def dec_bits(packed, scale, f):
        r, fb = packed.shape
        shifts = jnp.arange(7, -1, -1, dtype=jnp.uint8)
        bits = (packed[:, :, None] >> shifts) & jnp.uint8(1)
        return (bits.reshape(r, fb * 8)[:, :f].astype(jnp.float32)
                * scale.astype(jnp.float32))

    @partial(jax.jit, static_argnames=('f',))
    def dec_bits2(packed, lo, hi, f):
        r, fb = packed.shape
        shifts = jnp.arange(7, -1, -1, dtype=jnp.uint8)
        bits = (packed[:, :, None] >> shifts) & jnp.uint8(1)
        bits = bits.reshape(r, fb * 8)[:, :f]
        return jnp.where(bits.astype(bool), hi[None, :],
                         lo[None, :]).astype(jnp.float32)

    @partial(jax.jit, static_argnames=('f',))
    def dec_plain(xb, f):
        return xb[:, :f].astype(jnp.float32)

    def _csr_flat(indptr, cols, f):
        # see _get_insert_jits._csr_flat: sorted+unique flat scatter index
        rows = jnp.searchsorted(indptr, jnp.arange(cols.shape[0]),
                                side='right').astype(jnp.int32) - 1
        flat = rows * (f + 1) + cols
        return flat + jnp.where(
            cols == f, jnp.arange(cols.shape[0], dtype=jnp.int32), 0)

    @partial(jax.jit, static_argnames=('f', 'r'))
    def dec_csr(indptr, cols, vals, r, f):
        flat = _csr_flat(indptr, cols, f)
        out = jnp.zeros((r * (f + 1),), jnp.float32)
        out = out.at[flat].set(vals.astype(jnp.float32), mode='drop',
                               unique_indices=True, indices_are_sorted=True)
        return out.reshape(r, f + 1)[:, :f]

    @partial(jax.jit, static_argnames=('f', 'r'))
    def dec_csr_const(indptr, cols, scale, r, f):
        flat = _csr_flat(indptr, cols, f)
        out = jnp.zeros((r * (f + 1),), jnp.float32)
        out = out.at[flat].set(scale.astype(jnp.float32), mode='drop',
                               unique_indices=True, indices_are_sorted=True)
        return out.reshape(r, f + 1)[:, :f]

    _decode_jits.update(bits=dec_bits, bits2=dec_bits2, u8=dec_plain,
                        bf16=dec_plain, csr=dec_csr,
                        csr_const=dec_csr_const)
    return _decode_jits


_dec_block_jit = None


def _get_dec_block():
    """Jitted dense-f32 decode of rows [s, s+r) from a device-resident
    padded CSR. `s` is traced (one executable serves every block of a
    given (r, w)); the nnz window w is a static power-of-two bucket. The
    window is slice-clamped, so no tail padding of cols/vals is needed:
    entries before/after the valid run map to strictly-sorted
    out-of-range flat indices (negative prefix, past-the-end suffix) and
    drop, preserving the sorted+unique scatter promises."""
    global _dec_block_jit
    if _dec_block_jit is not None:
        return _dec_block_jit
    import jax
    import jax.numpy as jnp

    @partial(jax.jit, static_argnames=('r', 'f', 'w'))
    def dec_block(indptr, cols, vals, s, r, f, w):
        lo = indptr[s]
        hi = indptr[s + r]
        start = jnp.clip(lo, 0, cols.shape[0] - w)
        c = jax.lax.dynamic_slice(cols, (start,), (w,)).astype(jnp.int32)
        v = jax.lax.dynamic_slice(vals, (start,), (w,))
        pos = jnp.arange(w, dtype=jnp.int32)
        k = start + pos
        rows = (jnp.searchsorted(indptr, k, side='right').astype(jnp.int32)
                - 1 - s)
        # Guard regions of width w on both sides keep EVERY index
        # in-bounds and globally sorted (negative scatter indices WRAP in
        # jax — mode='drop' only drops past-the-end): prefix entries land
        # in [0, w), the block's data in [w, w + r*(f+1)), suffix entries
        # in the tail guard. The guards are sliced away.
        body = w + rows * (f + 1) + c
        flat = jnp.where(k < lo, pos,
                         jnp.where(k >= hi, w + r * (f + 1) + pos, body))
        out = jnp.zeros((w + r * (f + 1) + w,), jnp.float32)
        out = out.at[flat].set(v.astype(jnp.float32),
                               unique_indices=True, indices_are_sorted=True)
        return jax.lax.dynamic_slice(
            out, (w,), (r * (f + 1),)).reshape(r, f + 1)[:, :f]

    _dec_block_jit = dec_block
    return dec_block


# --------------------------------------------------------------------------
# SpMM without scatter (VERDICT round-4 item 1): the on-chip CSR block
# decode is a sorted flat scatter that TPU serializes at ~9.2 M nnz/s
# (RESULTS.md round-4 probe: an 8.03M-nnz block takes 873.6 ms while its
# (13421 x 20000) @ (20000 x 522) consumer matmul takes 4.5 ms) — at atlas
# scale the decode dominated the whole Mapping phase. But every hot
# consumer of the decoded block is a MATMUL (PCA sketch Xc @ Omega, PCA
# projection Q^T Xc, cell->landmark Gram x @ lm^T, FPS JL sketch), so the
# dense block never has to exist.
#
# Round-5 chip probes (examples/spmm_probe.py, examples/ell_probe.py)
# settled the formulation: windowed one-hot matmuls, gather+segment_sum,
# and BCOO all measure ~3-9 M nnz/s (one-hot pays span*w*k FLOPs; TPU
# serializes scatter), while an ELL row-gather + einsum reduce runs at
# 156 M nnz/s — 17.7x the decode — because every op in it is a batched
# row gather or a dense reduce. Its cost is proportional to PADDED slots
# (the (block, w, k) einsum transient), so the production layout is
# row-SPLIT ELL: a uniform width w chosen to minimize total padded slots
# (host scan over pow2-ish candidates), long rows split across
# ceil(nnz_i/w) consecutive ELL subrows. Subrows of a source row stay
# CONTIGUOUS, so any row range [s, e) is one slice, and the per-subrow
# partial products combine by a cumsum over ELL rows differenced at the
# source-row boundaries — the row_sq_sums prefix-sum trick, vectorized
# over k. No scatter anywhere; skewed (lognormal) row-nnz only costs its
# padding, not a global max width.
# --------------------------------------------------------------------------

_ELL_SLOT_TARGET = 1 << 27        # einsum transient budget (elements)


def _pow2(x: int) -> int:
    b = 1
    while b < x:
        b <<= 1
    return b


def _ell_width(row_nnz: np.ndarray) -> int:
    """Width minimizing padded slots PLUS per-ELL-row overhead
    (sum(ceil(nnz_i/w))*w + 32*n_ell) over lane-friendly candidates
    capped at the max row nnz rounded up. Slots alone always shrink with
    smaller w (the padding vanishes) but every ELL row also costs a
    partial-vector write + combine gather — 32 slot-equivalents covers it
    and keeps the width near the row-nnz scale (uniform 600-nnz rows pick
    the 688 cap; lognormal ones pick ~256-512)."""
    mx = int(row_nnz.max(initial=0))
    if mx == 0:
        return 128
    cap = ((mx + 7) // 8) * 8
    cands = sorted({min(c, cap) for c in
                    (8, 16, 32, 64, 128, 256, 384, 512, 768, 1024, 1536,
                     2048, 3072, 4096, cap)})
    best, best_cost = cands[0], None
    for w in cands:
        n_ell = int(((row_nnz + w - 1) // w).sum())
        cost = n_ell * w + 32 * n_ell
        if best_cost is None or cost < best_cost:
            best, best_cost = w, cost
    return best


def _build_ell(indptr: np.ndarray, indices: np.ndarray, data: np.ndarray,
               w: int, val_dtype, col_dtype, chunk_slots: int = 64 << 20):
    """Host-side row-split ELL build: (ell_start (n+1,) int64, ec
    (n_ell, w) col_dtype, ev (n_ell, w) val_dtype). Vectorized numpy
    fancy-gather, chunked over ELL rows to bound the transient index
    array. Row padding to the slice-bucket multiple happens ON DEVICE
    (jnp.pad after upload) so the link never carries pad rows."""
    n = len(indptr) - 1
    row_nnz = np.diff(indptr)
    n_sub = (row_nnz + w - 1) // w                      # 0 for empty rows
    ell_start = np.zeros(n + 1, np.int64)
    np.cumsum(n_sub, out=ell_start[1:])
    n_ell = int(ell_start[-1])
    ec = np.zeros((n_ell, w), col_dtype)
    ev = np.zeros((n_ell, w), val_dtype)
    if n_ell == 0:
        return ell_start, ec, ev
    src = np.repeat(np.arange(n, dtype=np.int64), n_sub)
    sub = np.arange(n_ell, dtype=np.int64) - np.repeat(
        ell_start[:-1], n_sub)
    starts = indptr[src] + sub * w
    lens = np.minimum(indptr[src + 1] - starts, w)
    jj = np.arange(w, dtype=np.int64)
    rows_per_chunk = max(int(chunk_slots) // w, 1)
    nnz = len(indices)
    for s in range(0, n_ell, rows_per_chunk):
        e = min(s + rows_per_chunk, n_ell)
        idx = starts[s:e, None] + jj[None, :]
        np.clip(idx, 0, nnz - 1, out=idx)
        mask = jj[None, :] < lens[s:e, None]
        ec[s:e] = indices[idx]
        ev[s:e] = np.where(mask, data[idx], 0)
    return ell_start, ec, ev


_ell_mm_jit = None


def _get_ell_mm_jit():
    global _ell_mm_jit
    if _ell_mm_jit is not None:
        return _ell_mm_jit
    import jax
    import jax.numpy as jnp

    @partial(jax.jit, static_argnames=('R', 'block', 'S'))
    def ell_mm(ec, ev, bounds, M, start, R, block, S):
        """ELL rows [start, start+R) of the split layout times M, combined
        at the source-row boundaries `bounds` ((r+1,) i32, absolute ELL
        row indices) -> (r, k) f32.

        Per scan block: gather M's rows by the block's column indices
        ((block, w, k), the only irregular op — TPU row-gather runs at
        memory speed), multiply by the values and reduce over w (einsum,
        f32 accumulation). Each source row's <=S subrow partials then
        combine by S masked row-gathers (no scatter, no long prefix sum —
        a cumsum-difference combine lost ~1e-3 relative to f32
        cancellation at just 1000 rows; S is 1 for every unsplit row
        range, so the common case is a single gather)."""
        w = ec.shape[1]
        k = M.shape[1]
        ecs = jax.lax.dynamic_slice(ec, (start, 0), (R, w))
        evs = jax.lax.dynamic_slice(ev, (start, 0), (R, w))

        def step(_, blk):
            c, v = blk
            g = jnp.take(M, c.astype(jnp.int32), axis=0)
            o = jnp.einsum('bn,bnk->bk', v, g,
                           preferred_element_type=jnp.float32)
            return None, o

        _, P = jax.lax.scan(
            step, None,
            (ecs.reshape(R // block, block, w),
             evs.reshape(R // block, block, w)))
        P = P.reshape(R, k)
        base = bounds[:-1] - start
        ends = bounds[1:] - start

        def comb(t, out):
            idx = base + t
            g = jnp.take(P, jnp.clip(idx, 0, R - 1), axis=0)
            return out + jnp.where((idx < ends)[:, None], g, 0.0)

        r = base.shape[0]
        return jax.lax.fori_loop(
            0, S, comb, jnp.zeros((r, k), jnp.float32))

    _ell_mm_jit = ell_mm
    return ell_mm


_row_sq_jit = None


def _get_row_sq_jit():
    """Per-row sum of squared values without scatter: f32 cumsum over the
    value vector, then boundary differences at indptr (sorted-segment-sum
    via prefix sums; parallel-prefix error is O(log nnz) ulps)."""
    global _row_sq_jit
    if _row_sq_jit is not None:
        return _row_sq_jit
    import jax
    import jax.numpy as jnp

    @jax.jit
    def row_sq(indptr, vals):
        c = jnp.cumsum(vals.astype(jnp.float32) ** 2)
        cz = jnp.concatenate([jnp.zeros((1,), jnp.float32), c])
        ip = indptr.astype(jnp.int32)
        return jnp.take(cz, ip[1:]) - jnp.take(cz, ip[:-1])

    _row_sq_jit = row_sq
    return row_sq


class DeviceCSR:
    """A scipy CSR matrix resident on device in padded-CSR form.

    Uploaded ONCE (indptr int32, cols uint16/int32, vals dtype-aware:
    exact f32 below the package-wide 100M-dense-element bf16 threshold —
    matching what the dense chunk paths ship at the same sizes — bf16 at
    scale, ~6 bytes/nnz, 2.4 GB less than dense bf16 at the 100k-cell
    3%-dense atlas shapes); every `rows(s, e)` call decodes a dense f32
    block with pure chip work, and every `matmul`/`tmatmul` call computes
    CSR @ M / X^T @ Q directly without materializing the dense block at
    all (see the SpMM note above). This is what makes multi-pass
    streamed consumers (cell->landmark weights, then 2-3 row-streamed
    PCA passes over the SAME matrix) cost one upload instead of
    re-shipping the matrix per pass — at the axon pool's worst measured
    link rates the re-streaming dominated the whole atlas fit."""

    def __init__(self, X, _count_equiv: bool = True):
        import jax
        import jax.numpy as jnp
        if not X.has_canonical_format:
            # Non-canonical CSR (unsorted and/or duplicate entries): the
            # decode scatter assumes sorted unique indices, and duplicates
            # must SUM (matching the dense path), not overwrite. Work on a
            # copy — the residency contract is read-only inputs, so never
            # mutate the caller's matrix in place.
            X = X.copy()
            X.sum_duplicates()
        n, f = X.shape
        self.shape = (int(n), int(f))
        self._X = X               # host source: lazy flat/CSC builds
        self._indptr_np = np.asarray(X.indptr, np.int64)
        # Value dtype follows the package-wide link policy: matrices whose
        # DENSE element count is under the 100M bf16 threshold ship exact
        # f32 (the dense transform/stream paths are exact there too), big
        # ones round to bf16 (quality A/B'd neutral on real data).
        import ml_dtypes
        self._val_dtype = (ml_dtypes.bfloat16
                           if int(n) * int(f) >= BF16_LINK_ELEMS
                           else np.float32)
        vals_host = np.asarray(X.data, np.float32)
        if self._val_dtype is not np.float32:
            vals_host = host_bf16(vals_host)
        # Primary layout: row-split ELL (the SpMM every hot consumer
        # runs); built on host, uploaded once.
        row_nnz = np.diff(self._indptr_np)
        self.ell_w = _ell_width(row_nnz)
        cdt = np.uint16 if f < 65535 else np.int32
        ell_start, ec, ev = _build_ell(
            self._indptr_np, np.asarray(X.indices, np.int64), vals_host,
            self.ell_w, self._val_dtype, cdt)
        self._ell_start_np = ell_start
        # Pad ELL rows to a multiple of 256 ON DEVICE (jnp.pad zero-fills
        # device-side, so the link only carries the real rows); 256 is a
        # multiple of every einsum block the matmul can pick, keeping row
        # slices bucketable.
        pad = (-ec.shape[0]) % 256 or (256 if ec.shape[0] == 0 else 0)
        self.ec = jnp.pad(jnp.asarray(ec), ((0, pad), (0, 0)))
        self.ev = jnp.pad(jnp.asarray(ev), ((0, pad), (0, 0)))
        self.nbytes = 4 * (n + 1) + ec.nbytes + ev.nbytes
        _transfer['bytes'] += self.nbytes
        if _count_equiv:
            # What ONE dense-bf16 shipment of this matrix would cost —
            # the same counterfactual every other link path records (the
            # CSC twin counts its real bytes but no extra equivalent:
            # a dense-resident matrix would not need a twin).
            _transfer['bf16_equiv_bytes'] += 2 * int(n) * int(f)
        self.indptr = jnp.asarray(self._indptr_np.astype(np.int32))
        self._flat = None         # lazy (cols, vals) for rows() decode
        self._csc = None          # lazy transposed DeviceCSR (host tocsc)
        self._row_sq = None       # lazy (n,) f32 cache
        jax.block_until_ready((self.indptr, self.ec, self.ev))

    def _ensure_flat(self):
        """Flat cols/vals for the dense-block decode — shipped lazily:
        every hot consumer is matmul-shaped and runs off the ELL layout,
        so only a consumer that truly needs dense blocks pays this."""
        if self._flat is not None:
            return self._flat
        import jax
        import jax.numpy as jnp
        f = self.shape[1]
        cdt = np.uint16 if f < 65535 else np.int32
        cols = np.asarray(self._X.indices, cdt)
        vals = np.asarray(self._X.data, np.float32)
        if self._val_dtype is not np.float32:
            vals = host_bf16(vals)
        nb = cols.nbytes + vals.nbytes
        _transfer['bytes'] += nb
        self.nbytes += nb
        self._flat = (jnp.asarray(cols), jnp.asarray(vals))
        jax.block_until_ready(self._flat)
        return self._flat

    def rows(self, s: int, e: int):
        """Rows [s, e) as a dense f32 device block (values bf16-rounded
        at scale, exact below the link-policy threshold)."""
        e = min(e, self.shape[0])
        r = e - s
        cols, vals = self._ensure_flat()
        w = _nnz_bucket(int(self._indptr_np[e] - self._indptr_np[s]))
        w = min(w, int(cols.shape[0]))
        if w == 0 or self._indptr_np[-1] == 0:
            import jax.numpy as jnp
            return jnp.zeros((r, self.shape[1]), jnp.float32)
        return _get_dec_block()(self.indptr, cols, vals, s,
                                r=r, f=self.shape[1], w=w)

    def matmul(self, M, s: int = 0, e: Optional[int] = None):
        """X[s:e] @ M as pure chip work, (e-s, k) f32 — no dense block.
        M: (f, k) device/host array; cast on device to the values' link
        dtype (bf16 at scale, exact f32 below the 100M-element
        threshold), f32 accumulation. Runs the row-split ELL einsum at
        ~150 M nnz/s (chip probe) vs the decode's ~9 M nnz/s."""
        import jax.numpy as jnp
        e = self.shape[0] if e is None else min(e, self.shape[0])
        r = e - s
        k = int(M.shape[1])
        e0 = int(self._ell_start_np[s])
        e1 = int(self._ell_start_np[e])
        if e1 == e0:
            return jnp.zeros((r, k), jnp.float32)
        n_pad = int(self.ec.shape[0])
        w = self.ell_w
        # einsum scan block: bound the (block, w, k) transient; <=256 so
        # any block divides the device-side row padding
        ratio = max(_ELL_SLOT_TARGET // max(w * k, 1), 1)
        block = int(np.clip(1 << (int(ratio).bit_length() - 1), 8, 256))
        R = min(_pow2(max(e1 - e0, block)), n_pad)
        R = ((R + block - 1) // block) * block
        start = max(min(e0, n_pad - R), 0)
        Mb = jnp.asarray(M).astype(self.ev.dtype)
        b_np = self._ell_start_np[s:e + 1]
        S = _pow2(int((b_np[1:] - b_np[:-1]).max(initial=1)))
        bounds = jnp.asarray(b_np.astype(np.int32))
        return _get_ell_mm_jit()(
            self.ec, self.ev, bounds, Mb,
            jnp.asarray(start, jnp.int32), R=R, block=block, S=S)

    def _ensure_csc(self):
        """The transposed products run the same ELL SpMM over a host-built
        CSC twin (scipy tocsc — C-speed; the round-4 on-device argsort
        build measured 21.9 s on the 8M-nnz probe block). Lazy: only the
        PCA projection pass needs it."""
        if self._csc is None:
            self._csc = DeviceCSR(self._X.T.tocsr(), _count_equiv=False)
        return self._csc

    def tmatmul(self, Q):
        """X^T @ Q as pure chip work, (f, k) f32 — the PCA projection
        B = (Q^T Xc)^T without a dense block. Q: (n, k)."""
        return self._ensure_csc().matmul(Q)

    def release_csc(self):
        """Drop the CSC twin's device arrays. The twin serves only the
        transposed products (PCA projection passes); at atlas scale it
        holds 0.6-1.2 GB of HBM that later phases need. A subsequent
        tmatmul transparently rebuilds it."""
        self._csc = None

    def row_sq_sums(self):
        """Per-row sum of squared values (bf16-rounded at scale), (n,)
        f32 — the |x|^2 term of the cell->landmark Gram, cached. Computed
        from the ELL layout (padding slots are zero) with the same
        cumsum-at-boundaries combine the SpMM uses."""
        if self._row_sq is None:
            import jax.numpy as jnp
            sq = (self.ev.astype(jnp.float32) ** 2).sum(axis=1)
            b = self._ell_start_np
            S = int((b[1:] - b[:-1]).max(initial=1))
            base = jnp.asarray(b[:-1].astype(np.int32))
            ends = jnp.asarray(b[1:].astype(np.int32))
            out = jnp.zeros((self.shape[0],), jnp.float32)
            for t in range(S):       # S masked gathers, one-time
                idx = base + t
                out = out + jnp.where(
                    idx < ends,
                    jnp.take(sq, jnp.clip(idx, 0, sq.shape[0] - 1)), 0.0)
            self._row_sq = out
        return self._row_sq


# id(X) -> (weakref, DeviceCSR); mirrors the bf16 residency cache so the
# landmark-weights pass and the PCA passes share one upload
_csr_cache: dict = {}


def device_csr(X, budget_bytes: Optional[int] = None):
    """X (scipy CSR) as a shared DeviceCSR, or None over budget."""
    from .hostmat import is_scipy_sparse
    if not (is_scipy_sparse(X) and X.format == 'csr'):
        return None
    key = id(X)
    hit = _csr_cache.get(key)
    if hit is not None and hit[0]() is X:
        if content_fingerprint(X) == hit[2]:
            return hit[1]
        warnings.warn(
            'device_csr: cached host matrix was mutated in place; '
            'rebuilding the device copy (the residency contract is '
            'read-only inputs)', stacklevel=2)
        del _csr_cache[key]
    budget = DEFAULT_BUDGET_BYTES if budget_bytes is None else budget_bytes
    # Match DeviceCSR's actual layout: uint16 cols below 65k features
    # (2 B) else int32 (4 B), bf16 vals (2 B), int32 indptr. The old flat
    # 6 B/nnz estimate refused residency for matrices that fit — at 1M
    # cells x 40k features x 3% the ATAC arm is 4.8 GB resident, not 7.2.
    col_b = 2 if X.shape[1] < 65535 else 4
    est = (col_b + 2) * int(X.nnz) + 4 * (X.shape[0] + 1)
    if est > budget:
        return None
    dev = DeviceCSR(X)

    def _evict(_, key=key):
        _csr_cache.pop(key, None)

    _csr_cache[key] = (weakref.ref(X, _evict), dev, content_fingerprint(X))
    return dev


class ChunkUploader:
    """Dtype-aware, backpressured host->device block uploads for the
    streamed phases (row/column-streamed PCA, feature-chunked Gram).

    Each `rows(s, e)` / `cols(s, e)` call encodes the block in the
    cheapest exact link format (the resident build's classification:
    packed bits for two-valued data, u8 for small ints, CSR for sparse
    blocks, bf16 otherwise), ships it, and returns the block decoded to
    dense f32 on device. The _Backpressure window bounds pinned host
    transfer buffers — the unbounded async loop is what OOM-killed the
    100k-cell atlas fit (131 GB RSS; see _Backpressure).

    Exactness: bits/u8/CSR-const/CSR-u8 round-trip bit-identically;
    continuous data rounds to bf16 on the link (the same rounding the
    resident path applies, quality A/B'd neutral on real data —
    examples/bf16_threshold_ab.py)."""

    def __init__(self, X, limit_bytes: int = 1 << 30):
        from .hostmat import is_scipy_sparse
        self.X = X
        self.sparse = is_scipy_sparse(X)
        self.bp = _Backpressure(limit_bytes)
        # Below the package-wide threshold continuous chunks ship exact
        # f32 (what the non-streamed paths compute at the same sizes);
        # bf16 rounding is reserved for matrices where the 2x link cut
        # actually matters.
        self.exact = (int(X.shape[0]) * int(X.shape[1]) < BF16_LINK_ELEMS)
        # CSR sources that fit the HBM budget become device-resident once
        # (shared across uploaders via the id-keyed cache); rows() then
        # decodes on chip with zero further link traffic.
        self.dcsr = (device_csr(X)
                     if self.sparse and getattr(X, 'format', '') == 'csr'
                     else None)

    def _block_f32(self, block_csr_or_dense, r, f):
        import jax.numpy as jnp
        dec = _get_decode_jits()
        t0 = time.perf_counter()
        if self.sparse:
            chunk = block_csr_or_dense
            if int(chunk.nnz) == 0:
                return jnp.zeros((r, f), jnp.float32)
            enc = _encode_csr_chunk(chunk, f, exact=self.exact)
            if enc is not None:
                _transfer['encode_s'] += time.perf_counter() - t0
                kind, payload, link_bytes = enc
                _transfer['bytes'] += link_bytes
                devs = [jnp.asarray(p) for p in payload]
                self.bp.add(*devs)
                return dec[kind](*devs, r=r, f=f)
            from .hostmat import densify
            x = densify(chunk)
        else:
            x = np.ascontiguousarray(block_csr_or_dense, np.float32)
        _transfer['read_s'] += time.perf_counter() - t0
        t0 = time.perf_counter()
        kind, payload, link_bytes = _encode_dense_chunk(x, exact=self.exact)
        _transfer['encode_s'] += time.perf_counter() - t0
        if kind == 'bits' and not payload[0].any():
            return jnp.zeros((r, f), jnp.float32)
        _transfer['bytes'] += link_bytes
        devs = [jnp.asarray(p) for p in payload]
        self.bp.add(*devs)
        return dec[kind](*devs, f=f)

    def rows(self, s: int, e: int):
        """Rows [s:e) as a device-resident dense f32 block."""
        e = min(e, self.X.shape[0])
        f = int(self.X.shape[1])
        _transfer['bf16_equiv_bytes'] += 2 * (e - s) * f
        if self.dcsr is not None:
            return self.dcsr.rows(s, e)
        return self._block_f32(self.X[s:e], e - s, f)

    def cols(self, s: int, e: int):
        """Columns [s:e) as a device-resident dense f32 block (pass CSC
        for sparse inputs — the per-chunk tocsr is O(chunk nnz))."""
        e = min(e, self.X.shape[1])
        n = int(self.X.shape[0])
        _transfer['bf16_equiv_bytes'] += 2 * n * (e - s)
        blk = self.X[:, s:e]
        if self.sparse:
            blk = blk.tocsr()
        return self._block_f32(blk, n, e - s)

    def drain(self) -> None:
        self.bp.drain()


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
        ref, dev, fp = hit
        if ref() is arr:
            if content_fingerprint(arr) == fp:
                return dev
            warnings.warn(
                'device_bf16: cached host matrix was mutated in place; '
                'rebuilding the device copy (the residency contract is '
                'read-only inputs)', stacklevel=2)
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
    _cache[key] = (ref, dev, content_fingerprint(arr))
    return dev


def clear_residency_cache() -> None:
    """Drop every resident copy (call before the training phase claims
    HBM)."""
    _cache.clear()
    _csr_cache.clear()
