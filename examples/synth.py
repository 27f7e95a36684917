"""Shared spectrum-matched synthetic data generator for the benchmark
harnesses (bench.py's pipeline leg and examples/time_and_memory.py).

One generator, one disk cache: both harnesses previously re-implemented
the rank-`latent` chunked generation with different cache filenames, so
the identical scGLUE-shaped arrays were generated and stored twice
(~20 GB instead of ~10). Identical inputs also make the two harnesses'
scGLUE rows directly comparable — differences are the axon pool's
link/chip share, not data provenance.
"""

import os

import numpy as np

SYNTH_CACHE = os.path.expanduser('~/.cache/jamie_tpu_bench')


def synthesize(shape0, shape1, seed=0, latent=32, binarize1=None):
    """Spectrum-matched synthetic pair at the given shapes.

    Disk-cached under ~/.cache/jamie_tpu_bench and memmap-loaded on
    reruns: the single-core host generates normals at <25 MFLOP/s, so the
    widest shapes (scGLUE/DM_rep4) cost minutes each per regeneration that
    the harness shouldn't pay twice. Consumers treat the arrays as
    read-only (fit_transform never mutates its inputs).

    binarize1: if set (a density in (0, 1)), modality 1 models BINARY
    ATAC peaks fed through the reference's preprocessing: thresholded to
    {0, 1} at the per-column (1 - density) quantile, then z-scored per
    column — exactly what every reference notebook's
    `preprocessing.scale` does to Chen-2019-ATAC before JAMIE
    (notebooks/scGLUE.ipynb cell "Preprocessing"). The result is dense
    but two-valued per column, the structure the dtype-aware link format
    exploits. Cached under a distinct filename; modality 0's cache is
    shared with the continuous variant."""
    tags = ['', f'_zb{int(binarize1 * 100)}' if binarize1 else '']
    paths = [os.path.join(SYNTH_CACHE,
                          f'tm_{s[0]}x{s[1]}_{seed}_{i}{tags[i]}.npy')
             for i, s in enumerate((shape0, shape1))]
    if all(os.path.exists(p) for p in paths):
        return [np.load(p, mmap_mode='r') for p in paths]

    rng = np.random.default_rng(seed)  # PCG64: ~4x faster than RandomState
    n = shape0[0]
    z = rng.standard_normal((n, latent), dtype=np.float32)

    def one(shape, binarize=None):
        # feature-chunked so the noise generation for 242k-dim modalities
        # stays memory- and time-bounded
        out = np.empty((n, shape[1]), np.float32)
        chunk = 16384
        for s in range(0, shape[1], chunk):
            e = min(s + chunk, shape[1])
            w = rng.standard_normal((latent, e - s), dtype=np.float32)
            out[:, s:e] = z @ w
            out[:, s:e] += 0.3 * rng.standard_normal((n, e - s),
                                                     dtype=np.float32)
            if binarize is not None:
                tau = np.quantile(out[:, s:e], 1.0 - binarize, axis=0)
                b = (out[:, s:e] > tau).astype(np.float32)
                mu, sd = b.mean(axis=0), b.std(axis=0)
                out[:, s:e] = (b - mu) / np.where(sd == 0, 1.0, sd)
        return out

    data = [one(shape0), one(shape1, binarize1)]
    try:
        os.makedirs(SYNTH_CACHE, exist_ok=True)
        for p, d in zip(paths, data):
            np.save(p + '.tmp.npy', d)
            os.replace(p + '.tmp.npy', p)
    except OSError:
        pass  # no disk room: run uncached
    return data


def _sparse_latent(n, seed, latent):
    """The shared clustered latent behind synthesize_sparse_pair, plus the
    cluster assignments. The draw ORDER is load-bearing: z, then centers,
    then assignments, then (in the pair generator) per-modality weights —
    so labels can be re-derived for a cached pair without regenerating the
    matrices."""
    rng = np.random.default_rng(seed)
    z = rng.standard_normal((n, latent), dtype=np.float32)
    centers = 2.0 * rng.standard_normal((12, latent), dtype=np.float32)
    assign = rng.integers(0, 12, n)
    z += centers[assign]
    return z, assign, rng


def synthesize_sparse_labels(n, seed=0, latent=24):
    """Cluster labels of the synthesize_sparse_pair latent (same rng draw
    order, stopping before the weight draws) — exact label-transfer scoring
    for cached atlas pairs, no matrix regeneration."""
    return _sparse_latent(n, seed, latent)[1]


def synthesize_sparse_pair(n, d0, d1, density=0.03, seed=0, latent=24):
    """Counts-like sparse CSR modality pair over a shared clustered latent
    (the 10x-multiome shape class: tall, nonnegative, a few % nonzero).

    Row-chunked generation — the dense matrix never materializes — with a
    per-modality cutoff calibrated on the first chunk to hit the target
    density. Disk-cached as .npz (scipy save_npz) beside the dense tm_
    caches."""
    from scipy import sparse

    paths = [os.path.join(SYNTH_CACHE, f'sp_{n}x{d}_{density}_{seed}_{i}.npz')
             for i, d in enumerate((d0, d1))]
    if all(os.path.exists(p) for p in paths):
        return [sparse.load_npz(p) for p in paths]

    z, _assign, rng = _sparse_latent(n, seed, latent)

    def one(d):
        w = rng.standard_normal((latent, d), dtype=np.float32)
        chunk = max(int((1 << 29) / (d * 4)), 256)
        first = z[:chunk] @ w + 0.3 * rng.standard_normal(
            (min(chunk, n), d), dtype=np.float32)
        cutoff = np.quantile(first, 1.0 - density)
        blocks = []
        for s in range(0, n, chunk):
            xb = z[s:s + chunk] @ w
            xb += 0.3 * rng.standard_normal(xb.shape, dtype=np.float32)
            xb -= cutoff
            np.maximum(xb, 0.0, out=xb)   # relu at the density cutoff
            blocks.append(sparse.csr_matrix(xb))
        return sparse.vstack(blocks, format='csr')

    data = [one(d0), one(d1)]
    try:
        os.makedirs(SYNTH_CACHE, exist_ok=True)
        for p, m in zip(paths, data):
            sparse.save_npz(p + '.tmp', m)
            os.replace(p + '.tmp.npz', p)
    except OSError:
        pass
    return data
