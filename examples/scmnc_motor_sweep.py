"""scMNC-Motor normalization-provenance sweep (VERDICT round-3 item 1).

The notebook reads geneExp_filtered.csv (stripped from this mount); the rda
ships RAW counts, so the CSV's row transform is the one unknown behind the
full-prior LTA gap (ours 0.868 vs reference 0.8957). Round 2 tried
{raw, log1p, CPM-1e6, log-CPM-1e4}; this sweep covers every remaining
standard single-cell transform. Every candidate is followed by the
notebook's own per-gene z-score (cells 4), which absorbs any per-GENE affine
difference — so candidates differ only through per-CELL depth handling and
the log/sqrt pseudocount placement.

Usage:
  PYTHONPATH=/root/repo:/root/repo/examples:/root/.axon_site \
      python -u examples/scmnc_motor_sweep.py [--seeds 2] [--only name,...]
"""

import argparse
import json
import time

import numpy as np

from scmnc_motor import KWARGS, load_scmnc_motor


def _depth(x):
    return np.maximum(x.sum(1, keepdims=True), 1.0)


def _cpm(x, target):
    return x / _depth(x) * target


def _median_depth_norm(x):
    # scanpy sc.pp.normalize_total(target_sum=None): median library size
    return x / _depth(x) * np.median(x.sum(1))


def _deseq_lognorm(x):
    """Median-of-ratios (DESeq/scran-flavor) size factors, then log1p.
    Genes with any zero are excluded from the geometric mean, as DESeq does."""
    pos = (x > 0).all(axis=0)
    if not pos.any():
        # No gene expressed in every cell (sparse matrices): NaN size
        # factors would silently zero the whole modality downstream.
        raise ValueError(
            'DESeq median-of-ratios undefined: no all-nonzero gene; use a '
            'CPM/UQ/TMM transform for this matrix')
    ref = np.exp(np.log(x[:, pos]).mean(axis=0))  # per-gene geometric mean
    sf = np.median(x[:, pos] / ref, axis=1, keepdims=True)
    sf = np.maximum(sf, 1e-9)
    return np.log1p(x / sf)


def _tmm_lognorm(x, trim_m=0.3, trim_a=0.05):
    """edgeR TMM (Robinson & Oshlack 2010): per-cell effective library
    sizes from the doubly-trimmed, precision-weighted mean of M-values
    against the reference cell (the one whose upper quartile is closest
    to the mean upper quartile), then log-CPM(1e4) by effective depth."""
    depth = _depth(x)
    p = x / depth
    uq = np.quantile(p, 0.75, axis=1)
    ref_i = int(np.argmin(np.abs(uq - uq.mean())))
    ref = p[ref_i]
    factors = np.ones(x.shape[0])
    for i in range(x.shape[0]):
        both = (p[i] > 0) & (ref > 0)
        if both.sum() < 50:
            continue
        pi, pr = p[i][both], ref[both]
        m = np.log2(pi / pr)
        a = 0.5 * np.log2(pi * pr)
        # inverse asymptotic variance of M (edgeR's weights)
        w = ((1 - pi) / (pi * depth[i, 0])
             + (1 - pr) / (pr * depth[ref_i, 0]))
        mlo, mhi = np.quantile(m, [trim_m, 1 - trim_m])
        alo, ahi = np.quantile(a, [trim_a, 1 - trim_a])
        keep = (m >= mlo) & (m <= mhi) & (a >= alo) & (a <= ahi)
        if keep.sum() >= 10:
            factors[i] = 2 ** (np.sum(m[keep] / w[keep])
                               / np.sum(1.0 / w[keep]))
    factors /= np.exp(np.mean(np.log(factors)))  # geometric mean 1
    return np.log1p(x / (depth * factors[:, None]) * 1e4)


def _uq_lognorm(x):
    """Upper-quartile size factors (Bullard et al. 2010): 75th percentile
    of each cell's nonzero counts, geometric-mean-centered, then log1p."""
    uq = np.array([np.quantile(r[r > 0], 0.75) if (r > 0).any() else 1.0
                   for r in x])
    sf = uq / np.exp(np.mean(np.log(np.maximum(uq, 1e-9))))
    return np.log1p(x / sf[:, None])


def _quantile_lognorm(x):
    """Full quantile normalization across cells (each cell's counts mapped
    onto the mean sorted profile; limma/affy-style), then log1p."""
    order = np.argsort(x, axis=1)
    ranks = np.argsort(order, axis=1)
    mean_sorted = np.sort(x, axis=1).mean(axis=0)
    return np.log1p(mean_sorted[ranks])


def _pearson_residuals(x, theta=100.0):
    """Analytic Pearson residuals (SCTransform-flavor, Lause et al. 2021)."""
    total = x.sum()
    mu = _depth(x) * x.sum(0, keepdims=True) / total
    r = (x - mu) / np.sqrt(mu + mu * mu / theta)
    n = x.shape[0]
    return np.clip(r, -np.sqrt(n), np.sqrt(n))


CANDIDATES = {
    # round-2 coverage, kept for the table
    'raw': lambda x: x,
    'log1p': np.log1p,
    'logcpm_1e4': lambda x: np.log1p(_cpm(x, 1e4)),     # shipped default
    # pseudocount-placement variants (z-score can't absorb these)
    'logcpm_1e2': lambda x: np.log1p(_cpm(x, 1e2)),
    'logcpm_1e5': lambda x: np.log1p(_cpm(x, 1e5)),
    'logcpm_1e6': lambda x: np.log1p(_cpm(x, 1e6)),
    'logcpm_median': lambda x: np.log1p(_median_depth_norm(x)),
    # non-log depth handling
    'cpm_1e4': lambda x: _cpm(x, 1e4),
    'sqrt_cpm_1e4': lambda x: np.sqrt(_cpm(x, 1e4)),
    # size-factor families
    'deseq_log': _deseq_lognorm,
    'pearson_resid': _pearson_residuals,
    # round-3 second pass: the remaining standard bulk/SC normalizations
    'tmm_log': _tmm_lognorm,
    'uq_log': _uq_lognorm,
    'quantile_log': _quantile_lognorm,
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--seeds', type=int, default=2)
    ap.add_argument('--only', type=str, default=None)
    args = ap.parse_args()
    names = (args.only.split(',') if args.only else list(CANDIDATES))

    from jamie_tpu import JAMIE

    table = {}
    for name in names:
        dataset, types = load_scmnc_motor(normalize=CANDIDATES[name])
        ltas, foscttms = [], []
        t0 = time.perf_counter()
        for seed in range(args.seeds):
            np.random.seed(seed)
            jm = JAMIE(manual_seed=seed, log_pd=10_000, **{
                **KWARGS, 'log_DNN': 100_000})
            jm.fit_transform(dataset=dataset)
            emb = jm.transform(dataset=dataset)
            foscttms.append(float(jm.test_closer(emb)))
            ltas.append(float(jm.test_LabelTA(emb, types)))
        table[name] = {
            'lta_mean': round(float(np.mean(ltas)), 4),
            'lta_sd': round(float(np.std(ltas)), 4),
            'foscttm_mean': round(float(np.mean(foscttms)), 5),
            'seconds': round(time.perf_counter() - t0, 1),
            'runs': [round(v, 4) for v in ltas],
        }
        print(json.dumps({name: table[name]}), flush=True)
    print()
    print(json.dumps({'sweep': table,
                      'reference': {'lta': 0.8957, 'foscttm': 0.0025}},
                     indent=1))


if __name__ == '__main__':
    main()
