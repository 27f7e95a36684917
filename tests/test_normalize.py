"""Count normalization module: values, sparse preservation, and agreement
with the sweep harness's committed implementations
(examples/scmnc_motor_sweep.py — kept inline there as provenance)."""

import sys

import numpy as np
import pytest
from scipy import sparse

from jamie_tpu import normalize as nz


@pytest.fixture
def counts():
    rng = np.random.RandomState(0)
    x = rng.poisson(2.0, size=(30, 50)).astype(np.float64)
    x[rng.rand(30, 50) < 0.4] = 0
    x[0] = 0                      # an empty cell must not divide by zero
    return x


def test_cpm_rows_sum_to_target(counts):
    out = nz.cpm(counts, 1e4)
    sums = out.sum(axis=1)
    np.testing.assert_allclose(sums[1:], 1e4, rtol=1e-9)
    assert sums[0] == 0.0         # empty cell stays empty


def test_scale_rows_preserves_f32(counts):
    x32 = counts.astype(np.float32)
    assert nz.cpm(x32).dtype == np.float32
    assert nz.cpm(sparse.csr_matrix(x32)).dtype == np.float32
    assert nz.cpm(counts).dtype == np.float64       # f64 in, f64 out
    assert nz.cpm(counts.astype(np.int64)).dtype == np.float64


def test_normalize_total_median(counts):
    out = nz.normalize_total(counts)
    med = np.median(np.maximum(counts.sum(1), 1.0))
    np.testing.assert_allclose(out[1:].sum(axis=1),
                               np.full(29, med), rtol=1e-9)


@pytest.mark.parametrize('fn', [nz.cpm, nz.normalize_total,
                                nz.log1p, nz.sqrt, nz.normalize_log_cpm])
def test_sparse_preserving_family(counts, fn):
    csr = sparse.csr_matrix(counts)
    out = fn(csr)
    assert sparse.issparse(out), fn.__name__
    assert out.nnz <= csr.nnz + 1
    np.testing.assert_allclose(out.toarray(), np.asarray(fn(counts)),
                               rtol=1e-9, atol=1e-12)


@pytest.mark.parametrize('name', ['normalize_tmm', 'normalize_upper_quartile',
                                  'normalize_quantile', 'pearson_residuals'])
def test_dense_factor_methods_run(counts, name):
    out = getattr(nz, name)(sparse.csr_matrix(counts))
    assert out.shape == counts.shape
    assert np.isfinite(out).all()


def test_deseq_requires_all_nonzero_gene(counts):
    with pytest.raises(ValueError):
        nz.normalize_deseq(counts)      # 40% zeros: no all-nonzero gene
    dense = counts + 1.0                # now every gene is all-nonzero
    out = nz.normalize_deseq(dense)
    assert np.isfinite(out).all()


def test_zscore_matches_notebook_semantics(counts):
    out = nz.zscore(counts)
    keep = counts.std(axis=0) > 0
    np.testing.assert_allclose(out[:, keep].mean(axis=0), 0, atol=1e-12)
    np.testing.assert_allclose(out[:, keep].std(axis=0), 1, rtol=1e-9)
    assert (out[:, ~keep] == 0).all()


def test_agrees_with_sweep_implementations(counts):
    """The public functions reproduce the sweep harness's committed
    transforms (same math, possibly different fp association order)."""
    import os
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..',
                                    'examples'))
    sweep = pytest.importorskip('scmnc_motor_sweep')
    pairs = [
        (lambda x: nz.log1p(nz.cpm(x, 1e4)), sweep.CANDIDATES['logcpm_1e4']),
        (lambda x: nz.log1p(nz.normalize_total(x)),
         sweep.CANDIDATES['logcpm_median']),
        (nz.normalize_tmm, sweep.CANDIDATES['tmm_log']),
        (nz.normalize_upper_quartile, sweep.CANDIDATES['uq_log']),
        (nz.normalize_quantile, sweep.CANDIDATES['quantile_log']),
        (nz.pearson_residuals, sweep.CANDIDATES['pearson_resid']),
    ]
    for ours, theirs in pairs:
        np.testing.assert_allclose(np.asarray(ours(counts)),
                                   theirs(counts), rtol=1e-9, atol=1e-9)
