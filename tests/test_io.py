"""IO readers: native h5ad (anndata on-disk format) and 10x CellRanger h5.

Files are handcrafted with h5py following the public anndata format spec
(the encodings scGLUE.ipynb cell 3's scanpy.read_h5ad consumes) so the
tests pin the layout, not an anndata install.
"""

import numpy as np
import pytest

h5py = pytest.importorskip('h5py')

from jamie_tpu.io import (
    H5adData, load_matrix, read_10x_h5, read_10x_mtx, read_h5ad,
)


def _write_csr(parent, name, mat, fmt='csr'):
    from scipy import sparse
    m = sparse.csr_matrix(mat) if fmt == 'csr' else sparse.csc_matrix(mat)
    g = parent.create_group(name)
    g.attrs['encoding-type'] = f'{fmt}_matrix'
    g.attrs['encoding-version'] = '0.1.0'
    g.attrs['shape'] = mat.shape
    g.create_dataset('data', data=m.data)
    g.create_dataset('indices', data=m.indices)
    g.create_dataset('indptr', data=m.indptr)


def _write_obs(f, cell_types):
    obs = f.create_group('obs')
    obs.attrs['encoding-type'] = 'dataframe'
    obs.attrs['_index'] = '_index'
    obs.create_dataset(
        '_index', data=[f'cell{i}'.encode() for i in range(len(cell_types))])
    cat = obs.create_group('cell_type')
    cat.attrs['encoding-type'] = 'categorical'
    cats = sorted(set(cell_types))
    cat.create_dataset('categories', data=[c.encode() for c in cats])
    cat.create_dataset('codes', data=[cats.index(c) for c in cell_types])
    obs.create_dataset('depth', data=np.arange(len(cell_types)) * 10.0)


def _make_h5ad(path, X, fmt='dense', cell_types=('a', 'b', 'a', 'b')):
    with h5py.File(path, 'w') as f:
        if fmt == 'dense':
            f.create_dataset('X', data=X)
        else:
            _write_csr(f, 'X', X, fmt)
        _write_obs(f, list(cell_types))
        var = f.create_group('var')
        var.attrs['_index'] = '_index'
        var.create_dataset(
            '_index', data=[f'g{j}'.encode() for j in range(X.shape[1])])
        var.create_dataset(
            'name', data=[f'gene{j}'.encode() for j in range(X.shape[1])])
        layers = f.create_group('layers')
        layers.create_dataset('doubled', data=X * 2)


@pytest.fixture
def X():
    rng = np.random.RandomState(0)
    mat = rng.rand(4, 5).astype(np.float32)
    mat[mat < 0.4] = 0
    return mat


@pytest.mark.parametrize('fmt', ['dense', 'csr', 'csc'])
def test_read_h5ad_matrix_encodings(tmp_path, X, fmt):
    p = str(tmp_path / 'a.h5ad')
    _make_h5ad(p, X, fmt)
    ad = read_h5ad(p)
    assert isinstance(ad, H5adData)
    np.testing.assert_allclose(ad.X, X, rtol=1e-6)
    assert ad.X.dtype == np.float32
    assert list(ad.obs_names) == ['cell0', 'cell1', 'cell2', 'cell3']
    assert list(ad.var_names) == ['g0', 'g1', 'g2', 'g3', 'g4']
    # the scGLUE.ipynb cell-3 access patterns: obs.cell_type + var.name
    assert list(ad.obs['cell_type']) == ['a', 'b', 'a', 'b']
    assert list(ad.var['name']) == [f'gene{j}' for j in range(5)]
    np.testing.assert_allclose(ad.obs['depth'], [0., 10., 20., 30.])


def test_read_h5ad_sparse_output_and_layer(tmp_path, X):
    p = str(tmp_path / 'a.h5ad')
    _make_h5ad(p, X, 'csc')
    ad = read_h5ad(p, dense=False)
    assert hasattr(ad.X, 'toarray')
    np.testing.assert_allclose(ad.X.toarray(), X, rtol=1e-6)
    ad2 = read_h5ad(p, layer='doubled')
    np.testing.assert_allclose(ad2.X, X * 2, rtol=1e-6)


def test_read_h5ad_legacy_record_obs(tmp_path, X):
    p = str(tmp_path / 'legacy.h5ad')
    with h5py.File(p, 'w') as f:
        f.create_dataset('X', data=X)
        rec = np.zeros(4, dtype=[('index', 'S8'), ('cell_type', 'S4')])
        rec['index'] = [f'c{i}'.encode() for i in range(4)]
        rec['cell_type'] = [b'x', b'y', b'x', b'y']
        f.create_dataset('obs', data=rec)
    ad = read_h5ad(p)
    assert list(ad.obs_names) == ['c0', 'c1', 'c2', 'c3']
    assert list(ad.obs['cell_type']) == ['x', 'y', 'x', 'y']
    assert list(ad.var_names) == [0, 1, 2, 3, 4]


def test_read_h5ad_index_fallbacks(tmp_path, X):
    """pre-0.7 group obs: index dataset named 'index' with no _index attr;
    and a no-index group falls back to positional names sized by a
    categorical column's codes."""
    p = str(tmp_path / 'old.h5ad')
    with h5py.File(p, 'w') as f:
        f.create_dataset('X', data=X)
        obs = f.create_group('obs')
        obs.create_dataset('index', data=[f'c{i}'.encode() for i in range(4)])
        obs.create_dataset('score', data=np.arange(4.0))
    ad = read_h5ad(p)
    assert list(ad.obs_names) == ['c0', 'c1', 'c2', 'c3']
    assert 'index' not in ad.obs and 'score' in ad.obs

    p2 = str(tmp_path / 'noindex.h5ad')
    with h5py.File(p2, 'w') as f:
        f.create_dataset('X', data=X)
        obs = f.create_group('obs')
        cat = obs.create_group('grp')
        cat.create_dataset('categories', data=[b'a', b'b'])
        cat.create_dataset('codes', data=[0, 1, 0, 1])
    ad2 = read_h5ad(p2)
    assert list(ad2.obs_names) == [0, 1, 2, 3]
    assert list(ad2.obs['grp']) == ['a', 'b', 'a', 'b']


def test_read_h5ad_nan_code_and_column_filter(tmp_path, X):
    p = str(tmp_path / 'a.h5ad')
    _make_h5ad(p, X)
    with h5py.File(p, 'r+') as f:
        codes = f['obs/cell_type/codes']
        codes[1] = -1                       # pandas NaN category
    ad = read_h5ad(p, obs_columns=['cell_type'])
    assert ad.obs['cell_type'][1] is None
    assert 'depth' not in ad.obs


def test_load_matrix_h5ad_path(tmp_path, X):
    p = str(tmp_path / 'a.h5ad')
    _make_h5ad(p, X, 'csr')
    out = load_matrix(p)
    np.testing.assert_allclose(out, X, rtol=1e-6)
    assert out.dtype == np.float32


def _make_10x_v3(path, X):
    from scipy import sparse
    csc = sparse.csc_matrix(X.T)            # genes x cells, CSC as 10x ships
    with h5py.File(path, 'w') as f:
        g = f.create_group('matrix')
        g.create_dataset('data', data=csc.data)
        g.create_dataset('indices', data=csc.indices)
        g.create_dataset('indptr', data=csc.indptr)
        g.create_dataset('shape', data=np.array(csc.shape))
        g.create_dataset(
            'barcodes', data=[f'BC{i}'.encode() for i in range(X.shape[0])])
        feats = g.create_group('features')
        feats.create_dataset(
            'name', data=[f'gene{j}'.encode() for j in range(X.shape[1])])


def test_read_10x_h5_v3(tmp_path, X):
    p = str(tmp_path / 'filtered.h5')
    _make_10x_v3(p, X)
    mat, barcodes, names = read_10x_h5(p)
    np.testing.assert_allclose(mat, X, rtol=1e-6)   # back to cells x genes
    assert list(barcodes) == [f'BC{i}' for i in range(4)]
    assert list(names) == [f'gene{j}' for j in range(5)]


def test_read_10x_mtx_triplet(tmp_path, X):
    import gzip

    from scipy import io as sio, sparse as sp
    d = tmp_path / 'filtered_feature_bc_matrix'
    d.mkdir()
    coo = sp.coo_matrix(X.T)                  # genes x cells, as 10x ships
    with gzip.open(d / 'matrix.mtx.gz', 'wb') as fh:
        sio.mmwrite(fh, coo)
    with gzip.open(d / 'barcodes.tsv.gz', 'wt') as fh:
        fh.write(''.join(f'BC{i}\n' for i in range(X.shape[0])))
    with gzip.open(d / 'features.tsv.gz', 'wt') as fh:
        fh.write(''.join(f'ENSG{j}\tgene{j}\tGene Expression\n'
                         for j in range(X.shape[1])))
    mat, barcodes, names = read_10x_mtx(str(d))
    assert mat.format == 'csr'
    np.testing.assert_allclose(mat.toarray(), X, rtol=1e-6)
    assert list(barcodes) == [f'BC{i}' for i in range(4)]
    assert list(names) == [f'gene{j}' for j in range(5)]


def test_read_10x_h5_v2_genome_group(tmp_path, X):
    from scipy import sparse
    csc = sparse.csc_matrix(X.T)
    p = str(tmp_path / 'v2.h5')
    with h5py.File(p, 'w') as f:
        g = f.create_group('GRCh38')
        g.create_dataset('data', data=csc.data)
        g.create_dataset('indices', data=csc.indices)
        g.create_dataset('indptr', data=csc.indptr)
        g.create_dataset('shape', data=np.array(csc.shape))
        g.create_dataset('barcodes', data=[b'B0', b'B1', b'B2', b'B3'])
        g.create_dataset('genes', data=[f'ENSG{j}'.encode() for j in range(5)])
        g.create_dataset(
            'gene_names', data=[f'gene{j}'.encode() for j in range(5)])
    mat, barcodes, names = read_10x_h5(p, dense=False)
    np.testing.assert_allclose(mat.toarray(), X, rtol=1e-6)
    assert list(names) == [f'gene{j}' for j in range(5)]
    with pytest.raises(ValueError):
        with h5py.File(p, 'r+') as f:
            f.create_group('mm10_dummy')['x'] = 1
        read_10x_h5(p)
