"""Tests for the minimal .rda reader (jamie_tpu/rdata.py)."""

import os

import numpy as np
import pytest

from jamie_tpu.rdata import load_rda

MOTOR = ('/root/reference/examples/data/scMNC/mouse_motor_cortex/data/'
         'motor_data_filtered.rda')


@pytest.mark.skipif(not os.path.exists(MOTOR), reason='reference mount absent')
def test_load_motor_rda():
    d = load_rda(MOTOR)
    assert set(d) >= {'gdata', 'edata', 'meta'}
    g = d['gdata']['matrix']
    assert g.shape == (1286, 1208)            # genes x cells (R column-major)
    assert np.isfinite(g).all()
    rows = np.asarray(d['gdata']['dimnames'][0])
    assert rows[0] == 'Cbln2'                 # spot-check dimnames decoding
    e = d['edata']
    feat = [k for k in e if k != '__row_names__']
    assert len(feat) == 29
    assert all(len(np.atleast_1d(e[k])) == 1208 for k in feat)
    meta = d['meta']
    assert 'RNA family' in meta and 'Cell' in meta


def test_load_rda_roundtrip_types(tmp_path):
    """Hand-built RDX3 stream: real vector with dim, int vector, strings."""
    import gzip
    import struct

    def u32(x):
        return struct.pack('>i', x)

    def charsxp(s):
        b = s.encode()
        return u32(9 | (1 << 12)) + u32(len(b)) + b

    def strsxp(strs):
        return u32(16) + u32(len(strs)) + b''.join(charsxp(s) for s in strs)

    def realsxp(vals, attr=b''):
        flags = 14 | (0x200 if attr else 0)
        out = u32(flags) + u32(len(vals))
        out += b''.join(struct.pack('>d', v) for v in vals)
        return out + attr

    def sym(name):
        return u32(1) + charsxp(name)

    # attributes pairlist: dim = c(2, 3)
    dim_attr = (u32(2 | 0x400) + sym('dim')
                + u32(13) + u32(2) + u32(2) + u32(3)
                + u32(254))
    body = (
        u32(2 | 0x400) + sym('m') + realsxp([1, 2, 3, 4, 5, 6], dim_attr)
        + u32(2 | 0x400) + sym('s') + strsxp(['a', 'b'])
        + u32(254)
    )
    stream = (b'RDX3\nX\n' + u32(3) + u32(0x30400) + u32(0x30000)
              + u32(5) + b'UTF-8' + body)
    p = tmp_path / 'toy.rda'
    p.write_bytes(gzip.compress(stream))
    d = load_rda(str(p))
    np.testing.assert_allclose(d['m'], np.array([[1, 3, 5], [2, 4, 6]]))
    assert d['s'] == ['a', 'b']
