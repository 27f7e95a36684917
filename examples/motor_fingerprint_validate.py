"""Validate the motor-fingerprint harness against the reference solver.

The fingerprint sweep (motor_provenance_fingerprint.py) found NO
candidate transform whose telemetry matches scMNC-Motor.ipynb's printed
trace — but that conclusion is only sound if OUR prime_dual reproduces
the REFERENCE implementation's telemetry digits on identical inputs. No
mounted dataset has both full inputs and a printed reference trace, so
this harness validates implementation parity directly: run the
reference's own torch Prime_Dual (reference/jamie/jamie.py:314-414,
torch-cpu) and our solver on the SAME Kx/Ky, print both traces.

CPU-only, run anywhere:
  PYTHONPATH=/root/repo:/root/repo/examples:/root/.axon_site \
      python -u examples/motor_fingerprint_validate.py --epochs 500
"""

import argparse
import contextlib
import io
import json
import re
import sys

import numpy as np


def _stub(name, **attrs):
    import types
    m = types.ModuleType(name)
    for k, v in attrs.items():
        setattr(m, k, v)
    sys.modules[name] = m
    return m


def reference_trace(Kx, Ky, dx, dy, epochs, log_pd):
    """Import the reference jamie with stubs for its unused-here heavy
    deps (anndata/unioncom/umap are absent from this image; Prime_Dual
    touches none of them)."""
    import torch  # noqa: F401  (reference needs it)
    for name in ('anndata', 'umap'):
        if name not in sys.modules:
            try:
                __import__(name)
            except ImportError:
                _stub(name, UMAP=object, AnnData=object)
    if 'unioncom' not in sys.modules:
        try:
            __import__('unioncom')
        except ImportError:
            class _UnionComStub:
                """unioncom 0.4.0 __init__ surface: store kwargs as
                attributes over the pinned defaults JAMIE's Prime_Dual
                reads (jamie_tpu/config.py mirrors the same values)."""

                def __init__(self, **kw):
                    defaults = dict(integration_type='MultiOmics',
                                    epoch_pd=2000, epoch_DNN=200,
                                    epsilon=0.001, lr=0.001,
                                    batch_size=100, rho=10, log_DNN=10,
                                    log_pd=500, manual_seed=666, delay=0,
                                    beta=1, perplexity=30, kmax=40,
                                    output_dim=32, distance_mode='geodesic',
                                    project_mode='tsne', test=False)
                    defaults.update(kw)
                    for k, v in defaults.items():
                        setattr(self, k, v)

            pkg = _stub('unioncom')
            pkg.UnionCom = _stub('unioncom.UnionCom',
                                 UnionCom=_UnionComStub)
            _stub('unioncom.utils',
                  geodesic_distances=lambda *a, **k: None,
                  init_random_seed=lambda *a, **k: None,
                  joint_probabilities=lambda *a, **k: None)
    # Load jamie/jamie.py WITHOUT the package __init__ (which pulls the
    # evaluation module and its absent plotting deps): synthesize the
    # package context so the module's relative imports resolve.
    import importlib.util
    import types
    if 'jamie.jamie' not in sys.modules:
        pkg = types.ModuleType('jamie')
        pkg.__path__ = ['/root/reference/jamie']
        sys.modules['jamie'] = pkg
        spec = importlib.util.spec_from_file_location(
            'jamie.jamie', '/root/reference/jamie/jamie.py')
        mod = importlib.util.module_from_spec(spec)
        sys.modules['jamie.jamie'] = mod
        spec.loader.exec_module(mod)
    RefJAMIE = sys.modules['jamie.jamie'].JAMIE

    jm = RefJAMIE(epoch_pd=epochs, log_pd=log_pd)
    jm.device = 'cpu'
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        jm.Prime_Dual([Kx.copy(), Ky.copy()], dx=dx, dy=dy, verbose=True)
    return _parse(buf.getvalue(), epochs)


def our_trace(Kx, Ky, dx, dy, epochs, log_pd, precision):
    import jax
    jax.config.update('jax_platforms', 'cpu')
    from jamie_tpu.solvers.prime_dual import prime_dual
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        prime_dual(Kx, Ky, dx=dx, dy=dy, epoch_pd=epochs, log_pd=log_pd,
                   verbose=True, precision=precision)
    return _parse(buf.getvalue(), epochs)


def _parse(text, epochs):
    out = {}
    for m in re.finditer(r'epoch:\[(\d+)/%d\] err:([0-9.]+) '
                         r'alpha:([0-9.]+)' % epochs, text):
        out[int(m.group(1))] = (float(m.group(2)), float(m.group(3)))
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--epochs', type=int, default=500)
    ap.add_argument('--log-pd', type=int, default=100)
    ap.add_argument('--candidate', default='cpm1e4_log1p')
    ap.add_argument('--precision', default='highest')
    args = ap.parse_args()

    from sklearn import preprocessing
    from sklearn.metrics import pairwise_distances

    from motor_provenance_fingerprint import candidates, load_raw

    X, E = load_raw()
    E = preprocessing.scale(E, axis=0)
    E[np.isnan(E)] = 0
    Ky = pairwise_distances(E, metric='euclidean')

    Xt = candidates()[args.candidate](X.copy())
    Xt = preprocessing.scale(Xt, axis=0)
    Xt[np.isnan(Xt)] = 0
    Kx = pairwise_distances(Xt, metric='euclidean')
    dx, dy = X.shape[1], E.shape[1]

    ours = our_trace(Kx.astype(np.float32), Ky.astype(np.float32),
                     dx, dy, args.epochs, args.log_pd, args.precision)
    print(json.dumps({'ours': {k: list(v) for k, v in sorted(ours.items())},
                      'candidate': args.candidate}), flush=True)
    ref = reference_trace(Kx.astype(np.float64), Ky.astype(np.float64),
                          dx, dy, args.epochs, args.log_pd)
    print(json.dumps({'reference_torch': {k: list(v)
                                          for k, v in sorted(ref.items())}}),
          flush=True)
    common = sorted(set(ours) & set(ref))
    devs = [abs(ours[e][0] - ref[e][0]) / max(ref[e][0], 1e-9)
            for e in common] + \
           [abs(ours[e][1] - ref[e][1]) / max(ref[e][1], 1e-9)
            for e in common]
    print(json.dumps({'max_rel_dev_ours_vs_reference_impl':
                      round(float(np.max(devs)) if devs else float('nan'), 6),
                      'epochs_compared': common}), flush=True)


if __name__ == '__main__':
    main()
