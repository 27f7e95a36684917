"""Atlas-scale demo: 100k+ cells, data-parallel over the TPU mesh.

BASELINE.json config 5: "Atlas-scale 10x Multiome RNA+ATAC (100k+ cells)
sharded data-parallel across TPU mesh". The reference never ran at this
scale (its O(N^2) host pipeline peaks at 9.2k cells / 31.9 GB RAM,
SURVEY.md section 6). Here the N x N prior stays implicit ('identity'
sentinel), the dataset is HBM-resident, and on a multi-chip mesh batches
shard over the data axis.

Usage: python examples/atlas_scale.py [--cells 100000] [--epochs 100]
"""

import argparse
import faulthandler
import json
import signal
import time

import numpy as np

# timeout(1) kills with SIGTERM; dump the stack first so a killed run
# says WHERE it was (the 100k leg has been killed twice now). The
# python-level handler restores default disposition and re-raises so the
# process actually DIES (faulthandler.register alone swallows the signal
# — caught live: a SIGTERM'd atlas run dumped and kept training);
# faulthandler's C-level dump still fires even while blocked in a tunnel
# read, then chains here at the next bytecode.


def _term_after_dump(sig, frame):
    import os
    signal.signal(signal.SIGTERM, signal.SIG_DFL)
    os.kill(os.getpid(), signal.SIGTERM)


signal.signal(signal.SIGTERM, _term_after_dump)
faulthandler.register(signal.SIGTERM, all_threads=True, chain=True)


def make_multiome(n=100_000, d_rna=512, d_atac=512, seed=0):
    """PCA-space multiome-like data (atlas pipelines PCA first; generating
    post-PCA keeps the demo's memory footprint honest for the train loop)."""
    rng = np.random.RandomState(seed)
    k = 24
    z = rng.randn(n, k).astype(np.float32)
    centers = 2 * rng.randn(12, k).astype(np.float32)
    z += centers[rng.randint(0, 12, n)]
    rna = z @ rng.randn(k, d_rna).astype(np.float32) \
        + 0.5 * rng.randn(n, d_rna).astype(np.float32)
    atac = z @ rng.randn(k, d_atac).astype(np.float32) \
        + 0.5 * rng.randn(n, d_atac).astype(np.float32)
    return [rna, atac]


def main_sparse_data(args):
    """The full atlas story: raw-feature sparse CSR modalities into the
    public estimator — row-streamed PCA (never densified on host), landmark
    correspondence (auto past the dense solver's N^2 wall), implicit
    identity prior, HBM-resident post-PCA training. FOSCTTM is evaluated on
    a row subsample (the exact metric is itself O(N^2))."""
    import jax

    import os
    import sys

    from jamie_tpu import JAMIE
    from jamie_tpu.core.timing import device_memory_stats
    from jamie_tpu.evaluation import knn_label_transfer_accuracy, test_closer
    try:
        from synth import synthesize_sparse_labels, synthesize_sparse_pair
    except ImportError:
        sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
        from synth import synthesize_sparse_labels, synthesize_sparse_pair

    n = args.cells
    rna, atac = synthesize_sparse_pair(n, *args.features,
                                       density=args.density, seed=0)
    pca = min(512, min(args.features) // 2, n // 2)
    jm = JAMIE(epoch_DNN=args.epochs, min_epochs=args.epochs // 2,
               use_early_stop=False, batch_size=args.batch_size,
               pca_dim=(pca, pca), log_DNN=10 ** 9, epoch_chunk=20,
               corr_landmarks=min(args.landmarks, n),
               epoch_pd=args.epoch_pd,
               use_mesh=True if args.mesh else None)   # None = auto
    t0 = time.perf_counter()
    emb = jm.fit_transform(dataset=[rna, atac])
    fit_s = time.perf_counter() - t0

    t1 = time.perf_counter()
    f = test_closer(emb)     # exact at any N: row-blocked device FOSCTTM
    labels = synthesize_sparse_labels(n, seed=0)   # the latent's clusters
    # LTA: the reference's auto-k rule (20% of average class size) makes
    # k grow with N (k=16.7k at N=1M), and the kNN vote is O(N^2 k) —
    # past --metric-cells the vote runs on a uniform cell subsample with
    # the same protocol/auto-k as the smaller atlas rows (FOSCTTM above
    # stays exact at full N: it is comparison counting, no top_k).
    lta_cells = n
    if args.metric_cells and args.metric_cells < n:
        lta_cells = args.metric_cells
        sub = np.random.RandomState(0).choice(n, lta_cells, replace=False)
        emb_l = [np.asarray(e)[sub] for e in emb]
        labels_l = labels[sub]
    else:
        emb_l, labels_l = emb, labels
    lta, k = knn_label_transfer_accuracy(emb_l, [labels_l, labels_l])
    print(json.dumps({
        'cells': n,
        'features': list(args.features),
        'nnz_frac': round((rna.nnz + atac.nnz)
                          / (n * sum(args.features)), 4),
        'devices': len(jax.devices()),
        'fit_seconds': round(fit_s, 1),
        'phase_seconds': getattr(jm, 'phase_timings', None),
        # Mapping sub-split (Preprocessing = streamed PCA, Trainer setup =
        # residency + P/F operands, Training, Output = final embed) — the
        # Mapping phase dominates the atlas fits, so show where it goes
        'mapping_seconds': {k: round(float(v), 1) for k, v in getattr(
            jm, '_mapping_timings', {}).items()},
        'foscttm_exact': round(float(f), 6),
        'label_transfer_acc': round(float(lta), 4),
        'label_transfer_k': int(k),
        'label_transfer_cells': int(lta_cells),
        'metric_seconds': round(time.perf_counter() - t1, 1),
        'hbm': device_memory_stats(),
        'peak_rss_gb': _peak_rss_gb(),
        'transfer': {k: (round(v, 1) if isinstance(v, float)
                         else round(v / 1e6, 1))
                     for k, v in _xfer().items()},
    }))


def _peak_rss_gb():
    """Peak host RSS (GB) from the kernel's accounting — the number the
    round-4 OOM post-mortem cares about (python hit 131 GB pre-fix)."""
    try:
        import resource
        return round(resource.getrusage(
            resource.RUSAGE_SELF).ru_maxrss / 1e6, 2)
    except Exception:
        return None


def _xfer():
    from jamie_tpu.core.residency import transfer_stats
    return transfer_stats()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--cells', type=int, default=100_000)
    ap.add_argument('--epochs', type=int, default=100)
    ap.add_argument('--batch-size', type=int, default=512)
    ap.add_argument('--mesh', action='store_true',
                    help='shard over all visible devices')
    ap.add_argument('--sparse-prior', type=float, default=None, metavar='F',
                    help='partial prior: fraction F of cells matched, as a '
                         'SparseRows diagonal (hybrid sampling, no N^2)')
    ap.add_argument('--sparse-data', action='store_true',
                    help='raw-feature sparse CSR modalities through the '
                         'full estimator (streamed PCA + landmark F) '
                         'instead of the PCA-space trainer demo')
    ap.add_argument('--features', type=int, nargs=2, default=(20000, 40000),
                    metavar=('D_RNA', 'D_ATAC'),
                    help='raw feature widths for --sparse-data')
    ap.add_argument('--density', type=float, default=0.03,
                    help='nonzero fraction of the synthetic CSR modalities '
                         '(10x multiome RNA is ~5-10%%, ATAC ~1-3%%; the '
                         'million-cell demo uses 0.01 to bound host synth '
                         'time on this 1-core container)')
    ap.add_argument('--landmarks', type=int, default=2048,
                    help='landmark count for --sparse-data correspondence '
                         '(forced: the dense N^2 solver is the wall this '
                         'demo exists to avoid)')
    ap.add_argument('--epoch-pd', type=int, default=2000,
                    help='prime-dual iterations on the landmark subproblem')
    ap.add_argument('--metric-cells', type=int, default=None,
                    help='evaluate LTA on a uniform subsample of this many '
                         'cells (FOSCTTM stays exact at full N); the '
                         'million-cell demo uses 250000 — the same '
                         'protocol/auto-k as the 250k row')
    args = ap.parse_args()

    if args.sparse_data:
        return main_sparse_data(args)

    import jax
    from jamie_tpu.config import JamieConfig
    from jamie_tpu.core.mesh import create_mesh
    from jamie_tpu.core.timing import device_memory_stats
    from jamie_tpu.models import CoupledVAE
    from jamie_tpu.train.trainer import JamieTrainer

    data = make_multiome(args.cells)
    mesh = create_mesh() if args.mesh and len(jax.devices()) > 1 else None

    if args.sparse_prior is not None:
        from jamie_tpu.ops.sparse import SparseRows
        rng = np.random.RandomState(1)
        on = rng.choice(args.cells, int(args.sparse_prior * args.cells),
                        replace=False)
        P = SparseRows.from_coo(on, on, np.ones(len(on), np.float32),
                                (args.cells, args.cells))
    else:
        P = 'identity'

    cfg = JamieConfig(epoch_DNN=args.epochs, min_epochs=args.epochs // 2,
                      batch_size=args.batch_size, use_early_stop=False,
                      pca_dim=None, log_DNN=10 ** 9, epoch_chunk=20)
    model = CoupledVAE((data[0].shape[1], data[1].shape[1]), cfg.output_dim,
                       dropout=0.6)
    trainer = JamieTrainer(cfg, model, data, P, 'zeros', mesh=mesh)

    t0 = time.perf_counter()
    state = trainer.fit()
    fit_s = time.perf_counter() - t0
    steps = trainer.epochs_run * trainer.len_dataloader
    emb = trainer.final_embed(state)

    print(json.dumps({
        'cells': args.cells,
        'devices': len(jax.devices()),
        'sampling': trainer.sampling_method,
        'epochs': trainer.epochs_run,
        'fit_seconds': round(fit_s, 1),
        'cell_samples_per_sec': round(steps * trainer.batch_size / fit_s, 1),
        'embedding_shapes': [list(e.shape) for e in emb],
        'finite': bool(np.isfinite(emb[0]).all()),
        'hbm': device_memory_stats(),
    }))


if __name__ == '__main__':
    main()
