"""Dense vs landmark correspondence A/B (VERDICT round-3 item 3 stretch).

At a size where both solvers run (default 4,000 cells), fit the full JAMIE
pipeline with (a) the dense prime-dual F and (b) the landmark LowRankF at
several L, and compare integration quality (FOSCTTM/LTA) and wall time.
Then (--atlas) run the landmark path at a size where the dense solver
CANNOT exist (100k cells: five dense (N,N) f32 state arrays = 200 GB) and
record wall-clock + peak state.

Usage:
  PYTHONPATH=/root/repo:/root/.axon_site python -u examples/landmark_ab.py \
      [--cells 4000] [--landmarks 512,1024,2048] [--atlas] [--atlas-cells 100000]
"""

import argparse
import json
import time

import numpy as np


def synth(n, f0=600, f1=400, latent=12, clusters=6, seed=0):
    rng = np.random.RandomState(seed)
    z = rng.randn(n, latent).astype(np.float32)
    centers = rng.randn(clusters, latent).astype(np.float32) * 2.5
    labels = rng.randint(0, clusters, n)
    z += centers[labels]
    x = (z @ rng.randn(latent, f0) + 0.3 * rng.randn(n, f0)).astype(np.float32)
    y = (z @ rng.randn(latent, f1) + 0.3 * rng.randn(n, f1)).astype(np.float32)
    return [x, y], labels


def run(dataset, labels, tag, **kwargs):
    from jamie_tpu import JAMIE
    t0 = time.perf_counter()
    jm = JAMIE(epoch_DNN=3000, min_epochs=1000, batch_size=512,
               log_DNN=100_000, log_pd=10_000, epoch_chunk=500,
               distance_mode='euclidean', prng_impl='rbg', **kwargs)
    emb = jm.fit_transform(dataset=dataset)
    res = {
        'tag': tag,
        'seconds': round(time.perf_counter() - t0, 1),
        'foscttm': round(float(jm.test_closer(emb)), 5),
        'lta': round(float(jm.test_LabelTA(emb, [labels, labels])), 4),
    }
    print(json.dumps(res), flush=True)
    return res


def selection_ab(n=1200, L=256, epoch_pd=1500, seed=666):
    """uniform vs fps landmark selection, scored by the mean rank of each
    cell's TRUE match within its row of the assembled landmark F (aligned
    synthetic, so row i's truth is column i; 0 = best of n). Measured on
    CPU at n=1200, L=256: dense-solver-at-equal-iterations 732 (worse than
    random — the N x N problem needs its full 20k iterations), uniform
    48.0, fps 35.6 — the fps cover is ~1.35x better and is the default."""
    from jamie_tpu.solvers.landmark import landmark_correspondence

    dataset, labels = synth(n, f0=300, f1=200)
    out = {'n': n, 'L': L}
    for sel in ('uniform', 'fps'):
        t0 = time.perf_counter()
        F = landmark_correspondence(
            dataset[0], dataset[1], n_landmarks=L, selection=sel,
            seed=seed, epoch_pd=epoch_pd, log_pd=100_000).to_dense()
        F = np.asarray(F)
        ranks = (F > F[np.arange(n), np.arange(n)][:, None]).sum(1)
        out[sel] = {'mean_true_match_rank': round(float(ranks.mean()), 2),
                    'seconds': round(time.perf_counter() - t0, 1)}
        print(json.dumps({sel: out[sel]}), flush=True)
    print(json.dumps(out))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--cells', type=int, default=4000)
    ap.add_argument('--landmarks', type=str, default='512,1024,2048')
    ap.add_argument('--atlas', action='store_true')
    ap.add_argument('--atlas-cells', type=int, default=100_000)
    ap.add_argument('--selection-ab', action='store_true')
    args = ap.parse_args()

    if args.selection_ab:
        selection_ab(n=args.cells if args.cells != 4000 else 1200)
        return

    if args.atlas:
        # No dense leg: the point is that this size has no dense option.
        dataset, labels = synth(args.atlas_cells, f0=256, f1=192)
        run(dataset, labels, f'landmark-atlas-{args.atlas_cells}',
            use_f_tilde=True, f_top_k=32)
        return

    dataset, labels = synth(args.cells)
    out = [run(dataset, labels, 'dense')]
    for L in (int(s) for s in args.landmarks.split(',')):
        out.append(run(dataset, labels, f'landmark-{L}', corr_landmarks=L))
    out.append(run(dataset, labels, 'no-F', use_f_tilde=False))
    print(json.dumps({'table': out}, indent=1))


if __name__ == '__main__':
    main()
