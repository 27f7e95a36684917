"""Phase-timing benchmark harness across the reference's dataset shapes.

Mirrors examples/notebooks/time-and-memory.ipynb: for each dataset
(cells x features per modality) run the full fit with section timing and
report the Distance / Correspondence / Mapping split. Reference CPU numbers
are in BASELINE.md; real datasets are replaced by spectrum-matched synthetic
data at identical shapes when the originals aren't present in the mount.

Usage: python examples/time_and_memory.py [--configs mmd,scmnc_motor,...]
"""

import argparse
import faulthandler
import json
import os
import time

import numpy as np

# Watchdog: if a TPU dispatch wedges (e.g. a stale tunnel claim), dump the
# stack and exit instead of hanging silently. Re-armed per config.
def _arm_watchdog(seconds=7200):
    faulthandler.cancel_dump_traceback_later()
    faulthandler.dump_traceback_later(seconds, exit=True)


_arm_watchdog()

# (name, (n0, f0), (n1, f1), reference_total_seconds)
CONFIGS = {
    'mmd': (('MMD-MA sim', (300, 2000), (300, 1000)), 111.5),
    'scmultisim': (('scMultiSim-1250', (500, 1250), (500, 3750)), 481.9),
    'scmnc_motor': (('scMNC-Motor', (1208, 1286), (1208, 29)), 526.5),
    'scmnc_visual': (('scMNC-Visual', (3654, 1302), (3654, 39)), 5629.7),
    # DM_rep4's ATAC arm is binary in the reference too (BABEL snareseq
    # peaks; notebooks/time-and-memory.ipynb cell 21 feeds
    # preprocessing.scale of it) — same representative treatment as scGLUE
    'dm_rep4': (('DM_rep4 BABEL', (4301, 34861), (4301, 85596)), 9565.1,
                0.05),
    'brainchromatin': (('BrainChromatin', (8981, 34104), (8981, 19836)),
                       49372.7),
    # scGLUE's ATAC arm models the REAL input: binary peaks z-scored per
    # column (notebooks/scGLUE.ipynb feeds preprocessing.scale(ATAC) to
    # JAMIE) — two-valued columns the dtype-aware link format ships as
    # packed bits. The round-3 continuous variant remains reachable via
    # synthesize(..., binarize1=None) for A/B.
    'scglue': (('scGLUE', (9190, 28930), (9190, 241757)), 52557.4, 0.05),
}


# Shared generator/cache with bench.py's pipeline leg
try:
    from synth import synthesize
except ImportError:   # imported as a module rather than run as a script
    import sys
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from synth import synthesize


def run_config(name, shape0, shape1, ref_total, epoch_dnn=10000,
               min_epochs=2500, binarize1=None):
    from jamie_tpu import JAMIE
    from jamie_tpu.core.residency import reset_transfer_stats, transfer_stats

    _arm_watchdog()
    dataset = synthesize(shape0, shape1, binarize1=binarize1)
    from jamie_tpu.core.residency import enable_encode_cache
    enable_encode_cache()   # replay link payloads for disk-backed sources
    reset_transfer_stats()
    jm = JAMIE(output_dim=32, batch_size=512, pca_dim=(512, 512),
               epoch_DNN=epoch_dnn, min_epochs=min_epochs,
               use_early_stop=True, log_DNN=100000,
               distance_mode='euclidean', epoch_chunk=500,
               prng_impl='rbg',  # hw RNG: dropout bits were 31% of a step
               model_matmul_dtype='bfloat16')  # quality-neutral (RESULTS.md)
    t0 = time.perf_counter()
    jm.fit_transform(dataset=dataset)
    total = time.perf_counter() - t0
    return {
        'dataset': name,
        'shapes': [list(shape0), list(shape1)],
        # Input variant (round-4 advisor): rows are only wall-clock
        # comparable within the same variant — zbN = binary ATAC z-scored
        # per column at density N%, 'continuous' = round-3 Gaussian arm.
        'input_variant': (f'zb{int(binarize1 * 100)}' if binarize1
                          else 'continuous'),
        'total_seconds': round(total, 1),
        'reference_cpu_seconds': ref_total,
        'speedup': round(ref_total / total, 1),
        'epochs_run': jm.epochs_run,
        # Distance / Correspondence / Mapping split (the axon pool's
        # link/chip share swings hour-to-hour; the split shows which
        # phase absorbed the noise)
        'phases': getattr(jm, 'phase_timings', {}),
        # Link bytes the dtype-aware residency shipped vs the round-3
        # always-bf16 equivalent — the pool-noise-proof transfer measure —
        # plus the host read/encode seconds behind them
        'upload_mb': round(transfer_stats()['bytes'] / 1e6, 1),
        'upload_mb_bf16_equiv': round(
            transfer_stats()['bf16_equiv_bytes'] / 1e6, 1),
        'host_read_s': round(transfer_stats()['read_s'], 1),
        'host_encode_s': round(transfer_stats()['encode_s'], 1),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--configs', default=','.join(CONFIGS))
    ap.add_argument('--epoch-dnn', type=int, default=10000)
    ap.add_argument('--min-epochs', type=int, default=2500)
    args = ap.parse_args()

    # One-time device/tunnel initialization happens on the first dispatch
    # (~minutes through a remote TPU tunnel); pay it before the clock starts
    # so per-dataset numbers measure the pipeline, not PJRT bring-up.
    import jax
    import jax.numpy as jnp
    t0 = time.perf_counter()
    # np.asarray, not just block_until_ready: the first device->host VALUE
    # fetch is its own (minutes-scale, erratic) tunnel bring-up cost
    np.asarray(jnp.ones((8, 128)) @ jnp.ones((128, 8)))
    print(f'device init: {time.perf_counter() - t0:.1f}s')

    results = []
    for key in args.configs.split(','):
        cfg = CONFIGS[key.strip()]
        (name, s0, s1), ref_total = cfg[0], cfg[1]
        binarize1 = cfg[2] if len(cfg) > 2 else None
        print(f'=== {name} {s0} {s1} ===')
        res = run_config(name, s0, s1, ref_total,
                         epoch_dnn=args.epoch_dnn,
                         min_epochs=args.min_epochs,
                         binarize1=binarize1)
        print(json.dumps(res))
        results.append(res)
    print(json.dumps(results, indent=2))


if __name__ == '__main__':
    main()
