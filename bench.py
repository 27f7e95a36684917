"""Headline benchmark: SNARE-seq-class coupled-VAE training throughput,
plus the whole-pipeline scGLUE-shaped fit.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", "extra"}.
"extra" carries the second, pipeline-level metric (round-2 verdict item 2:
the train loop alone hid solver/distance/preprocessing wins): wall-clock of
a FULL fit_transform at the scGLUE shape (9190 x 28930 / 241757 — the
reference's largest committed benchmark, 52,557 s CPU,
time-and-memory.ipynb cell 33). Set JAMIE_BENCH_PIPELINE=0 to skip it
(the pipeline leg costs the fit wall-clock on one chip; the synthetic
dataset is generated once and disk-cached under ~/.cache/jamie_tpu_bench).

Baseline (BASELINE.md): the reference PyTorch-CPU training phase sustains
~6-17k cell-samples/s (batch 512 x batches/epoch over epoch time) on its
committed time-and-memory.ipynb runs; 17k/s is taken as the baseline so
vs_baseline is conservative. Config mirrors the SNARE-seq cell-lines
benchmark shape (~1k cells, RNA + ATAC with PCA-512 front end) — BASELINE.json
config 3 — and the reference defaults output_dim=32, batch_size=512,
pca_dim=[512,512].

Measured: cell-samples/s through the full jitted train loop (sampling, P/F
row-normalization, forward, 4-term loss, grad, clip, Adam) after the PCA
preprocessing, excluding compilation (warmup chunk discarded).
"""

import json
import os
import sys
import time

import numpy as np

BASELINE_CELLS_PER_SEC = 17_000.0
SCGLUE_REF_SECONDS = 52_557.4      # time-and-memory.ipynb cell 33 (CPU)


def make_snare_like(n=1047, d_rna=3000, d_atac=5000, seed=0):
    """Synthetic SNARE-seq-shaped paired data (cell lines, ~1k cells)."""
    rng = np.random.RandomState(seed)
    k = 16
    z = rng.randn(n, k).astype(np.float32)
    # 4 "cell line" clusters
    centers = rng.randn(4, k).astype(np.float32) * 2
    assign = rng.randint(0, 4, n)
    z += centers[assign]
    x_rna = np.maximum(z @ rng.randn(k, d_rna).astype(np.float32)
                       + 0.5 * rng.randn(n, d_rna).astype(np.float32), 0)
    x_atac = (z @ rng.randn(k, d_atac).astype(np.float32)
              + 0.5 * rng.randn(n, d_atac).astype(np.float32) > 0.5
              ).astype(np.float32)
    return [x_rna, x_atac], assign


def main():
    import threading

    from jamie_tpu.config import JamieConfig
    from jamie_tpu.models import CoupledVAE
    from jamie_tpu.preprocess import Preprocessor
    from jamie_tpu.train.trainer import JamieTrainer

    # Bring-up deadline: during an axon pool outage, backend setup hangs
    # indefinitely (>40 min observed) BEFORE any of the timed work — emit an
    # error record instead of hanging the whole bench run. Cancelled the
    # moment the first device op completes; the lock+flag keeps the
    # "ONE JSON line" contract if the timer fires at the cancel boundary
    # (Timer.cancel() cannot stop a _fire already running).
    bringup_lock = threading.Lock()
    bringup_settled = []

    def _bringup_fire():
        with bringup_lock:
            if bringup_settled:
                return
            bringup_settled.append('timer')
        print(json.dumps({
            'metric': 'snare_seq_train_cells_per_sec_per_chip',
            'value': 0.0, 'unit': 'cell-samples/s', 'vs_baseline': 0.0,
            'extra': {'error': 'device bring-up exceeded 1800s '
                               '(axon pool unavailable?)'}}), flush=True)
        os._exit(0)
    bringup = threading.Timer(1800, _bringup_fire)
    bringup.daemon = True
    bringup.start()
    import jax
    jax.block_until_ready(jax.numpy.ones(4) + 1)
    with bringup_lock:
        bringup_settled.append('main')
    bringup.cancel()

    data, labels = make_snare_like()
    n = data[0].shape[0]

    # rbg = TPU hardware RNG: dropout's threefry bits were 31% of the step
    # (0.608 -> 0.412 ms/step measured); scGEM quality unchanged
    cfg = JamieConfig(epoch_DNN=10_000, min_epochs=2500, batch_size=512,
                      log_DNN=100_000, use_early_stop=False,
                      epoch_chunk=200, prng_impl='rbg')

    # PCA-512 front end (reference default pca_dim=[512, 512])
    pres = [Preprocessor.fit(d, pca_dim=512) for d in data]
    transformed = [pre.transform(d) for pre, d in zip(pres, data)]

    # matmul-only bf16: MXU-rate matmuls, f32 activations/batchnorm/Adam —
    # quality-validated neutral on scGEM (RESULTS.md round 2). The loop is
    # otherwise optimizer/elementwise-bound (f32 781k vs bf16-matmul 822k
    # cell-samples/s measured; full-bf16 compute is SLOWER, 754k).
    model = CoupledVAE(tuple(x.shape[1] for x in transformed),
                       cfg.output_dim, dropout=cfg.dropout,
                       matmul_bf16=True)
    P = np.eye(n, dtype=np.float32)
    F = np.zeros((n, n), np.float32)
    trainer = JamieTrainer(cfg, model, transformed, P, F)
    # The prng scope applies cfg.prng_impl (rbg) while keys are created AND
    # while the chunk fn traces — fit() does this internally; driving
    # _chunk_fn directly requires entering it explicitly.
    with trainer._prng_scope():
        state = trainer.init_state()

        chunk_fn = trainer._chunk_fn(cfg.epoch_chunk)
        # Warmup: compile + first chunk
        state, _ = chunk_fn(state)
        import jax
        jax.block_until_ready(state.params)

        # Timed chunks
        n_timed_chunks = 5
        t0 = time.perf_counter()
        for _ in range(n_timed_chunks):
            state, _ = chunk_fn(state)
        jax.block_until_ready(state.params)
        dt = time.perf_counter() - t0

        # Achieved FLOPs / MFU from the compiled executable's own cost
        # analysis (XLA's flop count for one chunk), so the "train leg is
        # roofline-bound" claim is auditable from the artifact (VERDICT
        # round-4 item 7) rather than asserted from HBM arithmetic.
        train_tflops = None
        try:
            cost = trainer._chunk_cost_analysis(cfg.epoch_chunk)
            if cost and cost.get('flops'):
                train_tflops = cost['flops'] * n_timed_chunks / dt / 1e12
        except Exception:
            pass

    epochs = n_timed_chunks * cfg.epoch_chunk
    steps = epochs * trainer.len_dataloader
    cell_samples = steps * trainer.batch_size
    cells_per_sec = cell_samples / dt

    record = {
        'metric': 'snare_seq_train_cells_per_sec_per_chip',
        'value': round(cells_per_sec, 1),
        'unit': 'cell-samples/s',
        'vs_baseline': round(cells_per_sec / BASELINE_CELLS_PER_SEC, 2),
        'extra': {},
    }
    if train_tflops is not None:
        # v5e peak: 197 TFLOP/s bf16. The train loop is deliberately
        # MIXED precision (matmul-only bf16; activations/BN/Adam f32 —
        # full-bf16 measured SLOWER, RESULTS.md round 2) and its model is
        # ~4.3M params, so the loop is HBM/elementwise-bound by design;
        # the MFU figure makes that auditable, it is not expected to be
        # high (VERDICT round-4 item 7).
        record['extra']['train_achieved_tflops'] = round(train_tflops, 2)
        record['extra']['train_mfu_vs_v5e_bf16_peak'] = round(
            train_tflops / 197.0, 4)
    # Progress note on stderr so a pipeline-leg crash doesn't lose the
    # train metric from the log; stdout stays the single JSON line.
    print(json.dumps(record), file=sys.stderr, flush=True)
    if os.environ.get('JAMIE_BENCH_PIPELINE', '1') != '0':
        del trainer, state, model, transformed, pres, data
        # Deadline watchdog: the axon pool can wedge indefinitely
        # (device bring-up measured hanging >40 min during an outage);
        # if the pipeline leg exceeds the budget, emit the train metric
        # with an error note instead of hanging the whole bench run.
        import threading

        # The lock+flag keeps the "ONE JSON line" contract when the timer
        # fires just as the pipeline returns: whoever takes `settled` first
        # owns the output (Timer.cancel() cannot stop a _fire already
        # running).
        lock = threading.Lock()
        settled = []

        def _fire():
            with lock:
                if settled:
                    return
                settled.append('timer')
            record['extra'] = {
                'scglue_pipeline_error':
                    'timeout after 4500s (axon pool unavailable?)'}
            print(json.dumps(record), flush=True)
            os._exit(0)
        watchdog = threading.Timer(4500, _fire)
        watchdog.daemon = True
        watchdog.start()
        try:
            extra = scglue_pipeline_noise_controlled()
        except Exception as e:   # emit the train metric regardless
            extra = {'scglue_pipeline_error': repr(e)[:200]}
        with lock:
            if not settled:
                settled.append('main')
                record['extra'].update(extra)
        watchdog.cancel()
    print(json.dumps(record))


def synth_scglue(seed=0):
    """scGLUE-shaped synthetic pair (9190 x 28930 / 241757), generated and
    disk-cached by the SAME examples/synth.py generator time_and_memory.py
    uses — identical inputs make the two harnesses' scGLUE rows directly
    comparable (any difference is the axon pool's link/chip share, not data
    provenance), and the ~10 GB cache is stored once instead of twice.

    binarize1=0.05 (round 4): the ATAC modality is binary peaks z-scored
    per column, matching what the reference's time-and-memory.ipynb
    actually fed JAMIE (scanpy Chen-2019-ATAC -> preprocessing.scale).
    The round-3 continuous-Gaussian ATAC was unrepresentatively EXPENSIVE
    for the transfer-bound Distance phase (continuous data can only ship
    bf16; two-valued columns ship as packed bits, 14-16x fewer bytes).
    JAMIE_BENCH_ATAC=continuous restores the round-3 input for an
    input-variant A/B (the reported rows carry the variant tag — the two
    workloads are not wall-clock-comparable)."""
    sys.path.insert(0, os.path.join(
        os.path.dirname(os.path.abspath(__file__)), 'examples'))
    from synth import synthesize
    b1 = (None if os.environ.get('JAMIE_BENCH_ATAC') == 'continuous'
          else 0.05)
    return synthesize((9190, 28930), (9190, 241757), seed=seed,
                      binarize1=b1)


def scglue_pipeline_once(data):
    """One full fit_transform at the scGLUE shape; the reference's de-facto
    whole-pipeline benchmark (52,557 s CPU)."""
    from jamie_tpu import JAMIE
    from jamie_tpu.core.residency import (
        enable_encode_cache, reset_transfer_stats, transfer_stats,
    )

    # Disk-backed sources replay their link payloads across runs; the
    # host-encode scans were 84% of the Distance phase (RESULTS round 4)
    enable_encode_cache()
    reset_transfer_stats()
    t0 = time.perf_counter()
    jm = JAMIE(epoch_chunk=500, log_pd=2000, log_DNN=100_000,
               prng_impl='rbg', model_matmul_dtype='bfloat16')
    jm.fit_transform(dataset=data)
    seconds = time.perf_counter() - t0
    xfer = transfer_stats()
    return {
        'scglue_pipeline_seconds': round(seconds, 1),
        'scglue_pipeline_vs_ref_cpu': round(SCGLUE_REF_SECONDS / seconds, 1),
        'epochs_run': jm.epochs_run,
        # Per-phase split: Distance+Mapping are tunnel-transfer-bound and
        # the axon pool's link/chip share swings ~4x hour to hour (measured
        # 13-65 MB/s); the split shows which phases absorbed the noise.
        'phases': getattr(jm, 'phase_timings', {}),
        # Link bytes the dtype-aware residency actually shipped vs what the
        # round-3 always-bf16 build would have shipped for the same data —
        # the pool-noise-proof measure of the round-4 Distance-phase work
        # (VERDICT round-3 item 3) — plus the host-side read/encode split
        # so a slow Distance phase is attributable (disk vs CPU vs link).
        'upload_mb': round(xfer['bytes'] / 1e6, 1),
        'upload_mb_bf16_equiv': round(xfer['bf16_equiv_bytes'] / 1e6, 1),
        'host_read_s': round(xfer['read_s'], 1),
        'host_encode_s': round(xfer['encode_s'], 1),
    }


def scglue_pipeline_noise_controlled():
    """Median-of-N pipeline figure (VERDICT round-4 item 2): the axon
    pool's link/chip share swings ~4x hour to hour, and a single-sample
    artifact let the committed number (190x) and the README headline
    (335x) disagree by reader's choice. N runs back to back (default 3;
    JAMIE_BENCH_PIPELINE_REPS overrides, 1 keeps the old cost), report
    the MEDIAN as the headline plus the min/max band and every run's
    phase split. Run 1 is the cold-cache floor (XLA + encode caches may
    be cold); runs 2+ are warm — the median of 3 therefore leans warm,
    which is the steady-state number a user re-fitting real data sees."""
    reps = max(int(os.environ.get('JAMIE_BENCH_PIPELINE_REPS', '3')), 1)
    data = synth_scglue()
    runs = [scglue_pipeline_once(data) for _ in range(reps)]
    secs = sorted(r['scglue_pipeline_seconds'] for r in runs)
    med = secs[len(secs) // 2] if reps % 2 else 0.5 * (
        secs[len(secs) // 2 - 1] + secs[len(secs) // 2])
    out = {
        'scglue_pipeline_seconds': round(med, 1),
        'scglue_pipeline_vs_ref_cpu': round(SCGLUE_REF_SECONDS / med, 1),
        'scglue_pipeline_band_seconds': [secs[0], secs[-1]],
        'scglue_pipeline_band_vs_ref_cpu': [
            round(SCGLUE_REF_SECONDS / secs[-1], 1),
            round(SCGLUE_REF_SECONDS / secs[0], 1)],
        'scglue_pipeline_reps': reps,
        # Input variant (round-4 advisor): zb5 = binary ATAC z-scored per
        # column (binarize1=0.05, what the reference notebooks feed JAMIE);
        # JAMIE_BENCH_ATAC=continuous benches the round-3 continuous-
        # Gaussian ATAC instead — rows are only comparable within variant.
        'input_variant': os.environ.get('JAMIE_BENCH_ATAC', 'zb5'),
        'runs': runs,
    }
    return out


if __name__ == '__main__':
    main()
