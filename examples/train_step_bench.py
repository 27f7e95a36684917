"""Train-step ablation bench: where does the 0.41 ms step go, and does a
fused/flattened optimizer beat optax's default lowering?

Round-2 RESULTS split the bench-config step (~0.412 ms with rbg+donation+
matmul-bf16) into Adam+clip ~0.11 ms, model matmuls ~0.07 ms, and the rest
(batchnorm/sampling/gathers/backward). VERDICT round-2 item 4 asks for an
honest A/B of a fused optimizer pass vs XLA's own fusion.

Ablations (all on the bench config, 5 timed chunks of 200 epochs each):
  base        optax.chain(clip_by_global_norm(1), adam)   [round-2 shipped]
  flat        optax.flatten(...) — one concatenated parameter vector, so the
              clip + moment + update chain runs as a few big fused
              elementwise kernels instead of ~26 small per-tensor ones
  fused       jamie_tpu.ops.ab_archive.clip_adam (clip fold-in + single-pass
              Adam), when available

Usage: PYTHONPATH=/root/repo:/root/.axon_site python -u examples/train_step_bench.py
"""

import json
import time

import numpy as np


def run_variant(name, tx_factory, data, cfg_kwargs):
    import jax
    from jamie_tpu.config import JamieConfig
    from jamie_tpu.models import CoupledVAE
    from jamie_tpu.train.trainer import JamieTrainer

    cfg = JamieConfig(**cfg_kwargs)
    n = data[0].shape[0]
    model = CoupledVAE(tuple(x.shape[1] for x in data), cfg.output_dim,
                       dropout=cfg.dropout, matmul_bf16=True)
    P = np.eye(n, dtype=np.float32)
    F = np.zeros((n, n), np.float32)
    trainer = JamieTrainer(cfg, model, data, P, F)
    if tx_factory is not None:
        trainer.tx = tx_factory(cfg)
    with trainer._prng_scope():
        state = trainer.init_state()
        chunk_fn = trainer._chunk_fn(cfg.epoch_chunk)
        state, _ = chunk_fn(state)  # warmup/compile
        jax.block_until_ready(state.params)
        n_chunks = 5
        t0 = time.perf_counter()
        for _ in range(n_chunks):
            state, _ = chunk_fn(state)
        jax.block_until_ready(state.params)
        dt = time.perf_counter() - t0
    steps = n_chunks * cfg.epoch_chunk * trainer.len_dataloader
    ms_per_step = dt / steps * 1e3
    cells_per_sec = steps * trainer.batch_size / dt
    print(json.dumps({'variant': name, 'ms_per_step': round(ms_per_step, 4),
                      'cells_per_sec': round(cells_per_sec, 1)}))
    return cells_per_sec


def main():
    import optax

    # Same synthetic SNARE-seq-shaped data as bench.py
    import sys
    sys.path.insert(0, '/root/repo')
    from bench import make_snare_like
    from jamie_tpu.preprocess import Preprocessor

    data, _ = make_snare_like()
    pres = [Preprocessor.fit(d, pca_dim=512) for d in data]
    transformed = [pre.transform(d) for pre, d in zip(pres, data)]

    cfg_kwargs = dict(epoch_DNN=10_000, min_epochs=2500, batch_size=512,
                      log_DNN=100_000, use_early_stop=False,
                      epoch_chunk=200, prng_impl='rbg')

    # 'base' must build the per-tensor chain EXPLICITLY: the trainer's
    # default is now the flattened optimizer (the winner of this very A/B),
    # so tx_factory=None would measure flat-vs-flat.
    run_variant(
        'base',
        lambda cfg: optax.chain(
            optax.clip_by_global_norm(1.0),
            optax.adam(cfg.model_lr, b1=0.9, b2=0.999, eps=1e-8)),
        transformed, cfg_kwargs)
    run_variant(
        'flat',
        lambda cfg: optax.flatten(optax.chain(
            optax.clip_by_global_norm(1.0),
            optax.adam(cfg.model_lr, b1=0.9, b2=0.999, eps=1e-8))),
        transformed, cfg_kwargs)
    try:
        from jamie_tpu.ops.ab_archive import clip_adam
        run_variant('fused', lambda cfg: clip_adam(cfg.model_lr),
                    transformed, cfg_kwargs)
    except ImportError:
        print(json.dumps({'variant': 'fused', 'skipped': 'not built'}))


if __name__ == '__main__':
    main()
