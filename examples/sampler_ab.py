"""A/B: per-epoch vectorized batch sampling vs the per-step permutation draw.

Round-3 change (train/sampling.make_epoch_sampler): diag/zeros batches ride
ONE shuffled permutation per epoch sliced into wrap-around windows instead
of the previous per-STEP `jax.random.permutation(key, N)` — a full
N-element device sort per train step, measured ~2x the fwd/bwd/Adam work at
the BrainChromatin shape (N~9k).

This harness measures trainer throughput at N=9000, d=512 (the shape where
the sort dominated) under both policies. The OLD policy is emulated
faithfully by drawing the per-step sampler inside the scanned batch body
(exactly where the pre-4e0982a trainer called it) while the new per-epoch
indices are computed but ignored — the per-epoch draw itself is one
permutation per epoch, noise against 17 per-step sorts.

Usage:
  PYTHONPATH=/root/repo:/root/.axon_site python examples/sampler_ab.py
  python examples/sampler_ab.py --cpu --n 600 --chunks 2   # smoke test
"""

import argparse
import json
import time

import numpy as np


def build_trainer(trainer_cls, n, d, cfg_kwargs):
    from jamie_tpu.config import JamieConfig
    from jamie_tpu.models import CoupledVAE

    cfg = JamieConfig(**cfg_kwargs)
    rng = np.random.RandomState(0)
    data = [rng.randn(n, d).astype(np.float32) for _ in range(2)]
    model = CoupledVAE((d, d), cfg.output_dim, dropout=cfg.dropout,
                       matmul_bf16=True)
    P = np.eye(n, dtype=np.float32)
    F = np.zeros((n, n), np.float32)
    return trainer_cls(cfg, model, data, P, F), cfg


def time_trainer(trainer, cfg, chunks):
    import jax

    with trainer._prng_scope():
        state = trainer.init_state()
        chunk_fn = trainer._chunk_fn(cfg.epoch_chunk)
        state, _ = chunk_fn(state)              # warmup: compile + chunk 1
        jax.block_until_ready(state.params)
        t0 = time.perf_counter()
        for _ in range(chunks):
            state, _ = chunk_fn(state)
        jax.block_until_ready(state.params)
        dt = time.perf_counter() - t0
    steps = chunks * cfg.epoch_chunk * trainer.len_dataloader
    return dt, steps


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--n', type=int, default=9000)
    ap.add_argument('--d', type=int, default=512)
    ap.add_argument('--chunks', type=int, default=5)
    ap.add_argument('--epoch-chunk', type=int, default=100)
    ap.add_argument('--cpu', action='store_true')
    args = ap.parse_args()

    if args.cpu:
        import jax
        jax.config.update('jax_platforms', 'cpu')

    import jax

    from jamie_tpu.train.trainer import JamieTrainer

    class OldSamplerTrainer(JamieTrainer):
        """Pre-4e0982a behavior: a fresh without-replacement draw (full
        N-element device sort) inside every scanned batch body."""

        def _batch_loss_and_grads(self, params, batch_stats, key, epoch_idx,
                                  ops, idx0, idx1):
            k_s, key = jax.random.split(key)
            idx0, idx1 = self.sampler(k_s, ops[4])
            return super()._batch_loss_and_grads(
                params, batch_stats, key, epoch_idx, ops, idx0, idx1)

    cfg_kwargs = dict(epoch_DNN=10_000, min_epochs=2500, batch_size=512,
                      log_DNN=100_000, use_early_stop=False,
                      epoch_chunk=args.epoch_chunk, prng_impl='rbg')

    out = {'n': args.n, 'd': args.d}
    for name, cls in [('new_per_epoch', JamieTrainer),
                      ('old_per_step', OldSamplerTrainer)]:
        trainer, cfg = build_trainer(cls, args.n, args.d, cfg_kwargs)
        dt, steps = time_trainer(trainer, cfg, args.chunks)
        out[name] = {
            'seconds': round(dt, 2),
            'ms_per_step': round(1e3 * dt / steps, 4),
            'cell_samples_per_sec': round(steps * cfg.batch_size / dt, 1),
        }
        print(json.dumps({name: out[name]}), flush=True)
        del trainer

    out['speedup'] = round(out['old_per_step']['ms_per_step']
                           / out['new_per_epoch']['ms_per_step'], 3)
    print(json.dumps(out))


if __name__ == '__main__':
    main()
