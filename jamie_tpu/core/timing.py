"""Section timing / memory tracing.

Reference parity: `time_logger` (jamie/utilities.py:61-132) — named-section
wall-clock accumulation with per-key mean report and optional tracemalloc
capture. Here the host-side API is identical in spirit, with two TPU-world
additions: `block=True` synchronizes outstanding device work before stamping
(otherwise async dispatch makes wall-clock lies), and `trace()` wraps
`jax.profiler` for real device profiles.
"""

from __future__ import annotations

import contextlib
import tracemalloc
from time import perf_counter

import numpy as np

try:
    import jax
except ImportError:  # pragma: no cover
    jax = None


class TimeLogger:
    def __init__(
        self,
        discard_first_sample: bool = False,
        record: bool = True,
        verbose: bool = False,
        memory_usage: bool = False,
        block: bool = False,
    ):
        self.discard_first_sample = discard_first_sample
        self.record = record
        self.verbose = verbose
        self.memory_usage = memory_usage
        self.block = block

        self.history: dict = {}
        self.history_mem: dict = {}
        if memory_usage:
            tracemalloc.start()
        self.start_time = perf_counter()

    def _sync(self):
        if self.block and jax is not None:
            # Drain async dispatch so the section time is honest: block on
            # every live device array (a fresh zeros(()) only serializes by
            # the grace of single-stream dispatch; deleted-buffer races are
            # possible mid-iteration, hence the guard).
            try:
                jax.block_until_ready(list(jax.live_arrays()))
            except Exception:
                pass

    def log(self, name: str = ''):
        if not (self.verbose or self.record):
            return
        self._sync()
        end_time = perf_counter()
        elapsed = end_time - self.start_time
        if self.record:
            self.history.setdefault(name, []).append(elapsed)
        if self.verbose:
            print(f'{name}: {elapsed}')
        if self.memory_usage:
            if self.record:
                self.history_mem.setdefault(name, []).append(
                    tracemalloc.get_traced_memory())
            tracemalloc.stop()
            tracemalloc.start()
        self.start_time = perf_counter()

    def aggregate(self):
        """Print mean time per section and the running total (ref format)."""
        running_total = 0.0
        for k, v in self.history.items():
            vals = np.array(v)
            if self.discard_first_sample and len(vals) > 1:
                vals = vals[1:]
            mean = float(np.mean(vals))
            running_total += mean
            print(f'{k}: {mean}')
            if self.memory_usage and k in self.history_mem:
                stored = sum(m[0] for m in self.history_mem[k])
                peak = max(m[1] for m in self.history_mem[k])
                print(f'{k} Memory: Stored {stored} - Peak {peak}')
        print(f'Total: {running_total}')
        return running_total

    def totals(self) -> dict:
        return {k: float(np.sum(v)) for k, v in self.history.items()}

    def stop(self):
        if self.memory_usage:
            tracemalloc.stop()


def device_memory_stats(device=None) -> dict:
    """HBM usage for one device (bytes_in_use / peak_bytes_in_use /
    bytes_limit when the backend reports them). The device-side counterpart
    of the reference's tracemalloc capture (jamie/utilities.py:73-79)."""
    if jax is None:
        return {}
    device = device or jax.local_devices()[0]
    try:
        stats = device.memory_stats() or {}
    except Exception:
        return {}
    keys = ('bytes_in_use', 'peak_bytes_in_use', 'bytes_limit',
            'largest_alloc_size')
    return {k: stats[k] for k in keys if k in stats}


@contextlib.contextmanager
def trace(log_dir: str = '/tmp/jamie-tpu-trace'):
    """Device-side profiling via jax.profiler (replaces tracemalloc's role
    for on-device memory/time attribution)."""
    if jax is None:
        yield
        return
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
