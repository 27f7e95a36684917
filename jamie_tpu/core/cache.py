"""Persistent XLA compilation cache.

Cold-start fits are compile-dominated for small datasets (the first jitted
train chunk costs tens of seconds through a remote-compile path; the math
itself runs in milliseconds). The persistent compilation cache makes every
shape's compile a one-time cost across processes, which is the difference
between a 180 s and an 8 s small-dataset fit. Enabled on import, opt out
with JAMIE_TPU_NO_CACHE=1.
"""

from __future__ import annotations

import os


def enable_persistent_cache(path: str = None) -> bool:
    if os.environ.get('JAMIE_TPU_NO_CACHE') == '1':
        return False
    try:
        import jax
        # Scope to accelerator sessions: a CPU executable cached by a
        # machine with different ISA features can SIGILL when loaded here
        # (the cache key does not cover host CPU features).
        if (os.environ.get('JAX_PLATFORMS') or '').startswith('cpu'):
            return False
        cache_dir = path or os.environ.get(
            'JAMIE_TPU_CACHE_DIR',
            os.path.expanduser('~/.cache/jamie_tpu_xla'))
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update('jax_compilation_cache_dir', cache_dir)
        # Persist EVERY executable, including sub-second one-op compiles:
        # through this container's remote-compile tunnel each backend
        # compile costs a ~0.35 s round-trip regardless of size, and a cold
        # fit dispatches hundreds of them — persisting all of them is the
        # difference between a 128 s and a ~20 s cold fit (measured,
        # RESULTS.md round 2).
        jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.0)
        return True
    except Exception:  # cache is best-effort; never break import
        return False
