"""Run an example script CPU-forced (outage-safe smoke mode for run_all.sh).

`JAX_PLATFORMS=cpu` alone is ignored here — the axon sitecustomize sets
jax_platforms programmatically — so force it via jax.config before the
script imports anything heavy, and use a headless matplotlib backend.

Usage: python examples/_cpu_runner.py <script.py> [args...]
"""

import sys

import jax

jax.config.update('jax_platforms', 'cpu')
import matplotlib

matplotlib.use('Agg')

import runpy  # noqa: E402

script = sys.argv[1]
sys.argv = sys.argv[1:]
runpy.run_path(script, run_name='__main__')
