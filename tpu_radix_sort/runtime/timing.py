"""Honest device timing (reference counterpart: GPU timestamp queries).

The reference times kernels with WebGPU `timestamp-query`
(`example/tests.ts:247-285`); on this machine the TPU is tunneled ('axon'
platform), where `jax.block_until_ready` is a no-op and a host fetch costs a
fixed ~25-30 ms, so single-shot wall-clock timing is useless. Instead we run
the op k times inside one jitted `lax.fori_loop` with a data dependency
chain, fetch one scalar, and take the slope between two iteration counts:

    per_op = (t(k_hi) - t(k_lo)) / (k_hi - k_lo)

This cancels fetch latency, dispatch, and jit-call overhead — the same role
as the reference's device-side begin/end timestamps.
"""
from __future__ import annotations

import time
from functools import partial

import jax
import numpy as np


def _chain(step, x, k):
    """Run `step` k times with a data dependency chain. step: pytree -> pytree."""
    return jax.lax.fori_loop(0, k, lambda i, c: step(c), x)


def device_time(step, x, k_lo=2, k_hi=10, reps=3):
    """Median per-op seconds for `step` (pytree->pytree of same structure)."""
    f = jax.jit(partial(_chain, step), static_argnums=1)

    def run(k):
        out = f(x, k)
        leaf = jax.tree_util.tree_leaves(out)[0]
        return np.asarray(leaf.ravel()[0])  # forces full execution

    # warm up / compile both variants
    run(k_lo), run(k_hi)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        run(k_lo)
        t1 = time.perf_counter()
        run(k_hi)
        t2 = time.perf_counter()
        ts.append(((t2 - t1) - (t1 - t0)) / (k_hi - k_lo))
    return float(np.median(ts))
