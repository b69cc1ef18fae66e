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

Chain-length auto-escalation: a few-ms op measured over a short chain sits
*under* the sync noise — round 1 produced a negative "2.3 ms" reading of a
0.9 ms scan that way. `device_time` therefore re-measures with a longer
chain whenever the timed window (chain delta x per-op) is smaller than
~2x the fetch noise, sizing the new chain from the first estimate. Callers
no longer hand-roll the escalation (round-3 VERDICT item 5).
"""
from __future__ import annotations

import time
from functools import partial

import jax
import numpy as np

# A measurement is trustworthy when the timed window (chain delta * per-op
# time) comfortably exceeds the ~25-30 ms host-fetch noise of the tunnel.
MIN_WINDOW_S = 50e-3
ESCALATE_BELOW_S = 5e-3  # CLAUDE.md noise rule: sub-5 ms ops need long chains
_DELTA_FLOOR = 200       # the empirically-clean k_lo=20, k_hi=220 chain
_DELTA_CAP = 20_000      # bounds compile+run cost for sub-us ops


def _chain(step, x, k):
    """Run `step` k times with a data dependency chain. step: pytree -> pytree."""
    return jax.lax.fori_loop(0, k, lambda i, c: step(c), x)


def escalation_plan(t, k_lo, k_hi):
    """Next (k_lo, k_hi) when measurement `t` over the given chain is too
    noisy to trust, else None. Pure decision logic (unit-tested)."""
    if t >= ESCALATE_BELOW_S:
        return None  # long op: even a short chain gives a wide window
    if t > 0 and (k_hi - k_lo) * t >= MIN_WINDOW_S:
        return None  # window already clears the fetch noise
    if t <= 0:
        delta = _DELTA_FLOOR  # negative reading: magnitude unknown, start low
    else:
        delta = int(min(_DELTA_CAP, max(_DELTA_FLOOR, round(MIN_WINDOW_S / t))))
    lo = max(2, delta // 10)
    return lo, lo + delta


def device_time(step, x, k_lo=2, k_hi=10, reps=3, auto_escalate=True):
    """Median per-op seconds for `step` (pytree->pytree of same structure).

    With `auto_escalate` (default), noisy short-chain readings trigger up to
    two re-measurements over chains sized to put the timed window above the
    tunnel's fetch noise (see module docstring).
    """
    f = jax.jit(partial(_chain, step), static_argnums=1)

    def run(k):
        out = f(x, k)
        leaf = jax.tree_util.tree_leaves(out)[0]
        return np.asarray(leaf.ravel()[0])  # forces full execution

    def measure(lo, hi):
        run(lo), run(hi)  # warm up / compile both variants
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            run(lo)
            t1 = time.perf_counter()
            run(hi)
            t2 = time.perf_counter()
            ts.append(((t2 - t1) - (t1 - t0)) / (hi - lo))
        return float(np.median(ts))

    t = measure(k_lo, k_hi)
    if auto_escalate:
        for _ in range(2):
            plan = escalation_plan(t, k_lo, k_hi)
            if plan is None:
                break
            k_lo, k_hi = plan
            t = measure(k_lo, k_hi)
    return t
