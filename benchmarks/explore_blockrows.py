"""Sweep the sort-engine tile height vs `choose_block_rows`'s pick.

Round-4 VERDICT weak #5: `utils/dispatch.choose_block_rows` (8 MB budget,
~3x temporaries factor) is a heuristic while everything else in the engine
was tuned by measurement. The default engine path clamps to
DEFAULT_BLOCK_ROWS=1024, and the heuristic only deviates at
n_arrays >= 6 (it returns 512) — exactly the masked/descending 64-bit
k+v sorts that carry (hi, lo, tie, full_hi, full_lo, v) column tuples.

This probe measures, on chip at 16M elements:
  - n_arrays=3 (u32 k+v stable, the headline tuple) over {512, 1024}
  - n_arrays=6 (the heuristic's deviation point)   over {256, 512, 1024, 2048}

If 1024/2048 beats 512 at 6 arrays, the 8 MB budget is too conservative
(v5e VMEM is ~64-128 MB) and dispatch.py should be retuned; the verdict
goes to DESIGN.md either way. Payload columns are set equal to the tie
column so a one-line consistency check rides along.
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp

from tpu_radix_sort.ops import bitonic
from tpu_radix_sort.runtime import device_time


def headline_ab():
    """k+v rank-payload (the headline config) + keys-only block_rows A/B:
    the 16M 3-array sweep showed 512 ~4% ahead of the shipping 1024 —
    check whether that transfers to the shapes bench.py reports. At 64M the
    512-row program exceeds the remote-compile body cap (HTTP 413, measured
    2026-08-19): smaller tiles mean more HBM-level merge rounds in one jit.
    Rows fail soft so one uncompilable config doesn't kill the sweep;
    BLOCKROWS_AB_N overrides the size (default 16M, which compiles at all
    three tile heights)."""
    import tpu_radix_sort as trs

    n = int(os.environ.get("BLOCKROWS_AB_N", 1 << 24))
    rng = np.random.default_rng(0)
    knp = rng.integers(0, 2**32, n, dtype=np.uint64).astype(np.uint32)
    k = jnp.asarray(knp)
    v = jnp.arange(n, dtype=jnp.uint32)
    ref_k = np.sort(knp)
    mname = f"{n >> 20}M"

    def row(label, fn):
        try:
            f = jax.jit(fn)
            out = np.asarray(f(k))
            ok = np.array_equal(out, ref_k)
            t = device_time(f, k, k_lo=1, k_hi=3)
            print(f"{label}  {t*1e3:9.3f} ms  {n/t/1e6:7.1f} Mkeys/s  "
                  f"ok={ok}", flush=True)
        except Exception as e:  # noqa: BLE001 — sweep must keep going
            print(f"{label}  FAILED: {type(e).__name__}: "
                  f"{str(e).splitlines()[0][:90]}", flush=True)

    for b in (512, 1024, 2048):
        row(f"{mname} k+v rank-payload block_rows={b:4d}",
            lambda kk, b=b: trs.sort(kk, v, values_are_ranks=True,
                                     block_rows=b)[0])
    # keys-only (1-array minmax path): the other shape a DEFAULT_BLOCK_ROWS
    # change would touch
    for b in (512, 1024, 2048):
        row(f"{mname} keys-only        block_rows={b:4d}",
            lambda kk, b=b: trs.sort(kk, block_rows=b))


def main():
    print("device:", jax.devices()[0].device_kind, flush=True)
    if os.environ.get("BLOCKROWS_HEADLINE"):
        headline_ab()
        return
    n = int(os.environ.get("BLOCKROWS_N", 1 << 24))  # CPU smoke: small pow2
    rng = np.random.default_rng(0)
    k = jnp.asarray(rng.integers(0, 2**32, n, dtype=np.uint64).astype(np.uint32))
    tie = jnp.arange(n, dtype=jnp.uint32)
    ref = np.sort(np.asarray(k))

    for n_arrays, blocks in ((3, (512, 1024)), (6, (256, 512, 1024, 2048))):
        pads = tuple(tie for _ in range(n_arrays - 2))
        for b in blocks:
            def fn(kk, b=b, pads=pads):
                return bitonic.sort_padded(
                    (kk, tie, *pads), stable=True, block_rows=b)[0]

            tag = f"n_arrays={n_arrays} block_rows={b:4d}"
            try:
                f = jax.jit(fn)
                out = np.asarray(f(k))
                ok = np.array_equal(out, ref)
                if os.environ.get("BLOCKROWS_SMOKE"):  # CPU: correctness only
                    print(f"{tag}  (untimed smoke)   ok={ok}", flush=True)
                    continue
                t = device_time(f, k, k_lo=1, k_hi=3)
                print(f"{tag}  {t*1e3:9.3f} ms   ok={ok}", flush=True)
            except Exception as e:
                msg = str(e).splitlines()[0][:120]
                print(f"{tag}  FAILED: {type(e).__name__}: {msg}", flush=True)


if __name__ == "__main__":
    main()
