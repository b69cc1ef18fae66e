"""Execute the REAL `jax.lax.ragged_all_to_all` on the TPU backend.

XLA:CPU has no ragged-all-to-all thunk (`UNIMPLEMENTED ... ThunkEmitter`,
jax 0.9.0), so the unit suite pins an emulation instead
(`tests/test_radix_exchange.py`). This probe runs the *actual collective*
on the one real chip via a 1-device mesh self-exchange — the same
primitive + metadata layout `parallel/radix_exchange.py` issues on a real
multi-chip mesh — and checks the documented semantics end to end. It
cannot validate cross-chip transport (no multi-chip hardware here), but it
proves the collective compiles AND executes with our metadata on the TPU
backend, not just in emulation.

Run alone: python benchmarks/ragged_probe.py
"""
import sys, os

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P


def main():
    rng = np.random.default_rng(0)
    dev = jax.devices()[0]
    print("device:", dev)
    mesh = Mesh(np.array([dev]), ("x",))
    L = 4096
    data = rng.integers(0, 2**32, L, dtype=np.uint64).astype(np.uint32)

    # self-exchange: send 3 ragged pieces of my block to myself at
    # permuted offsets (the D=1 specialization of the exchange metadata)
    cuts = np.sort(rng.integers(1, L, 2))
    starts_np = np.array([0, cuts[0], cuts[1]], np.int32)
    sizes_np = np.array([cuts[0], cuts[1] - cuts[0], L - cuts[1]], np.int32)
    order = np.array([2, 0, 1])  # receive pieces in permuted order
    out_offsets_np = np.zeros(3, np.int32)
    pos = 0
    for piece in order:
        out_offsets_np[piece] = pos
        pos += sizes_np[piece]

    expect = np.zeros(L, np.uint32)
    for piece in range(3):
        o, s, z = out_offsets_np[piece], starts_np[piece], sizes_np[piece]
        expect[o:o + z] = data[s:s + z]

    def body(a):
        buf = jnp.zeros((L,), a.dtype)
        # D=1: every piece's source and destination shard is shard 0; the
        # operand rows are per-destination-shard, here all destination 0 —
        # ragged_all_to_all treats the leading metadata dim as the piece
        # list for this (single) peer
        out = a
        for piece in range(3):
            out = jax.lax.ragged_all_to_all(
                a,
                out if piece else buf,
                jnp.asarray([starts_np[piece]]),
                jnp.asarray([sizes_np[piece]]),
                jnp.asarray([out_offsets_np[piece]]),
                jnp.asarray([sizes_np[piece]]),
                axis_name="x",
            )
        return out

    fn = jax.jit(
        jax.shard_map(body, mesh=mesh, in_specs=P("x"), out_specs=P("x"),
                      check_vma=False)
    )
    got = np.asarray(fn(jnp.asarray(data)))
    ok = np.array_equal(got, expect)
    print(f"ragged_all_to_all executed on {dev.platform}: semantics ok={ok}")
    assert ok


if __name__ == "__main__":
    main()
