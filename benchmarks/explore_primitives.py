"""Microbenchmarks of candidate TPU data-movement primitives for the radix engine.

Run on a real TPU chip. These numbers drive the design choice flagged in
SURVEY.md section 7 ("Scatter on TPU" is the make-or-break kernel).
"""
import sys
import os

sys.path.insert(0, os.path.dirname(__file__))

import numpy as np
import jax
import jax.numpy as jnp
from tpu_radix_sort.runtime import device_time

print("device:", jax.devices()[0])


def report(name, n, secs, bytes_moved=None):
    line = f"{name:40s} n={n:>9d}  {secs*1e3:8.3f} ms  {n/secs/1e9:7.2f} Gelem/s"
    if bytes_moved:
        line += f"  {bytes_moved/secs/1e9:7.1f} GB/s"
    print(line, flush=True)


key = jax.random.PRNGKey(0)

for n in (1 << 22, 1 << 26):
    keys = jax.random.bits(key, (n,), dtype=jnp.uint32)
    vals = jnp.arange(n, dtype=jnp.uint32)
    perm = jax.random.permutation(key, n).astype(jnp.int32)

    # roofline probe: 1 read + 1 write of 4B each
    t = device_time(lambda x: x + jnp.uint32(1), keys)
    report("elementwise +1 (roofline)", n, t, 8 * n)

    t = device_time(lambda x: jax.lax.sort(x, is_stable=True), keys)
    report("lax.sort stable keys-only", n, t)

    t = device_time(
        lambda kv: jax.lax.sort(kv, is_stable=True, num_keys=1), (keys, vals)
    )
    report("lax.sort stable k+v", n, t)

    t = device_time(lambda x: x[perm], keys)
    report("gather x[perm] (random)", n, t, 12 * n)

    t = device_time(
        lambda x: jnp.zeros_like(x).at[perm].set(x, mode="drop", unique_indices=True),
        keys,
    )
    report("scatter at[perm].set (random)", n, t, 12 * n)

# one-hot matmul block permute, data already u8-chunked
n = 1 << 22
for B in (256, 512, 1024):
    nb = n // B
    x = jax.random.bits(key, (nb, B), dtype=jnp.uint32).astype(jnp.float32) % 256
    x = x.astype(jnp.bfloat16)
    p = (jax.random.bits(key, (nb, B), dtype=jnp.uint32) % B).astype(jnp.int32)
    onehot = jax.nn.one_hot(p, B, dtype=jnp.bfloat16)

    t = device_time(
        lambda x: jnp.einsum("nij,nj->ni", onehot, x, preferred_element_type=jnp.float32).astype(jnp.bfloat16),
        x,
    )
    report(f"one-hot matmul permute B={B} (1 chunk)", n, t)

# gather with *sorted-ish* (locally coalesced) indices vs random
n = 1 << 24
keys = jax.random.bits(key, (n,), dtype=jnp.uint32)
perm_sorted = jnp.arange(n, dtype=jnp.int32)
t = device_time(lambda x: x[perm_sorted], keys)
report("gather x[iota] (coalesced)", n, t, 12 * n)

# segmented/tiled gather: random within 1K-wide windows
win = 1024
base = (jnp.arange(n, dtype=jnp.int32) // win) * win
off = (jax.random.bits(key, (n,), dtype=jnp.uint32) % win).astype(jnp.int32)
perm_local = base + off
t = device_time(lambda x: x[perm_local], keys)
report("gather x[local-random-1K]", n, t, 12 * n)
