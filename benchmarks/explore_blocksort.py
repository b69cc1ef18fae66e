"""Probe: is XLA's sort fast when batched (axis=-1 over VMEM-sized rows)?
Also sanity-check Pallas primitives needed by the engine (roll, cumsum,
compare-exchange) compile and run on this chip.
"""
import sys, os
sys.path.insert(0, os.path.dirname(__file__))
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from tpu_radix_sort.runtime import device_time


def report(name, n, secs):
    print(f"{name:44s} n={n:>9d}  {secs*1e3:8.3f} ms  {n/secs/1e9:7.2f} Gelem/s", flush=True)


key = jax.random.PRNGKey(0)
n = 1 << 24

for rows, cols in ((32, n // 32), (128, n // 128), (1024, n // 1024)):
    x = jax.random.bits(key, (rows, cols), dtype=jnp.uint32)
    t = device_time(lambda a: jax.lax.sort(a, dimension=1, is_stable=False), x)
    report(f"lax.sort batched [{rows},{cols}]", n, t)

# stable 3-operand batched sort (key, idx, val)
rows, cols = 128, n // 128
k3 = jax.random.bits(key, (rows, cols), dtype=jnp.uint32)
i3 = jnp.broadcast_to(jnp.arange(cols, dtype=jnp.uint32), (rows, cols))
v3 = jax.random.bits(key, (rows, cols), dtype=jnp.uint32)
t = device_time(
    lambda kv: jax.lax.sort(kv, dimension=1, num_keys=2, is_stable=False),
    (k3, i3, v3),
)
report("lax.sort batched (key,idx,val) 2keys", n, t)

# ---- Pallas sanity: compare-exchange stage over rows + lane roll + cumsum ----
ROWS, LANES = 512, 128


def ce_kernel(k_ref, o_ref):
    x = k_ref[:]
    # compare-exchange rows at stride 8 (sublane roll)
    y = pltpu.roll(x, 8, axis=0)
    lo = jnp.minimum(x, y)
    hi = jnp.maximum(x, y)
    rid = jax.lax.broadcasted_iota(jnp.int32, (ROWS, LANES), 0)
    take_lo = (rid // 8) % 2 == 0
    z = jnp.where(take_lo, lo, hi)
    # lane roll
    z = pltpu.roll(z, 1, axis=1)
    # cumsum along rows
    z = jnp.cumsum(z, axis=0, dtype=jnp.uint32)
    o_ref[:] = z


x = jax.random.bits(key, (ROWS, LANES), dtype=jnp.uint32)
f = jax.jit(
    lambda a: pl.pallas_call(
        ce_kernel,
        out_shape=jax.ShapeDtypeStruct((ROWS, LANES), jnp.uint32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(a)
)
o = f(x)
print("pallas sanity kernel ok:", np.asarray(o[0, :3]))

# time many compare-exchange stages in VMEM to estimate VPU stage cost
NSTAGE = 64


def stages_kernel(k_ref, o_ref):
    x = k_ref[:]
    rid = jax.lax.broadcasted_iota(jnp.int32, (ROWS, LANES), 0)

    def body(i, x):
        y = pltpu.roll(x, 8, axis=0)
        lo = jnp.minimum(x, y)
        hi = jnp.maximum(x, y)
        return jnp.where((rid // 8) % 2 == 0, lo, hi) + jnp.uint32(1)

    o_ref[:] = jax.lax.fori_loop(0, NSTAGE, body, x)


f2 = jax.jit(
    lambda a: pl.pallas_call(
        stages_kernel,
        out_shape=jax.ShapeDtypeStruct((ROWS, LANES), jnp.uint32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(a)
)
t = device_time(f2, x)
per_stage = t / NSTAGE
nelem = ROWS * LANES
print(
    f"pallas compare-exchange stage: {per_stage*1e6:.2f} us per stage of {nelem} elems"
    f" -> {nelem/per_stage/1e9:.1f} Gelem/s/stage"
)
