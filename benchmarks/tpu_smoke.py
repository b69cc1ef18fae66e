"""Real-TPU smoke + perf check of the bitonic engine."""
import sys, os, time

sys.path.insert(0, os.path.dirname(__file__))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp
import tpu_radix_sort as trs
from tpu_radix_sort.models.golden import golden_sort
from tpu_radix_sort.runtime import device_time

print("device:", jax.devices()[0], flush=True)

key = jax.random.PRNGKey(0)

for n in [1 << 20, 1 << 24]:
    k = jax.random.bits(key, (n,), dtype=jnp.uint32)
    t0 = time.time()
    f = jax.jit(lambda a: trs.sort(a, method="bitonic"))
    out = f(k)
    got = np.asarray(out)
    t1 = time.time()
    print(f"n={n}: keys-only compile+run {t1-t0:.1f}s", flush=True)
    ref = golden_sort(np.asarray(k))
    print(f"n={n}: correct = {np.array_equal(got, ref)}", flush=True)
    t = device_time(f, k, k_lo=1, k_hi=5)
    print(f"n={n}: keys-only {t*1e3:.2f} ms  {n/t/1e9:.3f} Gkeys/s", flush=True)

# key+value
n = 1 << 24
k = jax.random.bits(key, (n,), dtype=jnp.uint32)
v = jnp.arange(n, dtype=jnp.uint32)
t0 = time.time()
f2 = jax.jit(lambda a, b: trs.sort(a, b, method="bitonic"))
ok, ov = f2(k, v)
gk, gv = np.asarray(ok), np.asarray(ov)
print(f"kv compile+run {time.time()-t0:.1f}s", flush=True)
rk, rv = golden_sort(np.asarray(k), np.asarray(v))
print("kv correct =", np.array_equal(gk, rk) and np.array_equal(gv, rv), flush=True)
t = device_time(lambda kv: f2(*kv), (k, v), k_lo=1, k_hi=5)
print(f"kv n={n}: {t*1e3:.2f} ms  {n/t/1e9:.3f} Gkeys/s", flush=True)
