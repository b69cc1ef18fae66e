"""Headline benchmark: 64M uint32 key+value sort throughput on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

value        = sorted keys/s (Gkeys/s * 1e9) for the Pallas engine at
               N = 2^26 uint32 key + uint32 value (BASELINE.json north star).
vs_baseline  = speedup vs `jax.lax.sort` (XLA's stock stable sort) on the
               same chip and workload — the strongest existing TPU baseline
               (the reference itself publishes no numbers, BASELINE.md).

Timing uses the slope method (tpu_radix_sort.runtime.device_time): k
dependency-chained iterations inside one jit, slope between two iteration
counts — the reference's timestamp-query equivalent for a tunneled device.
"""
import json
import os
import subprocess
import sys

os.environ.setdefault("JAX_PLATFORMS", "")  # real device if present

PROBE_TIMEOUT_S = int(os.environ.get("TRS_BENCH_PROBE_TIMEOUT_S", "120"))
PROBE_RETRIES = int(os.environ.get("TRS_BENCH_PROBE_RETRIES", "2"))
RETRY_WAIT_S = int(os.environ.get("TRS_BENCH_RETRY_WAIT_S", "60"))


def probe_backend():
    """Bounded-time backend-init probe in a subprocess.

    The axon tunnel can WEDGE: `jax.devices()` then blocks *forever* during
    backend init with no exception to catch (CLAUDE.md, observed 2026-08-17,
    cost round 3 its headline capture). Probing in a throwaway subprocess
    under a timeout keeps this process clean — killing a jax process mid-init
    is only safe when it's not the one that must go on to run the benchmark.
    Returns the platform name, or None (wedged/unavailable).
    """
    try:
        r = subprocess.run(
            [sys.executable, "-c",
             "import jax; print(jax.devices()[0].platform)"],
            capture_output=True, text=True, timeout=PROBE_TIMEOUT_S,
        )
    except subprocess.TimeoutExpired:
        return None
    if r.returncode != 0:
        return None
    return r.stdout.strip() or None


def run(n):
    import jax
    import jax.numpy as jnp

    import tpu_radix_sort as trs
    from tpu_radix_sort.runtime import device_time

    key = jax.random.PRNGKey(0)
    keys = jax.random.bits(key, (n,), dtype=jnp.uint32)
    values = jnp.arange(n, dtype=jnp.uint32)

    # values are the identity iota (the reference's own test payload,
    # example/tests.ts:38), so the rank-payload contract holds: the payload
    # doubles as the stability tie-break (2 arrays moved — the same count
    # the XLA baseline's 2-operand sort moves). Output is byte-identical
    # to the generic path (tests/test_sort.py::test_values_are_ranks_*).
    ours = jax.jit(
        lambda kv: tuple(trs.sort(kv[0], kv[1], values_are_ranks=True))
    )
    xla = jax.jit(
        lambda kv: tuple(jax.lax.sort(kv, num_keys=1, is_stable=True))
    )

    t_ours = device_time(ours, (keys, values), k_lo=1, k_hi=3, reps=3)
    t_xla = device_time(xla, (keys, values), k_lo=1, k_hi=3, reps=3)
    return {
        "metric": f"sort throughput, {n} uint32 key+value, 1 chip",
        "value": round(n / t_ours, 0),
        "unit": "keys/s",
        "vs_baseline": round(t_xla / t_ours, 3),
    }


def main():
    import time

    n = int(sys.argv[1]) if len(sys.argv) > 1 else (1 << 26)

    platform = None
    for attempt in range(PROBE_RETRIES + 1):
        platform = probe_backend()
        if platform is not None:
            break
        if attempt < PROBE_RETRIES:
            print(f"bench: backend probe failed (attempt {attempt + 1}); "
                  f"waiting {RETRY_WAIT_S}s for the tunnel to heal",
                  file=sys.stderr, flush=True)
            time.sleep(RETRY_WAIT_S)
    if platform is not None:
        print(f"bench: backend ok ({platform})", file=sys.stderr, flush=True)
    else:
        print("bench: device backend unavailable — axon tunnel wedged or "
              f"down (init probe exceeded {PROBE_TIMEOUT_S}s x "
              f"{PROBE_RETRIES + 1}). Probe recovery with: timeout 60 "
              "python -c 'import jax; print(jax.devices())'",
              file=sys.stderr)
        sys.exit(1)

    try:
        out = run(n)
    except Exception:  # e.g. compile OOM on a smaller device: degrade once
        out = run(n // 4)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
