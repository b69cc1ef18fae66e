"""Runtime layer: native CPU baseline sorter + bindings, device timing."""
import jax.numpy as jnp
import numpy as np

from tpu_radix_sort.runtime import device_time
from tpu_radix_sort.runtime.cpu_baseline import (
    cpu_disorder_count,
    cpu_sort,
    native_available,
)
from tpu_radix_sort.runtime.timing import (
    ESCALATE_BELOW_S,
    MIN_WINDOW_S,
    escalation_plan,
)


def test_native_cpu_sort_matches_numpy(rng):
    k = rng.integers(0, 2**32, 100_000, dtype=np.uint64).astype(np.uint32)
    v = np.arange(k.size, dtype=np.uint32)
    sk, sv = cpu_sort(k, v)
    order = np.argsort(k, kind="stable")
    np.testing.assert_array_equal(sk, k[order])
    np.testing.assert_array_equal(sv, v[order])
    np.testing.assert_array_equal(cpu_sort(k), k[order])


def test_native_disorder_count(rng):
    k = rng.integers(0, 2**16, 10_000, dtype=np.uint64).astype(np.uint32)
    expect = int(np.sum(k[:-1] > k[1:]))
    assert cpu_disorder_count(k) == expect
    assert cpu_disorder_count(np.sort(k)) == 0
    assert cpu_disorder_count(np.array([7], dtype=np.uint32)) == 0


def test_native_build_available():
    # g++ is baked into this image; the binding must actually build.
    assert native_available()


def test_escalation_plan_decision():
    """Chain-length auto-escalation rules (round-3 VERDICT item 5: the
    noise rule lives in ONE place now — CLAUDE.md 'Machine gotchas')."""
    # long ops over any chain: trusted as-is
    assert escalation_plan(0.130, 1, 3) is None
    assert escalation_plan(ESCALATE_BELOW_S, 2, 10) is None
    # sub-5ms op over a short chain: window under the fetch noise -> escalate
    plan = escalation_plan(0.9e-3, 1, 3)
    assert plan is not None
    lo, hi = plan
    assert (hi - lo) * 0.9e-3 >= MIN_WINDOW_S  # new window clears the noise
    # negative reading (round-1 artifact: a 0.9 ms scan "measured" -2.3 ms
    # under a 2-iteration delta): always re-measure, with the floor chain
    assert escalation_plan(-2.3e-3, 2, 10) == (20, 220)
    # already-long chain whose window clears the noise: trusted
    assert escalation_plan(0.9e-3, 20, 220) is None
    # sub-us op: chain bounded by the cap, lo stays sane
    lo, hi = escalation_plan(5e-7, 2, 10)
    assert hi - lo <= 20_000 and lo >= 2


def test_device_time_smoke():
    """device_time returns a positive per-op figure for a real (tiny) op on
    CPU; the auto-escalation path must terminate and not raise."""
    x = jnp.arange(1024, dtype=jnp.uint32)
    t = device_time(lambda a: a + jnp.uint32(1), x, k_lo=2, k_hi=10, reps=2)
    assert np.isfinite(t)
