#!/bin/bash
# One-shot on-chip capture: run every real-TPU measurement the round needs,
# in sequence (ONE chip — never run these concurrently), with per-step
# timeouts so a re-wedge of the axon tunnel cannot hang the whole capture.
# Usage: bash benchmarks/capture_all.sh [outdir]   (default: bench_logs/)
set -u
cd "$(dirname "$0")/.."
out="${1:-bench_logs}"
mkdir -p "$out"
stamp=$(date +%Y%m%d_%H%M%S)

probe() {
    timeout 90 python -c "import jax; print(jax.devices()[0])" 2>/dev/null
}

echo "== probe =="
if ! probe; then
    echo "tunnel wedged — aborting capture (probe recipe: CLAUDE.md)"
    exit 1
fi

run() { # name, timeout_s, cmd...
    local name="$1" t="$2"; shift 2
    echo "== $name (timeout ${t}s) =="
    timeout "$t" "$@" 2>&1 | tee "$out/${name}_${stamp}.log"
    echo "== $name rc=${PIPESTATUS[0]} =="
}

# order = marginal evidence value per minute if the tunnel heals late:
# the driver re-runs bench.py itself at round end, but the crossover table
# and the fold A/B exist only here; workloads is the longest block
run headline   1800 python bench.py
run crossover  5400 python benchmarks/crossover.py
run explore_ce 5400 python benchmarks/explore_ce.py
run workloads  7200 python benchmarks/workloads.py
run blockrows  5400 python benchmarks/explore_blockrows.py
run demo_consecutive 1800 python examples/demo.py --n 16777216 --check-order --consecutive 4
echo "== capture done; logs in $out =="
