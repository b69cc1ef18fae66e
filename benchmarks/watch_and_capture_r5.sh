#!/bin/bash
# Round-5 pending-capture watcher: probe the axon tunnel every 2 min and,
# on the first healthy probe, run the captures the wedge blocked — in
# marginal-evidence order. Logs to bench_logs/ (gitignored); distilled
# results go to BENCH.md by hand.
# Health = the probe EXITS 0 within the timeout (never grep its output:
# the "experimental" warning prints even when wedged).
set -u
cd "$(dirname "$0")/.."
out=bench_logs
mkdir -p "$out"
stamp=$(date +%Y%m%d_%H%M%S)

probe() {
    timeout 90 python -c "import jax; jax.devices()" >/dev/null 2>&1
}

echo "[watch] probing every 120s (stamp $stamp)"
until probe; do
    echo "[watch] $(date +%H:%M:%S) tunnel wedged"
    sleep 120
done
echo "[watch] $(date +%H:%M:%S) tunnel healthy — starting captures"

run() { # name, timeout_s, cmd...
    local name="$1" t="$2"; shift 2
    echo "== $name (timeout ${t}s) =="
    timeout "$t" "$@" 2>&1 | tee "$out/${name}_${stamp}.log"
    echo "== $name rc=${PIPESTATUS[0]} =="
}

# 1. the workloads rows the first r5 pass crashed before (segmented /
#    bf16 / 128M / 65M / 256M / batched / u64 / u64-values)
run workloads_resume 7200 env WORKLOADS_FROM=segmented python benchmarks/workloads.py
# 2. the 64M full-engine fold A/B (BENCH.md's dangling-claim closer)
run fold_engine 5400 python benchmarks/explore_ce.py fold-engine
# 3. block_rows sweep (round-4 VERDICT weak #5: heuristic vs measured)
run blockrows 5400 python benchmarks/explore_blockrows.py
# 4. headline sanity after a capture-heavy session
run headline 1800 python bench.py
echo "[watch] capture done; logs in $out"
