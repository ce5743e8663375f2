#!/bin/bash
# TPU artifact-refresh queue for the work blocked on the axon tunnel
# outage (down since 2026-08-17). Run whenever the tunnel is back:
#
#     bash experiments/tpu_refresh.sh [--probe-only]
#
# Probes the TPU with a bounded timeout first (the relay retries
# backend registration in an unbounded loop — NEVER call jax.devices()
# unguarded), then runs the pending jobs in priority order, each with
# its own timeout, logging to results/refresh/. Jobs are independent:
# a failure moves on to the next and is reported in the summary.
set -u
cd "$(dirname "$0")/.."
export JAX_COMPILATION_CACHE_DIR=/root/.cache/jax_comp
LOGDIR=results/refresh
mkdir -p "$LOGDIR"

echo "== probing TPU (300 s budget) =="
if ! timeout 300 python -c "import jax; d=jax.devices(); print(d); assert d[0].platform != 'cpu'" \
    >"$LOGDIR/probe.log" 2>&1; then
  echo "TPU tunnel still DOWN (probe timed out or failed; $LOGDIR/probe.log)"
  exit 2
fi
echo "TPU up: $(tail -1 "$LOGDIR/probe.log")"
[ "${1:-}" = "--probe-only" ] && exit 0

declare -A STATUS

run_job() {  # name timeout_s command...
  local name=$1 tmo=$2; shift 2
  echo "== $name (timeout ${tmo}s) =="
  if timeout "$tmo" "$@" >"$LOGDIR/$name.log" 2>&1; then
    STATUS[$name]=ok
  else
    STATUS[$name]="FAIL($?)"
  fi
  tail -3 "$LOGDIR/$name.log"
}

# 1. Headline bench — now also reports the production (NGD) step time.
run_job bench 1800 python bench.py
grep -h '"metric"' "$LOGDIR/bench.log" | tail -1 > "$LOGDIR/bench_line.json" || true

# 2. c8_amortized_svi first full-scale run (gates in core/config.py are
#    UNCALIBRATED floors — run WITHOUT --check, then calibrate CHECKS
#    from results/c8/result.json and re-run with --check).
run_job c8 5400 python experiments/run.py c8_amortized_svi --out results/c8

# 3. Serving latency refresh including the new encoder-imputer rows.
run_job serving 3600 python experiments/serving_bench.py --out results/serving_bench.json

# 4. c9_mrd_svi_bigN first full-scale run (gates are UNCALIBRATED
#    floors — calibrate CHECKS from results/c9/result.json, then re-run
#    with --check).
run_job c9 5400 python experiments/run.py c9_mrd_svi_bigN --out results/c9

# 5/6. gate re-confirmation for the big-N configs whose trajectories
#    shifted with the resume-aware rng derivation (drive now folds the
#    chunk step index instead of sequentially splitting) — headroom
#    should absorb it; verify on-chip.
run_job c6_check 5400 python experiments/run.py c6_svi_bigN --check --out results/c6_recheck
run_job c7_check 7200 python experiments/run.py c7_dp_svi --check --out results/c7_recheck

echo "== summary =="
for k in "${!STATUS[@]}"; do echo "$k: ${STATUS[$k]}"; done
echo "next: python experiments/calibrate_checks.py results/c8/result.json \\"
echo "          results/c9/result.json   # suggested tightened CHECKS"
echo "      paste (after a sanity look) into core/config.py CHECKS,"
echo "      then re-run both configs with --check"
