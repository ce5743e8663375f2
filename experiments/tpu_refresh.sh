#!/bin/bash
# TPU artifact-refresh queue. Run whenever full-scale artifacts need
# regenerating (post-fix, post-recalibration, or after a tunnel outage):
#
#     bash experiments/tpu_refresh.sh [--probe-only]
#
# Probes the TPU with a bounded timeout first (the relay retries
# backend registration in an unbounded loop — NEVER call jax.devices()
# unguarded), then runs the pending jobs in priority order, each with
# its own timeout, logging to results/refresh/. Jobs are independent:
# a failure moves on to the next and is reported in the summary.
#
# GATE CONTRACT (round-4 verdict item 4): every config this script
# refreshes runs with --check, and the script exits NONZERO if any job
# — including any gate — failed. "Refreshed but ungated" artifacts can
# no longer be produced by this path; tests/test_golden.py additionally
# re-evaluates every committed results/<cfg>/result.json in CI.
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

# 1. Headline bench — also reports the production (NGD) step time.
run_job bench 1800 python bench.py
grep -h '"metric"' "$LOGDIR/bench.log" | tail -1 > "$LOGDIR/bench_line.json" || true

# 2. c8_amortized_svi full-scale, post-round-4 fixes (sandwiched natgrad
#    blend, qx_var_floor, slow-Z, f64 final ELBO). Gates enforced.
run_job c8 7200 python experiments/run.py c8_amortized_svi --check --out results/c8

# 3. c9_mrd_svi_bigN full-scale, post-round-4 fixes. Gates enforced
#    (throughput + the new relevance-signature gate).
run_job c9 7200 python experiments/run.py c9_mrd_svi_bigN --check --out results/c9

# 4/5. big-N single-family configs: gate re-confirmation.
run_job c6_check 5400 python experiments/run.py c6_svi_bigN --check --out results/c6_recheck
run_job c7_check 9000 python experiments/run.py c7_dp_svi --check --out results/c7

# 6. Serving latency refresh including the encoder-imputer rows.
run_job serving 3600 python experiments/serving_bench.py --out results/serving_bench.json

echo "== summary =="
rc=0
for k in "${!STATUS[@]}"; do
  echo "$k: ${STATUS[$k]}"
  [ "${STATUS[$k]}" != ok ] && rc=1
done
if [ "$rc" -ne 0 ]; then
  echo "REFRESH FAILED: at least one job or gate failed (see $LOGDIR/*.log)"
  echo "do NOT commit the failing artifacts; fix or recalibrate"
  echo "(experiments/calibrate_checks.py) and re-run."
fi
exit "$rc"
