#!/bin/bash
# VERDICT r1 #8: Sports-scale perf pass — serialized TPU experiments.
# Run AFTER the baseline bench (one chip, one process at a time).
#
# Each invocation writes to its own timestamped directory so reruns never
# interleave with stale output, and the script exits non-zero if any run
# failed (ADVICE r2: append-mode /tmp paths made a failed bench look like
# data).
set -u
cd "$(dirname "$0")/.."
OUT="${SPORTS_EXP_OUT:-/tmp/sports_exp.$(date +%Y%m%d_%H%M%S)}"
mkdir -p "$OUT"
echo "results -> $OUT" >&2
FAILED=0
run() {
  local tag="$1"; shift
  echo "=== $tag ($(date +%H:%M:%S)) ===" >> "$OUT/log"
  timeout 2400 env "$@" python scripts/bench_zoo.py mmssl_sports \
    >> "$OUT/$tag.json" 2>> "$OUT/log"
  local rc=$?
  echo "--- $tag exit=$rc ---" >> "$OUT/log"
  if [ "$rc" -ne 0 ]; then
    echo "FAILED: $tag (exit $rc)" >&2
    FAILED=1
  fi
}
run lowrank   MMSSL_BENCH_OVERRIDES="model.disc_lowrank=on"
run gp_bf16   MMSSL_BENCH_OVERRIDES="model.gp_act_dtype=bfloat16"
run combined  MMSSL_BENCH_OVERRIDES="model.disc_lowrank=on,model.gp_act_dtype=bfloat16"
echo "ALL DONE (failed=$FAILED)" >> "$OUT/log"
exit $FAILED
