#!/bin/bash
# VERDICT r1 #8: Sports-scale perf pass — serialized TPU experiments.
# Run AFTER the baseline bench (one chip, one process at a time).
set -u
cd "$(dirname "$0")/.."
run() {
  local tag="$1"; shift
  echo "=== $tag ($(date +%H:%M:%S)) ===" >> /tmp/sports_exp.log
  timeout 2400 env "$@" python scripts/bench_zoo.py mmssl_sports \
    >> /tmp/sports_exp.json 2>> /tmp/sports_exp.log
  echo "--- $tag exit=$? ---" >> /tmp/sports_exp.log
}
run lowrank   MMSSL_BENCH_OVERRIDES="model.disc_lowrank=on"
run gp_bf16   MMSSL_BENCH_OVERRIDES="model.gp_act_dtype=bfloat16"
run combined  MMSSL_BENCH_OVERRIDES="model.disc_lowrank=on,model.gp_act_dtype=bfloat16"
echo "ALL DONE" >> /tmp/sports_exp.log
