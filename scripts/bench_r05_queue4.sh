#!/bin/bash
# Round-5 queue 4: hv15 + vace + ti2v with the host-loop constant-capture
# fix (params passed as jit ARGUMENTS — closed-over weights were lowered
# as 4.3/13.2 GB constants and killed the remote compile helper), then
# the tea+sol candidate row and a default-config confirmation.
set -u
cd /root/repo
OUT=bench_results_r05
mkdir -p "$OUT"

run() {
  local name="$1"; shift
  echo "=== $name : $* === $(date -u +%H:%M:%S)" | tee -a "$OUT/queue4.log"
  env "$@" timeout 5400 python bench.py > "$OUT/$name.out" 2> "$OUT/$name.err"
  local rc=$?
  echo "--- $name rc=$rc $(date -u +%H:%M:%S)" | tee -a "$OUT/queue4.log"
  tail -1 "$OUT/$name.out" | tee -a "$OUT/queue4.log"
}

run hv15_480p BENCH_CONFIG=hv15_480p
run vace      BENCH_CONFIG=vace_multitalk
run ti2v_5b   BENCH_CONFIG=ti2v_5b
run tea_sol   BENCH_ATTN=sol      # BENCH_CACHE defaults to tea now
run default   BENCH_DUMMY=1       # default: radial + tea + w4a8

echo "=== QUEUE4 DONE $(date -u +%H:%M:%S) ===" | tee -a "$OUT/queue4.log"
