#!/bin/bash
# Round-5 queue 2: re-runs after the sol SMEM/HBM fixes, hv15/vace
# host-loop fixes, and the ti2v tiled VAE decode.
set -u
cd /root/repo
OUT=bench_results_r05
mkdir -p "$OUT"

run() {
  local name="$1"; shift
  echo "=== $name : $* === $(date -u +%H:%M:%S)" | tee -a "$OUT/queue2.log"
  env "$@" timeout 5400 python bench.py > "$OUT/$name.out" 2> "$OUT/$name.err"
  local rc=$?
  echo "--- $name rc=$rc $(date -u +%H:%M:%S)" | tee -a "$OUT/queue2.log"
  tail -1 "$OUT/$name.out" | tee -a "$OUT/queue2.log"
}

run sol          BENCH_ATTN=sol
run hv15_480p    BENCH_CONFIG=hv15_480p
run vace         BENCH_CONFIG=vace_multitalk
run ti2v_5b      BENCH_CONFIG=ti2v_5b

echo "=== QUEUE2 DONE $(date -u +%H:%M:%S) ===" | tee -a "$OUT/queue2.log"
