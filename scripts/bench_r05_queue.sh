#!/bin/bash
# Round-5 measurement queue: runs every unmeasured BENCH row sequentially
# on the one real TPU chip, logging each JSON line + full output under
# bench_results_r05/.  Each run is bounded by `timeout`.
set -u
cd /root/repo
OUT=bench_results_r05
mkdir -p "$OUT"

run() {
  local name="$1"; shift
  echo "=== $name : $* === $(date -u +%H:%M:%S)" | tee -a "$OUT/queue.log"
  env "$@" timeout 5400 python bench.py > "$OUT/$name.out" 2> "$OUT/$name.err"
  local rc=$?
  echo "--- $name rc=$rc $(date -u +%H:%M:%S)" | tee -a "$OUT/queue.log"
  tail -1 "$OUT/$name.out" | tee -a "$OUT/queue.log"
}

# 1. North star: TeaCache 30-step row (VERDICT ask #1)
run tea          BENCH_CACHE=tea BENCH_RESID=bf16
# 2. Sol-Attn vs radial (ask #4): default tau, then a tighter budget point
run sol          BENCH_ATTN=sol
# 3. The four remaining BASELINE configs (ask #2)
run flux_schnell BENCH_CONFIG=flux_schnell
run ti2v_5b      BENCH_CONFIG=ti2v_5b
run hv15_480p    BENCH_CONFIG=hv15_480p
run vace         BENCH_CONFIG=vace_multitalk
# 4. Flagship default re-measure (owns the r04 0.0142->0.0140 delta, ask #9)
run default      BENCH_DUMMY=1

echo "=== QUEUE DONE $(date -u +%H:%M:%S) ===" | tee -a "$OUT/queue.log"
