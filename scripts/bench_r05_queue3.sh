#!/bin/bash
# Round-5 queue 3: hv15 crash bisect, fixed vace, clean ti2v re-measure,
# and the tea+sol combined row (candidate best config).
set -u
cd /root/repo
OUT=bench_results_r05
mkdir -p "$OUT"

run() {
  local name="$1"; shift
  echo "=== $name : $* === $(date -u +%H:%M:%S)" | tee -a "$OUT/queue3.log"
  env "$@" timeout 5400 python bench.py > "$OUT/$name.out" 2> "$OUT/$name.err"
  local rc=$?
  echo "--- $name rc=$rc $(date -u +%H:%M:%S)" | tee -a "$OUT/queue3.log"
  tail -1 "$OUT/$name.out" | tee -a "$OUT/queue3.log"
}

echo "=== diag_hv15 === $(date -u +%H:%M:%S)" | tee -a "$OUT/queue3.log"
timeout 3600 python scripts/diag_hv15.py > "$OUT/diag_hv15.out" 2>&1
echo "--- diag rc=$? $(date -u +%H:%M:%S)" | tee -a "$OUT/queue3.log"
grep "\[diag\]" "$OUT/diag_hv15.out" | tee -a "$OUT/queue3.log"

run vace      BENCH_CONFIG=vace_multitalk
run ti2v_5b   BENCH_CONFIG=ti2v_5b
run tea_sol   BENCH_ATTN=sol      # BENCH_CACHE defaults to tea now
run default   BENCH_DUMMY=1       # new default: radial + tea

echo "=== QUEUE3 DONE $(date -u +%H:%M:%S) ===" | tee -a "$OUT/queue3.log"
