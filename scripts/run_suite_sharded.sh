#!/bin/bash
# Full test suite in per-batch pytest processes.  A long single process
# accumulates XLA:CPU compile state and has been observed to segfault
# after ~300 tests (compiler crash inside backend_compile); separate
# processes sidestep that and give per-batch accounting.
set -u
cd "$(dirname "$0")/.."
export JAX_PLATFORMS=cpu
BATCH=${BATCH:-12}
mapfile -t FILES < <(ls tests/test_*.py | sort)
total_pass=0; total_fail=0; failed_files=()
for ((i = 0; i < ${#FILES[@]}; i += BATCH)); do
    chunk=("${FILES[@]:i:BATCH}")
    out=$(python -m pytest "${chunk[@]}" -q 2>/dev/null | tail -2)
    p=$(grep -o '[0-9]* passed' <<< "$out" | grep -o '[0-9]*' | head -1)
    f=$(grep -o '[0-9]* failed' <<< "$out" | grep -o '[0-9]*' | head -1)
    total_pass=$((total_pass + ${p:-0}))
    if [ -n "${f:-}" ] && [ "${f:-0}" -gt 0 ]; then
        total_fail=$((total_fail + f)); failed_files+=("${chunk[@]}")
    fi
    echo "[suite] batch $((i / BATCH + 1)): ${p:-0} passed ${f:-0} failed"
done
echo "[suite] TOTAL: $total_pass passed, $total_fail failed"
if [ "$total_fail" -gt 0 ]; then
    echo "[suite] failing batches: ${failed_files[*]}"
    exit 1
fi
