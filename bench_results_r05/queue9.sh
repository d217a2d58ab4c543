#!/bin/bash
# r05 queue 9: fresh-process hv15 decode attempts — one tile size per
# process (a failed alloc poisons the in-process heap), fp32 then bf16.
cd /root/repo
R=bench_results_r05
run() {
  name=$1; shift
  echo "=== $name : $* === $(date +%H:%M:%S)" >> $R/queue9.log
  env "$@" timeout 2400 python scripts/diag_hv15_vae.py > $R/$name.out 2> $R/$name.err
  echo "--- $name rc=$? $(date +%H:%M:%S)" >> $R/queue9.log
}
run diag_t128 DIAG_TILES=128
run diag_t96_bf16 DIAG_TILES=96 DIAG_DTYPE=bf16
run diag_t192_bf16 DIAG_TILES=192 DIAG_DTYPE=bf16
echo "QUEUE9 DONE $(date +%H:%M:%S)" >> $R/queue9.log
