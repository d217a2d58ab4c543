#!/bin/bash
# r05 queue 6: hv15 re-measure post VAE channel-order fix (77a35ad),
# then the TeaCache+Sol combined row.
cd /root/repo
R=bench_results_r05
run() {
  name=$1; shift
  echo "=== $name : $* === $(date +%H:%M:%S)" >> $R/queue6.log
  env "$@" timeout 3000 python bench.py > $R/$name.out 2> $R/$name.err
  echo "--- $name rc=$? $(date +%H:%M:%S)" >> $R/queue6.log
  grep -h '"metric"' $R/$name.out >> $R/queue6.log 2>/dev/null
}
run hv15_post BENCH_CONFIG=hv15_480p
run tea_sol BENCH_ATTN=sol
echo "QUEUE6 DONE $(date +%H:%M:%S)" >> $R/queue6.log
