#!/bin/bash
# r05 queue 7: hv15 decode re-measure with the DiT freed pre-decode,
# then a full default-config re-run at HEAD (the driver's BENCH_r05
# config) to confirm the post-a9dbf48 dit.py changes kept the
# north-star row intact.
cd /root/repo
R=bench_results_r05
run() {
  name=$1; shift
  echo "=== $name : $* === $(date +%H:%M:%S)" >> $R/queue7.log
  env "$@" timeout 3000 python bench.py > $R/$name.out 2> $R/$name.err
  echo "--- $name rc=$? $(date +%H:%M:%S)" >> $R/queue7.log
  grep -h '"metric"' $R/$name.out >> $R/queue7.log 2>/dev/null
}
run hv15_freed BENCH_CONFIG=hv15_480p
run default_head BENCH_DEFAULT=1
echo "QUEUE7 DONE $(date +%H:%M:%S)" >> $R/queue7.log
