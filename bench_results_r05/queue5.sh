#!/bin/bash
# r05 serial chip-bench queue (one at a time — the tunnel's compile
# helper has crashed under concurrent host load)
cd /root/repo
R=bench_results_r05
run() {
  name=$1; shift
  echo "=== $name : $* === $(date +%H:%M:%S)" >> $R/queue5.log
  env "$@" timeout 3000 python bench.py > $R/$name.out 2> $R/$name.err
  echo "--- $name rc=$? $(date +%H:%M:%S)" >> $R/queue5.log
  grep -h '"metric"' $R/$name.out >> $R/queue5.log 2>/dev/null
}
run vace BENCH_CONFIG=vace_multitalk
run hv15_480p BENCH_CONFIG=hv15_480p
run ti2v_5b BENCH_CONFIG=ti2v_5b
run tea_sol BENCH_ATTN=sol
echo "QUEUE5 DONE $(date +%H:%M:%S)" >> $R/queue5.log
