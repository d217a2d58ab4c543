#!/bin/bash
# r05 queue 8: hv15 VAE-only decode diagnosis, then the default bench
# retry (sol+tea with the new radial OOM-fallback).
cd /root/repo
R=bench_results_r05
echo "=== diag_hv15_vae === $(date +%H:%M:%S)" >> $R/queue8.log
timeout 2400 python scripts/diag_hv15_vae.py > $R/diag_vae.out 2> $R/diag_vae.err
echo "--- diag rc=$? $(date +%H:%M:%S)" >> $R/queue8.log
echo "=== default_retry === $(date +%H:%M:%S)" >> $R/queue8.log
timeout 3000 python bench.py > $R/default_retry.out 2> $R/default_retry.err
echo "--- default_retry rc=$? $(date +%H:%M:%S)" >> $R/queue8.log
grep -h '"metric"' $R/default_retry.out >> $R/queue8.log 2>/dev/null
echo "QUEUE8 DONE $(date +%H:%M:%S)" >> $R/queue8.log
