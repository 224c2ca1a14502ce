#!/bin/bash
# Round-5 final measurement batch: run sequentially on the single TPU chip.
# Produces the bench_all_configs.json artifact + the serving table numbers
# for BASELINE.md (VERDICT r4 items 5 and 6).
set -u
cd /root/repo
log=/tmp/round5_bench.log
: > $log
run() { echo "=== $* ===" | tee -a $log; timeout 2400 "$@" 2>&1 | grep -v WARNING | tail -4 | tee -a $log; }
run python bench.py --all-configs                        # artifact: 5 configs + stress + 100k
run python bench.py --batch 2
run python bench.py --batch 4
run python bench.py --batch 8
run python bench.py --batch 2 --width 3840 --height 2160
run python bench.py --batch 4 --width 3840 --height 2160
run python bench.py --batch 8 --width 3840 --height 2160
echo DONE | tee -a $log
