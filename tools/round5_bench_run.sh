#!/bin/bash
# Round-5 measurement batch: run sequentially on the single TPU chip.
set -u
cd /root/repo
log=/tmp/round5_bench.log
: > $log
run() { echo "=== $* ===" | tee -a $log; timeout 900 "$@" 2>&1 | grep -v WARNING | tail -4 | tee -a $log; }
run python bench.py                                      # headline 1080p
run python bench.py --width 3840 --height 2160           # 4K
run python bench.py --scene stress --objects 840         # stress 10k
run python bench.py --scene stress100k                   # 100k scale
run python bench.py --batch 2
run python bench.py --batch 4
run python bench.py --batch 8
run python bench.py --batch 2 --width 3840 --height 2160
run python bench.py --batch 4 --width 3840 --height 2160
run python bench.py --batch 8 --width 3840 --height 2160
run python tools/stress_probe.py --objects 840
run python tools/stress_probe.py --scene stress100k
run python tools/perf_probe.py --configs 3840x2160 --tile-h 216
echo DONE | tee -a $log
