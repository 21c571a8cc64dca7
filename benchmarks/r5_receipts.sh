#!/bin/bash
# Round-5 receipts sweep: one sequential TPU session recording every
# "built but unproven" round-4 claim (VERDICT item 2).  One TPU process
# at a time (the tunnel serializes clients), generous timeouts (killed
# TPU jobs can wedge the remote session).
set -u
cd /root/repo
LOG=/tmp/r5_receipts
mkdir -p $LOG

run() {
  name=$1; shift
  echo "=== $name: $* ==="
  timeout "$TMO" python -u "$@" > "$LOG/$name.log" 2>&1
  echo "--- $name exit=$? ($(date +%H:%M:%S))"
}

TMO=2400 run sweep    benchmarks/run.py all
TMO=1800 run largek   benchmarks/largek_probe.py 1000000 128 2048 1000,2048,4080
TMO=1200 run mst      benchmarks/mst_probe.py 1000000 8 5
TMO=2400 run dual     benchmarks/dual_probe.py
TMO=1800 run radius2  benchmarks/radius_ab_probe.py 100000 4096 2
TMO=1800 run radius8  benchmarks/radius_ab_probe.py 100000 4096 8
echo "ALL DONE $(date +%H:%M:%S)"
