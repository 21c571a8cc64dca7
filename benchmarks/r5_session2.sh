#!/bin/bash
# Round-5 TPU session 2: bcap granule/tile tuning + dim-2 MST receipt +
# the re-timed config sweep (device-resident queries, sustained +
# sequential walls).
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

TMO=3600 run tune2    benchmarks/bcap_tune2.py
TMO=2400 run rdecomp  benchmarks/radius_decomp_probe.py 100000 4096 4
TMO=1200 run mstwarm  benchmarks/mst_probe.py 1000000 8 5
TMO=1800 run mst2dual benchmarks/mst_probe.py 300000 2 5 dual
TMO=1500 run mst2scan benchmarks/mst_probe.py 300000 2 5 scan
TMO=2400 run sweep2   benchmarks/run.py all
echo "ALL DONE $(date +%H:%M:%S)"
