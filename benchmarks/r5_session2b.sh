#!/bin/bash
# Round-5 TPU session 2 (revised): kernel-gap attack sweeps first
# (bcap granule/tile tune, the new bcap2 two-phase scheme, the VP
# kernel route), then the remaining receipts (config sweep, warm MST,
# dim-2 MST A/B, radius decomposition).  One TPU process at a time
# (the tunnel serializes clients); generous timeouts.
set -u
cd /root/repo
LOG=/tmp/r5_receipts
mkdir -p $LOG

run() {
  name=$1; shift
  echo "=== $name: $* ($(date +%H:%M:%S)) ==="
  timeout "$TMO" python -u "$@" > "$LOG/$name.log" 2>&1
  echo "--- $name exit=$? ($(date +%H:%M:%S))"
}

TMO=3000 run tune2    benchmarks/bcap_tune2.py
TMO=3000 run bcap2    benchmarks/bcap2_probe.py
TMO=1500 run vpkern   benchmarks/vp_kernel_probe.py
TMO=2400 run sweep2   benchmarks/run.py all
TMO=1500 run mstwarm  benchmarks/mst_probe.py 1000000 8 5
TMO=2400 run rdecomp  benchmarks/radius_decomp_probe.py 100000 4096 4
TMO=1800 run mst2dual benchmarks/mst_probe.py 300000 2 5 dual
TMO=1500 run mst2scan benchmarks/mst_probe.py 300000 2 5 scan
echo "ALL DONE $(date +%H:%M:%S)"
