#!/bin/bash
# Round-5 TPU session 2 (take 3): the tunnel today runs at ~4-7 MB/s
# with 1-4 min client handshakes (measured, /tmp/upload_probe.log), so:
# long timeouts, a health gate between steps (a slow/wedged tunnel gets
# quiet time instead of a pile-up of killed clients), 60 s gaps so a new
# client never overlaps the previous one's teardown, probes ordered by
# value per TPU-minute.
set -u
cd /root/repo
LOG=/tmp/r5_receipts
mkdir -p $LOG

health() {
  # one tiny client: device list + matmul + 4 MB upload
  for i in 1 2 3; do
    if timeout 420 python -u /tmp/tpu_health.py > $LOG/health_last.log 2>&1
    then
      echo "health OK ($(date +%H:%M:%S))"
      sleep 60
      return 0
    fi
    echo "health FAIL #$i ($(date +%H:%M:%S)) — 600 s quiet"
    sleep 600
  done
  return 1
}

run() {
  name=$1; shift
  health || { echo "tunnel dead before $name — stopping"; exit 1; }
  echo "=== $name: $* ($(date +%H:%M:%S)) ==="
  timeout "$TMO" python -u "$@" > "$LOG/$name.log" 2>&1
  echo "--- $name exit=$? ($(date +%H:%M:%S))"
  sleep 60
}

TMO=4800 run tune2    benchmarks/bcap_tune2.py
TMO=4800 run bcap2    benchmarks/bcap2_probe.py
TMO=2400 run vpkern   benchmarks/vp_kernel_probe.py
TMO=2400 run mstwarm  benchmarks/mst_probe.py 1000000 8 5
TMO=1800 run sweep1   benchmarks/run.py config1
TMO=1800 run sweep2   benchmarks/run.py config2
TMO=1800 run sweep4   benchmarks/run.py config4
TMO=2400 run rdecomp  benchmarks/radius_decomp_probe.py 100000 4096 4
TMO=2400 run mst2dual benchmarks/mst_probe.py 300000 2 5 dual
TMO=2400 run mst2scan benchmarks/mst_probe.py 300000 2 5 scan
echo "ALL DONE $(date +%H:%M:%S)"
