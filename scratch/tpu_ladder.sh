#!/bin/bash
# Auto-run the round-3 TPU bench ladder the moment the tunnel revives.
#
# Waits for the probe loop (scratch/tpu_probe.sh) to append "TPU ALIVE"
# to /tmp/tpu_status, then runs the m=10 windowed-executor bench
# (first real end-to-end measurement of the round-3 MXU gate path).
# Results land in /tmp/bench_r3_m10.{json,log}; analysis is manual.
cd /root/repo
while ! grep -q 'TPU ALIVE' /tmp/tpu_status 2>/dev/null; do
  sleep 60
done
echo "$(date +%s) ladder: starting m=10 bench" >> /tmp/tpu_status
timeout 5400 python bench.py \
  > /tmp/bench_r3_m10.json 2> /tmp/bench_r3_m10.log
rc=$?
echo "$(date +%s) ladder: m10 bench exit $rc" >> /tmp/tpu_status
if [ "$rc" = 0 ]; then
  echo "$(date +%s) ladder: starting m=20 bench (t27)" >> /tmp/tpu_status
  BENCH_DEPTH=20 BENCH_TARGET_SIZE=27 BENCH_SLICE_BATCH=8 \
    timeout 5400 python bench.py \
    > /tmp/bench_r3_m20.json 2> /tmp/bench_r3_m20.log
  echo "$(date +%s) ladder: m20 bench exit $?" >> /tmp/tpu_status
fi
