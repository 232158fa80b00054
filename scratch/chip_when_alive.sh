#!/bin/bash
# chip_when_alive.sh <logfile> <timeout_s> <cmd...>
# Wait for the axon tunnel to answer a tiny matmul, pausing the CPU
# jobs in /tmp/cpu_jobs.pids during probes/run, then run the command
# once (fresh process). Exits with the command's rc.
LOG="$1"; TMO="$2"; shift 2
pause_cpu() { for p in $(cat /tmp/cpu_jobs.pids 2>/dev/null); do kill -STOP "$p" 2>/dev/null; done; }
resume_cpu() { for p in $(cat /tmp/cpu_jobs.pids 2>/dev/null); do kill -CONT "$p" 2>/dev/null; done; }
cd /root/repo
while true; do
  pause_cpu; sleep 2
  timeout 150 python -c "
import jax, jax.numpy as jnp, numpy as np
x = jnp.ones((256,256)); v = np.asarray(x@x)
assert np.isfinite(v).all(); print('ok')
" > /tmp/qprobe_out 2>&1
  if grep -q '^ok$' /tmp/qprobe_out; then
    echo "$(date +%s) TPU ALIVE" >> /tmp/tpu_status
    break
  fi
  echo "$(date +%s) wedged" >> /tmp/tpu_status
  resume_cpu; sleep 150
done
timeout "$TMO" "$@" > "$LOG" 2>&1
rc=$?
resume_cpu
echo "rc=$rc" >> "$LOG"
exit $rc
