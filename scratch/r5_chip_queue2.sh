#!/bin/bash
# r5_chip_queue2.sh — round-5 remaining chip A/B queue.
# Runs each queued bench when the tunnel is alive, pausing CPU search
# jobs (/tmp/cpu_jobs.pids) during probes and runs, retrying on a
# wedge (bench rc=3 = liveness watchdog abort). Logs land in /tmp.
cd /root/repo
pause_cpu() { for p in $(cat /tmp/cpu_jobs.pids 2>/dev/null); do kill -STOP "$p" 2>/dev/null; done; }
resume_cpu() { for p in $(cat /tmp/cpu_jobs.pids 2>/dev/null); do kill -CONT "$p" 2>/dev/null; done; }

wait_alive() {
  while true; do
    pause_cpu; sleep 2
    timeout 150 python -c "
import jax, jax.numpy as jnp, numpy as np
x = jnp.ones((256,256)); v = np.asarray(x@x)
assert np.isfinite(v).all(); print('ok')
" > /tmp/qprobe_out 2>&1
    if grep -q '^ok$' /tmp/qprobe_out; then
      echo "$(date +%s) TPU ALIVE" >> /tmp/tpu_status; return 0
    fi
    echo "$(date +%s) wedged" >> /tmp/tpu_status
    resume_cpu; sleep 150
  done
}

run_exp() {  # run_exp <log> <timeout> <env...> — retries twice on wedge
  local LOG="$1" TMO="$2"; shift 2
  for attempt in 1 2 3; do
    wait_alive
    env "$@" timeout "$TMO" python bench.py > "$LOG" 2>&1
    rc=$?
    echo "rc=$rc attempt=$attempt" >> "$LOG"
    resume_cpu
    if [ "$rc" != 3 ] && [ "$rc" != 124 ]; then return $rc; fi
    sleep 120
  done
  return 3
}

# 1. r5cand: 4-slice plan searched under the chip-calibrated tpu objective
run_exp /tmp/r5cand_chip.log 2400 BENCH_PLAN=plans/r5cand_m10_t27.json
echo "=== r5cand done rc=$? ===" >> /tmp/r5_queue2.log

# 2. unsliced tpu-objective plan (modelled 0.452s); needs t29 so bench
#    doesn't re-slice the 2^28-peak tree
run_exp /tmp/r5tpu_unsliced_chip.log 2400 \
  BENCH_PLAN=plans/sycamore53_m10_t27_tpu.json BENCH_TARGET_SIZE=29
echo "=== unsliced tpu plan done rc=$? ===" >> /tmp/r5_queue2.log

resume_cpu
echo "=== queue complete ===" >> /tmp/r5_queue2.log
