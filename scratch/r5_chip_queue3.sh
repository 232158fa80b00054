#!/bin/bash
# r5_chip_queue3.sh — round-5 final-stretch chip queue.
# 1. official m=10 bench (re-warm the fresh .jax_cache for the driver)
# 2. BENCH_STAGE_SIZE=256 A/B on the official plan (compile-budget lever)
# 3. m=20 re-measure with the 19.63 plan + regenerated refamp sidecar
# Pauses CPU search jobs (/tmp/cpu_jobs.pids) during runs; retries on a
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

# 1. official config — cold compile (fresh cache), then it is warm
run_exp /tmp/r5q3_official.log 2400
echo "=== official done rc=$? ===" >> /tmp/r5_queue3.log

# 2. single-stage program A/B (runbook r4 step 5, never run): fewer,
#    bigger stage programs compiled FASTER on combo-256 (40.5 vs 56.7 s)
run_exp /tmp/r5q3_stage256.log 2400 BENCH_STAGE_SIZE=256
echo "=== stage256 done rc=$? ===" >> /tmp/r5_queue3.log

# 3. m=20 north star with the 19.63 plan (12.3x fewer total flops than
#    the round-5-measured 20.72 plan) + fresh refamp
run_exp /tmp/r5q3_m20.log 5400 BENCH_DEPTH=20 BENCH_TARGET_SIZE=27 BENCH_SLICE_BATCH=8
echo "=== m20 done rc=$? ===" >> /tmp/r5_queue3.log

resume_cpu
echo "=== queue complete ===" >> /tmp/r5_queue3.log
