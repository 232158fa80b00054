#!/bin/bash
# Round-5 chip queue: run queued bench experiments the moment the axon
# tunnel is alive. Pauses the CPU search jobs (pids in /tmp/cpu_jobs.pids)
# during probes and chip runs so the single host core is free, resumes
# them while the tunnel is wedged. Each item retries (fresh process per
# attempt - a poisoned remote process can never allocate again) until
# rc=0 or the attempt cap.
cd /root/repo
Q=/tmp/r5_queue.log
say() { echo "$(date +%H:%M:%S) $*" >> "$Q"; }

pause_cpu() { for p in $(cat /tmp/cpu_jobs.pids 2>/dev/null); do kill -STOP "$p" 2>/dev/null; done; }
resume_cpu() { for p in $(cat /tmp/cpu_jobs.pids 2>/dev/null); do kill -CONT "$p" 2>/dev/null; done; }

probe() {
  timeout 150 python -c "
import jax, jax.numpy as jnp, numpy as np
x = jnp.ones((256,256)); v = np.asarray(x@x)
assert np.isfinite(v).all(); print('ok')
" > /tmp/qprobe_out 2>&1
  grep -q '^ok$' /tmp/qprobe_out
}

wait_alive() {
  pause_cpu; sleep 2
  until probe; do
    echo "$(date +%s) wedged" >> /tmp/tpu_status
    say "tunnel wedged; sleeping 150s"
    resume_cpu; sleep 150; pause_cpu; sleep 2
  done
  echo "$(date +%s) TPU ALIVE" >> /tmp/tpu_status
  say "tunnel ALIVE"
}

run_item() { # run_item <name> <timeout_s> <log> <env...>
  local name="$1" tmo="$2" log="$3"; shift 3
  for attempt in 1 2 3; do
    wait_alive
    say "START $name (attempt $attempt)"
    env "$@" timeout "$tmo" python bench.py > "$log" 2>&1
    local rc=$?
    say "DONE $name rc=$rc $(tail -c 300 "$log" | grep -o '"value": [0-9.]*' | tail -1)"
    [ "$rc" -eq 0 ] && return 0
  done
  say "GIVEUP $name"
  return 1
}

say "=== queue start ==="
run_item m20_t27 5400 /tmp/r5_m20_t27.log \
  BENCH_DEPTH=20 BENCH_TARGET_SIZE=27 BENCH_SLICE_BATCH=8
run_item combo256_head 2400 /tmp/r5_combo256_head.log \
  BENCH_PLAN=plans/sycamore53_m10_t27_combo-256.json
say "=== queue done ==="
resume_cpu
