#!/bin/bash
# Probe TPU liveness every 3 min until a tiny matmul succeeds.
# Writes status lines to /tmp/tpu_status; exits 0 on first success.
while true; do
  timeout 90 python -c "
import jax, jax.numpy as jnp, numpy as np
x = jnp.ones((256,256)); v = np.asarray(x@x)
assert np.isfinite(v).all()
print('ok')
" >/tmp/tpu_probe_out 2>&1
  if grep -q '^ok$' /tmp/tpu_probe_out; then
    echo "$(date +%s) TPU ALIVE" >> /tmp/tpu_status
    exit 0
  fi
  echo "$(date +%s) wedged" >> /tmp/tpu_status
  sleep 180
done
