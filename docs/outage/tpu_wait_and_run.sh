#!/bin/bash
while true; do
  if timeout 150 python -c "
import jax, jax.numpy as jnp
assert jax.default_backend() == 'tpu'
x = jnp.ones((8,128)); assert float(x.sum()) == 1024.0
print('TPU-OK')
" >> /tmp/tpu_probe_loop.log 2>&1; then
    echo "TPU BACK at $(date)" >> /tmp/tpu_probe_loop.log
    /tmp/hw_queue.sh
    exit 0
  fi
  echo "still down at $(date)" >> /tmp/tpu_probe_loop.log
  sleep 180
done
