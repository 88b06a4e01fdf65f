#!/bin/bash
# probe the tunnel every 5 min; when healthy, re-run the serving bench
# (captures the jitted-init fast boot in SERVING_r05); give up after 10
# tries. Keeps the existing green artifact if the probe never passes.
cd /root/repo
for i in $(seq 1 10); do
  if timeout 240 python -c "
import jax, jax.numpy as jnp
x = jnp.ones((128,128), jnp.bfloat16)
(x@x).block_until_ready()
import time, jax.numpy as jnp
t0=time.time()
for _ in range(5):
    (x@x).block_until_ready()
assert time.time()-t0 < 5, 'slow phase'
print('HEALTHY')" 2>/dev/null | grep -q HEALTHY; then
    echo "tunnel healthy on try $i; running bench $(date)"
    cp SERVING_r05.json /tmp/SERVING_r05.green.json
    if python tools/serving_bench_round.py > /tmp/r5_serving6.log 2>&1; then
      echo "bench ok $(date)"
    else
      echo "bench failed; restoring green artifact"
      cp /tmp/SERVING_r05.green.json SERVING_r05.json
    fi
    exit 0
  fi
  echo "probe $i unhealthy $(date)"
  sleep 300
done
echo "gave up; green artifact stands"
