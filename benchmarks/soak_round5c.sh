#!/bin/bash
# GroupC relaunch wrapper: the first groupC attempt passed its probe but
# wedged mid-leg (futex hang at 00:56 UTC, killed by PID). Same
# probe-backoff gate as benchmarks/soak_round5.sh, then the groupC legs.
set -x
cd /root/repo
OUT=${OUT:-/root/repo/runs}
LOG=$OUT/soak_round5.log
exec >>"$LOG" 2>&1

probe() {
  for attempt in $(seq 1 24); do
    if timeout 150 python -c "
import jax, jax.numpy as jnp
x = jnp.ones((512, 512))
assert float((x @ x).sum()) == 512.0 ** 3
print('probe ok')"; then
      sleep 95
      return 0
    fi
    backoff=$((attempt * 300)); [ $backoff -gt 1800 ] && backoff=1800
    echo "probe wedged (attempt $attempt) at $(date -u); backing off ${backoff}s"
    sleep $backoff
  done
  echo "tunnel did not recover after $attempt probes; giving up"
  return 1
}

echo "=== groupC retry start: $(date -u) ==="
sleep 300   # quiet time after the killed wedge
probe || exit 1
timeout 5400 python benchmarks/soak_round5b.py
echo "=== groupC retry done: $(date -u) rc=$? ==="
