#!/bin/bash
# Reusable wedge-gated runner: probe the TPU tunnel with backoff (5->30 min)
# until an execute-probe (matmul + host fetch) passes, then run the given
# command under a timeout. Usage:
#   bash benchmarks/gated_run.sh <timeout_secs> <cmd...>
# Output appends to runs/soak_round5.log. Run with no other jax process.
set -x
cd /root/repo
OUT=${OUT:-/root/repo/runs}
LOG=$OUT/soak_round5.log
exec >>"$LOG" 2>&1
TMO=$1; shift

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

echo "=== gated_run start: $(date -u) — timeout $TMO: $*"
probe || exit 1
timeout "$TMO" "$@"
rc=$?   # capture BEFORE any $(...) substitution can clobber $?
echo "=== gated_run done: $(date -u) rc=$rc — $*"
