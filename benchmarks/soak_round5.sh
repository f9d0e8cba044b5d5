#!/bin/bash
# Round-5 on-chip legs: probe-gate once per GROUP, then run that group's
# legs inside ONE python process (benchmarks/soak_round5.py) — the tunnel
# wedge tax is per process start, so in-process cli.main() legs pay it once
# per group instead of per leg like the round-4 consolidated script did.
# Two groups bound the blast radius of an unkillable mid-leg execution
# wedge. Run with no other jax process alive.
set -x
cd /root/repo
OUT=${OUT:-/root/repo/runs}
LOG=$OUT/soak_round5.log
mkdir -p "$OUT" "$OUT/soak_eeg2"
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

echo "=== round-5 legs start: $(date -u) ==="
probe || exit 1
timeout 7200 python benchmarks/soak_round5.py groupA
echo "=== groupA done: $(date -u) rc=$? ==="
sleep 95
probe || exit 1
timeout 14400 python benchmarks/soak_round5.py groupB
echo "=== groupB done: $(date -u) rc=$? ==="
