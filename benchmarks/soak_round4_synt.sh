#!/bin/bash
# Round-4 TSTR `synt` closure: the trained EEG flow checkpoints from the
# earlier soak legs were multi-GB and got cleaned from disk (runs/soak_eeg/
# kept only the gitignored-safe artifacts), so the synt regime — the one
# TSTR regime that samples from the trained flows — retrains both
# per-class flows (6000 iters each, ~1-2 min/flow on-chip) into a fresh
# dir and runs the protocol. Matches /root/reference/test_eegglow.py:105-197.
# Tunnel rules: ONE jax process at a time, 95 s gaps, execute-probe gate.
set -x
cd /root/repo
OUT=${OUT:-/root/repo/runs}
LOG=$OUT/soak_round4_final.log
mkdir -p "$OUT/soak_eeg2"
exec >>"$LOG" 2>&1

gap() { sleep 95; probe; }

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

echo "=== round-4 TSTR synt closure start: $(date -u) ==="
probe || exit 1

for etype in mi baseline; do
  timeout 1800 python -m vgd_tpu.cli glow-eeg --iters 6000 --event-type $etype \
      --out-dir "$OUT/soak_eeg2" --seed 42
  gap
done

timeout 1800 python -m vgd_tpu.cli tstr --method synt \
    --ckpt-dir "$OUT/soak_eeg2" --subjects 01 02 \
    > "$OUT/soak_eeg/tstr_synt.json.txt"

echo "=== round-4 TSTR synt closure done: $(date -u) ==="
