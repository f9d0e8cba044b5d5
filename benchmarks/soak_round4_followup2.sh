#!/bin/bash
# Round-4 soak follow-up #2: the legs NOT covered by soak_round4_cont.sh —
#   1. TSTR `synt` regime rerun (the cont-script leg died on the fresh-process
#      keyless-restore bug, fixed in a366a83; this rerun picks the fix up);
#   2. denoising-VAE run-level soak (20 epochs, 64px) so ALL FIVE families
#      have full-schedule run evidence, not just fast steps;
#   3. eval-vae checkpoint sweep + occlusion analysis from the trained ckpts.
# Same tunnel rules as soak_round4.sh: ONE jax process at a time, 95 s lease
# gaps, execute-probe wedge gate before every leg.
set -x
cd /root/repo
OUT=${OUT:-/root/repo/runs}
LOG=$OUT/soak_round4.log
mkdir -p "$OUT"
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

echo "=== round-4 soak FOLLOW-UP-2 start: $(date -u) ==="
probe || exit 1

# ---------- 1. TSTR synt regime (rerun after the a366a83 fix) ----------
timeout 1800 python -m vgd_tpu.cli tstr --method synt \
    --ckpt-dir "$OUT/soak_eeg" --subjects 01 02 \
    > "$OUT/soak_eeg/tstr_synt.json.txt"
gap

# ---------- 2. denoising-VAE 20-epoch soak ----------
timeout 7200 python -m vgd_tpu.cli vae --epochs 20 --image-size 64 \
    --batch-size 64 --dataset-size 10000 --keep-checkpoints 20 \
    --out-dir "$OUT/soak_vae" --seed 42
gap

# ---------- 3. eval-vae checkpoint sweep + occlusion analysis ----------
timeout 7200 python -m vgd_tpu.cli eval-vae --image-size 64 --batch-size 64 \
    --dataset-size 10000 --out-dir "$OUT/soak_vae" --fid --occlusion \
    --max-batches 8

echo "=== round-4 soak FOLLOW-UP-2 done: $(date -u) ==="
