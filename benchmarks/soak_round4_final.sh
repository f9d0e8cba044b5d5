#!/bin/bash
# Round-4 soak FINAL pass: every leg that has not yet produced artifacts.
#   1. TSTR `synt` regime (rerun; earlier attempt predates the a366a83
#      keyless-restore fix) — completes the four-regime TSTR table.
#   2. DDPM 20-epoch schedule at 64px + eval-diffusion restoration metrics
#      (VERDICT r3 item 2; matches /root/reference/train_diffusion.py:110-151).
#   3. DCGAN 30-epoch schedule + eval-gan checkpoint sweep
#      (matches /root/reference/gan_code.py:99-160).
#   4. Denoising-VAE 20-epoch schedule + eval-vae sweep/occlusion so all
#      five families have run-level evidence.
# Tunnel rules: ONE jax process at a time, 95 s lease gaps, execute-probe
# wedge gate before every leg.
set -x
cd /root/repo
OUT=${OUT:-/root/repo/runs}
LOG=$OUT/soak_round4_final.log
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

echo "=== round-4 soak FINAL start: $(date -u) ==="
probe || exit 1

# ---------- 1. TSTR synt regime ----------
timeout 1800 python -m vgd_tpu.cli tstr --method synt \
    --ckpt-dir "$OUT/soak_eeg" --subjects 01 02 \
    > "$OUT/soak_eeg/tstr_synt.json.txt"
gap

# ---------- 2. DDPM 20-epoch + restoration eval ----------
timeout 7200 python -m vgd_tpu.cli diffusion --epochs 20 --image-size 64 \
    --batch-size 16 --dataset-size 10000 --out-dir "$OUT/soak_ddpm" --seed 42
gap
timeout 7200 python -m vgd_tpu.cli eval-diffusion --image-size 64 \
    --batch-size 16 --dataset-size 10000 --out-dir "$OUT/soak_ddpm" \
    --fid --max-batches 8
gap

# ---------- 3. DCGAN 30-epoch + checkpoint sweep ----------
timeout 7200 python -m vgd_tpu.cli gan --epochs 30 --image-size 64 \
    --batch-size 128 --dataset-size 10000 --keep-checkpoints 30 \
    --out-dir "$OUT/soak_gan" --seed 42
gap
timeout 7200 python -m vgd_tpu.cli eval-gan --image-size 64 \
    --batch-size 128 --dataset-size 10000 --out-dir "$OUT/soak_gan" --fid
gap

# ---------- 4. denoising-VAE 20-epoch + eval sweep ----------
timeout 7200 python -m vgd_tpu.cli vae --epochs 20 --image-size 64 \
    --batch-size 64 --dataset-size 10000 --keep-checkpoints 20 \
    --out-dir "$OUT/soak_vae" --seed 42
gap
timeout 7200 python -m vgd_tpu.cli eval-vae --image-size 64 --batch-size 64 \
    --dataset-size 10000 --out-dir "$OUT/soak_vae" --fid --occlusion \
    --max-batches 8

echo "=== round-4 soak FINAL done: $(date -u) ==="
