#!/bin/bash
# Round-4 consolidated soak: every leg still missing after the 05:10 tunnel
# wedge killed the first DDPM attempt (futex_do_wait, CPU frozen at 0:23,
# zero artifacts — the documented first-process-after-kill wedge mode).
# ONE script, shortest legs first so evidence accrues early, probe gate +
# 95 s lease gaps between every jax process, chained CPU pytest at the end.
set -x
cd /root/repo
OUT=${OUT:-/root/repo/runs}
LOG=$OUT/soak_round4_final.log
mkdir -p "$OUT" "$OUT/soak_eeg2"
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

echo "=== round-4 CONSOLIDATED start: $(date -u) ==="
# the killed wedge needs zero-client quiet time before the first probe
sleep 300
probe || exit 1

# ---------- 1. DCGAN 30-epoch + checkpoint sweep ----------
timeout 7200 python -m vgd_tpu.cli gan --epochs 30 --image-size 64 \
    --batch-size 128 --dataset-size 10000 --keep-checkpoints 30 \
    --out-dir "$OUT/soak_gan" --seed 42
gap
timeout 7200 python -m vgd_tpu.cli eval-gan --image-size 64 \
    --batch-size 128 --dataset-size 10000 --out-dir "$OUT/soak_gan" --fid
gap

# ---------- 2. denoising-VAE 20-epoch + eval sweep + occlusion ----------
timeout 7200 python -m vgd_tpu.cli vae --epochs 20 --image-size 64 \
    --batch-size 64 --dataset-size 10000 --keep-checkpoints 20 \
    --out-dir "$OUT/soak_vae" --seed 42
gap
timeout 7200 python -m vgd_tpu.cli eval-vae --image-size 64 --batch-size 64 \
    --dataset-size 10000 --out-dir "$OUT/soak_vae" --fid --occlusion \
    --max-batches 8
gap
timeout 7200 python -m vgd_tpu.cli eval-vae --image-size 64 --batch-size 64 \
    --dataset-size 10000 --out-dir "$OUT/soak_vae" --fid --max-batches 8
gap

# ---------- 3. EEG flows retrain + TSTR synt ----------
for etype in mi baseline; do
  timeout 1800 python -m vgd_tpu.cli glow-eeg --iters 6000 --event-type $etype \
      --out-dir "$OUT/soak_eeg2" --seed 42
  gap
done
timeout 1800 python -m vgd_tpu.cli tstr --method synt \
    --ckpt-dir "$OUT/soak_eeg2" --subjects 01 02 \
    > "$OUT/soak_eeg/tstr_synt.json.txt"
gap

# ---------- 4. DDPM 20-epoch + restoration eval ----------
timeout 7200 python -m vgd_tpu.cli diffusion --epochs 20 --image-size 64 \
    --batch-size 16 --dataset-size 10000 --out-dir "$OUT/soak_ddpm" --seed 42
gap
timeout 7200 python -m vgd_tpu.cli eval-diffusion --image-size 64 \
    --batch-size 16 --dataset-size 10000 --out-dir "$OUT/soak_ddpm" \
    --fid --max-batches 8
gap

# ---------- 5. /verify: AOT serving export on the trained VAE ckpt ----------
timeout 1800 python -m vgd_tpu.cli export --family vae \
    --out-dir "$OUT/soak_vae" --image-size 64 -n 64 \
    --platforms tpu,cpu \
    --artifact "$OUT/soak_vae/serving_vae_sample.jaxexport"
gap
timeout 1800 python -m vgd_tpu.cli export --family vae --mode denoise \
    --out-dir "$OUT/soak_vae" --image-size 64 -n 64 \
    --platforms tpu,cpu \
    --artifact "$OUT/soak_vae/serving_vae_denoise.jaxexport"
gap
timeout 900 python -m vgd_tpu.cli infer \
    --artifact "$OUT/soak_vae/serving_vae_sample.jaxexport" --seed 7 \
    --out "$OUT/soak_vae/serving_sample_grid.jpg"
gap
python3 - <<'EOF'
import numpy as np
rng = np.random.default_rng(0)
x = np.clip(rng.normal(0, 0.35, (64, 64, 64, 3)), -1, 1).astype(np.float32)
np.save("/root/repo/runs/soak_vae/noisy_batch.npy", x)
EOF
timeout 900 python -m vgd_tpu.cli infer \
    --artifact "$OUT/soak_vae/serving_vae_denoise.jaxexport" --seed 7 \
    --input "$OUT/soak_vae/noisy_batch.npy" \
    --out "$OUT/soak_vae/serving_denoise_grid.jpg"

echo "=== round-4 CONSOLIDATED done: $(date -u) ==="

# ---------- 6. full CPU test suite (chip released) ----------
sleep 95
nice -n 10 python -m pytest tests/ -x -q > /tmp/pytest_r4.log 2>&1
echo "=== pytest done: $(date -u) rc=$? ==="
