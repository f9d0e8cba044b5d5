#!/bin/bash
# /verify leg for the round-4 session's new feature: the AOT serving export
# (io/export.py, cli export/infer). Runs ON THE REAL CHIP after the soak
# chain releases it (skill rule: one jax process at a time; batch new work
# into the next planned TPU slot). Uses the 20-epoch-trained denoising-VAE
# checkpoint the soak just produced: export its sampler AND denoiser as
# tpu+cpu StableHLO artifacts, then run both through `infer` with no model
# code / checkpoint access — the full deployment path, end-to-end.
set -x
cd /root/repo
OUT=${OUT:-/root/repo/runs}
LOG=$OUT/soak_round4_final.log
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

echo "=== round-4 VERIFY (serving export) start: $(date -u) ==="
probe || exit 1

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
# denoise infer: feed a noisy batch saved as .npy
timeout 900 python - <<'EOF'
import numpy as np
rng = np.random.default_rng(0)
x = np.clip(rng.normal(0, 0.35, (64, 64, 64, 3)), -1, 1).astype(np.float32)
np.save("/root/repo/runs/soak_vae/noisy_batch.npy", x)
EOF
timeout 900 python -m vgd_tpu.cli infer \
    --artifact "$OUT/soak_vae/serving_vae_denoise.jaxexport" --seed 7 \
    --input "$OUT/soak_vae/noisy_batch.npy" \
    --out "$OUT/soak_vae/serving_denoise_grid.jpg"

echo "=== round-4 VERIFY (serving export) done: $(date -u) ==="
