#!/bin/bash
# Round-4 run-level evidence: the reference's primary artifacts produced by
# THIS repo's production loops on the real TPU chip (VERDICT.md round-3
# tasks 1-3).
#
#  A. EEG TSTR end-to-end: train both per-class flows for the full 6k-iter
#     reference schedule (flow_eeg.py:461), then the four TSTR regimes
#     (test_eegglow.py:105-197) on the synthetic-ERD dataset.
#  B. Flagship 150-epoch VAE-GAN quality run at 64px with per-epoch
#     SSIM/PSNR/MSE + IS/FID (surrogate Inception), mid-run SIGKILL +
#     --resume (vaegan_code.py:55-219 schedule).
#  C. DDPM 20-epoch schedule (64px, attention on) + restoration eval
#     (train_diffusion.py:110-151, test_diffusion.py:80-122).
#  D. DCGAN 30-epoch schedule + eval-gan checkpoint sweep
#     (gan_code.py:99-160).
#
# TPU tunnel rules: ONE jax process at a time; >=90 s between consecutive
# TPU jobs (lease release lag). Everything below is strictly sequential.
set -x
cd /root/repo
OUT=${OUT:-/root/repo/runs}
LOG=$OUT/soak_round4.log
mkdir -p "$OUT"
exec >>"$LOG" 2>&1

# Inter-leg gap: lease release lag AFTER the previous job, then a wedge-gate
# probe (below) proving the tunnel still executes, then lease lag again
# before the next job.
gap() { sleep 95; probe; }

# Wedge gate: the axon tunnel sometimes enters a state where device metadata
# works but execution hangs forever (lease wedge; observed 2026-08-19 on the
# first process after >5 h of quiet). Each leg already has a `timeout`, but a
# wedged tunnel would burn every leg's full timeout in sequence. Before each
# leg, prove the tunnel EXECUTES (matmul + host fetch) under a short timeout;
# on failure, back off and retry — recovery needs zero-client quiet time
# (observed up to ~45 min), so probes are spaced 5 min apart.
probe() {
  for attempt in $(seq 1 24); do
    if timeout 150 python -c "
import jax, jax.numpy as jnp
x = jnp.ones((512, 512))
assert float((x @ x).sum()) == 512.0 ** 3
print('probe ok')"; then
      sleep 95   # lease release lag between the probe and the real leg
      return 0
    fi
    # Escalating quiet windows: a probing client may itself delay recovery
    # (the observed outage cleared only after ~45 min of zero-client time),
    # so back off 5 -> 10 -> 15 -> 20 -> 30 -> 30... minutes.
    backoff=$((attempt * 300)); [ $backoff -gt 1800 ] && backoff=1800
    echo "probe wedged (attempt $attempt) at $(date -u); backing off ${backoff}s"
    sleep $backoff
  done
  echo "tunnel did not recover after $attempt probes; giving up"
  return 1
}

echo "=== round-4 soak start: $(date -u) ==="
probe || exit 1

# ---------- A. TSTR ----------
timeout 1800 python -m vgd_tpu.cli glow-eeg --iters 6000 --event-type mi \
    --out-dir "$OUT/soak_eeg" --seed 42
gap
timeout 1800 python -m vgd_tpu.cli glow-eeg --iters 6000 --event-type baseline \
    --out-dir "$OUT/soak_eeg" --seed 42
gap
for method in synt real sr other_sub; do
  timeout 1800 python -m vgd_tpu.cli tstr --method $method \
      --ckpt-dir "$OUT/soak_eeg" --subjects 01 02 \
      > "$OUT/soak_eeg/tstr_${method}.json.txt"
  gap
done

# ---------- B. flagship 150-epoch soak with SIGKILL + resume ----------
FLAG="--epochs 150 --image-size 64 --batch-size 64 --dataset-size 20000 \
      --fid --keep-checkpoints 4 --out-dir $OUT/soak_vaegan --seed 42"
( timeout 7200 python -m vgd_tpu.cli vaegan $FLAG & echo $! > /tmp/soak_vg.pid
  PID=$(cat /tmp/soak_vg.pid)
  # SIGKILL mid-run: wait until epoch ~60 appears in the metric log, then -9.
  # $PID is the `timeout` wrapper — SIGKILL must hit the python CHILD, or the
  # trainer survives orphaned and the later --resume leg races it (observed
  # in the first round-4 run: kill -9 $PID only removed the wrapper).
  for i in $(seq 1 720); do
    sleep 10
    N=$(wc -l < "$OUT/soak_vaegan/loss.jsonl" 2>/dev/null || echo 0)
    if [ "$N" -ge 60 ]; then
      CHILD=$(ps -o pid= --ppid "$PID" | head -1)
      kill -9 ${CHILD:-$PID} "$PID" 2>/dev/null
      echo "KILLED at epoch $N (python pid ${CHILD:-unknown}, wrapper $PID)"
      break
    fi
    kill -0 "$PID" 2>/dev/null || break
  done
  wait "$PID" 2>/dev/null )
gap
timeout 10800 python -m vgd_tpu.cli vaegan $FLAG --resume
gap

# ---------- C. DDPM 20-epoch + restoration eval ----------
timeout 7200 python -m vgd_tpu.cli diffusion --epochs 20 --image-size 64 \
    --batch-size 16 --dataset-size 10000 --out-dir "$OUT/soak_ddpm" --seed 42
gap
timeout 7200 python -m vgd_tpu.cli eval-diffusion --image-size 64 \
    --batch-size 16 --dataset-size 10000 --out-dir "$OUT/soak_ddpm" \
    --fid --max-batches 8
gap

# ---------- D. DCGAN 30-epoch + checkpoint sweep ----------
timeout 7200 python -m vgd_tpu.cli gan --epochs 30 --image-size 64 \
    --batch-size 128 --dataset-size 10000 --keep-checkpoints 30 \
    --out-dir "$OUT/soak_gan" --seed 42
gap
timeout 7200 python -m vgd_tpu.cli eval-gan --image-size 64 \
    --batch-size 128 --dataset-size 10000 --out-dir "$OUT/soak_gan" --fid

echo "=== round-4 soak done: $(date -u) ==="
