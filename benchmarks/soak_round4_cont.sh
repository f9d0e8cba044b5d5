#!/bin/bash
# Round-4 soak continuation: resumes benchmarks/soak_round4.sh after the
# session running it died mid-pass (API-side). The glow-eeg `mi` leg already
# completed (runs/soak_eeg/ckpt_mi/6000 + PSD/GIF artifacts, 20:41 UTC);
# everything after it still has to run. Same tunnel rules: ONE jax process
# at a time, 95 s lease gaps, execute-probe wedge gate before every leg.
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

echo "=== round-4 soak CONTINUATION start: $(date -u) ==="
probe || exit 1

# ---------- A (rest). baseline flow + four TSTR regimes ----------
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
  # SIGKILL mid-run: wait until epoch ~60 appears in the metric log, then -9
  # the python CHILD (not the timeout wrapper — see soak_round4.sh notes).
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

echo "=== round-4 soak CONTINUATION done: $(date -u) ==="
