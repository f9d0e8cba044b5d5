#!/bin/bash
# Round-5 on-chip legs (run AFTER benchmarks/soak_round4_consolidated.sh has
# fully exited — including its final CPU pytest leg; one jax process at a
# time, see STATUS.md environment gotchas):
#   1. four-regime EEG TSTR table on the OVERLAPPING synthetic data
#      (data/eeg.py OVERLAP_SIGMA): real / sr / other_sub / synt into
#      runs/soak_eeg2 — one coherent table where the ordering
#      real >= sr >= synt > chance carries information (VERDICT r4 item 3);
#   2. epoch-scan A/B re-measure for gan + vae with the quarter-epoch
#      _chunk_steps staging overlap fix (VERDICT r4 weak-5): 3 epochs
#      per mode, steady-state img/s compared from the loss jsonl;
#   3. 256px flagship loop-level run (the reference's actual scale,
#      vaegan_code.py:22-26): run_vaegan at 256x256 batch 64 with
#      per-epoch eval (VERDICT r4 item 7).
set -x
cd /root/repo
OUT=${OUT:-/root/repo/runs}
LOG=$OUT/soak_round5.log
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

echo "=== round-5 legs start: $(date -u) ==="
probe || exit 1

# ---------- 0. complete the EEG flows if the consolidated script's 1800s
# timeout truncated them (measured ~112 iters/min on-chip => 6000 iters
# needs ~53 min); --resume continues from the last saved step and exits
# immediately when already at 6000 ----------
for etype in mi baseline; do
  timeout 3600 python -m vgd_tpu.cli glow-eeg --iters 6000 \
      --event-type $etype --out-dir "$OUT/soak_eeg2" --seed 42 --resume
  gap
done

# ---------- 1. four-regime TSTR on the overlap data ----------
# real/other_sub need no flow; sr+synt sample the soak_eeg2 flows (retrained
# by the consolidated script on the SAME overlap data).
for method in real sr other_sub synt; do
  timeout 1800 python -m vgd_tpu.cli tstr --method $method \
      --ckpt-dir "$OUT/soak_eeg2" --subjects 01 02 \
      > "$OUT/soak_eeg2/tstr_${method}.json.txt"
  gap
done

# ---------- 2. epoch-scan A/B (quarter-epoch chunking) ----------
for fam in gan vae; do
  bs=128; [ "$fam" = vae ] && bs=64
  timeout 3600 python -m vgd_tpu.cli $fam --epochs 3 --image-size 64 \
      --batch-size $bs --dataset-size 10000 --keep-checkpoints 1 \
      --out-dir "$OUT/ab_${fam}_step" --seed 42 --no-epoch-scan
  gap
  timeout 3600 python -m vgd_tpu.cli $fam --epochs 3 --image-size 64 \
      --batch-size $bs --dataset-size 10000 --keep-checkpoints 1 \
      --out-dir "$OUT/ab_${fam}_scan" --seed 42 --epoch-scan
  gap
done
python3 - <<'EOF'
import json, os
for fam in ("gan", "vae"):
    r = {}
    for mode in ("step", "scan"):
        p = f"/root/repo/runs/ab_{fam}_{mode}/{fam}_loss.jsonl"
        if not os.path.exists(p):
            continue
        rows = [json.loads(l) for l in open(p) if l.strip()]
        ips = [x["images_per_sec"] for x in rows[1:]]  # skip compile epoch
        r[mode] = sum(ips) / max(len(ips), 1)
    if "step" in r and "scan" in r:
        print(f"AB {fam}: step={r['step']:.0f} scan={r['scan']:.0f} "
              f"img/s ratio scan/step={r['scan']/r['step']:.3f}")
EOF

# ---------- 2b. composed eval-vae with the round-5 surrogate tagging:
# occlusion + sweep from ONE invocation, npz columns carry _surrogate
# suffixes and no IS ----------
timeout 3600 python -m vgd_tpu.cli eval-vae --image-size 64 --batch-size 64 \
    --dataset-size 10000 --out-dir "$OUT/soak_vae" --fid --occlusion \
    --max-checkpoints 3 --max-batches 4
gap

# ---------- 3. 256px flagship loop-level run ----------
timeout 7200 python -m vgd_tpu.cli vaegan --epochs 3 --image-size 256 \
    --batch-size 64 --dataset-size 10000 --keep-checkpoints 1 \
    --out-dir "$OUT/soak_vaegan256" --seed 42 --fid
gap

echo "=== round-5 legs done: $(date -u) ==="
