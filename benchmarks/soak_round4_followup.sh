#!/bin/bash
# Round-4 soak follow-up: the two legs the first pass lost.
#
#  1. Flagship --resume. The first pass's SIGKILL hit the `timeout` wrapper,
#     not the python child, so the trainer survived to epoch 109 where it was
#     killed -9 by hand (14:40:23 UTC); its --resume leg had ALSO crashed on
#     the rbg-restore bug fixed in commit 35f76d5. This leg resumes from the
#     latest kept checkpoint and runs to epoch 150, producing the
#     kill-at-109/resume continuity evidence.
#  2. TSTR `sr` regime re-run (same restore bug, same fix).
#
# Run strictly AFTER benchmarks/soak_round4.sh has exited (one TPU process
# at a time; 95 s lease gaps).
set -x
cd /root/repo
OUT=${OUT:-/root/repo/runs}
LOG=$OUT/soak_round4_followup.log
exec >>"$LOG" 2>&1

gap() { sleep 95; }

echo "=== round-4 soak follow-up start: $(date -u) ==="

timeout 10800 python -m vgd_tpu.cli vaegan \
    --epochs 150 --image-size 64 --batch-size 64 --dataset-size 20000 \
    --fid --keep-checkpoints 4 --out-dir "$OUT/soak_vaegan" --seed 42 --resume
gap

timeout 1800 python -m vgd_tpu.cli tstr --method sr \
    --ckpt-dir "$OUT/soak_eeg" --subjects 01 02 \
    > "$OUT/soak_eeg/tstr_sr.json.txt"

echo "=== round-4 soak follow-up done: $(date -u) ==="
