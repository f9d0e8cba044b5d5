"""Round-5 groupE: committed run-dir evidence for the two families whose
round-4 artifacts lived only as BASELINE.md tables — Glow (drift tables,
no committed production-CLI run dir) and WGAN (kill/resume soak described,
checkpoints since cleaned).

Legs (in-process cli.main, one backend init — run via gated_run.sh):
  1. glow: 3000 iters at the reference shape (64px, batch 16, K=32 L=4,
     5-bit, nf_code.py:711-736) through the production CLI — loss jsonl,
     reverse-sample grids, checkpoints;
  2. eval-glow --fid: checkpoint sweep with _surrogate-tagged columns;
  3. wgan: 10 epochs (batch 64, gan_code.py:266-288 semantics: 5 critic
     iters, clip ±0.01) — loss jsonl + fixed-noise grids;
  4. eval-gan --wgan --fid: checkpoint sweep over the fresh wgan ckpts.

Usage: bash benchmarks/gated_run.sh 7200 python benchmarks/soak_round5e.py
"""
import json
import os
import sys
import time
import traceback

sys.path.insert(0, "/root/repo")
OUT = os.environ.get("OUT", "/root/repo/runs")

from vgd_tpu import cli  # noqa: E402

RESULTS = {}


def leg(name, argv):
    t0 = time.time()
    print(f"\n=== leg {name}: cli.main({argv}) at {time.strftime('%H:%M:%S')}",
          flush=True)
    try:
        rc = cli.main(argv)
        RESULTS[name] = {"rc": rc, "secs": round(time.time() - t0, 1)}
        print(f"=== leg {name} done rc={rc} in {RESULTS[name]['secs']}s",
              flush=True)
    except Exception:
        RESULTS[name] = {"rc": "EXC", "secs": round(time.time() - t0, 1)}
        print(f"=== leg {name} FAILED:\n{traceback.format_exc()}",
              flush=True)


G = f"{OUT}/soak_glow"
leg("glow-train",
    ["glow", "--iters", "3000", "--image-size", "64", "--batch-size", "16",
     "--dataset-size", "10000", "--out-dir", G, "--seed", "42"])
leg("glow-eval",
    ["eval-glow", "--image-size", "64", "--batch-size", "16",
     "--dataset-size", "10000", "--out-dir", G, "--fid",
     "--max-batches", "4"])

W = f"{OUT}/soak_wgan"
leg("wgan-train",
    ["wgan", "--epochs", "10", "--image-size", "64", "--batch-size", "64",
     "--dataset-size", "10000", "--out-dir", W, "--seed", "42"])
leg("wgan-eval",
    ["eval-gan", "--wgan", "--image-size", "64", "--batch-size", "64",
     "--dataset-size", "10000", "--out-dir", W, "--fid",
     "--max-batches", "4"])

print("\nROUND5 groupE SUMMARY: " + json.dumps(RESULTS, indent=1),
      flush=True)
