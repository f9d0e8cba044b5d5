"""Round-5 groupD: DDPM at the reference's FULL scale (256x256, batch 16,
T=1000 — train_diffusion.py:70-73), loop-level, on-chip.

The groupB DDPM quality soak ran the reference protocol at 64px; this leg
demonstrates the production diffusion loop and the compiled restoration
eval at the reference's actual resolution: 3 epochs of `diffusion` then
`eval-diffusion --fid` with a small batch budget (each full ancestral
chain at 256px is ~26 s for batch 16; 2 batches keeps the leg bounded).

Usage: python benchmarks/soak_round5d.py   (no other jax process alive)
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


D = f"{OUT}/soak_ddpm256"
leg("ddpm256-train",
    ["diffusion", "--epochs", "3", "--image-size", "256",
     "--batch-size", "16", "--dataset-size", "4096",
     "--keep-checkpoints", "1", "--out-dir", D, "--seed", "42"])
leg("ddpm256-eval",
    ["eval-diffusion", "--image-size", "256", "--batch-size", "16",
     "--dataset-size", "4096", "--out-dir", D, "--fid",
     "--max-batches", "2"])

print("\nROUND5 groupD SUMMARY: " + json.dumps(RESULTS, indent=1),
      flush=True)
