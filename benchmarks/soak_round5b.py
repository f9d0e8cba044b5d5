"""Round-5 follow-up legs (groupC): redo the legs that FileNotFoundError'd
because the gitignored multi-GB soak_vae checkpoints were cleaned with the
fresh VM (STATUS.md gap 5 — artifacts are committed, checkpoints are not).

Retrains the denoising VAE (5 epochs, checkpoints kept) into
runs/soak_vae2, then runs the on-chip serving export->infer verify and the
composed eval-vae (occlusion + aggregated-posterior sweep, surrogate keys)
against the fresh checkpoints. Same in-process cli.main() batching as
benchmarks/soak_round5.py (one backend init, one wedge-tax payment).

Usage: python benchmarks/soak_round5b.py   (run with no other jax process)
"""
import contextlib
import io
import json
import os
import sys
import time
import traceback

sys.path.insert(0, "/root/repo")
OUT = os.environ.get("OUT", "/root/repo/runs")

from vgd_tpu import cli  # noqa: E402

RESULTS = {}


def leg(name, argv, tee_to=None):
    # same wrapper as benchmarks/soak_round5.py (not imported from there:
    # that module runs its group's legs at import time)
    t0 = time.time()
    print(f"\n=== leg {name}: cli.main({argv}) at {time.strftime('%H:%M:%S')}",
          flush=True)
    try:
        if tee_to:
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                rc = cli.main(argv)
            text = buf.getvalue()
            sys.stdout.write(text)
            os.makedirs(os.path.dirname(tee_to), exist_ok=True)
            with open(tee_to, "w") as f:
                f.write(text)
        else:
            rc = cli.main(argv)
        RESULTS[name] = {"rc": rc, "secs": round(time.time() - t0, 1)}
        print(f"=== leg {name} done rc={rc} in {RESULTS[name]['secs']}s",
              flush=True)
    except SystemExit as e:
        RESULTS[name] = {"rc": f"SystemExit:{e}",
                         "secs": round(time.time() - t0, 1)}
        print(f"=== leg {name} SystemExit: {e}", flush=True)
    except Exception:
        RESULTS[name] = {"rc": "EXC", "secs": round(time.time() - t0, 1)}
        print(f"=== leg {name} FAILED:\n{traceback.format_exc()}",
              flush=True)

V2 = f"{OUT}/soak_vae2"

leg("vae-retrain",
    ["vae", "--epochs", "5", "--image-size", "64", "--batch-size", "64",
     "--dataset-size", "10000", "--keep-checkpoints", "5",
     "--out-dir", V2, "--seed", "42"])

leg("export-sample",
    ["export", "--family", "vae", "--out-dir", V2, "--image-size", "64",
     "-n", "64", "--platforms", "tpu,cpu",
     "--artifact", f"{V2}/serving_vae_sample.jaxexport"])
leg("export-denoise",
    ["export", "--family", "vae", "--mode", "denoise", "--out-dir", V2,
     "--image-size", "64", "-n", "64", "--platforms", "tpu,cpu",
     "--artifact", f"{V2}/serving_vae_denoise.jaxexport"])
leg("infer-sample",
    ["infer", "--artifact", f"{V2}/serving_vae_sample.jaxexport",
     "--seed", "7", "--out", f"{V2}/serving_sample_grid.jpg"])

import numpy as np  # noqa: E402

rng = np.random.default_rng(0)
x = np.clip(rng.normal(0, 0.35, (64, 64, 64, 3)), -1, 1).astype(np.float32)
np.save(f"{V2}/noisy_batch.npy", x)
leg("infer-denoise",
    ["infer", "--artifact", f"{V2}/serving_vae_denoise.jaxexport",
     "--seed", "7", "--input", f"{V2}/noisy_batch.npy",
     "--out", f"{V2}/serving_denoise_grid.jpg"])

leg("eval-vae-composed",
    ["eval-vae", "--image-size", "64", "--batch-size", "64",
     "--dataset-size", "10000", "--out-dir", V2,
     "--fid", "--occlusion", "--max-checkpoints", "5",
     "--max-batches", "4"])

print("\nROUND5 groupC SUMMARY: " + json.dumps(RESULTS, indent=1),
      flush=True)
