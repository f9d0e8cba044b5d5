"""Round-5 on-chip legs as ONE python process.

The axon tunnel wedge tax is paid per PROCESS START (STATUS.md: the first
process after quiet time can hang in its initial compile; recovery needs
zero-client quiet, so each new process risks a 5-30+ min probe-backoff
cycle). The round-4 consolidated soak paid that tax between every leg
because each leg was a fresh `python -m vgd_tpu.cli` process. Here every
leg is an in-process `cli.main([...])` call — the same CLI surface the
tests exercise (tests/test_loops.py) — so the whole batch pays ONE backend
init and zero inter-leg gaps.

Legs (VERDICT r4 items 3, 6, 7 + the surrogate-tagging run-level demo):
  0. resume-complete the soak_eeg2 EEG flows if the 1800s timeouts
     truncated them (no-op when already at 6000 iters);
  1. four-regime TSTR table on the OVERLAP data -> runs/soak_eeg2/tstr_*.json.txt;
  2. gan/vae epoch-scan A/B with the quarter-epoch chunking fix;
  2b. composed eval-vae (occlusion + sweep, new _surrogate keys);
  3. 256px flagship loop-level run (3 epochs, per-epoch eval).

Also absorbs the legs the round-4 consolidated script had not reached when
its inter-leg wedge tax became prohibitive (killed at probe-backoff, no
python child running): EEG baseline flow, TSTR synt, DDPM 20-epoch soak +
restoration eval, serving export/infer verify on-chip.

Each leg is wrapped so one failure doesn't kill the batch; progress and
errors stream to stdout (the shell wrapper tees to runs/soak_round5.log).
Usage: python benchmarks/soak_round5.py {groupA|groupB}
  groupA: EEG flow completion + four-regime TSTR (quick, highest value)
  groupB: DDPM soak+eval, export/infer verify, A/B, composed eval-vae,
          256px flagship
Split into two processes so a mid-leg execution wedge (unkillable futex
hang, survives signal.alarm) can cost at most one group.
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
GROUP = sys.argv[1] if len(sys.argv) > 1 else "groupA"

from vgd_tpu import cli  # noqa: E402

RESULTS = {}


def leg(name, argv, tee_to=None):
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
        RESULTS[name] = {"rc": f"SystemExit:{e}", "secs":
                         round(time.time() - t0, 1)}
        print(f"=== leg {name} SystemExit: {e}", flush=True)
    except Exception:
        RESULTS[name] = {"rc": "EXC", "secs": round(time.time() - t0, 1)}
        print(f"=== leg {name} FAILED:\n{traceback.format_exc()}",
              flush=True)


if GROUP == "groupA":
    # ------ 0. complete the EEG flows (resume; baseline trains fresh,
    # mi is already at 6000 so its resume is a no-op) ------
    for etype in ("mi", "baseline"):
        leg(f"eeg-complete-{etype}",
            ["glow-eeg", "--iters", "6000", "--event-type", etype,
             "--out-dir", f"{OUT}/soak_eeg2", "--seed", "42", "--resume"])

    # ------ 1. four-regime TSTR table on the overlap data ------
    for method in ("real", "sr", "other_sub", "synt"):
        leg(f"tstr-{method}",
            ["tstr", "--method", method, "--ckpt-dir", f"{OUT}/soak_eeg2",
             "--subjects", "01", "02"],
            tee_to=f"{OUT}/soak_eeg2/tstr_{method}.json.txt")

elif GROUP == "groupB":
    # ------ 4. DDPM 20-epoch soak + restoration eval (the round-4 leg the
    # 05:10 wedge killed; matches /root/reference/test_diffusion.py:80-171
    # protocol at 64px) ------
    leg("ddpm-train",
        ["diffusion", "--epochs", "20", "--image-size", "64",
         "--batch-size", "16", "--dataset-size", "10000",
         "--out-dir", f"{OUT}/soak_ddpm", "--seed", "42"])
    leg("ddpm-eval",
        ["eval-diffusion", "--image-size", "64", "--batch-size", "16",
         "--dataset-size", "10000", "--out-dir", f"{OUT}/soak_ddpm",
         "--fid", "--max-batches", "8"])

    # ------ 5. serving export -> infer verify ON-CHIP (trained soak_vae
    # checkpoint; tpu+cpu lowering from this host) ------
    leg("export-sample",
        ["export", "--family", "vae", "--out-dir", f"{OUT}/soak_vae",
         "--image-size", "64", "-n", "64", "--platforms", "tpu,cpu",
         "--artifact", f"{OUT}/soak_vae/serving_vae_sample.jaxexport"])
    leg("export-denoise",
        ["export", "--family", "vae", "--mode", "denoise", "--out-dir",
         f"{OUT}/soak_vae", "--image-size", "64", "-n", "64",
         "--platforms", "tpu,cpu",
         "--artifact", f"{OUT}/soak_vae/serving_vae_denoise.jaxexport"])
    leg("infer-sample",
        ["infer", "--artifact", f"{OUT}/soak_vae/serving_vae_sample.jaxexport",
         "--seed", "7", "--out", f"{OUT}/soak_vae/serving_sample_grid.jpg"])
    import numpy as np
    rng = np.random.default_rng(0)
    x = np.clip(rng.normal(0, 0.35, (64, 64, 64, 3)), -1, 1).astype(
        np.float32)
    np.save(f"{OUT}/soak_vae/noisy_batch.npy", x)
    leg("infer-denoise",
        ["infer", "--artifact",
         f"{OUT}/soak_vae/serving_vae_denoise.jaxexport", "--seed", "7",
         "--input", f"{OUT}/soak_vae/noisy_batch.npy",
         "--out", f"{OUT}/soak_vae/serving_denoise_grid.jpg"])

    # ------ 2. epoch-scan A/B (quarter-epoch chunking) ------
    for fam, bs in (("gan", "128"), ("vae", "64")):
        for mode, flag in (("step", "--no-epoch-scan"),
                           ("scan", "--epoch-scan")):
            leg(f"ab-{fam}-{mode}",
                [fam, "--epochs", "3", "--image-size", "64",
                 "--batch-size", bs, "--dataset-size", "10000",
                 "--keep-checkpoints", "1",
                 "--out-dir", f"{OUT}/ab_{fam}_{mode}", "--seed", "42",
                 flag])
    ab = {}
    for fam in ("gan", "vae"):
        r = {}
        for mode in ("step", "scan"):
            p = f"{OUT}/ab_{fam}_{mode}/{fam}_loss.jsonl"
            if os.path.exists(p):
                rows = [json.loads(l) for l in open(p) if l.strip()]
                ips = [x["images_per_sec"] for x in rows[1:]]
                r[mode] = sum(ips) / max(len(ips), 1)
        if len(r) == 2:
            ab[fam] = {**{k: round(v) for k, v in r.items()},
                       "scan_over_step": round(r["scan"] / r["step"], 3)}
    print("\nAB RESULT: " + json.dumps(ab), flush=True)

    # ------ 2b. composed eval-vae (occlusion + sweep, _surrogate keys) ----
    leg("eval-vae-composed",
        ["eval-vae", "--image-size", "64", "--batch-size", "64",
         "--dataset-size", "10000", "--out-dir", f"{OUT}/soak_vae",
         "--fid", "--occlusion", "--max-checkpoints", "3",
         "--max-batches", "4"])

    # ------ 3. 256px flagship loop-level run ------
    leg("vaegan-256",
        ["vaegan", "--epochs", "3", "--image-size", "256",
         "--batch-size", "64", "--dataset-size", "10000",
         "--keep-checkpoints", "1", "--out-dir", f"{OUT}/soak_vaegan256",
         "--seed", "42", "--fid"])
else:
    raise SystemExit(f"unknown group {GROUP!r}")

print(f"\nROUND5 {GROUP} SUMMARY: " + json.dumps(RESULTS, indent=1),
      flush=True)
