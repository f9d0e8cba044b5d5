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

Each leg is wrapped so one failure doesn't kill the batch; progress and
errors stream to stdout (the shell wrapper tees to runs/soak_round5.log).
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


# ---------- 0. complete the EEG flows (resume is a no-op at 6000) ----------
for etype in ("mi", "baseline"):
    leg(f"eeg-complete-{etype}",
        ["glow-eeg", "--iters", "6000", "--event-type", etype,
         "--out-dir", f"{OUT}/soak_eeg2", "--seed", "42", "--resume"])

# ---------- 1. four-regime TSTR table on the overlap data ----------
for method in ("real", "sr", "other_sub", "synt"):
    leg(f"tstr-{method}",
        ["tstr", "--method", method, "--ckpt-dir", f"{OUT}/soak_eeg2",
         "--subjects", "01", "02"],
        tee_to=f"{OUT}/soak_eeg2/tstr_{method}.json.txt")

# ---------- 2. epoch-scan A/B (quarter-epoch chunking) ----------
for fam, bs in (("gan", "128"), ("vae", "64")):
    for mode, flag in (("step", "--no-epoch-scan"), ("scan", "--epoch-scan")):
        leg(f"ab-{fam}-{mode}",
            [fam, "--epochs", "3", "--image-size", "64", "--batch-size", bs,
             "--dataset-size", "10000", "--keep-checkpoints", "1",
             "--out-dir", f"{OUT}/ab_{fam}_{mode}", "--seed", "42", flag])
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

# ---------- 2b. composed eval-vae (occlusion + sweep, _surrogate keys) ----
leg("eval-vae-composed",
    ["eval-vae", "--image-size", "64", "--batch-size", "64",
     "--dataset-size", "10000", "--out-dir", f"{OUT}/soak_vae",
     "--fid", "--occlusion", "--max-checkpoints", "3", "--max-batches", "4"])

# ---------- 3. 256px flagship loop-level run ----------
leg("vaegan-256",
    ["vaegan", "--epochs", "3", "--image-size", "256", "--batch-size", "64",
     "--dataset-size", "10000", "--keep-checkpoints", "1",
     "--out-dir", f"{OUT}/soak_vaegan256", "--seed", "42", "--fid"])

print("\nROUND5 SUMMARY: " + json.dumps(RESULTS, indent=1), flush=True)
