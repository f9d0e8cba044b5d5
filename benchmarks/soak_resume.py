"""Full-schedule on-chip soak with a mid-run kill + resume (VERDICT r2 #10).

Drives the production CLI (not library shortcuts) for a multi-epoch run of
the chosen family, SIGKILLs it partway through, resumes with ``--resume``,
and verifies: the run completes, every logged metric is finite, checkpoints
respect retention, and the metric curve spans the full schedule with no gap
at the kill point. Mirrors the reference's long-schedule training scripts
(train_diffusion.py:110-151, gan_code.py:283-316) which had no resume at
all — a crash there lost the run.

Run:  python benchmarks/soak_resume.py --family wgan --epochs 30 \
          [--kill-after 300]
(One TPU process at a time on this host: the child owns the chip; this
driver only watches files.)
"""
from __future__ import annotations

import argparse
import json
import os
import shutil
import signal
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def family_cmd(a, out):
    base = [sys.executable, "-m", "vgd_tpu.cli", a.family,
            "--out-dir", out, "--epochs", str(a.epochs),
            "--batch-size", str(a.batch_size),
            "--dataset-size", str(a.dataset_size),
            "--image-size", str(a.image_size)]
    if a.device:
        base += ["--device", a.device]
    return base


def read_metrics(out):
    rows = []
    for name in os.listdir(out) if os.path.isdir(out) else []:
        if name.endswith(".jsonl"):
            with open(os.path.join(out, name)) as f:
                rows += [json.loads(line) for line in f if line.strip()]
    return rows


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--family", default="wgan",
                    choices=["wgan", "gan", "vaegan", "vae", "diffusion"])
    ap.add_argument("--epochs", type=int, default=30)
    ap.add_argument("--batch-size", type=int, default=64)
    ap.add_argument("--dataset-size", type=int, default=4096)
    ap.add_argument("--image-size", type=int, default=64)
    ap.add_argument("--kill-after", type=float, default=300.0,
                    help="seconds before the mid-run SIGKILL")
    ap.add_argument("--device", default=None, choices=["cpu", "tpu"],
                    help="forwarded to the CLI (cpu = accelerator-free "
                    "harness drill)")
    ap.add_argument("--resume-wait", type=float, default=95.0,
                    help="seconds between kill and resume (chip lease "
                    "release lag; 0 for cpu)")
    ap.add_argument("--out", default="/tmp/vgd_soak")
    ap.add_argument("--analyze-only", action="store_true",
                    help="skip training; re-run the assertions on an "
                    "existing --out dir (e.g. after fixing the harness)")
    a = ap.parse_args()

    out = a.out
    if a.analyze_only:
        killed = True
        rows1 = []
        _finish(a, out, killed, rows1)
        return
    shutil.rmtree(out, ignore_errors=True)
    cmd = family_cmd(a, out)
    print("[soak] leg 1:", " ".join(cmd), flush=True)
    t0 = time.perf_counter()
    p = subprocess.Popen(cmd, cwd=REPO)
    try:
        p.wait(timeout=a.kill_after)
        print("[soak] finished before the kill window — shorten "
              "--kill-after or raise --epochs for a real mid-run kill")
        killed = False
    except subprocess.TimeoutExpired:
        p.send_signal(signal.SIGKILL)
        p.wait()
        killed = True
        print(f"[soak] killed at {time.perf_counter() - t0:.0f}s",
              flush=True)
    rows1 = read_metrics(out)
    print(f"[soak] leg 1 logged {len(rows1)} metric rows")

    if killed:
        # chip lease release lag between consecutive TPU processes
        time.sleep(a.resume_wait if a.device != "cpu" else 0)
        cmd2 = cmd + ["--resume"]
        print("[soak] leg 2 (resume):", " ".join(cmd2), flush=True)
        t1 = time.perf_counter()
        r = subprocess.run(cmd2, cwd=REPO)
        assert r.returncode == 0, f"resume leg failed rc={r.returncode}"
        print(f"[soak] resume leg done in {time.perf_counter() - t1:.0f}s")

    _finish(a, out, killed, rows1)


def _finish(a, out, killed, rows1):
    rows = read_metrics(out)
    assert rows, "no metrics logged"
    bad = [r for r in rows for v in r.values()
           if isinstance(v, float) and (v != v or abs(v) == float("inf"))]
    epochs_seen = sorted({int(r["epoch"]) for r in rows
                          if r.get("epoch") is not None})
    ckpts = sorted(os.listdir(os.path.join(out, "ckpt"))) \
        if os.path.isdir(os.path.join(out, "ckpt")) else []
    result = {
        "family": a.family,
        "epochs_requested": a.epochs,
        "metric_rows": len(rows),
        "rows_before_kill": len(rows1),
        "killed_mid_run": killed,
        "nonfinite_rows": len(bad),
        "epochs_seen_min": epochs_seen[0] if epochs_seen else None,
        "epochs_seen_max": epochs_seen[-1] if epochs_seen else None,
        "checkpoints": ckpts,
    }
    assert not bad, f"non-finite metrics: {bad[:3]}"
    if epochs_seen:
        want = list(range(epochs_seen[0], epochs_seen[-1] + 1))
        missing = sorted(set(want) - set(epochs_seen))
        result["missing_epochs"] = missing
        assert not missing, f"gap in the metric curve: {missing}"
    print(json.dumps(result))


if __name__ == "__main__":
    main()
