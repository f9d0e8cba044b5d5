"""Unit coverage for the soak harness's metric-curve analysis
(benchmarks/soak_resume.py:_finish) — the logic that turns a killed+resumed
training run's artifacts into pass/fail assertions. Drilled end-to-end on
CPU (8-epoch WGAN kill+resume); these tests pin the analysis rules without
a training run. Mirrors what the reference lacked entirely: its long
schedules (train_diffusion.py:110-151, gan_code.py:283-316) could not
resume, so a crash lost the run.
"""
import json
import os
import sys
import types

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "benchmarks"))

import soak_resume  # noqa: E402


def _args(**kw):
    d = dict(family="wgan", epochs=4, device="cpu")
    d.update(kw)
    return types.SimpleNamespace(**d)


def _write_rows(out, rows, name="gan_loss.jsonl"):
    os.makedirs(out, exist_ok=True)
    with open(os.path.join(out, name), "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


def test_finish_accepts_contiguous_float_epochs(tmp_path, capsys):
    """jsonl epochs arrive as floats; the curve-gap check must coerce."""
    out = str(tmp_path)
    _write_rows(out, [{"epoch": float(e), "d_loss": -0.1, "g_loss": 0.2}
                      for e in range(4)])
    os.makedirs(os.path.join(out, "ckpt", "3"))
    soak_resume._finish(_args(), out, killed=True, rows1=[])
    res = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert res["epochs_seen_min"] == 0 and res["epochs_seen_max"] == 3
    assert res["missing_epochs"] == []
    assert res["checkpoints"] == ["3"]


def test_finish_rejects_curve_gap(tmp_path):
    """A resume that skips epochs (re-consumed data, bad restore) fails."""
    out = str(tmp_path)
    _write_rows(out, [{"epoch": e, "d_loss": 0.0} for e in (0, 1, 3)])
    with pytest.raises(AssertionError, match="gap in the metric curve"):
        soak_resume._finish(_args(), out, killed=True, rows1=[])


def test_finish_rejects_nonfinite(tmp_path):
    out = str(tmp_path)
    _write_rows(out, [{"epoch": 0, "d_loss": float("nan")}])
    with pytest.raises(AssertionError, match="non-finite"):
        soak_resume._finish(_args(), out, killed=True, rows1=[])


def test_finish_rejects_empty(tmp_path):
    with pytest.raises(AssertionError, match="no metrics"):
        soak_resume._finish(_args(), str(tmp_path), killed=False, rows1=[])
