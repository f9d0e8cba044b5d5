"""Tune data/eeg.py OVERLAP_SIGMA: per-trial ERD-strength variability.

Goal (VERDICT r4 item 3): the synthetic EEG stand-in must land CSP+LDA
accuracy strictly between chance and 1.0, so the TSTR regime table
(real >= sr >= synt > chance) carries information.

numpy/scipy/sklearn ONLY — loads vgd_tpu modules directly by file path with
stubbed package entries so the package root (which imports jax) is never
executed. Safe to run while a jax process owns the TPU tunnel.
"""
import importlib.util
import sys
import types

import numpy as np


def _load(name, path):
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


# stub the package chain so `from vgd_tpu.data.eeg import ...` resolves
for pkg in ("vgd_tpu", "vgd_tpu.data", "vgd_tpu.eval"):
    if pkg not in sys.modules:
        sys.modules[pkg] = types.ModuleType(pkg)

eeg = _load("vgd_tpu.data.eeg", "/root/repo/vgd_tpu/data/eeg.py")
sys.modules["vgd_tpu.data"].eeg = eeg
down = _load("vgd_tpu.eval.eeg_downstream",
             "/root/repo/vgd_tpu/eval/eeg_downstream.py")


def acc_at(overlap, n_train=144, n_test=72, seeds=(1, 2, 3)):
    accs = []
    for s in seeds:
        tr_mi = eeg.synthetic_trials(n_train, "mi", seed=10 * s, overlap=overlap)
        tr_bl = eeg.synthetic_trials(n_train, "baseline", seed=10 * s, overlap=overlap)
        te_mi = eeg.synthetic_trials(n_test, "mi", seed=10 * s + 5, overlap=overlap)
        te_bl = eeg.synthetic_trials(n_test, "baseline", seed=10 * s + 5, overlap=overlap)
        X_tr = np.concatenate([tr_mi, tr_bl]).astype(np.float64)
        y_tr = np.concatenate([np.ones(n_train), np.zeros(n_train)])
        X_te = np.concatenate([te_mi, te_bl]).astype(np.float64)
        y_te = np.concatenate([np.ones(n_test), np.zeros(n_test)])
        _, test_scores = down.tstr_evaluate(X_tr, y_tr, X_te, y_te)
        accs.append(test_scores["acc"])
    return float(np.mean(accs)), float(np.std(accs))


if __name__ == "__main__":
    for overlap in (0.0, 0.5, 0.7, 0.9, 1.1, 1.3, 1.5):
        m, sd = acc_at(overlap)
        print(f"overlap={overlap:.1f}  test_acc={m:.3f} +/- {sd:.3f}")
