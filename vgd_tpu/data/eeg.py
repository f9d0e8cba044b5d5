"""EEG (BCI Competition IV 2a) data pipeline.

Capability parity with flow_eeg.py:8-69:
* loads .npz files with keys ``s`` (signal), ``etyp`` (event types), ``epos``
  (event positions); keeps the first 22 channels; fs = 250 Hz,
* trial extraction: motor-imagery cues {769,770,771,772,783} or baseline 768,
  640-sample windows decimated x4 -> (22, 160),
* per-subject filtering and T (training) / E (evaluation) session selection.

When no data folder is present, a synthetic generator produces band-limited
trials with a class-dependent mu-rhythm (8-13 Hz) power difference, so the
downstream TSTR evaluation (test_eegglow.py) remains exercisable end-to-end.
"""
from __future__ import annotations

import glob as _glob
import os
import zlib
from typing import List, Optional

import numpy as np
from scipy.signal import decimate

FS = 250
MI_CUES = (769, 770, 771, 772, 783)   # flow_eeg.py:20
BASELINE_CUE = 768                    # flow_eeg.py:24
WINDOW = 640                          # flow_eeg.py:32
DOWNSAMPLING = 4                      # flow_eeg.py:9
NUM_CHANNELS = 22

CHANNEL_NAMES = [
    "Fz", "FC3", "FC1", "FCz", "FC2", "FC4",
    "C5", "C3", "C1", "Cz", "C2", "C4", "C6",
    "CP3", "CP1", "CPz", "CP2", "CP4",
    "P1", "Pz", "P2", "POz",
]  # flow_eeg.py:348-353


def extract_trials(data: dict, event_type: str = "mi",
                   downsampling: int = DOWNSAMPLING) -> List[np.ndarray]:
    """Extract decimated (22, 160) trials from one recording.

    Reference: EEGLoad.get_trials (flow_eeg.py:18-39). Malformed/truncated
    trials are skipped.
    """
    signal = np.asarray(data["s"]).T[:NUM_CHANNELS]
    etyp = np.asarray(data["etyp"]).T
    epos = np.asarray(data["epos"]).T
    if event_type == "mi":
        idxs = [i for i, e in enumerate(etyp[0]) if e in MI_CUES]
    else:
        idxs = [i for i, e in enumerate(etyp[0]) if e == BASELINE_CUE]
    trials = []
    for idx in idxs:
        start = int(epos[0, idx])
        stop = start + WINDOW
        if stop > signal.shape[1]:
            continue
        trial = signal[:, start:stop]
        if not np.all(np.isfinite(trial)):
            continue
        trials.append(decimate(trial, downsampling))
    return trials


#: Per-trial lognormal sigma on the central-channel mu amplitude. Tuned by
#: benchmarks/tune_eeg_overlap.py so that bandpass->CSP->LDA on real synthetic
#: trials lands strictly between chance and 1.0 (~0.83 acc): with the original
#: fixed 4x amplitude gap the classes were linearly separable by construction
#: and every TSTR regime saturated at 1.0, making the regime table
#: (real >= sr >= synt > chance, test_eegglow.py:115-166) carry no information.
OVERLAP_SIGMA = 0.7


def synthetic_trials(n: int, event_type: str, seed: int = 0,
                     num_channels: int = NUM_CHANNELS,
                     num_samples: int = WINDOW // DOWNSAMPLING,
                     erd: float = 0.25,
                     overlap: float = OVERLAP_SIGMA) -> np.ndarray:
    """Band-limited synthetic EEG: pink-ish noise + a mu rhythm whose power
    over central channels depends on the class (MI suppresses mu — ERD).

    ``erd``: multiplicative mu suppression on central channels for MI trials
    (0.25 = the mean 4x amplitude / 16x power ERD).
    ``overlap``: sigma of a per-trial lognormal gain shared by the central
    channels' mu amplitude — trial-to-trial ERD-strength variability. 0
    reproduces the fully separable classes; the default ``OVERLAP_SIGMA``
    makes the class-conditional mu-power distributions overlap so downstream
    CSP+LDA accuracy is informative rather than saturated.
    """
    rng = np.random.default_rng(seed + (0 if event_type == "mi" else 10_000))
    fs = FS / DOWNSAMPLING
    t = np.arange(num_samples) / fs
    out = np.empty((n, num_channels, num_samples), np.float32)
    central = {7, 9, 11}  # C3, Cz, C4 indices (test_eegglow.py:35)
    for i in range(n):
        x = rng.normal(0, 1.0, (num_channels, num_samples)).astype(np.float32)
        # crude 1/f shaping via cumulative smoothing
        x = np.cumsum(x, axis=1)
        x -= x.mean(axis=1, keepdims=True)
        x /= (x.std(axis=1, keepdims=True) + 1e-6)
        # one gain per trial (shared across central channels): independent
        # per-channel draws would average out under CSP and restore
        # separability.
        gain = float(rng.lognormal(0.0, overlap)) if overlap > 0 else 1.0
        for ch in range(num_channels):
            f_mu = rng.uniform(9.0, 12.0)
            phase = rng.uniform(0, 2 * np.pi)
            amp = 1.5 if ch in central else 0.4
            if ch in central:
                amp *= gain
                if event_type == "mi":
                    amp *= erd  # event-related desynchronisation
            x[ch] += amp * np.sin(2 * np.pi * f_mu * t + phase)
        out[i] = x * 10.0
    return out


class EEGDataset:
    """Trials as float32 (N, C, T, 1) — the 1-D Glow treats EEG as images with
    width 1 (flow_eeg.py:66 ``unsqueeze(2)``; layout here is channels-last in
    the loader, see ``as_nhwc``)."""

    def __init__(self, path: Optional[str] = None, dataset_type: str = "T",
                 event_type: str = "mi", subject: Optional[str] = None,
                 synthetic_n: int = 288, seed: int = 42):
        trials: List[np.ndarray] = []
        if path:
            pattern = os.path.join(path, f"*{dataset_type}.npz")
            files = sorted(_glob.glob(pattern))
            if subject:
                files = [f for f in files if subject in os.path.basename(f)]
            for f in files:
                trials.extend(extract_trials(np.load(f), event_type))
        if trials:
            self.dataset = np.asarray(trials, dtype=np.float32)
        else:
            # deterministic salt: Python's hash() is randomized per process
            # (PYTHONHASHSEED), which would give every process a different
            # synthetic T/E split — TSTR numbers would not reproduce across
            # the train-flow and eval processes.
            salt = zlib.crc32(f"{dataset_type}|{subject or ''}".encode()) \
                & 0xFFFF
            self.dataset = synthetic_trials(synthetic_n, event_type,
                                            seed=seed + salt)

    def __len__(self) -> int:
        return len(self.dataset)

    def as_ncT(self) -> np.ndarray:
        """(N, C, T) float32 — for host-side analysis (CSP/LDA, PSD)."""
        return self.dataset

    def as_nhwc(self) -> np.ndarray:
        """(N, T, 1, C) float32 — NHWC layout for the TPU 1-D Glow where the
        time axis plays the role of height."""
        return np.ascontiguousarray(self.dataset.transpose(0, 2, 1)[:, :, None, :])


def eeg_batches(ds: EEGDataset, batch_size: int, seed: int = 42,
                skip: int = 0):
    """Infinite shuffled batch stream of NHWC trials (drop-last).

    ``skip``: fast-forward past the first N batches (resume support) —
    permutations are still drawn so the stream position matches an
    uninterrupted run, but skipped batches are never materialised."""
    arr = ds.as_nhwc()
    n = len(arr)
    per = max(n // batch_size, 1)
    rng = np.random.default_rng(seed)
    while True:
        perm = rng.permutation(n)
        start, skip = min(skip, per), max(skip - per, 0)
        for i in range(start, n // batch_size):
            yield arr[perm[i * batch_size:(i + 1) * batch_size]]
