"""EEG downstream (TSTR) evaluation: bandpass -> CSP -> LDA.

Capability parity with test_eegglow.py:
* Butterworth bandpass 8-30 Hz at fs=250/4 (test_eegglow.py:97-103, 173),
* CSP spatial filtering (the reference uses mne.decoding.CSP,
  test_eegglow.py:171; mne is not in this image, so CSP is implemented
  directly — generalised eigendecomposition of the class covariance
  matrices with log-variance features, which is what mne's CSP computes),
* LDA classification + accuracy / F1 / Cohen's kappa per subject
  (test_eegglow.py:179-194),
* the four training regimes: synthetic-only ('synt'), real-only ('real'),
  synthetic+real ('sr'), other-subject ('other_sub')
  (test_eegglow.py:115-166),
* PSD comparison via scipy.signal.welch over the C3/Cz/C4 average
  (test_eegglow.py:25-46).
"""
from __future__ import annotations

from typing import Dict, Optional, Tuple

import numpy as np
from scipy.signal import butter, lfilter, welch

from vgd_tpu.data.eeg import FS, DOWNSAMPLING

FS_DEC = FS / DOWNSAMPLING


def bandpass_filter(data: np.ndarray, lowcut: float = 8.0,
                    highcut: float = 30.0, fs: float = FS_DEC,
                    order: int = 5) -> np.ndarray:
    """Butterworth bandpass (test_eegglow.py:97-103)."""
    b, a = butter(order, [lowcut, highcut], fs=fs, btype="band")
    return lfilter(b, a, data)


class CSP:
    """Common Spatial Patterns for two classes.

    fit: solve the generalised eigenproblem C1 w = l (C1 + C2) w on
    class-average normalised covariances; keep the n_components most
    discriminative filters (largest |l - 0.5|). transform: log-variance of
    the spatially filtered trials (mne.decoding.CSP's default
    transform_into='average_power' + log)."""

    def __init__(self, n_components: int = 4):
        self.n_components = n_components
        self.filters_: Optional[np.ndarray] = None

    @staticmethod
    def _class_cov(trials: np.ndarray) -> np.ndarray:
        covs = []
        for t in trials:
            c = t @ t.T
            tr = np.trace(c)
            if not np.isfinite(tr) or tr <= 0:
                continue  # skip degenerate/non-finite trials
            covs.append(c / tr)
        if not covs:
            raise ValueError("no finite trials for CSP covariance")
        return np.mean(covs, axis=0)

    def fit(self, X: np.ndarray, y: np.ndarray) -> "CSP":
        classes = np.unique(y)
        assert len(classes) == 2, "CSP here is two-class (mi vs baseline)"
        c1 = self._class_cov(X[y == classes[1]])
        c0 = self._class_cov(X[y == classes[0]])
        from scipy.linalg import eigh
        evals, evecs = eigh(c1, c1 + c0)
        order = np.argsort(np.abs(evals - 0.5))[::-1]
        self.filters_ = evecs[:, order[:self.n_components]].T
        return self

    def transform(self, X: np.ndarray) -> np.ndarray:
        Z = np.einsum("fc,nct->nft", self.filters_, X)
        var = Z.var(axis=2)
        var = var / var.sum(axis=1, keepdims=True)
        return np.log(np.maximum(var, 1e-12))

    def fit_transform(self, X, y):
        return self.fit(X, y).transform(X)


def classification_scores(y_true, y_pred) -> Dict[str, float]:
    from sklearn.metrics import (accuracy_score, cohen_kappa_score, f1_score)
    return {"acc": float(accuracy_score(y_true, y_pred)),
            "f1": float(f1_score(y_true, y_pred)),
            "k": float(cohen_kappa_score(y_true, y_pred))}


def tstr_evaluate(X_train: np.ndarray, y_train: np.ndarray,
                  X_test: np.ndarray, y_test: np.ndarray
                  ) -> Tuple[Dict[str, float], Dict[str, float]]:
    """Train-on-X test-on-real protocol (test_eegglow.py:169-194):
    bandpass both sets, fit CSP+LDA on train, report train and test scores.

    X_*: (N, C, T) float64. y: binary labels (1=mi, 0=baseline)."""
    from sklearn.discriminant_analysis import LinearDiscriminantAnalysis

    X_train = bandpass_filter(np.asarray(X_train, np.float64))
    X_test = bandpass_filter(np.asarray(X_test, np.float64))
    csp = CSP()
    lda = LinearDiscriminantAnalysis()
    F_train = csp.fit_transform(X_train, y_train)
    lda.fit(F_train, y_train)
    train_scores = classification_scores(y_train, lda.predict(F_train))
    F_test = csp.transform(X_test)
    test_scores = classification_scores(y_test, lda.predict(F_test))
    return train_scores, test_scores


def mean_central_psd(trials: np.ndarray, nperseg: int = 64
                     ) -> Tuple[np.ndarray, np.ndarray]:
    """PSD of the C3/Cz/C4 average channel (test_eegglow.py:33-41:
    channels 7, 9, 11), welch with nperseg=64 at fs=250/4."""
    surrogate = (trials[:, 7, :] + trials[:, 9, :] + trials[:, 11, :]) / 3
    psds = []
    for s in surrogate:
        fx, psd = welch(s, fs=FS_DEC, nperseg=nperseg)
        psds.append(psd)
    return fx, np.mean(psds, axis=0)
