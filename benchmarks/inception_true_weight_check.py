"""One-command true-weight InceptionV3 parity check (VERDICT r2 #7).

This host has no egress, so the real pytorch-fid weights
(``pt_inception-2015-12-05-6726825d.pth``, the file torchmetrics/pytorch-fid
download — what the reference's FID/IS used, vaegan_code.py:143-185) cannot
be fetched. When a weights file IS available, this harness proves the import
end-to-end in one command:

    python benchmarks/inception_true_weight_check.py --weights pt_inception.pth

It loads the same state_dict into (a) the in-process torch pytorch-fid-layout
network (tests/test_inception_parity.py fixture, strict=False so the real
file's extra AuxLogits.* / num_batches_tracked keys are reported, not fatal)
and (b) the flax InceptionV3 via ``io.torch_import.import_inception``, runs
both on synthetic uint8 images, and reports feature/logit deltas plus an
end-to-end FID delta.

Expected tolerances (established against an in-process randomized fixture,
tests/test_inception_parity.py): feat64 <= 1e-3 abs, feat2048 / logits
<= 1e-2 rel, FID <= 5e-3 rel. Larger logit deltas with real weights usually
indicate an fc layout mismatch; larger feature deltas indicate a BN-stat or
resize mismatch.
"""
from __future__ import annotations

import argparse
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--weights", required=True,
                    help="torch state_dict (.pth), e.g. pytorch-fid's "
                    "pt_inception-2015-12-05-6726825d.pth")
    ap.add_argument("--n", type=int, default=16)
    a = ap.parse_args()

    import torch

    from test_inception_parity import TInception3  # the pytorch-fid layout

    from vgd_tpu.eval.inception import load_inception
    from vgd_tpu.eval.metrics import frechet_distance
    from vgd_tpu.io.torch_import import _load_state_dict

    sd = _load_state_dict(a.weights)  # strips any nn.DataParallel 'module.'
    n_fc = sd["fc.weight"].shape[0]
    print(f"state_dict: {len(sd)} tensors, fc={n_fc}-way")

    tm = TInception3(num_classes=n_fc)
    missing, unexpected = tm.load_state_dict(
        {k: torch.as_tensor(np.asarray(v)) for k, v in sd.items()},
        strict=False)
    print(f"torch-side load: {len(missing)} missing, "
          f"{len(unexpected)} unexpected (aux/bookkeeping keys are "
          f"expected here): {sorted(unexpected)[:6]} ...")
    assert not missing, f"torch fixture missing weights: {missing[:8]}"
    tm.eval()

    feature_fn, tag = load_inception(a.weights, feature="64")
    assert tag == a.weights

    rng = np.random.default_rng(0)
    x_u8 = rng.integers(0, 256, (a.n, 64, 64, 3), dtype=np.uint8)
    with torch.no_grad():
        f64_t, f2048_t, logits_t = tm(
            torch.tensor(x_u8.transpose(0, 3, 1, 2), dtype=torch.float32)
            / 255.0)
    f64_j, logits_j = feature_fn(x_u8)

    fn2048, _ = load_inception(a.weights, feature="2048")
    f2048_j, _ = fn2048(x_u8)

    real = rng.integers(0, 256, (a.n, 64, 64, 3), dtype=np.uint8)
    fake = np.clip(real.astype(np.int32)
                   + rng.integers(-40, 40, real.shape), 0, 255) \
        .astype(np.uint8)

    def t64(u8):
        with torch.no_grad():
            f, _, _ = tm(torch.tensor(u8.transpose(0, 3, 1, 2),
                                      dtype=torch.float32) / 255.0)
        return f.numpy()

    fid_t = frechet_distance(t64(real), t64(fake))
    fid_j = frechet_distance(np.asarray(feature_fn(real)[0]),
                             np.asarray(feature_fn(fake)[0]))

    def err(a_, b_):
        return float(np.max(np.abs(np.asarray(a_) - np.asarray(b_))))

    result = {
        "feat64_max_abs": err(f64_j, f64_t.numpy()),
        "feat2048_max_abs": err(f2048_j, f2048_t.numpy()),
        "logits_max_abs": err(logits_j, logits_t.numpy()),
        "fid_torch": float(fid_t), "fid_jax": float(fid_j),
        "fid_rel_err": float(abs(fid_j - fid_t) / max(abs(fid_t), 1e-12)),
        "pass": bool(err(f64_j, f64_t.numpy()) <= 1e-3
                     and abs(fid_j - fid_t) / max(abs(fid_t), 1e-12) <= 5e-3),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
