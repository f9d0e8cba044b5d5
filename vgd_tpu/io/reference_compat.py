"""Import the upstream reference's own torch modules in-process.

The parity harness (tests/test_reference_lockstep.py,
benchmarks/reference_checkpoint_parity.py) drives the reference's actual
``nn.Module`` classes (gan_code.py:16-89, main_vae.py:20-58) side by side
with this framework. The reference's top-level imports pull heavy eval deps
(torchmetrics, torchvision) that are absent from this image and irrelevant
to the model classes, so minimal import stubs are installed first.

Nothing here touches the production path; it exists so parity claims are
made against the reference's code rather than a re-transcription of it.
"""
from __future__ import annotations

import sys
import types

REFERENCE_PATH = "/root/reference"


def _stub(name, **attrs):
    if name in sys.modules:
        return sys.modules[name]
    mod = types.ModuleType(name)
    for k, v in attrs.items():
        setattr(mod, k, v)
    sys.modules[name] = mod
    return mod


def install_stubs() -> None:
    """Register placeholder torchmetrics/torchvision modules (eval-only deps
    of the reference scripts; never called by the model classes)."""
    metric = type("_StubMetric", (), {})
    tm = _stub("torchmetrics")
    tm_img = _stub("torchmetrics.image",
                   FrechetInceptionDistance=metric,
                   StructuralSimilarityIndexMeasure=metric)
    tm.image = tm_img
    tm_inc = _stub("torchmetrics.image.inception", InceptionScore=metric)
    tm_img.inception = tm_inc
    tv = _stub("torchvision")
    tv_t = _stub("torchvision.transforms", Compose=list, Resize=object,
                 CenterCrop=object, ToTensor=object, Normalize=object)
    tv_t_f = _stub("torchvision.transforms.functional",
                   crop=lambda *a: None)
    tv_t.functional = tv_t_f
    tv_d = _stub("torchvision.datasets")
    tv_d_f = _stub("torchvision.datasets.folder",
                   default_loader=lambda p: None)
    tv_d.folder = tv_d_f
    tv.transforms, tv.datasets = tv_t, tv_d


def import_reference(path: str = REFERENCE_PATH):
    """Returns a namespace with the reference's gan_code and main_vae
    modules imported from ``path`` (raises ImportError/FileNotFoundError if
    the checkout is absent)."""
    import os
    if not os.path.isdir(path):
        raise FileNotFoundError(f"reference checkout not found at {path}")
    install_stubs()
    sys.path.insert(0, path)
    try:
        import gan_code
        import main_vae
    finally:
        sys.path.remove(path)
    return types.SimpleNamespace(gan=gan_code, vae=main_vae)
