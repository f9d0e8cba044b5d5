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
    tv_u = _stub("torchvision.utils", save_image=lambda *a, **k: None)
    tv.transforms, tv.datasets, tv.utils = tv_t, tv_d, tv_u
    tm_fid = _stub("torchmetrics.image.fid",
                   FrechetInceptionDistance=metric)
    tm_img.fid = tm_fid
    # flow_eeg.py:340 imports mne at module level for its plotting helpers
    # (absent from this image; never touched by the model classes)
    _stub("mne", create_info=lambda *a, **k: None,
          io=types.SimpleNamespace(RawArray=None))
    # The reference left stray breakpoint() calls in its Glow reverse/train
    # paths (nf_code.py:447,587,684 — debug artifacts, SURVEY.md §2a #12);
    # neutralise them so the parity harness can drive those code paths.
    import os
    os.environ.setdefault("PYTHONBREAKPOINT", "0")


def import_reference(path: str = REFERENCE_PATH):
    """Returns a namespace with the reference's model-bearing modules
    imported from ``path`` (raises ImportError/FileNotFoundError if the
    checkout is absent): gan_code, main_vae, nf_code (2-D Glow), flow_eeg
    (1-D EEG Glow), diffusion_model / diffusion_model_no_attn (UNets), and
    train_diffusion (schedule + q_sample + loss)."""
    import os
    if not os.path.isdir(path):
        raise FileNotFoundError(f"reference checkout not found at {path}")
    install_stubs()
    sys.path.insert(0, path)
    try:
        import diffusion_model
        import diffusion_model_no_attn
        import flow_eeg
        import gan_code
        import main_vae
        import nf_code
        import train_diffusion
    finally:
        sys.path.remove(path)
    return types.SimpleNamespace(gan=gan_code, vae=main_vae, nf=nf_code,
                                 eeg=flow_eeg, unet=diffusion_model,
                                 unet_na=diffusion_model_no_attn,
                                 diff=train_diffusion)
