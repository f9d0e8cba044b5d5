"""PyTorch checkpoint importers.

BASELINE.json requires "FID and PSNR parity against PyTorch checkpoints":
these functions map reference ``state_dict`` files (saved by vaegan_code.py:
193, main_vae.py:204-205, gan_code.py:235) onto the NHWC flax parameter
trees, handling the layout transposes:

* Conv2d weight   (O, I, kh, kw) -> (kh, kw, I, O)   [HWIO]
* ConvTranspose2d (I, O, kh, kw) -> (kh, kw, I, O)   (the spatial flip that
  torch applies implicitly is performed inside ops.conv.conv_transpose2d,
  so the kernel itself is stored unflipped)
* Linear weight   (O, I)         -> (I, O)
* BatchNorm weight/bias/running_mean/running_var -> scale/bias/mean/var

torch is only needed to *read* the files (torch.load on CPU); nothing else
touches it.
"""
from __future__ import annotations

from typing import Dict

import numpy as np


def _load_state_dict(path: str) -> Dict[str, np.ndarray]:
    import torch
    sd = torch.load(path, map_location="cpu", weights_only=True)
    out = {k: v.numpy() if hasattr(v, "numpy") else np.asarray(v)
           for k, v in sd.items()}
    # strip nn.DataParallel's `module.` prefix: the reference saves Glow as
    # model.module.state_dict() (nf_code.py:624) but loads whole-model dumps
    # with `module.`-prefixed keys too (nf_code.py:652-657); accept both.
    if out and all(k.startswith("module.") for k in out):
        out = {k[len("module."):]: v for k, v in out.items()}
    return out


def conv_w(w: np.ndarray) -> np.ndarray:
    """OIHW -> HWIO."""
    return np.transpose(w, (2, 3, 1, 0))


def convT_w(w: np.ndarray) -> np.ndarray:
    """torch ConvTranspose2d (I, O, kh, kw) -> HWIO (kh, kw, I, O)."""
    return np.transpose(w, (2, 3, 0, 1))


def linear_w(w: np.ndarray) -> np.ndarray:
    return np.transpose(w, (1, 0))


def _bn(sd, prefix):
    return ({"scale": sd[f"{prefix}.weight"], "bias": sd[f"{prefix}.bias"]},
            {"mean": sd[f"{prefix}.running_mean"],
             "var": sd[f"{prefix}.running_var"]})


def import_generator(path: str, n_up: int, nc: int = 3) -> Dict:
    """Reference Generator state_dict (gan_code.py:16-54) -> flax variables.

    torch Sequential layout: convT at index 3i, BN at 3i+1 for i in
    0..n_up, final 3x3 layer at 3*(n_up+1).

    The reference's final 3x3 layer is a stride-1 ConvTranspose2d
    (gan_code.py:49) — weight (I, O, kh, kw); our Generator's ``out`` is a
    plain conv, and stride-1 convT == correlation with the spatially-flipped,
    I/O-swapped kernel, so that conversion is applied when the checkpoint's
    weight has convT layout (detected via the ``nc`` output-channel axis).
    """
    sd = _load_state_dict(path)
    params, stats = {}, {}
    for i in range(n_up + 1):
        params[f"up{i}"] = {"kernel": convT_w(sd[f"main.{3 * i}.weight"])}
        p, s = _bn(sd, f"main.{3 * i + 1}")
        params[f"bn{i}"] = p
        stats[f"bn{i}"] = s
    w = sd[f"main.{3 * (n_up + 1)}.weight"]
    if w.shape[1] == nc and w.shape[0] != nc:
        w = np.transpose(w, (1, 0, 2, 3))[:, :, ::-1, ::-1]
    params["out"] = {"kernel": conv_w(np.ascontiguousarray(w))}
    return {"params": params, "batch_stats": stats}


def import_discriminator(path: str, n_down: int) -> Dict:
    """Reference Discriminator state_dict (gan_code.py:56-89) -> flax.

    torch Sequential layout: conv0 at 0 (no BN), then conv at 3i-1 and BN at
    3i for i in 1..n_down-1, final conv after.
    """
    sd = _load_state_dict(path)
    params, stats = {}, {}
    params["down0"] = {"kernel": conv_w(sd["main.0.weight"])}
    idx = 2
    for i in range(1, n_down):
        params[f"down{i}"] = {"kernel": conv_w(sd[f"main.{idx}.weight"])}
        p, s = _bn(sd, f"main.{idx + 1}")
        params[f"bn{i}"] = p
        stats[f"bn{i}"] = s
        idx += 3
    params["out"] = {"kernel": conv_w(sd[f"main.{idx}.weight"])}
    return {"params": params, "batch_stats": stats}


def import_encoder(path: str) -> Dict:
    """Reference Encoder state_dict (main_vae.py:34-58) -> flax variables.

    NOTE on the flatten order: torch flattens (C, H, W); the NHWC encoder
    flattens (H, W, C). The fc weight rows are permuted accordingly so the
    imported model is numerically identical.
    """
    sd = _load_state_dict(path)
    params, stats = {}, {}
    for i in range(4):
        params[f"conv{i}"] = {
            "kernel": conv_w(sd[f"cnn.{i}.conv.weight"]),
            "bias": sd[f"cnn.{i}.conv.bias"]}
        p, s = _bn(sd, f"cnn.{i}.bn")
        params[f"bn{i}"] = p
        stats[f"bn{i}"] = s
    c = sd["cnn.3.conv.weight"].shape[0]       # final channels (256)
    for name in ("fc_mu", "fc_logvar"):
        w = sd[f"{name}.weight"]               # (latent, C*H*W), CHW order
        latent, flat = w.shape
        hw = flat // c
        side = int(round(hw ** 0.5))
        # (latent, C, H, W) -> (latent, H, W, C) -> (HWC, latent)
        w = w.reshape(latent, c, side, side).transpose(0, 2, 3, 1)
        params[name] = {"kernel": w.reshape(latent, -1).T,
                        "bias": sd[f"{name}.bias"]}
    return {"params": params, "batch_stats": stats}


def import_inception(path: str, variables: Dict) -> Dict:
    """pytorch-fid / torchvision inception state_dict -> the flax
    InceptionV3 of vgd_tpu.eval.inception (module names match torch's)."""
    sd = _load_state_dict(path)
    import jax

    params = jax.tree_util.tree_map(np.asarray, variables["params"])
    stats = jax.tree_util.tree_map(np.asarray, variables["batch_stats"])

    def walk(tree, stats_tree, prefix):
        for name, sub in tree.items():
            tkey = f"{prefix}{name}" if not prefix else f"{prefix}.{name}"
            if name == "conv" and "kernel" in sub:
                sub["kernel"] = conv_w(sd[f"{tkey}.weight"])
            elif name == "bn" and "scale" in sub:
                sub["scale"] = sd[f"{tkey}.weight"]
                sub["bias"] = sd[f"{tkey}.bias"]
            elif name == "fc":
                sub["kernel"] = linear_w(sd["fc.weight"])
                sub["bias"] = sd["fc.bias"]
            elif isinstance(sub, dict):
                walk(sub, stats_tree.get(name, {}) if stats_tree else {},
                     tkey)
        return tree

    params = walk(params, stats, "")

    def walk_stats(tree, prefix):
        for name, sub in tree.items():
            tkey = f"{prefix}{name}" if not prefix else f"{prefix}.{name}"
            if name == "bn" and "mean" in sub:
                sub["mean"] = sd[f"{tkey}.running_mean"]
                sub["var"] = sd[f"{tkey}.running_var"]
            elif isinstance(sub, dict):
                walk_stats(sub, tkey)
        return tree

    stats = walk_stats(stats, "")
    return {"params": params, "batch_stats": stats}


def import_unet(path: str, attention: bool = True) -> Dict:
    """Reference DDPM UNet state_dict (diffusion_model.py:88-139 /
    diffusion_model_no_attn.py:47-91) -> flax variables.

    torch layout per ConvBlock: conv.0 / conv.1 (GroupNorm) / conv.3 /
    conv.4 (GroupNorm), time_emb_proj, residual_conv (absent when
    in_ch == out_ch). The unused level-3 self-attention module
    (diffusion_model.py:104) is skipped.
    """
    sd = _load_state_dict(path)
    params: Dict = {}

    params["time_mlp1"] = {"kernel": linear_w(sd["time_mlp.0.weight"]),
                           "bias": sd["time_mlp.0.bias"]}
    params["time_mlp2"] = {"kernel": linear_w(sd["time_mlp.2.weight"]),
                           "bias": sd["time_mlp.2.bias"]}

    def convblock(name):
        out = {
            "conv1": {"kernel": conv_w(sd[f"{name}.conv.0.weight"]),
                      "bias": sd[f"{name}.conv.0.bias"]},
            "gn1": {"scale": sd[f"{name}.conv.1.weight"],
                    "bias": sd[f"{name}.conv.1.bias"]},
            "conv2": {"kernel": conv_w(sd[f"{name}.conv.3.weight"]),
                      "bias": sd[f"{name}.conv.3.bias"]},
            "gn2": {"scale": sd[f"{name}.conv.4.weight"],
                    "bias": sd[f"{name}.conv.4.bias"]},
            "time_proj": {"kernel": linear_w(sd[f"{name}.time_emb_proj.weight"]),
                          "bias": sd[f"{name}.time_emb_proj.bias"]},
        }
        if f"{name}.residual_conv.weight" in sd:
            out["residual_conv"] = {
                "kernel": conv_w(sd[f"{name}.residual_conv.weight"]),
                "bias": sd[f"{name}.residual_conv.bias"]}
        return out

    for blk in ("down1", "down2", "down3", "bottleneck", "up3", "up2", "up1"):
        params[blk] = convblock(blk)

    if attention:
        for name in ("cross_attn2", "cross_attn3"):
            params[name] = {
                "to_q": {"kernel": linear_w(sd[f"{name}.to_q.weight"]),
                         "bias": sd[f"{name}.to_q.bias"]},
                "to_kv": {"kernel": linear_w(sd[f"{name}.to_kv.weight"]),
                          "bias": sd[f"{name}.to_kv.bias"]},
                "proj": {"kernel": linear_w(sd[f"{name}.proj.weight"]),
                         "bias": sd[f"{name}.proj.bias"]},
                "norm": {"scale": sd[f"{name}.norm.weight"],
                         "bias": sd[f"{name}.norm.bias"]},
                "global_tokens": sd[f"{name}.global_tokens"],
            }
        params["attn_bottleneck"] = {
            "norm": {"scale": sd["attn_bottleneck.norm.weight"],
                     "bias": sd["attn_bottleneck.norm.bias"]},
            "qkv": {"kernel": conv_w(sd["attn_bottleneck.qkv.weight"]),
                    "bias": sd["attn_bottleneck.qkv.bias"]},
            "proj": {"kernel": conv_w(sd["attn_bottleneck.proj.weight"]),
                     "bias": sd["attn_bottleneck.proj.bias"]},
        }

    params["out_conv"] = {"kernel": conv_w(sd["out_conv.weight"]),
                          "bias": sd["out_conv.bias"]}
    return {"params": params}


def import_glow(path: str, n_blocks: int, n_flows: int) -> Dict:
    """Reference Glow state_dict (nf_code.py GlowModel / flow_eeg.py) ->
    the stacked-parameter pytree of vgd_tpu.models.glow.Glow.

    torch keys: blocks.{i}.flows.{k}.ActNorm.{b,s} (1,C,1,1),
    .InvConv.{P,L,U,S,S_sign} (masks/eye recomputed on the fly here),
    .AffCoupling.neuralnet.{0,2}.{weight,bias} + .4.conv.{weight,bias} +
    .4.scale, and blocks.{i}.prior.conv.{weight,bias} + prior.scale.
    """
    sd = _load_state_dict(path)
    params: Dict = {}
    for i in range(n_blocks):
        flows = {"actnorm": {"b": [], "s": []},
                 "invconv": {"P": [], "L": [], "U": [], "log_s": [],
                             "s_sign": []},
                 "coupling": {"conv1": {"w": [], "b": []},
                              "conv2": {"w": [], "b": []},
                              "zero": {"w": [], "b": [], "scale": []}}}
        for k in range(n_flows):
            pre = f"blocks.{i}.flows.{k}"
            flows["actnorm"]["b"].append(
                sd[f"{pre}.ActNorm.b"].reshape(-1))
            flows["actnorm"]["s"].append(
                sd[f"{pre}.ActNorm.s"].reshape(-1))
            flows["invconv"]["P"].append(sd[f"{pre}.InvConv.P"])
            flows["invconv"]["L"].append(sd[f"{pre}.InvConv.L"])
            flows["invconv"]["U"].append(sd[f"{pre}.InvConv.U"])
            flows["invconv"]["log_s"].append(sd[f"{pre}.InvConv.S"])
            flows["invconv"]["s_sign"].append(sd[f"{pre}.InvConv.S_sign"])
            cp = f"{pre}.AffCoupling.neuralnet"
            flows["coupling"]["conv1"]["w"].append(
                conv_w(sd[f"{cp}.0.weight"]))
            flows["coupling"]["conv1"]["b"].append(sd[f"{cp}.0.bias"])
            flows["coupling"]["conv2"]["w"].append(
                conv_w(sd[f"{cp}.2.weight"]))
            flows["coupling"]["conv2"]["b"].append(sd[f"{cp}.2.bias"])
            flows["coupling"]["zero"]["w"].append(
                conv_w(sd[f"{cp}.4.conv.weight"]))
            flows["coupling"]["zero"]["b"].append(sd[f"{cp}.4.conv.bias"])
            flows["coupling"]["zero"]["scale"].append(
                sd[f"{cp}.4.scale"].reshape(-1))
        flows = _stack_lists(flows)
        prior = {"w": conv_w(sd[f"blocks.{i}.prior.conv.weight"]),
                 "b": sd[f"blocks.{i}.prior.conv.bias"],
                 "scale": sd[f"blocks.{i}.prior.scale"].reshape(-1)}
        params[f"block{i}"] = {"flows": flows, "prior": prior}
    return params


def _stack_lists(tree):
    if isinstance(tree, dict):
        return {k: _stack_lists(v) for k, v in tree.items()}
    return np.stack(tree)
