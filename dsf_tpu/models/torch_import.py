"""PyTorch checkpoint -> Flax parameter converters.

Imports the reference's released weights: the frozen Consis-CycleGAN
generator (`latest_net_G_A.pth`, loaded at train_render.py:95-100) and
DSF `MANO_OCR_stage` checkpoints (train_render.py:119-145) — needed for
output-fidelity parity without retraining.

Layout rules:
  conv      torch (out, in, kh, kw)  -> flax (kh, kw, in, out)
  deconv    torch (in, out, kh, kw)  -> flax transpose_kernel (kh, kw, out, in)
  (both are .transpose(2, 3, 1, 0))
  linear    torch (out, in)          -> flax (in, out)
  batchnorm weight/bias/running_*    -> scale/bias + batch_stats
"""

from __future__ import annotations

from typing import Dict

import numpy as np


def _np(t):
    return np.asarray(t.detach().cpu().numpy() if hasattr(t, "detach") else t,
                      np.float32)


def _conv_w(t):
    return _np(t).transpose(2, 3, 1, 0)


def load_torch_state(path: str) -> Dict[str, np.ndarray]:
    import torch
    sd = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(sd, dict) and "model" in sd:
        sd = sd["model"]
    return {k: _np(v) for k, v in sd.items() if hasattr(v, "numpy")
            or hasattr(v, "detach")}


# ---------------------------------------------------------------------------
# CycleGAN generator (pix2pix resnet_9blocks layout)
# ---------------------------------------------------------------------------

def convert_cyclegan_generator(sd: Dict[str, np.ndarray], n_blocks=9):
    """torch `ResnetGenerator.model` Sequential indices -> our module tree.

    Sequential layout (transfer.py:416-445): 0 pad, 1 stem conv, 2 IN,
    3 relu, (4, 7) down convs, (10..10+n-1) resblocks with conv_block.1
    and conv_block.5, then two deconvs, pad, head conv, tanh.
    """
    p = {}
    def conv(dst, idx):
        p[dst] = {"conv": {"kernel": _conv_w(sd[f"model.{idx}.weight"]),
                           "bias": _np(sd[f"model.{idx}.bias"])}}

    conv("stem", 1)
    conv("down0", 4)
    conv("down1", 7)
    for i in range(n_blocks):
        base = f"model.{10 + i}.conv_block"
        p[f"res{i}"] = {
            "c1": {"conv": {"kernel": _conv_w(sd[f"{base}.1.weight"]),
                            "bias": _np(sd[f"{base}.1.bias"])}},
            "c2": {"conv": {"kernel": _conv_w(sd[f"{base}.5.weight"]),
                            "bias": _np(sd[f"{base}.5.bias"])}},
        }
    up0_idx = 10 + n_blocks
    for j, idx in enumerate((up0_idx, up0_idx + 3)):
        p[f"up{j}"] = {"deconv": {
            "kernel": _conv_w(sd[f"model.{idx}.weight"]),
            "bias": _np(sd[f"model.{idx}.bias"])}}
    head_idx = up0_idx + 7
    conv("head", head_idx)
    return {"params": p}


def load_cyclegan_generator(path_or_dir: str):
    import os
    path = path_or_dir
    if os.path.isdir(path):
        path = os.path.join(path, "latest_net_G_A.pth")
    return convert_cyclegan_generator(load_torch_state(path))


# ---------------------------------------------------------------------------
# MANO_OCR_stage checkpoints
# ---------------------------------------------------------------------------

def _bn(sd, prefix):
    return ({"bn": {"scale": _np(sd[f"{prefix}.weight"]),
                    "bias": _np(sd[f"{prefix}.bias"])}},
            {"bn": {"mean": _np(sd[f"{prefix}.running_mean"]),
                    "var": _np(sd[f"{prefix}.running_var"])}})


def _basic_block(sd, prefix, has_down):
    params, stats = {}, {}
    for i in (1, 2):
        params[f"conv{i}"] = {"conv": {"kernel": _conv_w(sd[f"{prefix}.conv{i}.weight"])}}
        bp, bs = _bn(sd, f"{prefix}.bn{i}")
        params[f"bn{i}"], stats[f"bn{i}"] = bp, bs
    if has_down:
        params["down_conv"] = {"conv": {"kernel": _conv_w(sd[f"{prefix}.downsample.0.weight"])}}
        bp, bs = _bn(sd, f"{prefix}.downsample.1")
        params["down_bn"], stats["down_bn"] = bp, bs
    return params, stats


def _res_layer(sd, prefix, blocks):
    params, stats = {}, {}
    for i in range(blocks):
        has_down = f"{prefix}.{i}.downsample.0.weight" in sd
        bp, bs = _basic_block(sd, f"{prefix}.{i}", has_down)
        params[f"block{i}"], stats[f"block{i}"] = bp, bs
    return params, stats


def _trunk(sd, suffix, stem, layers=(2, 2, 2, 2)):
    """suffix '' for stage 1, '_s2' for stage 2."""
    params, stats = {}, {}
    if stem:
        params["pre_conv"] = {"conv": {"kernel": _conv_w(sd["pre.0.weight"])}}
        bp, bs = _bn(sd, "pre.1")
        params["pre_bn"], stats["pre_bn"] = bp, bs
    for li, blocks in enumerate(layers, start=1):
        lp, ls = _res_layer(sd, f"layer{li}{suffix}", blocks)
        params[f"layer{li}"], stats[f"layer{li}"] = lp, ls
    return params, stats


def _heads(sd, suffix):
    params, stats = {}, {}
    params["mano_regress"] = {
        "kernel": _np(sd[f"mano_regress{suffix}.2.weight"]).T,
        "bias": _np(sd[f"mano_regress{suffix}.2.bias"])}
    for name, li in (("deconv4", 4), ("deconv3", 3), ("deconv2", 2)):
        pre = f"deconv_layer{li}{suffix}"
        params[name] = {
            "deconv": {"deconv": {
                "kernel": _conv_w(sd[f"{pre}.0.weight"])}}}
        bp, bs = _bn(sd, f"{pre}.1")
        params[name]["bn"] = bp
        stats[name] = {"bn": bs}
    fin = f"finals{suffix}"
    params["final_offset"] = {"conv": {
        "kernel": _conv_w(sd[f"{fin}.0.weight"]),
        "bias": _np(sd[f"{fin}.0.bias"])}}
    params["final_heat"] = {"conv": {
        "kernel": _conv_w(sd[f"{fin}.1.weight"]),
        "bias": _np(sd[f"{fin}.1.bias"])}}
    return params, stats


def convert_mano_ocr_stage(sd: Dict[str, np.ndarray], refine=True):
    """Reference MANO_OCR_stage state_dict -> our variables dict."""
    params, stats = {}, {}
    params["trunk"], stats["trunk"] = _trunk(sd, "", stem=True)
    params["heads"], stats["heads"] = _heads(sd, "")
    if refine:
        fp = {"conv": {"conv": {"kernel": _conv_w(sd["fusion.0.weight"])}}}
        bp, bs = _bn(sd, "fusion.1")
        fp["bn"] = bp
        params["fusion"] = fp
        stats["fusion"] = {"bn": bs}
        params["trunk_s2"], stats["trunk_s2"] = _trunk(sd, "_s2", stem=False)
        params["heads_s2"], stats["heads_s2"] = _heads(sd, "_s2")
    return {"params": params, "batch_stats": stats}


def load_mano_ocr_stage(path: str, refine=True):
    return convert_mano_ocr_stage(load_torch_state(path), refine=refine)


# ---------------------------------------------------------------------------
# Hourglass PoseNet checkpoints (ref model/hourglass.py:169-259)
# ---------------------------------------------------------------------------

def _hg_conv(sd, prefix, bn=False):
    p = {"conv": {"kernel": _conv_w(sd[f"{prefix}.conv.weight"]),
                  "bias": _np(sd[f"{prefix}.conv.bias"])}}
    s = {}
    if bn:
        bp, bs = _bn(sd, f"{prefix}.bn")
        p["bn"], s["bn"] = bp, bs
    return p, s


def _hg_residual(sd, prefix):
    """Reference Residual always materializes skip_layer params; our
    module only has the skip conv when channels change (detected here
    from the conv shapes)."""
    p, s = {}, {}
    for i in (1, 2, 3):
        bp, bs = _bn(sd, f"{prefix}.bn{i}")
        p[f"bn{i}"], s[f"bn{i}"] = bp, bs
        cp, _ = _hg_conv(sd, f"{prefix}.conv{i}")
        p[f"c{i}"] = cp
    inp = sd[f"{prefix}.bn1.weight"].shape[0]
    out = sd[f"{prefix}.conv3.conv.weight"].shape[0]
    if inp != out:
        p["skip"], _ = _hg_conv(sd, f"{prefix}.skip_layer")
    return p, s


def _hg_hourglass(sd, prefix, n):
    p, s = {}, {}
    for name in ("up1", "low1", "low3"):
        p[name], s[name] = _hg_residual(sd, f"{prefix}.{name}")
    if n > 1:
        p["low2"], s["low2"] = _hg_hourglass(sd, f"{prefix}.low2", n - 1)
    else:
        p["low2"], s["low2"] = _hg_residual(sd, f"{prefix}.low2")
    return p, s


def convert_pose_net(sd: Dict[str, np.ndarray], nstack=1):
    """Reference `PoseNet` state_dict -> our hourglass.PoseNet variables
    (ref layout: pre.{0,1,3,4}, hgs.i, features.i.{0,1}, outs_{1,2,3}.i,
    merge_preds.i / merge_features.i)."""
    params, stats = {}, {}
    params["pre_conv"], stats["pre_conv"] = _hg_conv(sd, "pre.0", bn=True)
    for ours, theirs in (("pre_r1", "pre.1"), ("pre_r2", "pre.3"),
                         ("pre_r3", "pre.4")):
        params[ours], stats[ours] = _hg_residual(sd, theirs)
    for i in range(nstack):
        params[f"hg{i}"], stats[f"hg{i}"] = _hg_hourglass(sd, f"hgs.{i}", 4)
        params[f"feat_r{i}"], stats[f"feat_r{i}"] = _hg_residual(
            sd, f"features.{i}.0")
        params[f"feat_c{i}"], stats[f"feat_c{i}"] = _hg_conv(
            sd, f"features.{i}.1", bn=True)
        for j, outs in ((1, "outs_1"), (2, "outs_2"), (3, "outs_3")):
            params[f"out{j}_{i}"] = {"conv": {
                "kernel": _conv_w(sd[f"{outs}.{i}.weight"]),
                "bias": _np(sd[f"{outs}.{i}.bias"])}}
        if i < nstack - 1:
            params[f"merge_pred{i}"], _ = _hg_conv(sd, f"merge_preds.{i}.conv")
            params[f"merge_feat{i}"], _ = _hg_conv(
                sd, f"merge_features.{i}.conv")
    return {"params": params, "batch_stats": stats}
