"""Torch .pth checkpoint -> JAX parameter-tree converter.

Consumes the official Depth-Anything-V2 state_dicts the reference loads
(reference SupportFunction.py:158-168; download paths README.md:33-39) and
produces the flax param pytree for models/dinov2.py + models/dpt.py.

Layout transforms:
  Linear (out,in) -> Dense kernel (in,out)
  Conv  (O,I,kh,kw) -> (kh,kw,I,O)
  ConvTranspose (I,O,kh,kw) -> PixelShuffleUpsample kernel (kh,kw,I,O)

torch is only needed to unpickle the checkpoint; conversion itself is numpy.
"""

from __future__ import annotations

from typing import Dict, Mapping

import numpy as np

from vr_video_generator_tpu.utils.config import ModelConfig

Array = np.ndarray


def _dense(sd: Mapping[str, Array], prefix: str) -> Dict[str, Array]:
    out = {"kernel": np.ascontiguousarray(sd[prefix + ".weight"].T)}
    if prefix + ".bias" in sd:
        out["bias"] = sd[prefix + ".bias"]
    return out


def _conv(sd: Mapping[str, Array], prefix: str, bias: bool = True) -> Dict[str, Array]:
    out = {"kernel": np.ascontiguousarray(sd[prefix + ".weight"].transpose(2, 3, 1, 0))}
    if bias and prefix + ".bias" in sd:
        out["bias"] = sd[prefix + ".bias"]
    return out


def _conv_transpose(sd: Mapping[str, Array], prefix: str) -> Dict[str, Array]:
    return {"kernel": np.ascontiguousarray(sd[prefix + ".weight"].transpose(2, 3, 0, 1)),
            "bias": sd[prefix + ".bias"]}


def _norm(sd: Mapping[str, Array], prefix: str) -> Dict[str, Array]:
    return {"scale": sd[prefix + ".weight"], "bias": sd[prefix + ".bias"]}


def _rcu(sd: Mapping[str, Array], prefix: str) -> Dict[str, Array]:
    return {"conv1": _conv(sd, prefix + ".conv1"),
            "conv2": _conv(sd, prefix + ".conv2")}


def convert_state_dict(state_dict: Mapping[str, "object"],
                       cfg: ModelConfig) -> Dict:
    """Torch state_dict (tensors or arrays) -> flax params tree (numpy f32)."""
    sd: Dict[str, Array] = {}
    for k, v in state_dict.items():
        arr = v.detach().cpu().numpy() if hasattr(v, "detach") else np.asarray(v)
        sd[k] = np.asarray(arr, np.float32)

    pretrained: Dict[str, object] = {
        "cls_token": sd["pretrained.cls_token"],
        "pos_embed": sd["pretrained.pos_embed"],
        "patch_embed": _conv(sd, "pretrained.patch_embed.proj"),
        "norm": _norm(sd, "pretrained.norm"),
    }
    for i in range(cfg.depth):
        p = f"pretrained.blocks.{i}"
        if cfg.ffn_layer == "swiglufused":  # vitg (reference swiglu_ffn.py)
            mlp = {"w12": _dense(sd, p + ".mlp.w12"),
                   "w3": _dense(sd, p + ".mlp.w3")}
        else:
            mlp = {"fc1": _dense(sd, p + ".mlp.fc1"),
                   "fc2": _dense(sd, p + ".mlp.fc2")}
        pretrained[f"block{i}"] = {
            "norm1": _norm(sd, p + ".norm1"),
            "attn": {"qkv": _dense(sd, p + ".attn.qkv"),
                     "proj": _dense(sd, p + ".attn.proj")},
            "ls1": {"gamma": sd[p + ".ls1.gamma"]},
            "norm2": _norm(sd, p + ".norm2"),
            "mlp": mlp,
            "ls2": {"gamma": sd[p + ".ls2.gamma"]},
        }

    head: Dict[str, object] = {}
    for i in range(4):
        head[f"project{i}"] = _conv(sd, f"depth_head.projects.{i}")
    head["resize0"] = _conv_transpose(sd, "depth_head.resize_layers.0")
    head["resize1"] = _conv_transpose(sd, "depth_head.resize_layers.1")
    head["resize3"] = _conv(sd, "depth_head.resize_layers.3")
    for i in range(4):
        head[f"layer{i + 1}_rn"] = _conv(sd, f"depth_head.scratch.layer{i + 1}_rn",
                                         bias=False)
    for i in range(1, 5):
        p = f"depth_head.scratch.refinenet{i}"
        head[f"refinenet{i}"] = {
            "rcu1": _rcu(sd, p + ".resConfUnit1"),
            "rcu2": _rcu(sd, p + ".resConfUnit2"),
            "out_conv": _conv(sd, p + ".out_conv"),
        }
    head["output_conv1"] = _conv(sd, "depth_head.scratch.output_conv1")
    head["output_conv2_0"] = _conv(sd, "depth_head.scratch.output_conv2.0")
    head["output_conv2_2"] = _conv(sd, "depth_head.scratch.output_conv2.2")

    return {"pretrained": pretrained, "depth_head": head}


def load_checkpoint(path: str, cfg: ModelConfig) -> Dict:
    """Load a reference-format .pth and convert (torch required)."""
    import torch

    state_dict = torch.load(path, map_location="cpu", weights_only=True)
    return convert_state_dict(state_dict, cfg)
