"""vitg end-to-end smoke: synthetic reference-format checkpoint -> converter
-> SwiGLU forward -> SBS pipeline step.

The reference wires vitg via DINOv2('vitg') with ffn_layer='swiglufused'
(reference depth_anything_v2/dinov2.py:380-415) and vitg taps [9,19,29,39]
(reference depth_anything_v2/dpt.py:166-171). No official DA-V2 vitg .pth is
published, so this test builds a tiny state_dict in the reference's exact key
format (pretrained.blocks.N.mlp.w12/w3 etc.), converts it, and drives the
full SBS step — proving the converter's vitg key-map and the SwiGLU path
work through the whole pipeline, not only at block level.
"""

import numpy as np
import jax.numpy as jnp

from vr_video_generator_tpu.models.convert import convert_state_dict
from vr_video_generator_tpu.models.depth_anything_v2 import DepthAnythingV2
from vr_video_generator_tpu.models.factory import random_params
from vr_video_generator_tpu.pipeline import SbsPipeline
from vr_video_generator_tpu.utils.config import ModelConfig, RunConfig

TINY_G = ModelConfig(encoder="vitg", embed_dim=48, depth=4, num_heads=2,
                     mlp_ratio=4.0, features=16, out_channels=(8, 16, 32, 32),
                     intermediate_layers=(0, 1, 2, 3),
                     ffn_layer="swiglufused", depth_scaler=1.0)

H, W = 56, 98


def _torchify_dense(tree):
    # flax Dense kernel (in,out) -> torch Linear weight (out,in)
    out = {"weight": np.ascontiguousarray(np.asarray(tree["kernel"]).T)}
    if "bias" in tree:
        out["bias"] = np.asarray(tree["bias"])
    return out


def _torchify_conv(tree):
    # flax kernel (kh,kw,I,O) -> torch Conv weight (O,I,kh,kw)
    out = {"weight": np.ascontiguousarray(
        np.asarray(tree["kernel"]).transpose(3, 2, 0, 1))}
    if "bias" in tree:
        out["bias"] = np.asarray(tree["bias"])
    return out


def _torchify_conv_transpose(tree):
    # flax kernel (kh,kw,I,O) -> torch ConvTranspose weight (I,O,kh,kw)
    return {"weight": np.ascontiguousarray(
        np.asarray(tree["kernel"]).transpose(2, 3, 0, 1)),
        "bias": np.asarray(tree["bias"])}


def _torchify_norm(tree):
    return {"weight": np.asarray(tree["scale"]), "bias": np.asarray(tree["bias"])}


def _emit(sd, prefix, mapped):
    for k, v in mapped.items():
        sd[f"{prefix}.{k}"] = v


def synthetic_vitg_state_dict(params):
    """Reference-format (torch key) state_dict with the tiny vitg shapes,
    built by inverting the converter's documented layout transforms."""
    sd = {}
    pre = params["pretrained"]
    sd["pretrained.cls_token"] = np.asarray(pre["cls_token"])
    sd["pretrained.pos_embed"] = np.asarray(pre["pos_embed"])
    _emit(sd, "pretrained.patch_embed.proj", _torchify_conv(pre["patch_embed"]))
    _emit(sd, "pretrained.norm", _torchify_norm(pre["norm"]))
    for i in range(TINY_G.depth):
        blk = pre[f"block{i}"]
        p = f"pretrained.blocks.{i}"
        _emit(sd, p + ".norm1", _torchify_norm(blk["norm1"]))
        _emit(sd, p + ".attn.qkv", _torchify_dense(blk["attn"]["qkv"]))
        _emit(sd, p + ".attn.proj", _torchify_dense(blk["attn"]["proj"]))
        sd[p + ".ls1.gamma"] = np.asarray(blk["ls1"]["gamma"])
        _emit(sd, p + ".norm2", _torchify_norm(blk["norm2"]))
        # vitg SwiGLU keys (reference dinov2_layers/swiglu_ffn.py)
        _emit(sd, p + ".mlp.w12", _torchify_dense(blk["mlp"]["w12"]))
        _emit(sd, p + ".mlp.w3", _torchify_dense(blk["mlp"]["w3"]))
        sd[p + ".ls2.gamma"] = np.asarray(blk["ls2"]["gamma"])
    head = params["depth_head"]
    for i in range(4):
        _emit(sd, f"depth_head.projects.{i}", _torchify_conv(head[f"project{i}"]))
    _emit(sd, "depth_head.resize_layers.0",
          _torchify_conv_transpose(head["resize0"]))
    _emit(sd, "depth_head.resize_layers.1",
          _torchify_conv_transpose(head["resize1"]))
    _emit(sd, "depth_head.resize_layers.3", _torchify_conv(head["resize3"]))
    for i in range(4):
        _emit(sd, f"depth_head.scratch.layer{i + 1}_rn",
              _torchify_conv(head[f"layer{i + 1}_rn"]))
    for i in range(1, 5):
        rn = head[f"refinenet{i}"]
        p = f"depth_head.scratch.refinenet{i}"
        for rcu, tname in (("rcu1", "resConfUnit1"), ("rcu2", "resConfUnit2")):
            # Real reference checkpoints carry refinenet4.resConfUnit1 weights
            # even though the top refinenet never applies them (single input;
            # reference util/blocks.py FeatureFusionBlock constructs both) —
            # the flax tree omits the unused module, so synthesize the torch
            # entry from rcu2's shapes to keep the key set faithful.
            src = rn.get(rcu) or rn["rcu2"]
            _emit(sd, f"{p}.{tname}.conv1", _torchify_conv(src["conv1"]))
            _emit(sd, f"{p}.{tname}.conv2", _torchify_conv(src["conv2"]))
        _emit(sd, p + ".out_conv", _torchify_conv(rn["out_conv"]))
    _emit(sd, "depth_head.scratch.output_conv1", _torchify_conv(head["output_conv1"]))
    _emit(sd, "depth_head.scratch.output_conv2.0",
          _torchify_conv(head["output_conv2_0"]))
    _emit(sd, "depth_head.scratch.output_conv2.2",
          _torchify_conv(head["output_conv2_2"]))
    return sd


def test_vitg_convert_and_sbs_step(rng):
    model = DepthAnythingV2(TINY_G, dtype=jnp.float32)
    want = random_params(model, seed=3)
    sd = synthetic_vitg_state_dict(want)
    got = convert_state_dict(sd, TINY_G)

    # converter output must reproduce the exact flax tree (structure + values)
    import jax

    want_flat = {jax.tree_util.keystr(p): np.asarray(v)
                 for p, v in jax.tree_util.tree_flatten_with_path(want)[0]}
    got_flat = {jax.tree_util.keystr(p): np.asarray(v)
                for p, v in jax.tree_util.tree_flatten_with_path(got)[0]}
    # the converter keeps the checkpoint's unused refinenet4.resConfUnit1
    # weights (flax ignores extra params at apply time) — everything else
    # must match the model tree exactly
    extras = set(got_flat) - set(want_flat)
    assert set(want_flat) <= set(got_flat)
    assert all("refinenet4" in k and "rcu1" in k for k in extras), extras
    for k in want_flat:
        np.testing.assert_allclose(got_flat[k], want_flat[k], rtol=0, atol=1e-6,
                                   err_msg=k)

    # end-to-end: converted vitg params drive a full SBS step
    cfg = RunConfig(batch_size=2, input_size=56, compute_dtype="float32")
    pipe = SbsPipeline(model, got, H, W, run_cfg=cfg)
    frames = rng.integers(0, 256, (2, H, W, 3), dtype=np.uint8)
    sbs, state = pipe.step(frames, pipe.initial_state())
    sbs = np.asarray(sbs)
    assert sbs.shape == (2, H, 2 * W, 3) and sbs.dtype == np.uint8
    np.testing.assert_array_equal(sbs[:, :, W:], frames)
    assert np.asarray(pipe.depth_only(frames)).min() >= 0
