"""Torch (diffusers) checkpoint -> Flax parameter conversion.

The reference loads its Texture-Structure Joint Model from a diffusers
layout: `model_key/unet_ema` (modified UNet2DConditionModel,
dual_branch_guidance.py:102-107) and `stabilityai/sd-vae-ft-mse`
(AutoencoderKL, :110). This module maps those torch state_dicts onto the
NHWC Flax modules in guidance/unet.py and guidance/vae.py:

- Conv2d weights [O,I,kh,kw] -> HWIO kernels [kh,kw,I,O];
- Linear weights [O,I] -> kernels [I,O];
- GroupNorm/LayerNorm weight/bias -> scale/bias;
- diffusers module paths -> our flatter module names (the name tables
  below; branch modules follow unet_rgbdepth.py:292-294,494-499,591-596).

All mapping is data-driven over key PATTERNS so the same code converts
the full SD2 model and the tiny test configs.
"""
from __future__ import annotations

import re

import numpy as np


def _conv(w):
    return np.ascontiguousarray(np.transpose(w, (2, 3, 1, 0)))


def _linear(w):
    return np.ascontiguousarray(np.transpose(w))


def load_torch_state_dict(path: str) -> dict:
    """Load a diffusers weight file (.safetensors or .bin) to numpy."""
    if path.endswith(".safetensors"):
        try:
            from safetensors.numpy import load_file

            return load_file(path)
        except ImportError:
            from safetensors.torch import load_file as load_t

            return {k: v.numpy() for k, v in load_t(path).items()}
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    return {k: v.float().numpy() for k, v in sd.items()}


def _assign(tree: dict, path: list[str], leaf):
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = leaf


_ATTN_INNER = {
    # diffusers BasicTransformerBlock -> our BasicTransformerBlock
    "norm1.weight": ("norm1", "scale", None),
    "norm1.bias": ("norm1", "bias", None),
    "attn1.to_q.weight": ("attn1", "to_q", "kernel"),
    "attn1.to_k.weight": ("attn1", "to_k", "kernel"),
    "attn1.to_v.weight": ("attn1", "to_v", "kernel"),
    "attn1.to_out.0.weight": ("attn1", "to_out", "kernel"),
    "attn1.to_out.0.bias": ("attn1", "to_out", "bias"),
    "norm2.weight": ("norm2", "scale", None),
    "norm2.bias": ("norm2", "bias", None),
    "attn2.to_q.weight": ("attn2", "to_q", "kernel"),
    "attn2.to_k.weight": ("attn2", "to_k", "kernel"),
    "attn2.to_v.weight": ("attn2", "to_v", "kernel"),
    "attn2.to_out.0.weight": ("attn2", "to_out", "kernel"),
    "attn2.to_out.0.bias": ("attn2", "to_out", "bias"),
    "norm3.weight": ("norm3", "scale", None),
    "norm3.bias": ("norm3", "bias", None),
    "ff.net.0.proj.weight": ("ff", "proj_in", "kernel"),
    "ff.net.0.proj.bias": ("ff", "proj_in", "bias"),
    "ff.net.2.weight": ("ff", "proj_out", "kernel"),
    "ff.net.2.bias": ("ff", "proj_out", "bias"),
}


def _convert_leaf(torch_key: str, value, kind: str):
    if kind == "kernel":
        return _conv(value) if value.ndim == 4 else _linear(value)
    if kind == "scale":
        return value
    return value


def _map_resnet(rest: str):
    table = {
        "norm1.weight": ("norm1", "scale"),
        "norm1.bias": ("norm1", "bias"),
        "conv1.weight": ("conv1", "kernel"),
        "conv1.bias": ("conv1", "bias"),
        "time_emb_proj.weight": ("time_emb_proj", "kernel"),
        "time_emb_proj.bias": ("time_emb_proj", "bias"),
        "norm2.weight": ("norm2", "scale"),
        "norm2.bias": ("norm2", "bias"),
        "conv2.weight": ("conv2", "kernel"),
        "conv2.bias": ("conv2", "bias"),
        "conv_shortcut.weight": ("conv_shortcut", "kernel"),
        "conv_shortcut.bias": ("conv_shortcut", "bias"),
    }
    return table.get(rest)


def _map_transformer(rest: str):
    table = {
        "norm.weight": ("norm", "scale"),
        "norm.bias": ("norm", "bias"),
        "proj_in.weight": ("proj_in", "kernel"),
        "proj_in.bias": ("proj_in", "bias"),
        "proj_out.weight": ("proj_out", "kernel"),
        "proj_out.bias": ("proj_out", "bias"),
    }
    if rest in table:
        return table[rest]
    m = re.match(r"transformer_blocks\.0\.(.+)$", rest)
    if m and m.group(1) in _ATTN_INNER:
        mod, sub, leaf = _ATTN_INNER[m.group(1)]
        if leaf is None:  # layer norm
            return ("block_0", mod, "scale" if rest.endswith("weight") else "bias")
        return ("block_0", mod, sub, leaf)
    return None


def convert_unet_state_dict(
    sd: dict, num_levels: int = 4, copy_last_n: int = 1
) -> dict:
    """diffusers dual-branch UNet state_dict -> flax params {'params': ...}.

    `num_levels`/`copy_last_n` resolve the branch up-block naming: torch
    `up_blocks_branch.0.j` is a copy of `up_blocks[num_levels-copy_last_n+j]`
    (unet_rgbdepth.py:591-596) and our flax module carries the latter's
    level index in its name.
    """
    params: dict = {}
    unmatched = []

    def put(path, torch_key, value):
        leaf_kind = path[-1]
        _assign(params, list(path), _convert_leaf(torch_key, value, leaf_kind))

    for key, value in sd.items():
        k = key
        # stems & heads
        simple = {
            "conv_in.weight": ("conv_in", "kernel"),
            "conv_in.bias": ("conv_in", "bias"),
            "fusion_conv.weight": ("fusion_conv", "kernel"),
            "fusion_conv.bias": ("fusion_conv", "bias"),
            "conv_norm_out.weight": ("head", "conv_norm_out", "scale"),
            "conv_norm_out.bias": ("head", "conv_norm_out", "bias"),
            "conv_out.weight": ("head", "conv_out", "kernel"),
            "conv_out.bias": ("head", "conv_out", "bias"),
            "time_embedding.linear_1.weight": ("time_embedding", "linear_1", "kernel"),
            "time_embedding.linear_1.bias": ("time_embedding", "linear_1", "bias"),
            "time_embedding.linear_2.weight": ("time_embedding", "linear_2", "kernel"),
            "time_embedding.linear_2.bias": ("time_embedding", "linear_2", "bias"),
            "add_embedding.linear_1.weight": ("add_embedding", "linear_1", "kernel"),
            "add_embedding.linear_1.bias": ("add_embedding", "linear_1", "bias"),
            "add_embedding.linear_2.weight": ("add_embedding", "linear_2", "kernel"),
            "add_embedding.linear_2.bias": ("add_embedding", "linear_2", "bias"),
        }
        if k in simple:
            put(simple[k], k, value)
            continue

        # branch stems/heads: torch `*_branch.{i}` ModuleLists -> flax
        # branch-0 keeps the historical un-indexed names, i >= 1 appends
        # the index (conv_in_branch1, head_branch1, ...)
        m = re.match(
            r"(conv_in|conv_norm_out|conv_out)_branch\.(\d+)\.(weight|bias)$",
            k,
        )
        if m:
            mod, bi, leaf = m.groups()
            bs = "" if bi == "0" else bi
            if mod == "conv_in":
                path = (f"conv_in_branch{bs}",
                        "kernel" if leaf == "weight" else "bias")
            elif mod == "conv_norm_out":
                path = (f"head_branch{bs}", "conv_norm_out",
                        "scale" if leaf == "weight" else "bias")
            else:
                path = (f"head_branch{bs}", "conv_out",
                        "kernel" if leaf == "weight" else "bias")
            put(path, k, value)
            continue

        m = re.match(
            r"(down_blocks|up_blocks)(?:_branch\.(\d+))?\.(\d+)\.(resnets|attentions|downsamplers|upsamplers)\.(\d+)\.(.+)$",
            k,
        )
        if m:
            family, bi, idx, sub, j, rest = m.groups()
            bs = None if bi is None else ("" if bi == "0" else bi)
            if family == "down_blocks":
                blk = (f"down_block_{idx}" if bs is None
                       else f"down_block_branch{bs}_{idx}")
            elif bs is not None:
                # torch branch index j -> level num_levels-copy_last_n+j
                level = num_levels - copy_last_n + int(idx)
                blk = f"up_block_branch{bs}_{level}"
            else:
                blk = f"up_block_{idx}"
            if sub == "resnets":
                mapped = _map_resnet(rest)
                if mapped:
                    put((blk, f"resnet_{j}") + mapped, k, value)
                    continue
            elif sub == "attentions":
                mapped = _map_transformer(rest)
                if mapped:
                    put((blk, f"attn_{j}") + mapped, k, value)
                    continue
            elif sub == "downsamplers" and rest.startswith("conv."):
                put((blk, "downsample", rest.split(".")[1].replace("weight", "kernel")), k, value)
                continue
            elif sub == "upsamplers" and rest.startswith("conv."):
                put((blk, "upsample", rest.split(".")[1].replace("weight", "kernel")), k, value)
                continue

        m = re.match(r"mid_block\.(resnets|attentions)\.(\d+)\.(.+)$", k)
        if m:
            sub, j, rest = m.groups()
            if sub == "resnets":
                mapped = _map_resnet(rest)
                if mapped:
                    put(("mid_block", f"resnet_{j}") + mapped, k, value)
                    continue
            else:
                mapped = _map_transformer(rest)
                if mapped:
                    put(("mid_block", f"attn_{j}") + mapped, k, value)
                    continue
        unmatched.append(k)

    return {"params": params}, unmatched


def convert_controlnet_state_dict(sd: dict) -> dict:
    """diffusers ControlNetModel state_dict -> flax params for
    guidance.controlnet.ControlNet. Shares the down/mid mapping with the
    UNet converter; adds the conditioning embed and zero-conv taps."""
    params: dict = {}
    unmatched = []

    def put(path, torch_key, value):
        _assign(params, list(path), _convert_leaf(torch_key, value, path[-1]))

    import re as _re

    for key, value in sd.items():
        k = key
        simple = {
            "conv_in.weight": ("conv_in", "kernel"),
            "conv_in.bias": ("conv_in", "bias"),
            "time_embedding.linear_1.weight": ("time_embedding", "linear_1", "kernel"),
            "time_embedding.linear_1.bias": ("time_embedding", "linear_1", "bias"),
            "time_embedding.linear_2.weight": ("time_embedding", "linear_2", "kernel"),
            "time_embedding.linear_2.bias": ("time_embedding", "linear_2", "bias"),
            "controlnet_cond_embedding.conv_in.weight": ("cond_conv_in", "kernel"),
            "controlnet_cond_embedding.conv_in.bias": ("cond_conv_in", "bias"),
            "controlnet_cond_embedding.conv_out.weight": ("cond_conv_out", "kernel"),
            "controlnet_cond_embedding.conv_out.bias": ("cond_conv_out", "bias"),
            "controlnet_mid_block.weight": ("controlnet_mid_block", "kernel"),
            "controlnet_mid_block.bias": ("controlnet_mid_block", "bias"),
        }
        if k in simple:
            put(simple[k], k, value)
            continue
        m = _re.match(r"controlnet_cond_embedding\.blocks\.(\d+)\.(weight|bias)$", k)
        if m:
            j, leaf = int(m.group(1)), m.group(2)
            # diffusers alternates non-strided/strided convs in `blocks`
            name = f"cond_block_{j // 2}{'a' if j % 2 == 0 else 'b'}"
            put((name, "kernel" if leaf == "weight" else "bias"), k, value)
            continue
        m = _re.match(r"controlnet_down_blocks\.(\d+)\.(weight|bias)$", k)
        if m:
            put(
                (f"controlnet_down_block_{m.group(1)}",
                 "kernel" if m.group(2) == "weight" else "bias"),
                k, value,
            )
            continue
        m = _re.match(
            r"down_blocks\.(\d+)\.(resnets|attentions|downsamplers)\.(\d+)\.(.+)$", k
        )
        if m:
            idx, sub, j, rest = m.groups()
            blk = f"down_block_{idx}"
            if sub == "resnets":
                mapped = _map_resnet(rest)
                if mapped:
                    put((blk, f"resnet_{j}") + mapped, k, value)
                    continue
            elif sub == "attentions":
                mapped = _map_transformer(rest)
                if mapped:
                    put((blk, f"attn_{j}") + mapped, k, value)
                    continue
            elif rest.startswith("conv."):
                put((blk, "downsample",
                     rest.split(".")[1].replace("weight", "kernel")), k, value)
                continue
        m = _re.match(r"mid_block\.(resnets|attentions)\.(\d+)\.(.+)$", k)
        if m:
            sub, j, rest = m.groups()
            mapped = _map_resnet(rest) if sub == "resnets" else _map_transformer(rest)
            if mapped:
                name = f"resnet_{j}" if sub == "resnets" else f"attn_{j}"
                put(("mid_block", name) + mapped, k, value)
                continue
        unmatched.append(k)
    return {"params": params}, unmatched


_VAE_ATTN = {
    "group_norm.weight": ("group_norm", "scale"),
    "group_norm.bias": ("group_norm", "bias"),
    "to_q.weight": ("to_q", "kernel"),
    "to_q.bias": ("to_q", "bias"),
    "to_k.weight": ("to_k", "kernel"),
    "to_k.bias": ("to_k", "bias"),
    "to_v.weight": ("to_v", "kernel"),
    "to_v.bias": ("to_v", "bias"),
    "to_out.0.weight": ("to_out", "kernel"),
    "to_out.0.bias": ("to_out", "bias"),
    # pre-0.18 diffusers naming
    "query.weight": ("to_q", "kernel"),
    "query.bias": ("to_q", "bias"),
    "key.weight": ("to_k", "kernel"),
    "key.bias": ("to_k", "bias"),
    "value.weight": ("to_v", "kernel"),
    "value.bias": ("to_v", "bias"),
    "proj_attn.weight": ("to_out", "kernel"),
    "proj_attn.bias": ("to_out", "bias"),
}


def convert_vae_state_dict(sd: dict) -> dict:
    """diffusers AutoencoderKL state_dict -> flax params."""
    params: dict = {}
    unmatched = []

    def put(path, torch_key, value):
        _assign(params, list(path), _convert_leaf(torch_key, value, path[-1]))

    for key, value in sd.items():
        k = key
        simple = {
            "quant_conv.weight": ("quant_conv", "kernel"),
            "quant_conv.bias": ("quant_conv", "bias"),
            "post_quant_conv.weight": ("post_quant_conv", "kernel"),
            "post_quant_conv.bias": ("post_quant_conv", "bias"),
        }
        for side in ("encoder", "decoder"):
            simple.update(
                {
                    f"{side}.conv_in.weight": (side, "conv_in", "kernel"),
                    f"{side}.conv_in.bias": (side, "conv_in", "bias"),
                    f"{side}.conv_norm_out.weight": (side, "conv_norm_out", "scale"),
                    f"{side}.conv_norm_out.bias": (side, "conv_norm_out", "bias"),
                    f"{side}.conv_out.weight": (side, "conv_out", "kernel"),
                    f"{side}.conv_out.bias": (side, "conv_out", "bias"),
                }
            )
        if k in simple:
            put(simple[k], k, value)
            continue

        m = re.match(
            r"(encoder)\.down_blocks\.(\d+)\.(resnets\.(\d+)\.(.+)|downsamplers\.0\.conv\.(.+))$",
            k,
        ) or re.match(
            r"(decoder)\.up_blocks\.(\d+)\.(resnets\.(\d+)\.(.+)|upsamplers\.0\.conv\.(.+))$",
            k,
        )
        if m:
            side, idx, _full, j, rest, convleaf = m.groups()
            tag = "down" if side == "encoder" else "up"
            if j is not None:
                mapped = _vae_resnet(rest)
                if mapped:
                    put((side, f"{tag}_{idx}_resnet_{j}") + mapped, k, value)
                    continue
            else:
                put(
                    (side, f"{tag}_{idx}_{'downsample' if tag == 'down' else 'upsample'}",
                     convleaf.replace("weight", "kernel")),
                    k, value,
                )
                continue

        m = re.match(r"(encoder|decoder)\.mid_block\.(resnets\.(\d+)\.(.+)|attentions\.0\.(.+))$", k)
        if m:
            side, _full, j, rest, attn_rest = m.groups()
            if j is not None:
                mapped = _vae_resnet(rest)
                if mapped:
                    put((side, f"mid_resnet_{j}") + mapped, k, value)
                    continue
            elif attn_rest in _VAE_ATTN:
                val = value
                if val.ndim == 4:  # old conv-style proj weights [O,I,1,1]
                    val = val[:, :, 0, 0]
                put((side, "mid_attn") + _VAE_ATTN[attn_rest], k, val)
                continue
        unmatched.append(k)

    return {"params": params}, unmatched


def _vae_resnet(rest: str):
    table = {
        "norm1.weight": ("norm1", "scale"),
        "norm1.bias": ("norm1", "bias"),
        "conv1.weight": ("conv1", "kernel"),
        "conv1.bias": ("conv1", "bias"),
        "norm2.weight": ("norm2", "scale"),
        "norm2.bias": ("norm2", "bias"),
        "conv2.weight": ("conv2", "kernel"),
        "conv2.bias": ("conv2", "bias"),
        "conv_shortcut.weight": ("conv_shortcut", "kernel"),
        "conv_shortcut.bias": ("conv_shortcut", "bias"),
    }
    return table.get(rest)
