"""Generic flax-params -> diffusers-layout torch state_dict exporters.

Inverse of guidance/convert.py's mapping, generic over UNet/VAE configs
(the tiny hand-written exporters in test_guidance.py predate this and
cover only the tiny configs). Used by the FULL-SCALE conversion dry run
(test_convert_fullscale.py): export a randomly initialized SD2
dual-branch `unet_ema` / sd-vae-ft-mse state dict, run it through the
production converter, and require exact round-trip coverage.

The torch-side names here are derived from convert.py's own tables, so
this proves the production converter's coverage, shapes, and transposes
at full scale — the torch naming itself is pinned against the reference
(unet_rgbdepth.py:211-294,591-624 + diffusers) by convert.py's cited
patterns, and first contact with a real checkpoint exercises exactly the
same code path.
"""
from __future__ import annotations

import re

import numpy as np


def _inv_kernel(v):
    v = np.asarray(v)
    if v.ndim == 4:  # HWIO -> OIHW
        return np.ascontiguousarray(np.transpose(v, (3, 2, 0, 1)))
    if v.ndim == 2:  # [I,O] -> [O,I]
        return np.ascontiguousarray(np.transpose(v))
    return np.asarray(v)


def _leaves(mod: dict, prefix: str, out: dict):
    """Emit {prefix}.weight/bias from a flax {kernel|scale, bias} dict."""
    for leaf, v in mod.items():
        if leaf == "kernel":
            out[f"{prefix}.weight"] = _inv_kernel(v)
        elif leaf == "scale":
            out[f"{prefix}.weight"] = np.asarray(v)
        else:
            out[f"{prefix}.{leaf}"] = np.asarray(v)


_ATTN_INV = {
    # flax (mod, sub) or (mod,) -> torch suffix inside attentions.{j}
    "norm": "norm",
    "proj_in": "proj_in",
    "proj_out": "proj_out",
}
_BLOCK_INV = {
    "norm1": "norm1",
    "norm2": "norm2",
    "norm3": "norm3",
    "attn1": "attn1",
    "attn2": "attn2",
}


def _export_transformer(attn: dict, tname: str, out: dict):
    for mod, sub in attn.items():
        if mod in _ATTN_INV:
            _leaves(sub, f"{tname}.{_ATTN_INV[mod]}", out)
        elif mod == "block_0":
            tb = f"{tname}.transformer_blocks.0"
            for m2, s2 in sub.items():
                if m2 in ("norm1", "norm2", "norm3"):
                    _leaves(s2, f"{tb}.{m2}", out)
                elif m2 in ("attn1", "attn2"):
                    for proj, pv in s2.items():
                        if proj == "to_out":
                            _leaves(pv, f"{tb}.{m2}.to_out.0", out)
                        else:
                            _leaves(pv, f"{tb}.{m2}.{proj}", out)
                elif m2 == "ff":
                    _leaves(s2["proj_in"], f"{tb}.ff.net.0.proj", out)
                    _leaves(s2["proj_out"], f"{tb}.ff.net.2", out)
                else:
                    raise KeyError(f"unknown transformer sub {m2}")
        else:
            raise KeyError(f"unknown attention sub {mod}")


def _export_block(blk: dict, tname: str, out: dict):
    for mod, sub in blk.items():
        m = re.match(r"resnet_(\d+)$", mod)
        if m:
            for m2, s2 in sub.items():
                _leaves(s2, f"{tname}.resnets.{m.group(1)}.{m2}", out)
            continue
        m = re.match(r"attn_(\d+)$", mod)
        if m:
            _export_transformer(sub, f"{tname}.attentions.{m.group(1)}", out)
            continue
        if mod == "downsample":
            _leaves(sub, f"{tname}.downsamplers.0.conv", out)
        elif mod == "upsample":
            _leaves(sub, f"{tname}.upsamplers.0.conv", out)
        else:
            raise KeyError(f"unknown block sub {mod}")


def export_unet_state_dict(params, num_levels: int = 4,
                           copy_last_n: int = 1) -> dict:
    """Flax DualBranchUNet params -> diffusers dual-branch `unet_ema`
    state dict (inverse of convert.convert_unet_state_dict)."""
    p = params["params"]
    out: dict = {}
    for top, sub in p.items():
        if top in ("conv_in", "fusion_conv"):
            _leaves(sub, top, out)
        elif top in ("time_embedding", "add_embedding"):
            for m2, s2 in sub.items():
                _leaves(s2, f"{top}.{m2}", out)
        elif top == "head":
            _leaves(sub["conv_norm_out"], "conv_norm_out", out)
            _leaves(sub["conv_out"], "conv_out", out)
        elif re.match(r"conv_in_branch(\d*)$", top):
            bi = re.match(r"conv_in_branch(\d*)$", top).group(1) or "0"
            _leaves(sub, f"conv_in_branch.{bi}", out)
        elif re.match(r"head_branch(\d*)$", top):
            bi = re.match(r"head_branch(\d*)$", top).group(1) or "0"
            _leaves(sub["conv_norm_out"], f"conv_norm_out_branch.{bi}", out)
            _leaves(sub["conv_out"], f"conv_out_branch.{bi}", out)
        elif re.match(r"down_block_(\d+)$", top):
            i = re.match(r"down_block_(\d+)$", top).group(1)
            _export_block(sub, f"down_blocks.{i}", out)
        elif re.match(r"down_block_branch(\d*)_(\d+)$", top):
            bi, i = re.match(r"down_block_branch(\d*)_(\d+)$", top).groups()
            _export_block(sub, f"down_blocks_branch.{bi or '0'}.{i}", out)
        elif re.match(r"up_block_(\d+)$", top):
            i = re.match(r"up_block_(\d+)$", top).group(1)
            _export_block(sub, f"up_blocks.{i}", out)
        elif re.match(r"up_block_branch(\d*)_(\d+)$", top):
            bi, lvl = re.match(r"up_block_branch(\d*)_(\d+)$", top).groups()
            j = int(lvl) - (num_levels - copy_last_n)
            _export_block(sub, f"up_blocks_branch.{bi or '0'}.{j}", out)
        elif top == "mid_block":
            _export_block(sub, "mid_block", out)
        else:
            raise KeyError(f"unknown top module {top}")
    return out


def export_vae_state_dict(params) -> dict:
    """Flax AutoencoderKL params -> diffusers AutoencoderKL state dict
    (inverse of convert.convert_vae_state_dict, post-0.18 naming)."""
    p = params["params"]
    out: dict = {}
    for top, sub in p.items():
        if top in ("quant_conv", "post_quant_conv"):
            _leaves(sub, top, out)
            continue
        if top not in ("encoder", "decoder"):
            raise KeyError(f"unknown top module {top}")
        tag = "down" if top == "encoder" else "up"
        for mod, s2 in sub.items():
            if mod in ("conv_in", "conv_out"):
                _leaves(s2, f"{top}.{mod}", out)
            elif mod == "conv_norm_out":
                _leaves(s2, f"{top}.conv_norm_out", out)
            elif re.match(rf"{tag}_(\d+)_resnet_(\d+)$", mod):
                i, j = re.match(rf"{tag}_(\d+)_resnet_(\d+)$", mod).groups()
                side_blocks = ("down_blocks" if top == "encoder"
                               else "up_blocks")
                for m3, s3 in s2.items():
                    _leaves(s3, f"{top}.{side_blocks}.{i}.resnets.{j}.{m3}",
                            out)
            elif re.match(rf"{tag}_(\d+)_(down|up)sample$", mod):
                i = re.match(rf"{tag}_(\d+)_", mod).group(1)
                kind = "downsamplers" if tag == "down" else "upsamplers"
                side_blocks = ("down_blocks" if top == "encoder"
                               else "up_blocks")
                _leaves(s2, f"{top}.{side_blocks}.{i}.{kind}.0.conv", out)
            elif re.match(r"mid_resnet_(\d+)$", mod):
                j = re.match(r"mid_resnet_(\d+)$", mod).group(1)
                for m3, s3 in s2.items():
                    _leaves(s3, f"{top}.mid_block.resnets.{j}.{m3}", out)
            elif mod == "mid_attn":
                for m3, s3 in s2.items():
                    if m3 == "to_out":
                        _leaves(s3, f"{top}.mid_block.attentions.0.to_out.0",
                                out)
                    else:
                        _leaves(s3, f"{top}.mid_block.attentions.0.{m3}", out)
            else:
                raise KeyError(f"unknown {top} sub {mod}")
    return out
