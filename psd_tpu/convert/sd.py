"""diffusers SD-v1.x state_dict → psd_tpu param trees (UNet + VAE).

Ports the pretrained checkpoints the reference depends on (SURVEY.md §2.3:
CompVis/stable-diffusion-v1-4 `unet` and `vae` subfolders) into our flax
modules. Accepts a flat {torch_key: np.ndarray} dict (load the .bin/.safetensors
yourself — see load_torch_state_dict) and returns {"params": {...}}.

Layout rules:
  torch Linear (out,in)        → flax kernel (in,out)       = W.T
  torch Conv2d (out,in,kh,kw)  → flax NHWC kernel (kh,kw,in,out)
  torch *Norm weight/bias      → flax scale/bias

Split-injection extras: `to_k_dis`/`to_v_dis` are warm-started from the
pretrained text-cross-attention K/V, exactly like the reference
(attention_processor_routing_gates.py:308-314).
"""

from __future__ import annotations

import re
from pathlib import Path
from typing import Dict

import numpy as np


def _lin(w):
    return np.asarray(w, np.float32).T


def _conv(w):
    return np.asarray(w, np.float32).transpose(2, 3, 1, 0)


def _set(tree: Dict, path, value):
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = value


def load_torch_state_dict(path: str | Path) -> Dict[str, np.ndarray]:
    """Load a .safetensors or torch .bin/.pt file into numpy arrays."""
    path = Path(path)
    if path.suffix == ".safetensors":
        from safetensors.numpy import load_file

        return dict(load_file(str(path)))
    import torch

    sd = torch.load(str(path), map_location="cpu", weights_only=True)
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    return {k: v.numpy() for k, v in sd.items()}


_NORM_NAMES = {
    "norm", "norm1", "norm2", "norm3", "conv_norm_out", "group_norm",
    "norm_out", "pre_layrnorm", "post_layernorm",
}


def _leaf_kind(modname: str, torch_w: np.ndarray) -> str:
    if torch_w.ndim == 4:
        return "conv"
    if torch_w.ndim == 2:
        return "linear"
    return "vector"


def _convert_generic(sd: Dict[str, np.ndarray], name_map) -> Dict:
    """Walk torch keys; name_map(torch_key) → flax path tuple or None."""
    params: Dict = {}
    for key, val in sd.items():
        if not (key.endswith(".weight") or key.endswith(".bias")):
            continue
        is_bias = key.endswith(".bias")
        base = key[: -len(".bias")] if is_bias else key[: -len(".weight")]
        path = name_map(base)
        if path is None:
            continue
        if is_bias:
            _set(params, path + ("bias",), np.asarray(val, np.float32))
        else:
            modname = path[-1]
            if val.ndim == 4:
                _set(params, path + ("kernel",), _conv(val))
            elif val.ndim == 2:
                _set(params, path + ("kernel",), _lin(val))
            else:  # norm scale
                _set(params, path + ("scale",), np.asarray(val, np.float32))
    # norms: torch stores .weight as 1-D → we wrote it under "scale" but bias
    # path also fine. Fix: 1-D weights already mapped to scale above; their
    # biases landed under "bias" in the same module. Nothing else to do.
    return params


_BLOCK_RE = re.compile(
    r"^(down_blocks|up_blocks)\.(\d+)\.(resnets|attentions|downsamplers|upsamplers)\.(\d+)\.(.*)$"
)
_MID_RE = re.compile(r"^mid_block\.(resnets|attentions)\.(\d+)\.(.*)$")


def _map_inner(rest: str):
    """Map the within-block remainder of a diffusers key to flax path parts."""
    rest = rest.replace("to_out.0", "to_out_0")
    rest = rest.replace("ff.net.0.proj", "ff.net_0_proj")
    rest = rest.replace("ff.net.2", "ff.net_2")
    m = re.match(r"^transformer_blocks\.(\d+)\.(.*)$", rest)
    if m:
        return (f"transformer_blocks_{m.group(1)}",) + tuple(m.group(2).split("."))
    return tuple(rest.split("."))


def unet_name_map(base: str):
    """diffusers UNet2DConditionModel key → our UNet2DCondition path."""
    if base.startswith("conv_in"):
        return ("conv_in",)
    if base.startswith("conv_out"):
        return ("conv_out",)
    if base.startswith("conv_norm_out"):
        return ("conv_norm_out",)
    m = re.match(r"^time_embedding\.(linear_[12])$", base)
    if m:
        return ("time_embedding", m.group(1))
    m = _BLOCK_RE.match(base)
    if m:
        where, i, kind, j, rest = m.groups()
        block = f"{where}_{i}_{kind}_{j}"
        if kind in ("downsamplers", "upsamplers"):
            return (block.replace(f"_{kind}_", f"_{kind}_"), "conv") if rest == "conv" else None
        return (block,) + _map_inner(rest)
    m = _MID_RE.match(base)
    if m:
        kind, j, rest = m.groups()
        return (f"mid_block_{kind}_{j}",) + _map_inner(rest)
    return None


def convert_sd_unet(
    sd: Dict[str, np.ndarray], warm_start_kv_dis: bool = True
) -> Dict:
    """Returns {"params": tree}; optionally adds to_k_dis/to_v_dis copies."""
    params = _convert_generic(sd, unet_name_map)
    if warm_start_kv_dis:
        for key in list(sd.keys()):
            m = re.match(
                r"^(.*transformer_blocks\.\d+\.attn2)\.to_([kv])\.weight$", key
            )
            if not m:
                continue
            base, kv = m.groups()
            path = unet_name_map(base + f".to_{kv}")
            if path is None:
                continue
            dis_path = path[:-1] + (f"to_{kv}_dis",)
            _set(params, dis_path + ("kernel",), _lin(sd[key]))
    return {"params": params}


def vae_name_map_factory(side: str):
    """side ∈ {encoder, decoder} inner key → path under that submodule."""

    def _map(base: str):
        if not base.startswith(side + "."):
            return None
        rest = base[len(side) + 1 :]
        if rest.startswith("conv_in"):
            return (side, "conv_in")
        if rest.startswith("conv_norm_out"):
            return (side, "conv_norm_out")
        if rest.startswith("conv_out"):
            return (side, "conv_out")
        m = _BLOCK_RE.match(rest)
        if m:
            where, i, kind, j, inner = m.groups()
            block = f"{where}_{i}_{kind}_{j}"
            if kind == "downsamplers":
                # VAE encoder downsampling is a bare nn.Conv (asymmetric pad)
                return (side, block) if inner == "conv" else None
            if kind == "upsamplers":
                return (side, block, "conv") if inner == "conv" else None
            return (side, block) + tuple(inner.split("."))
        m = _MID_RE.match(rest)
        if m:
            kind, j, inner = m.groups()
            if kind == "attentions":
                inner = inner.replace("to_out.0", "to_out_0")
                # legacy diffusers VAE attention names
                legacy = {"q": "to_q", "k": "to_k", "v": "to_v",
                          "proj_attn": "to_out_0", "norm": "group_norm"}
                parts = inner.split(".")
                parts[0] = legacy.get(parts[0], parts[0])
                return (side, "mid_block", f"attentions_{j}") + tuple(parts)
            return (side, "mid_block", f"resnets_{j}") + tuple(inner.split("."))
        return None

    return _map


def convert_sd_vae(sd: Dict[str, np.ndarray]) -> Dict:
    params: Dict = {}
    for side in ("encoder", "decoder"):
        sub = _convert_generic(sd, vae_name_map_factory(side))
        params.update(sub)
    for extra in ("quant_conv", "post_quant_conv"):
        w, b = sd.get(extra + ".weight"), sd.get(extra + ".bias")
        if w is not None:
            _set(params, (extra, "kernel"), _conv(w))
            _set(params, (extra, "bias"), np.asarray(b, np.float32))
    # VAE attention linear weights may ship as (C,C,1,1) convs in old
    # checkpoints → squeeze to linear kernels
    def _fix(node):
        for k, v in list(node.items()):
            if isinstance(v, dict):
                _fix(v)
            elif k == "kernel" and v.ndim == 4 and v.shape[0] == v.shape[1] == 1:
                node[k] = v[0, 0]
    for side in ("encoder", "decoder"):
        att = params.get(side, {}).get("mid_block", {}).get("attentions_0")
        if att:
            _fix(att)
    return {"params": params}


def verify_params_match(converted: Dict, init_shapes: Dict, path: str = ""):
    """Raise on any missing/extra/mismatched leaf vs a model's init tree."""
    conv_flat = {}
    init_flat = {}

    def _flat(tree, out, prefix=""):
        for k, v in tree.items():
            key = f"{prefix}/{k}" if prefix else str(k)
            if isinstance(v, dict):
                _flat(v, out, key)
            else:
                out[key] = tuple(v.shape)

    _flat(converted, conv_flat)
    _flat(init_shapes, init_flat)
    missing = sorted(set(init_flat) - set(conv_flat))
    extra = sorted(set(conv_flat) - set(init_flat))
    bad = sorted(
        k for k in set(conv_flat) & set(init_flat)
        if conv_flat[k] != init_flat[k]
    )
    if missing or extra or bad:
        msg = []
        if missing:
            msg.append(f"missing ({len(missing)}): {missing[:8]}")
        if extra:
            msg.append(f"extra ({len(extra)}): {extra[:8]}")
        if bad:
            msg.append(
                f"shape mismatch ({len(bad)}): "
                + str([(k, conv_flat[k], init_flat[k]) for k in bad[:4]])
            )
        raise ValueError(f"weight conversion mismatch {path}: " + "; ".join(msg))
