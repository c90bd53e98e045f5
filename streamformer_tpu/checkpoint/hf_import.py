"""Import reference / HF StreamFormer checkpoints into the JAX param tree.

The torch state-dict naming is documented by the reference's own weight
surgery (tools/initialize_SigLIP_weights.py:63-224) and model definitions
(models/modeling_timesformer_siglip.py). Mapping highlights:

* torch ``nn.Linear.weight`` is (out, in) — transposed to our (in, out)
  ``kernel``.
* fused qkv rows are ordered [q(D), k(D), v(D)]
  (initialize_SigLIP_weights.py:67-112).
* the MAP head's ``nn.MultiheadAttention`` packs q/k/v in ``in_proj_weight``
  thirds (modeling_timesformer_siglip.py:1135-1148, :1767-1777).
* conv patch-proj torch OIHW -> our HWIO.
"""

from __future__ import annotations

import json
import os
import re
from typing import Any, Dict, Mapping

import numpy as np
import jax.numpy as jnp

from streamformer_tpu.config import StreamformerConfig


def _t(w) -> np.ndarray:
    return np.asarray(w).T


def _ln(sd, prefix):
    return {
        "scale": np.asarray(sd[prefix + ".weight"]),
        "bias": np.asarray(sd[prefix + ".bias"]),
    }


def _dense(sd, prefix, lora_prefix=None):
    p = {"kernel": _t(sd[prefix + ".weight"])}
    if prefix + ".bias" in sd:
        p["bias"] = np.asarray(sd[prefix + ".bias"])
    if lora_prefix is not None and lora_prefix + "_lora_a.weight" in sd:
        p["lora_a"] = _t(sd[lora_prefix + "_lora_a.weight"])
        p["lora_b"] = _t(sd[lora_prefix + "_lora_b.weight"])
    return p


def convert_backbone_state_dict(
    sd: Mapping[str, Any], cfg: StreamformerConfig, prefix: str = ""
) -> Dict[str, Any]:
    """Convert a TimesformerMultiTaskingModelSigLIP state dict to our pytree.

    ``prefix`` strips a leading module path (e.g. ``"timesformer."`` when the
    dict comes from StreamformerForMultiTaskingSigLIP, or
    ``"vision_tower."`` variants from the VideoQA tower).
    """
    if prefix:
        sd = {k[len(prefix):]: v for k, v in sd.items() if k.startswith(prefix)}

    emb = {
        "patch_proj": {
            # OIHW -> HWIO
            "kernel": np.transpose(
                np.asarray(sd["embeddings.patch_embeddings.projection.weight"]),
                (2, 3, 1, 0),
            ),
            "bias": np.asarray(sd["embeddings.patch_embeddings.projection.bias"]),
        },
        "position_embeddings": np.asarray(sd["embeddings.position_embeddings"])[0],
    }
    if "embeddings.time_embeddings" in sd:
        emb["time_embeddings"] = np.asarray(sd["embeddings.time_embeddings"])[0]

    layers = []
    for i in range(cfg.num_hidden_layers):
        lp = f"encoder.layer.{i}."
        layer = {
            "layernorm_before": _ln(sd, lp + "layernorm_before"),
            "layernorm_after": _ln(sd, lp + "layernorm_after"),
            "attention": {
                "qkv": _dense(
                    sd, lp + "attention.attention.qkv",
                    lora_prefix=lp + "attention.attention.qkv",
                ),
                "out": _dense(
                    sd, lp + "attention.output.dense",
                    lora_prefix=lp + "attention.output.dense",
                ),
            },
            "mlp": {
                "fc1": _dense(sd, lp + "intermediate.dense"),
                "fc2": _dense(sd, lp + "output.dense"),
            },
        }
        if lp + "temporal_layernorm.weight" in sd:
            layer.update(
                {
                    "temporal_layernorm": _ln(sd, lp + "temporal_layernorm"),
                    "temporal_attention": {
                        "qkv": _dense(sd, lp + "temporal_attention.attention.qkv"),
                        "out": _dense(sd, lp + "temporal_attention.output.dense"),
                    },
                    "temporal_dense": _dense(sd, lp + "temporal_dense"),
                    "temporal_attention_gating": np.asarray(
                        sd[lp + "temporal_attention_gating"]
                    ).reshape(()),
                }
            )
        layers.append(layer)

    d = cfg.hidden_size
    in_w = np.asarray(sd["head.attention.in_proj_weight"])  # (3D, D)
    in_b = np.asarray(sd["head.attention.in_proj_bias"])  # (3D,)
    map_head = {
        "probe": np.asarray(sd["head.probe"]).reshape(d),
        "q": {"kernel": _t(in_w[:d]), "bias": in_b[:d]},
        "k": {"kernel": _t(in_w[d : 2 * d]), "bias": in_b[d : 2 * d]},
        "v": {"kernel": _t(in_w[2 * d :]), "bias": in_b[2 * d :]},
        "out": _dense(sd, "head.attention.out_proj"),
        "layernorm": _ln(sd, "head.layernorm"),
        "mlp": {
            "fc1": _dense(sd, "head.mlp.fc1"),
            "fc2": _dense(sd, "head.mlp.fc2"),
        },
    }

    params = {
        "embeddings": emb,
        "layers": layers,
        "post_layernorm": _ln(sd, "post_layernorm"),
        "map_head": map_head,
    }
    return _to_jnp(params)


def _to_jnp(tree):
    if isinstance(tree, dict):
        return {k: _to_jnp(v) for k, v in tree.items()}
    if isinstance(tree, list):
        return [_to_jnp(v) for v in tree]
    return jnp.asarray(np.asarray(tree), dtype=jnp.float32)


def load_torch_checkpoint_file(path: str) -> Dict[str, np.ndarray]:
    """Load a .safetensors / .bin / .pth file into numpy arrays (no torch
    tensors leak out)."""
    if path.endswith(".safetensors"):
        from safetensors.numpy import load_file

        return dict(load_file(path))
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=True)
    if isinstance(obj, dict) and "model" in obj and isinstance(obj["model"], dict):
        obj = obj["model"]  # reference trainer checkpoints (utils.py:622-636)
    return {k: v.float().numpy() for k, v in obj.items() if hasattr(v, "numpy")}


def from_pretrained(path: str, cfg: StreamformerConfig | None = None):
    """Load (cfg, params) from an HF-style checkpoint directory.

    Mirrors the published API
    ``TimesformerMultiTaskingModelSigLIP.from_pretrained`` (README.md:55-71):
    reads config.json + model weights, auto-detecting the ``timesformer.``
    prefix used by the multitask wrapper.
    """
    if cfg is None:
        cfg = StreamformerConfig.from_pretrained(path)
    sd: Dict[str, np.ndarray] = {}
    candidates = [
        "model.safetensors",
        "pytorch_model.bin",
        "model.pth",
    ]
    index = os.path.join(path, "model.safetensors.index.json")
    if os.path.exists(index):
        with open(index) as f:
            shards = sorted(set(json.load(f)["weight_map"].values()))
        for s in shards:
            sd.update(load_torch_checkpoint_file(os.path.join(path, s)))
    else:
        for c in candidates:
            p = os.path.join(path, c)
            if os.path.exists(p):
                sd = load_torch_checkpoint_file(p)
                break
    if not sd:
        raise FileNotFoundError(f"no model weights found under {path}")
    prefix = ""
    if not any(k.startswith("embeddings.") for k in sd):
        for cand in ("timesformer.", "model.timesformer.", "backbone."):
            if any(k.startswith(cand + "embeddings.") for k in sd):
                prefix = cand
                break
    params = convert_backbone_state_dict(sd, cfg, prefix=prefix)
    return cfg, params
