"""Export the JAX param tree back to an HF/torch-compatible checkpoint.

The inverse of hf_import: produces a state dict with the reference's
parameter naming (models/modeling_timesformer_siglip.py) so checkpoints
trained here load into the PyTorch reference via
``TimesformerMultiTaskingModelSigLIP.from_pretrained`` — and the reference's
own tools (ckpt_to_pretrained.py, downstream loaders that strip
``task_heads.*``) keep working.
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Mapping

import numpy as np

from streamformer_tpu.config import StreamformerConfig


def _t(x):
    # contiguous copy: safetensors serializes the raw buffer and silently
    # ignores view strides, corrupting transposed arrays
    return np.ascontiguousarray(np.asarray(x, np.float32).T)


def _a(x):
    return np.ascontiguousarray(np.asarray(x, np.float32))


def backbone_to_state_dict(
    params: Mapping[str, Any], cfg: StreamformerConfig, prefix: str = ""
) -> Dict[str, np.ndarray]:
    sd: Dict[str, np.ndarray] = {}
    p = prefix
    emb = params["embeddings"]
    # HWIO -> torch OIHW
    sd[p + "embeddings.patch_embeddings.projection.weight"] = np.ascontiguousarray(
        np.transpose(_a(emb["patch_proj"]["kernel"]), (3, 2, 0, 1))
    )
    sd[p + "embeddings.patch_embeddings.projection.bias"] = _a(
        emb["patch_proj"]["bias"]
    )
    sd[p + "embeddings.position_embeddings"] = _a(emb["position_embeddings"])[None]
    if "time_embeddings" in emb:
        sd[p + "embeddings.time_embeddings"] = _a(emb["time_embeddings"])[None]

    for i, layer in enumerate(params["layers"]):
        lp = f"{p}encoder.layer.{i}."

        def dense(name, q, lora_name=None):
            sd[name + ".weight"] = _t(q["kernel"])
            if "bias" in q:
                sd[name + ".bias"] = _a(q["bias"])
            if lora_name and "lora_a" in q:
                sd[lora_name + "_lora_a.weight"] = _t(q["lora_a"])
                sd[lora_name + "_lora_b.weight"] = _t(q["lora_b"])

        def ln(name, q):
            sd[name + ".weight"] = _a(q["scale"])
            sd[name + ".bias"] = _a(q["bias"])

        ln(lp + "layernorm_before", layer["layernorm_before"])
        ln(lp + "layernorm_after", layer["layernorm_after"])
        dense(lp + "attention.attention.qkv", layer["attention"]["qkv"],
              lp + "attention.attention.qkv")
        dense(lp + "attention.output.dense", layer["attention"]["out"],
              lp + "attention.output.dense")
        dense(lp + "intermediate.dense", layer["mlp"]["fc1"])
        dense(lp + "output.dense", layer["mlp"]["fc2"])
        if "temporal_attention" in layer:
            ln(lp + "temporal_layernorm", layer["temporal_layernorm"])
            dense(lp + "temporal_attention.attention.qkv",
                  layer["temporal_attention"]["qkv"])
            dense(lp + "temporal_attention.output.dense",
                  layer["temporal_attention"]["out"])
            dense(lp + "temporal_dense", layer["temporal_dense"])
            sd[lp + "temporal_attention_gating"] = _a(
                layer["temporal_attention_gating"]
            ).reshape(())

    sd[p + "post_layernorm.weight"] = _a(params["post_layernorm"]["scale"])
    sd[p + "post_layernorm.bias"] = _a(params["post_layernorm"]["bias"])

    mh = params["map_head"]
    d = cfg.hidden_size
    sd[p + "head.probe"] = _a(mh["probe"]).reshape(1, 1, d)
    sd[p + "head.attention.in_proj_weight"] = np.concatenate(
        [_t(mh["q"]["kernel"]), _t(mh["k"]["kernel"]), _t(mh["v"]["kernel"])], 0
    )
    sd[p + "head.attention.in_proj_bias"] = np.concatenate(
        [_a(mh["q"]["bias"]), _a(mh["k"]["bias"]), _a(mh["v"]["bias"])]
    )
    sd[p + "head.attention.out_proj.weight"] = _t(mh["out"]["kernel"])
    sd[p + "head.attention.out_proj.bias"] = _a(mh["out"]["bias"])
    sd[p + "head.layernorm.weight"] = _a(mh["layernorm"]["scale"])
    sd[p + "head.layernorm.bias"] = _a(mh["layernorm"]["bias"])
    sd[p + "head.mlp.fc1.weight"] = _t(mh["mlp"]["fc1"]["kernel"])
    sd[p + "head.mlp.fc1.bias"] = _a(mh["mlp"]["fc1"]["bias"])
    sd[p + "head.mlp.fc2.weight"] = _t(mh["mlp"]["fc2"]["kernel"])
    sd[p + "head.mlp.fc2.bias"] = _a(mh["mlp"]["fc2"]["bias"])
    return sd


def save_pretrained(
    path: str,
    params: Mapping[str, Any],
    cfg: StreamformerConfig,
    prefix: str = "",
) -> None:
    """Write config.json + model.safetensors in the reference layout
    (ckpt_to_pretrained.py equivalent)."""
    os.makedirs(path, exist_ok=True)
    cfg.save_pretrained(path)
    sd = backbone_to_state_dict(params, cfg, prefix=prefix)
    from safetensors.numpy import save_file

    save_file(sd, os.path.join(path, "model.safetensors"))
