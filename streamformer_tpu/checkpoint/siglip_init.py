"""Initialize StreamFormer params from a SigLIP checkpoint (weight surgery).

Rebuild of tools/initialize_SigLIP_weights.py (306 LoC): map the SigLIP
vision tower into the spatial half of the divided space-time encoder and
copy the text tower; the temporal half starts fresh:

* spatial attention qkv  <- concat(q_proj, k_proj, v_proj) rows
  (initialize_SigLIP_weights.py:67-112)
* layer_norm1 -> layernorm_before, layer_norm2 -> layernorm_after
* mlp fc1/fc2 -> intermediate/output (our mlp.fc1/fc2)
* MAP head copied verbatim (:222-224); post_layernorm copied
* text tower copied (:260-264); logit scale/bias copied (:249-257)
* temporal attention, temporal_dense, time_embeddings: normal(0, 0.02)
  (:229-240); temporal gate stays 0 so the model starts exactly at SigLIP

Accepts an HF SigLIP state dict (numpy) from a local checkpoint dir; writes
the same Loaded/Not-loaded audit JSON the reference dumps (:266-281).
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Mapping, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from streamformer_tpu.config import StreamformerConfig
from streamformer_tpu.models import encoder as enc
from streamformer_tpu.models.text_encoder import (
    SiglipTextConfig,
    convert_torch_state_dict as convert_text,
)


def _t(sd, k):
    return jnp.asarray(np.asarray(sd[k]).T)


def _a(sd, k):
    return jnp.asarray(np.asarray(sd[k]))


def init_from_siglip(
    sd: Mapping[str, Any],
    cfg: StreamformerConfig,
    text_cfg: Optional[SiglipTextConfig] = None,
    rng: Optional[jax.Array] = None,
    vision_prefix: str = "vision_model.",
    audit_path: Optional[str] = None,
) -> Tuple[Dict[str, Any], Dict[str, Any], Dict[str, Any]]:
    """Returns (backbone_params, text_params, extras) where extras carries
    logit_scale/logit_bias. ``sd`` is a full SigLIP model state dict."""
    rng = rng if rng is not None else jax.random.PRNGKey(0)
    params = enc.init_params(rng, cfg)  # temporal halves keep this fresh init
    loaded: Dict[str, bool] = {}
    p = vision_prefix

    def mark(name):
        loaded[name] = True

    emb = params["embeddings"]
    emb["patch_proj"]["kernel"] = jnp.asarray(
        np.transpose(np.asarray(sd[p + "embeddings.patch_embedding.weight"]),
                     (2, 3, 1, 0))
    )
    emb["patch_proj"]["bias"] = _a(sd, p + "embeddings.patch_embedding.bias")
    emb["position_embeddings"] = _a(sd, p + "embeddings.position_embedding.weight")
    mark("embeddings.patch_proj")
    mark("embeddings.position_embeddings")
    # time_embeddings stay fresh-init (reference :229-240) — re-init for
    # clarity with normal(0, 0.02)
    k_t = jax.random.fold_in(rng, 101)
    emb["time_embeddings"] = 0.02 * jax.random.normal(
        k_t, emb["time_embeddings"].shape, jnp.float32
    )

    for i, layer in enumerate(params["layers"]):
        e = f"{p}encoder.layers.{i}."
        q = np.asarray(sd[e + "self_attn.q_proj.weight"])
        k = np.asarray(sd[e + "self_attn.k_proj.weight"])
        v = np.asarray(sd[e + "self_attn.v_proj.weight"])
        layer["attention"]["qkv"]["kernel"] = jnp.asarray(
            np.concatenate([q, k, v], axis=0).T
        )
        layer["attention"]["qkv"]["bias"] = jnp.concatenate(
            [
                _a(sd, e + "self_attn.q_proj.bias"),
                _a(sd, e + "self_attn.k_proj.bias"),
                _a(sd, e + "self_attn.v_proj.bias"),
            ]
        )
        layer["attention"]["out"]["kernel"] = _t(sd, e + "self_attn.out_proj.weight")
        layer["attention"]["out"]["bias"] = _a(sd, e + "self_attn.out_proj.bias")
        layer["layernorm_before"] = {
            "scale": _a(sd, e + "layer_norm1.weight"),
            "bias": _a(sd, e + "layer_norm1.bias"),
        }
        layer["layernorm_after"] = {
            "scale": _a(sd, e + "layer_norm2.weight"),
            "bias": _a(sd, e + "layer_norm2.bias"),
        }
        layer["mlp"]["fc1"] = {
            "kernel": _t(sd, e + "mlp.fc1.weight"),
            "bias": _a(sd, e + "mlp.fc1.bias"),
        }
        layer["mlp"]["fc2"] = {
            "kernel": _t(sd, e + "mlp.fc2.weight"),
            "bias": _a(sd, e + "mlp.fc2.bias"),
        }
        mark(f"layers.{i}.spatial")
        # temporal halves: fresh normal(0, 0.02), zero biases, gate 0
        ki = jax.random.fold_in(rng, 1000 + i)
        d = cfg.hidden_size
        layer["temporal_attention"]["qkv"]["kernel"] = 0.02 * jax.random.normal(
            jax.random.fold_in(ki, 0), (d, 3 * d), jnp.float32
        )
        layer["temporal_attention"]["out"]["kernel"] = 0.02 * jax.random.normal(
            jax.random.fold_in(ki, 1), (d, d), jnp.float32
        )
        layer["temporal_dense"]["kernel"] = 0.02 * jax.random.normal(
            jax.random.fold_in(ki, 2), (d, d), jnp.float32
        )
        layer["temporal_attention_gating"] = jnp.zeros((), jnp.float32)

    params["post_layernorm"] = {
        "scale": _a(sd, p + "post_layernorm.weight"),
        "bias": _a(sd, p + "post_layernorm.bias"),
    }
    mark("post_layernorm")

    d = cfg.hidden_size
    in_w = np.asarray(sd[p + "head.attention.in_proj_weight"])
    in_b = np.asarray(sd[p + "head.attention.in_proj_bias"])
    params["map_head"] = {
        "probe": _a(sd, p + "head.probe").reshape(d),
        "q": {"kernel": jnp.asarray(in_w[:d].T), "bias": jnp.asarray(in_b[:d])},
        "k": {
            "kernel": jnp.asarray(in_w[d : 2 * d].T),
            "bias": jnp.asarray(in_b[d : 2 * d]),
        },
        "v": {
            "kernel": jnp.asarray(in_w[2 * d :].T),
            "bias": jnp.asarray(in_b[2 * d :]),
        },
        "out": {
            "kernel": _t(sd, p + "head.attention.out_proj.weight"),
            "bias": _a(sd, p + "head.attention.out_proj.bias"),
        },
        "layernorm": {
            "scale": _a(sd, p + "head.layernorm.weight"),
            "bias": _a(sd, p + "head.layernorm.bias"),
        },
        "mlp": {
            "fc1": {
                "kernel": _t(sd, p + "head.mlp.fc1.weight"),
                "bias": _a(sd, p + "head.mlp.fc1.bias"),
            },
            "fc2": {
                "kernel": _t(sd, p + "head.mlp.fc2.weight"),
                "bias": _a(sd, p + "head.mlp.fc2.bias"),
            },
        },
    }
    mark("map_head")

    if text_cfg is None:
        # infer the text tower geometry from the state dict
        import re

        n_layers = 1 + max(
            int(m.group(1))
            for k in sd
            if (m := re.match(r"text_model\.encoder\.layers\.(\d+)\.", k))
        )
        tok = np.asarray(sd["text_model.embeddings.token_embedding.weight"])
        pos = np.asarray(sd["text_model.embeddings.position_embedding.weight"])
        fc1 = np.asarray(sd["text_model.encoder.layers.0.mlp.fc1.weight"])
        text_cfg = SiglipTextConfig(
            vocab_size=tok.shape[0],
            hidden_size=tok.shape[1],
            num_hidden_layers=n_layers,
            intermediate_size=fc1.shape[0],
            max_position_embeddings=pos.shape[0],
        )
    text_params = convert_text(sd, text_cfg, prefix="text_model.")
    mark("text")

    extras = {}
    if "logit_scale" in sd:
        extras["logit_scale"] = _a(sd, "logit_scale").reshape(())
        extras["logit_bias"] = _a(sd, "logit_bias").reshape(())
        mark("logit_scale_bias")

    if audit_path:
        # weight-surgery audit trail (reference :266-281)
        fresh = [
            f"layers.{i}.temporal" for i in range(cfg.num_hidden_layers)
        ] + ["embeddings.time_embeddings", "temporal_attention_gating"]
        with open(audit_path, "w") as f:
            json.dump({"loaded": sorted(loaded), "fresh_init": fresh}, f, indent=2)
    return params, text_params, extras


def init_from_siglip_dir(path: str, cfg: StreamformerConfig, **kw):
    """Load from a local HF SigLIP checkpoint directory."""
    from streamformer_tpu.checkpoint.hf_import import load_torch_checkpoint_file

    sd = {}
    index = os.path.join(path, "model.safetensors.index.json")
    if os.path.exists(index):
        with open(index) as f:
            for s in sorted(set(json.load(f)["weight_map"].values())):
                sd.update(load_torch_checkpoint_file(os.path.join(path, s)))
    else:
        for c in ("model.safetensors", "pytorch_model.bin"):
            fp = os.path.join(path, c)
            if os.path.exists(fp):
                sd = load_torch_checkpoint_file(fp)
                break
    if not sd:
        raise FileNotFoundError(path)
    return init_from_siglip(sd, cfg, **kw)
