"""SigLIP text encoder (frozen text tower for all task heads).

The reference uses ``transformers.SiglipTextModel`` from
google/siglip-base-patch16-224 (modeling_timesformer_siglip.py:1365-1373) and
keeps it frozen. This is a JAX rebuild of that text transformer:
token + position embeddings -> pre-LN transformer -> final LN ->
last-token pooling -> head projection (the HF SiglipTextModel contract:
``pooler_output = head(last_hidden_state[:, -1])``).

Tokenization stays host-side (transformers AutoTokenizer) — it is string
processing, not compute.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class SiglipTextConfig:
    vocab_size: int = 32000
    hidden_size: int = 768
    num_hidden_layers: int = 12
    num_attention_heads: int = 12
    intermediate_size: int = 3072
    max_position_embeddings: int = 64
    layer_norm_eps: float = 1e-6
    # HF siglip uses gelu_pytorch_tanh
    hidden_act: str = "gelu_pytorch_tanh"

    @property
    def head_dim(self):
        return self.hidden_size // self.num_attention_heads


Params = Dict[str, Any]


def _act(cfg: SiglipTextConfig, x):
    if cfg.hidden_act == "gelu_pytorch_tanh":
        return jax.nn.gelu(x, approximate=True)
    return jax.nn.gelu(x, approximate=False)


def _ln(x, p, eps):
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, -1, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mean), -1, keepdims=True)
    return ((x32 - mean) * jax.lax.rsqrt(var + eps) * p["scale"] + p["bias"]).astype(
        x.dtype
    )


def _dense(x, p):
    return x @ p["kernel"].astype(x.dtype) + p["bias"].astype(x.dtype)


def init_params(rng, cfg: SiglipTextConfig) -> Params:
    d, m = cfg.hidden_size, cfg.intermediate_size

    def dense(rng, di, do):
        return {
            "kernel": 0.02 * jax.random.normal(rng, (di, do), jnp.float32),
            "bias": jnp.zeros((do,), jnp.float32),
        }

    def ln():
        return {
            "scale": jnp.ones((d,), jnp.float32),
            "bias": jnp.zeros((d,), jnp.float32),
        }

    ks = iter(jax.random.split(rng, 6 * cfg.num_hidden_layers + 4))
    return {
        "token_embedding": 0.02
        * jax.random.normal(next(ks), (cfg.vocab_size, d), jnp.float32),
        "position_embedding": 0.02
        * jax.random.normal(next(ks), (cfg.max_position_embeddings, d), jnp.float32),
        "layers": [
            {
                "layer_norm1": ln(),
                "attn": {
                    "q": dense(next(ks), d, d),
                    "k": dense(next(ks), d, d),
                    "v": dense(next(ks), d, d),
                    "out": dense(next(ks), d, d),
                },
                "layer_norm2": ln(),
                "mlp": {"fc1": dense(next(ks), d, m), "fc2": dense(next(ks), m, d)},
            }
            for _ in range(cfg.num_hidden_layers)
        ],
        "final_layer_norm": ln(),
        "head": dense(next(ks), d, d),
    }


def forward(
    params: Params, input_ids: jnp.ndarray, cfg: SiglipTextConfig
) -> Dict[str, jnp.ndarray]:
    """input_ids: (B, L) int32 (padded to max_length like the reference's
    tokenizer calls, padding="max_length", max_length=64).

    Returns last_hidden_state (B, L, D) and pooler_output (B, D).
    Note: HF SigLIP text attention is un-masked over the full padded length
    (the tokenizer pads and the model attends to padding — we reproduce that).
    """
    with jax.default_matmul_precision("highest"):
        b, l = input_ids.shape
        h, dh = cfg.num_attention_heads, cfg.head_dim
        scale = dh**-0.5
        x = params["token_embedding"][input_ids]
        x = x + params["position_embedding"][None, :l]
        for lp in params["layers"]:
            y = _ln(x, lp["layer_norm1"], cfg.layer_norm_eps)
            q = _dense(y, lp["attn"]["q"]).reshape(b, l, h, dh)
            k = _dense(y, lp["attn"]["k"]).reshape(b, l, h, dh)
            v = _dense(y, lp["attn"]["v"]).reshape(b, l, h, dh)
            scores = (
                jnp.einsum("bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32)
                * scale
            )
            probs = jax.nn.softmax(scores, axis=-1).astype(x.dtype)
            ctx = jnp.einsum("bhqk,bkhd->bqhd", probs, v).reshape(b, l, -1)
            x = x + _dense(ctx, lp["attn"]["out"])
            y = _ln(x, lp["layer_norm2"], cfg.layer_norm_eps)
            y = _dense(y, lp["mlp"]["fc1"])
            y = _act(cfg, y)
            x = x + _dense(y, lp["mlp"]["fc2"])
        x = _ln(x, params["final_layer_norm"], cfg.layer_norm_eps)
        pooled = _dense(x[:, -1], params["head"])
        return {"last_hidden_state": x, "pooler_output": pooled}


# ---------------------------------------------------------------------------
# torch / HF import
# ---------------------------------------------------------------------------


def convert_torch_state_dict(sd, cfg: SiglipTextConfig, prefix="text_model.") -> Params:
    """Map HF SiglipTextModel state dict -> our pytree."""

    def t(k):
        return jnp.asarray(np.asarray(sd[k]).T)

    def a(k):
        return jnp.asarray(np.asarray(sd[k]))

    def dense(k):
        return {"kernel": t(k + ".weight"), "bias": a(k + ".bias")}

    def ln(k):
        return {"scale": a(k + ".weight"), "bias": a(k + ".bias")}

    p = prefix
    layers = []
    for i in range(cfg.num_hidden_layers):
        e = f"{p}encoder.layers.{i}."
        layers.append(
            {
                "layer_norm1": ln(e + "layer_norm1"),
                "attn": {
                    "q": dense(e + "self_attn.q_proj"),
                    "k": dense(e + "self_attn.k_proj"),
                    "v": dense(e + "self_attn.v_proj"),
                    "out": dense(e + "self_attn.out_proj"),
                },
                "layer_norm2": ln(e + "layer_norm2"),
                "mlp": {
                    "fc1": dense(e + "mlp.fc1"),
                    "fc2": dense(e + "mlp.fc2"),
                },
            }
        )
    return {
        "token_embedding": a(p + "embeddings.token_embedding.weight"),
        "position_embedding": a(p + "embeddings.position_embedding.weight"),
        "layers": layers,
        "final_layer_norm": ln(p + "final_layer_norm"),
        "head": dense(p + "head"),
    }
