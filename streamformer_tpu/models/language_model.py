"""Decoder-only language model (Qwen2/Llama family) for the VideoQA suite.

The reference's VideoQA fork terminates in an LLM — vendored, patched
Llama/Qwen2.5 (downstream/VideoQA/llava/model/language_model/*,
modeling_llama.py 1,649 LoC). This is the TPU-native equivalent: one
functional decoder implementation covering both families —

* RMSNorm, rotary position embeddings, grouped-query attention
  (num_key_value_heads <= num_attention_heads), SwiGLU MLP;
* Qwen2 = attention_bias on q/k/v, Llama = no biases (``attention_bias``);
* optional tied lm_head (tie_word_embeddings);
* fixed-capacity KV cache for autoregressive decoding (same static-shape
  design as the video encoder cache: one compiled step program, donated
  buffers — the reference grows an HF DynamicCache).

Weight import from HF checkpoints: :func:`convert_hf_state_dict` maps
``model.layers.N.self_attn.q_proj.weight``-style names (Qwen2/Llama) onto
this tree; parity vs ``transformers`` is tested in tests/test_language_model.py.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Dict, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

Params = Dict[str, Any]


@dataclasses.dataclass(frozen=True)
class LMConfig:
    vocab_size: int = 151936
    hidden_size: int = 3584
    intermediate_size: int = 18944
    num_hidden_layers: int = 28
    num_attention_heads: int = 28
    num_key_value_heads: int = 4
    max_position_embeddings: int = 32768
    rope_theta: float = 1000000.0
    rms_norm_eps: float = 1e-6
    tie_word_embeddings: bool = False
    attention_bias: bool = True  # Qwen2; Llama uses False
    dtype: str = "float32"

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_attention_heads

    def replace(self, **kw):
        return dataclasses.replace(self, **kw)


def _norm_init(rng, shape, std=0.02):
    return std * jax.random.normal(rng, shape, jnp.float32)


def init_params(rng, cfg: LMConfig) -> Params:
    d, m = cfg.hidden_size, cfg.intermediate_size
    dh = cfg.head_dim
    hq, hkv = cfg.num_attention_heads, cfg.num_key_value_heads
    ks = jax.random.split(rng, cfg.num_hidden_layers + 3)

    def dense(k, i, o, bias):
        p = {"kernel": _norm_init(k, (i, o))}
        if bias:
            p["bias"] = jnp.zeros((o,), jnp.float32)
        return p

    def layer(k):
        k = jax.random.split(k, 7)
        return {
            "input_layernorm": jnp.ones((d,), jnp.float32),
            "post_attention_layernorm": jnp.ones((d,), jnp.float32),
            "attn": {
                "q": dense(k[0], d, hq * dh, cfg.attention_bias),
                "k": dense(k[1], d, hkv * dh, cfg.attention_bias),
                "v": dense(k[2], d, hkv * dh, cfg.attention_bias),
                "o": dense(k[3], hq * dh, d, False),
            },
            "mlp": {
                "gate": dense(k[4], d, m, False),
                "up": dense(k[5], d, m, False),
                "down": dense(k[6], m, d, False),
            },
        }

    p = {
        "embed_tokens": _norm_init(ks[0], (cfg.vocab_size, d)),
        "layers": [layer(ks[1 + i]) for i in range(cfg.num_hidden_layers)],
        "norm": jnp.ones((d,), jnp.float32),
    }
    if not cfg.tie_word_embeddings:
        p["lm_head"] = _norm_init(ks[-1], (d, cfg.vocab_size))
    return p


def rms_norm(x: jnp.ndarray, w: jnp.ndarray, eps: float) -> jnp.ndarray:
    dt = x.dtype
    x32 = x.astype(jnp.float32)
    x32 = x32 * jax.lax.rsqrt(jnp.mean(x32 * x32, axis=-1, keepdims=True) + eps)
    return (x32 * w).astype(dt)


def _rope(x: jnp.ndarray, positions: jnp.ndarray, theta: float) -> jnp.ndarray:
    """HF-convention rotary embedding: x (B, L, H, dh), positions (B, L).
    Matches transformers' rotate_half formulation (non-interleaved)."""
    dh = x.shape[-1]
    inv = 1.0 / (theta ** (jnp.arange(0, dh, 2, dtype=jnp.float32) / dh))
    ang = positions[..., None].astype(jnp.float32) * inv  # (B, L, dh/2)
    cos = jnp.cos(ang)[:, :, None, :]
    sin = jnp.sin(ang)[:, :, None, :]
    x1, x2 = x[..., : dh // 2], x[..., dh // 2 :]
    return jnp.concatenate(
        [x1 * cos - x2 * sin, x2 * cos + x1 * sin], axis=-1
    ).astype(x.dtype)


def _dense(x, p):
    if "kernel_q" in p:  # int8-weight serving (ops/quant tree): decode is
        # weights-bandwidth-bound, so int8 weights are the 2x lever
        from streamformer_tpu.ops.quant import int8_dense

        return int8_dense(x, p)
    y = x @ p["kernel"].astype(x.dtype)
    if "bias" in p:
        y = y + p["bias"].astype(x.dtype)
    return y


def init_cache(
    cfg: LMConfig,
    batch: int,
    capacity: int,
    per_stream_len: bool = False,
    cache_dtype: Optional[str] = None,
) -> Params:
    """Fixed-capacity KV cache. ``per_stream_len=True`` makes ``len`` a
    (batch,) vector so every row decodes at its own position — the ragged
    continuous-batching form (same design as the video encoder's ragged
    cache; the torch reference's DynamicCache is lockstep-only).
    ``cache_dtype="int8"`` stores K/V symmetric-quantized per
    (row, position, kv-head) with float32 scales — half the HBM footprint,
    which is the capacity limit for a 7B tower on 16 GB chips.
    ``cache_dtype="int4"`` nibble-packs two 4-bit values per byte (same
    per-(row, position, kv-head) scales) — quarter the bf16 footprint,
    2x the slots x context of int8 at the same HBM (ops/quant.py
    quantize_kv4; decode stays weights-bandwidth-bound, so throughput is
    unchanged while capacity doubles)."""
    dt = jnp.dtype(cfg.dtype)
    hkv, dh = cfg.num_key_value_heads, cfg.head_dim
    # planes are FLAT 3-D (B, C, hkv*dh), head-major in the last dim —
    # the 4-D (B, C, hkv, dh) form made XLA pick a permuted while-carry
    # layout in the engine's k-step decode scan, inserting two full-plane
    # relayout copies per layer per scan iteration (~200 MB/iteration at
    # the bench config, measured in the compiled HLO). The (hkv, dh)
    # split is a free bitcast at the attention read (minor-dims split),
    # same design as the encoder's flat pos-major cache.
    ln = (
        jnp.zeros((batch,), jnp.int32)
        if per_stream_len
        else jnp.zeros((), jnp.int32)
    )
    if cache_dtype in ("int8", "int4"):
        qdh = dh if cache_dtype == "int8" else dh // 2
        if cache_dtype == "int4":
            assert dh % 2 == 0, (
                f"int4 KV nibble-packs pairs: head_dim must be even, "
                f"got {dh}"
            )
        qshape = (batch, capacity, hkv * qdh)
        layer = lambda: {
            "k": jnp.zeros(qshape, jnp.int8),
            "v": jnp.zeros(qshape, jnp.int8),
            "k_scale": jnp.zeros((batch, capacity, hkv), jnp.float32),
            "v_scale": jnp.zeros((batch, capacity, hkv), jnp.float32),
        }
    else:
        assert cache_dtype is None, cache_dtype
        shape = (batch, capacity, hkv * dh)
        layer = lambda: {"k": jnp.zeros(shape, dt), "v": jnp.zeros(shape, dt)}
    return {
        "layers": [layer() for _ in range(cfg.num_hidden_layers)],
        "len": ln,
    }


def reset_streams(cache: Params, done: jnp.ndarray) -> Params:
    """Re-admit finished rows of a per-stream-length cache (len -> 0 where
    ``done``). Stale K/V needs no clearing: every mask excludes positions
    >= len. Jittable."""
    ln = cache["len"]
    assert ln.ndim == 1, "reset_streams needs init_cache(per_stream_len=True)"
    return {**cache, "len": jnp.where(done, 0, ln)}


def forward(
    params: Params,
    inputs_embeds: jnp.ndarray,  # (B, L, D)
    cfg: LMConfig,
    attention_mask: Optional[jnp.ndarray] = None,  # (B, L_total) 1 = valid
    cache: Optional[Params] = None,
) -> Tuple[Dict[str, jnp.ndarray], Optional[Params]]:
    """Causal decoder forward. With ``cache``, the L new positions append at
    ``cache["len"]`` and ``attention_mask`` (if given) covers cached+new.
    A (B,)-shaped ``cache["len"]`` (init_cache(per_stream_len=True)) makes
    the step RAGGED: every batch row appends, masks, and applies RoPE at
    its own position — one compiled program serves streams at mixed decode
    depths (continuous batching).
    Returns ({"logits", "last_hidden_state"}, new_cache)."""
    b, l, d = inputs_embeds.shape
    dt = jnp.dtype(cfg.dtype)
    x = inputs_embeds.astype(dt)
    hq, hkv, dh = cfg.num_attention_heads, cfg.num_key_value_heads, cfg.head_dim
    rep = hq // hkv
    start = cache["len"] if cache is not None else jnp.zeros((), jnp.int32)
    ragged = start.ndim == 1
    if ragged:
        positions = start[:, None] + jnp.arange(l)[None]  # (B, L)
    else:
        positions = start + jnp.arange(l)[None]  # (1, L) broadcast over batch
        positions = jnp.broadcast_to(positions, (b, l))

    new_layers = []
    for i, lp in enumerate(params["layers"]):
        h = rms_norm(x, lp["input_layernorm"], cfg.rms_norm_eps)
        q = _dense(h, lp["attn"]["q"]).reshape(b, l, hq, dh)
        k = _dense(h, lp["attn"]["k"]).reshape(b, l, hkv, dh)
        v = _dense(h, lp["attn"]["v"]).reshape(b, l, hkv, dh)
        q = _rope(q, positions, cfg.rope_theta)
        k = _rope(k, positions, cfg.rope_theta)

        if cache is not None:
            quantized = "k_scale" in cache["layers"][i]

            def append(planes, new):
                """DUS along the position axis; per-row starts if ragged."""
                if ragged:
                    return jax.vmap(
                        lambda c, nw, s: jax.lax.dynamic_update_slice(
                            c, nw, (s,) + (0,) * (c.ndim - 1)
                        )
                    )(planes, new, start)
                return jax.lax.dynamic_update_slice(
                    planes, new, (0, start) + (0,) * (planes.ndim - 2)
                )

            if quantized:
                from streamformer_tpu.models.encoder import (
                    dequantize_kv, quantize_kv,
                )

                # int4 planes store dh/2 packed bytes — dispatch on the
                # (static) flat plane width, so one forward serves both
                int4 = (cache["layers"][i]["k"].shape[-1]
                        == hkv * (dh // 2))
                if int4:
                    from streamformer_tpu.ops.quant import (
                        dequantize_kv4 as dequantize_kv,
                        quantize_kv4 as quantize_kv,
                    )
                qdh = dh // 2 if int4 else dh
                kq, ks = quantize_kv(k)  # (B, l, hkv) scales over dh
                vq, vs = quantize_kv(v)
                lay = {
                    # planes stay flat 3-D (see init_cache); the (hkv,
                    # qdh) split/merge on the minor dims is a free bitcast
                    "k": append(cache["layers"][i]["k"],
                                kq.reshape(b, l, hkv * qdh)),
                    "v": append(cache["layers"][i]["v"],
                                vq.reshape(b, l, hkv * qdh)),
                    "k_scale": append(cache["layers"][i]["k_scale"], ks),
                    "v_scale": append(cache["layers"][i]["v_scale"], vs),
                }
                new_layers.append(lay)
                cap = lay["k"].shape[1]
                k_att = dequantize_kv(
                    lay["k"].reshape(b, cap, hkv, qdh), lay["k_scale"], dt)
                v_att = dequantize_kv(
                    lay["v"].reshape(b, cap, hkv, qdh), lay["v_scale"], dt)
            else:
                ck = append(cache["layers"][i]["k"],
                            k.astype(dt).reshape(b, l, hkv * dh))
                cv = append(cache["layers"][i]["v"],
                            v.astype(dt).reshape(b, l, hkv * dh))
                new_layers.append({"k": ck, "v": cv})
                cap = ck.shape[1]
                k_att = ck.reshape(b, cap, hkv, dh)
                v_att = cv.reshape(b, cap, hkv, dh)
            kl = k_att.shape[1]
            kpos = jax.lax.broadcasted_iota(jnp.int32, (l, kl), 1)
            qoff = jax.lax.broadcasted_iota(jnp.int32, (l, kl), 0)
            if ragged:
                # (B, l, kl): each row causal at its own depth; rows past
                # a stream's frontier are excluded until overwritten
                mask = kpos[None] <= start[:, None, None] + qoff[None]
            else:
                mask = kpos <= start + qoff  # causal + only-written
        else:
            k_att, v_att = k, v
            kl = l
            mask = jnp.tril(jnp.ones((l, l), bool))
        if mask.ndim == 2:
            mask = jnp.broadcast_to(mask[None], (b, l, kl))
        if attention_mask is not None:
            pad = attention_mask[:, :kl].astype(bool)  # (B, kl)
            full_mask = mask & pad[:, None, :]
        else:
            full_mask = mask

        # grouped-query attention WITHOUT materializing repeated K/V:
        # queries reshaped (B, L, hkv, rep, dh) contract against the
        # (B, kl, hkv, dh) cache directly — the cache is read once, not
        # rep times (a materialized jnp.repeat would multiply the
        # HBM-bound decode's cache traffic by Hq/Hkv)
        qg = q.reshape(b, l, hkv, rep, dh)
        scores = jnp.einsum(
            "bqhrd,bkhd->bhrqk", qg, k_att.astype(q.dtype),
            preferred_element_type=jnp.float32,
        ) * (dh**-0.5)
        scores = jnp.where(full_mask[:, None, None], scores, -1e30)
        probs = jax.nn.softmax(scores, axis=-1).astype(dt)
        ctx = jnp.einsum("bhrqk,bkhd->bqhrd", probs, v_att.astype(dt))
        x = x + _dense(ctx.reshape(b, l, hq * dh), lp["attn"]["o"])

        h = rms_norm(x, lp["post_attention_layernorm"], cfg.rms_norm_eps)
        gate = jax.nn.silu(_dense(h, lp["mlp"]["gate"]))
        x = x + _dense(gate * _dense(h, lp["mlp"]["up"]), lp["mlp"]["down"])

    x = rms_norm(x, params["norm"], cfg.rms_norm_eps)
    logits = lm_logits(params, x, cfg)
    new_cache = None
    if cache is not None:
        new_cache = {"layers": new_layers, "len": start + l}
    return {"logits": logits, "last_hidden_state": x}, new_cache


def embed_tokens(params: Params, ids: jnp.ndarray) -> jnp.ndarray:
    return jnp.take(params["embed_tokens"], ids, axis=0)


def lm_logits(params: Params, x: jnp.ndarray, cfg: LMConfig) -> jnp.ndarray:
    """Vocab head over final-norm hidden states ``x`` (..., D) -> fp32
    (..., V). Factored out of ``forward`` so callers that need logits at
    ONE position (e.g. a prefill chunk's last valid row) can index the
    hidden state first and pay a 1xV matmul instead of LxV — at a
    448-token chunk the full-vocab projection is ~25% of the chunk's
    FLOPs, all of it dead work (jit DCEs ``forward``'s logits output when
    unused)."""
    dt = jnp.dtype(cfg.dtype)
    if cfg.tie_word_embeddings:
        return (x @ params["embed_tokens"].T.astype(dt)).astype(jnp.float32)
    if "lm_head_q" in params:  # int8 untied vocab head (ops/quant walk)
        from streamformer_tpu.ops.quant import int8_dense

        return int8_dense(
            x,
            {"kernel_q": params["lm_head_q"],
             "kernel_scale": params["lm_head_scale"]},
        ).astype(jnp.float32)
    return (x @ params["lm_head"].astype(dt)).astype(jnp.float32)


def lm_loss(
    logits: jnp.ndarray,  # (B, L, V)
    labels: jnp.ndarray,  # (B, L), -100 = ignore
) -> jnp.ndarray:
    """Next-token CE with ignore_index=-100 (HF Trainer semantics)."""
    shift_logits = logits[:, :-1]
    shift_labels = labels[:, 1:]
    valid = shift_labels != -100
    safe = jnp.where(valid, shift_labels, 0)
    logp = jax.nn.log_softmax(shift_logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logp, safe[..., None], axis=-1)[..., 0]
    total = jnp.sum(nll * valid)
    return total / jnp.maximum(jnp.sum(valid), 1)


def greedy_generate(
    params: Params,
    cfg: LMConfig,
    inputs_embeds: jnp.ndarray,  # (B, L, D) prompt embeddings
    max_new_tokens: int,
    attention_mask: Optional[jnp.ndarray] = None,
    eos_token_id: Optional[int] = None,
    capacity: Optional[int] = None,
) -> np.ndarray:
    """Greedy decoding with the fixed-capacity KV cache. Returns
    (B, <=max_new_tokens) int32 token ids (cut at EOS host-side)."""
    b, l, d = inputs_embeds.shape
    cap = capacity or (l + max_new_tokens)
    cache = init_cache(cfg, b, cap)
    if attention_mask is None:
        attention_mask = jnp.ones((b, l), jnp.int32)
    am = jnp.zeros((b, cap), jnp.int32)
    am = jax.lax.dynamic_update_slice(am, attention_mask.astype(jnp.int32), (0, 0))

    out, cache = forward(params, inputs_embeds, cfg,
                         attention_mask=am, cache=cache)
    # next-token from the last VALID prompt position per row
    last_idx = jnp.sum(attention_mask, axis=1).astype(jnp.int32) - 1
    tok = jnp.argmax(
        jnp.take_along_axis(
            out["logits"], last_idx[:, None, None], axis=1
        )[:, 0],
        axis=-1,
    ).astype(jnp.int32)

    # Switch to per-row (ragged) lengths for the decode loop: a right-padded
    # row's first generated token must land at position last_valid+1 (HF
    # position_ids-from-mask semantics), not at the padded batch length —
    # a scalar cache["len"] would give short rows a rotary-position gap.
    # New tokens overwrite the garbage pad K/V slot-by-slot, and ``am``
    # keeps the not-yet-overwritten pads excluded.
    cache["len"] = (last_idx + 1).astype(jnp.int32)

    step_fn = _greedy_step(cfg)
    toks = [np.asarray(tok)]
    for _ in range(1, max_new_tokens):
        tok, am, cache = step_fn(params, tok, am, cache)
        toks.append(np.asarray(tok))
        if eos_token_id is not None and bool(np.all(toks[-1] == eos_token_id)):
            break
    return np.stack(toks, axis=1)


@functools.lru_cache(maxsize=None)
def _greedy_step(cfg: LMConfig):
    """One compiled greedy-decode step per config (shapes are static, so
    every call after the first hits the jit cache — an eager per-token
    forward would dispatch thousands of host-side ops per token)."""

    @jax.jit
    def step(params, tok, am, cache):
        b = tok.shape[0]
        pos = cache["len"]  # (B,) per-row write position
        am = am.at[jnp.arange(b), pos].set(1)
        emb = embed_tokens(params, tok)[:, None]
        out, cache = forward(params, emb, cfg, attention_mask=am, cache=cache)
        nxt = jnp.argmax(out["logits"][:, -1], axis=-1).astype(jnp.int32)
        return nxt, am, cache

    return step


# ---------------------------------------------------------------------------
# HF weight import (Qwen2 / Llama name mapping)
# ---------------------------------------------------------------------------


def convert_hf_state_dict(sd: Dict[str, np.ndarray], cfg: LMConfig) -> Params:
    """Map an HF Qwen2/Llama state dict (numpy arrays) onto this tree.
    torch Linear weights are (out, in) -> transposed to (in, out) kernels."""

    def t(name):
        return np.ascontiguousarray(np.asarray(sd[name]).T)

    def a(name):
        return np.asarray(sd[name])

    def dense(prefix, bias):
        p = {"kernel": t(prefix + ".weight")}
        if bias and prefix + ".bias" in sd:
            p["bias"] = a(prefix + ".bias")
        return p

    layers = []
    for i in range(cfg.num_hidden_layers):
        pre = f"model.layers.{i}"
        layers.append(
            {
                "input_layernorm": a(f"{pre}.input_layernorm.weight"),
                "post_attention_layernorm": a(
                    f"{pre}.post_attention_layernorm.weight"
                ),
                "attn": {
                    "q": dense(f"{pre}.self_attn.q_proj", cfg.attention_bias),
                    "k": dense(f"{pre}.self_attn.k_proj", cfg.attention_bias),
                    "v": dense(f"{pre}.self_attn.v_proj", cfg.attention_bias),
                    "o": dense(f"{pre}.self_attn.o_proj", False),
                },
                "mlp": {
                    "gate": dense(f"{pre}.mlp.gate_proj", False),
                    "up": dense(f"{pre}.mlp.up_proj", False),
                    "down": dense(f"{pre}.mlp.down_proj", False),
                },
            }
        )
    p = {
        "embed_tokens": a("model.embed_tokens.weight"),
        "layers": layers,
        "norm": a("model.norm.weight"),
    }
    if not cfg.tie_word_embeddings:
        p["lm_head"] = t("lm_head.weight")
    return jax.tree.map(jnp.asarray, p)
