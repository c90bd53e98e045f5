"""LSTR/MAT online action detector on extracted per-frame features.

Rebuild of downstream/OAD (MAT/LSTR fork,
src/rekognition_online_action_detection/models/lstr.py:13-354):

* feature heads fuse visual (768-d StreamFormer dumps, §2.6) and optional
  flow features into d_model;
* long memory (LONG_MEMORY_NUM_SAMPLES frames) is compressed group-wise:
  GROUPS segments, each cross-attended by learned queries then average-pooled
  to one token (lstr.py:167-180), then a second query module compresses to
  ENC_MODULE[1][0] tokens;
* work memory (+ anticipation queries) runs a causal transformer decoder over
  the compressed memory (lstr.py:199-229);
* the future/CCI branch (MAT) generates future tokens and cyclically fuses
  work/future representations (lstr.py:122-147, CCI_TIMES rounds);
* classification per work/anticipation token.

Streaming inference keeps a FIFO long-memory feature cache and reuses the
compressed tokens until a new long-memory frame arrives
(LSTRStream.stream_inference, lstr.py:255-354).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Dict, List, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

Params = Dict[str, Any]


@dataclasses.dataclass(frozen=True)
class LSTRConfig:
    visual_size: int = 768
    motion_size: int = 0  # 0 = no flow stream
    d_model: int = 1024
    num_heads: int = 8
    dim_feedforward: int = 1024
    dropout: float = 0.2
    num_classes: int = 22
    long_memory_num_samples: int = 512
    work_memory_num_samples: int = 32
    anticipation_num_samples: int = 0
    future_num_samples: int = 0
    enc_queries_0: int = 16  # ENC_MODULE[0][0]
    enc_layers_0: int = 1
    enc_queries_1: int = 32  # ENC_MODULE[1][0]
    enc_layers_1: int = 2
    dec_layers: int = 2
    gen_queries: int = 32  # GEN_MODULE[0]
    gen_layers: int = 2
    fut_queries: int = 48  # FUT_MODULE[0][0]
    groups: int = 8
    cci_times: int = 2
    max_pos: int = 2048


# ---------------------------------------------------------------------------
# primitives
# ---------------------------------------------------------------------------


def _dense_init(rng, din, dout):
    lim = math.sqrt(6 / (din + dout))
    return {
        "kernel": jax.random.uniform(rng, (din, dout), jnp.float32, -lim, lim),
        "bias": jnp.zeros((dout,), jnp.float32),
    }


def _ln_init(d):
    return {"scale": jnp.ones((d,)), "bias": jnp.zeros((d,))}


def _dense(x, p):
    return x @ p["kernel"] + p["bias"]


def _ln(x, p, eps=1e-5):
    m = jnp.mean(x, -1, keepdims=True)
    v = jnp.mean(jnp.square(x - m), -1, keepdims=True)
    return (x - m) * jax.lax.rsqrt(v + eps) * p["scale"] + p["bias"]


def _mha_init(rng, d):
    ks = jax.random.split(rng, 4)
    return {
        "q": _dense_init(ks[0], d, d),
        "k": _dense_init(ks[1], d, d),
        "v": _dense_init(ks[2], d, d),
        "out": _dense_init(ks[3], d, d),
    }


def _mha(p, q_in, kv_in, num_heads, mask=None, key_padding_mask=None):
    """q_in: (B, Lq, D), kv_in: (B, Lk, D); mask (Lq, Lk) additive or bool;
    key_padding_mask (B, Lk) True=keep."""
    b, lq, d = q_in.shape
    lk = kv_in.shape[1]
    h = num_heads
    dh = d // h
    q = _dense(q_in, p["q"]).reshape(b, lq, h, dh)
    k = _dense(kv_in, p["k"]).reshape(b, lk, h, dh)
    v = _dense(kv_in, p["v"]).reshape(b, lk, h, dh)
    s = jnp.einsum("bqhd,bkhd->bhqk", q, k) * (dh**-0.5)
    if mask is not None:
        s = jnp.where(mask[None, None], s, -1e30) if mask.dtype == bool else s + mask
    if key_padding_mask is not None:
        s = jnp.where(key_padding_mask[:, None, None, :], s, -1e30)
    a = jax.nn.softmax(s, axis=-1)
    o = jnp.einsum("bhqk,bkhd->bqhd", a, v).reshape(b, lq, d)
    return _dense(o, p["out"])


def _declayer_init(rng, cfg: LSTRConfig):
    ks = jax.random.split(rng, 5)
    return {
        "self_attn": _mha_init(ks[0], cfg.d_model),
        "cross_attn": _mha_init(ks[1], cfg.d_model),
        "fc1": _dense_init(ks[2], cfg.d_model, cfg.dim_feedforward),
        "fc2": _dense_init(ks[3], cfg.dim_feedforward, cfg.d_model),
        "ln1": _ln_init(cfg.d_model),
        "ln2": _ln_init(cfg.d_model),
        "ln3": _ln_init(cfg.d_model),
    }


def _declayer(
    p, cfg, tgt, memory, tgt_mask=None, memory_mask=None,
    memory_key_padding_mask=None,
):
    """Post-norm transformer decoder layer (torch nn.TransformerDecoderLayer
    convention, which the reference's tr module follows)."""
    x = tgt
    x = _ln(x + _mha(p["self_attn"], x, x, cfg.num_heads, mask=tgt_mask), p["ln1"])
    x = _ln(
        x
        + _mha(
            p["cross_attn"], x, memory, cfg.num_heads,
            mask=memory_mask, key_padding_mask=memory_key_padding_mask,
        ),
        p["ln2"],
    )
    y = _dense(jax.nn.relu(_dense(x, p["fc1"])), p["fc2"])
    return _ln(x + y, p["ln3"])


def _decoder_init(rng, cfg, n_layers):
    ks = jax.random.split(rng, n_layers + 1)
    return {
        "layers": [_declayer_init(ks[i], cfg) for i in range(n_layers)],
        "norm": _ln_init(cfg.d_model),
    }


def _decoder(p, cfg, tgt, memory, **kw):
    x = tgt
    for lp in p["layers"]:
        x = _declayer(lp, cfg, x, memory, **kw)
    return _ln(x, p["norm"])


def _causal_mask(n):
    return jnp.tril(jnp.ones((n, n), bool))


def _pos_encoding(d, max_len):
    pos = np.arange(max_len)[:, None]
    div = np.exp(np.arange(0, d, 2) * (-math.log(10000.0) / d))
    pe = np.zeros((max_len, d), np.float32)
    pe[:, 0::2] = np.sin(pos * div)
    pe[:, 1::2] = np.cos(pos * div)
    return jnp.asarray(pe)


# ---------------------------------------------------------------------------
# model
# ---------------------------------------------------------------------------


def init_params(rng, cfg: LSTRConfig) -> Params:
    ks = iter(jax.random.split(rng, 32))
    din = cfg.visual_size + cfg.motion_size
    p: Params = {
        "feature_head_long": _dense_init(next(ks), din, cfg.d_model),
        "feature_head_work": _dense_init(next(ks), din, cfg.d_model),
        "enc_query_0": 0.02
        * jax.random.normal(next(ks), (cfg.enc_queries_0, cfg.d_model)),
        "enc_module_0": _decoder_init(next(ks), cfg, cfg.enc_layers_0),
        "enc_query_1": 0.02
        * jax.random.normal(next(ks), (cfg.enc_queries_1, cfg.d_model)),
        "enc_module_1": _decoder_init(next(ks), cfg, cfg.enc_layers_1),
        "dec_module": _decoder_init(next(ks), cfg, cfg.dec_layers),
        "classifier": _dense_init(next(ks), cfg.d_model, cfg.num_classes),
    }
    if cfg.future_num_samples > 0:
        p.update(
            {
                "gen_query": 0.02
                * jax.random.normal(next(ks), (cfg.gen_queries, cfg.d_model)),
                "gen_layer": _decoder_init(next(ks), cfg, cfg.gen_layers),
                "final_query": 0.02
                * jax.random.normal(next(ks), (cfg.fut_queries, cfg.d_model)),
                "work_fusions": [
                    _decoder_init(next(ks), cfg, 1) for _ in range(cfg.cci_times)
                ],
                "fut_fusions": [
                    _decoder_init(next(ks), cfg, 1)
                    for _ in range(cfg.cci_times - 1)
                ],
            }
        )
    return p


def _fuse_features(p, visual, motion):
    x = visual if motion is None else jnp.concatenate([visual, motion], -1)
    return jax.nn.relu(_dense(x, p))


def compress_long_memory(
    params: Params,
    cfg: LSTRConfig,
    long_visual: jnp.ndarray,  # (B, L_long, visual)
    long_motion: Optional[jnp.ndarray] = None,
    memory_mask: Optional[jnp.ndarray] = None,  # (B, L_long) True = valid
) -> jnp.ndarray:
    """Group-wise compression (lstr.py:167-180): split into ``groups``
    segments, cross-attend enc_query_0, average-pool each to one token; then
    enc_module_1 with enc_query_1 -> (B, enc_queries_1, D)."""
    b = long_visual.shape[0]
    mem = _fuse_features(params["feature_head_long"], long_visual, long_motion)
    g = cfg.groups
    lt = mem.shape[1] // g
    q0 = jnp.tile(params["enc_query_0"][None], (b, 1, 1))
    tokens = []
    for i in range(g):
        seg = mem[:, i * lt : (i + 1) * lt]
        kpm = (
            memory_mask[:, i * lt : (i + 1) * lt] if memory_mask is not None else None
        )
        out = _decoder(
            params["enc_module_0"], cfg, q0, seg, memory_key_padding_mask=kpm
        )  # (B, q0, D)
        tokens.append(out.mean(axis=1, keepdims=True))  # avg-pool to 1 token
    pooled = jnp.concatenate(tokens, axis=1)  # (B, groups, D)
    q1 = jnp.tile(params["enc_query_1"][None], (b, 1, 1))
    return _decoder(params["enc_module_1"], cfg, q1, pooled)


def forward(
    params: Params,
    cfg: LSTRConfig,
    visual: jnp.ndarray,  # (B, L_long + L_work, visual_size)
    motion: Optional[jnp.ndarray] = None,
    memory_mask: Optional[jnp.ndarray] = None,  # (B, L_long) True = valid
) -> Dict[str, jnp.ndarray]:
    """Returns per-token logits: work (+ anticipation) and optional future."""
    ln = cfg.long_memory_num_samples
    b = visual.shape[0]
    memory = compress_long_memory(
        params, cfg,
        visual[:, :ln], None if motion is None else motion[:, :ln],
        memory_mask,
    )

    work = _fuse_features(
        params["feature_head_work"],
        visual[:, ln:],
        None if motion is None else motion[:, ln:],
    )
    pe = _pos_encoding(cfg.d_model, cfg.max_pos)
    work = work + pe[: work.shape[1]][None]
    lw = work.shape[1]

    if cfg.anticipation_num_samples > 0 and cfg.future_num_samples > 0:
        ant = jnp.tile(
            params["final_query"][: cfg.anticipation_num_samples][None], (b, 1, 1)
        )
        ant = ant + pe[lw : lw + ant.shape[1]][None]
        work = jnp.concatenate([work, ant], axis=1)

    n = work.shape[1]
    mask = _causal_mask(n)
    output = _decoder(params["dec_module"], cfg, work, memory, tgt_mask=mask)

    result = {}
    if cfg.future_num_samples > 0:
        # CCI (lstr.py:122-147)
        his = jnp.concatenate([memory, output], axis=1)
        gq = jnp.tile(params["gen_query"][None], (b, 1, 1))
        future = _decoder(params["gen_layer"], cfg, gq, his)
        fq = jnp.tile(params["final_query"][None], (b, 1, 1))
        lm = memory.shape[1]
        for i in range(cfg.cci_times):
            total = jnp.concatenate([memory, output, future], axis=1)
            mm = jnp.concatenate(
                [
                    jnp.ones((n, lm), bool),
                    mask,
                    jnp.ones((n, future.shape[1]), bool),
                ],
                axis=1,
            )
            output = _declayer(
                params["work_fusions"][i]["layers"][0], cfg, output, total,
                tgt_mask=mask, memory_mask=mm,
            )
            output = _ln(output, params["work_fusions"][i]["norm"])
            total = jnp.concatenate([memory, output, future], axis=1)
            if i == 0:
                future = _decoder(params["fut_fusions"][i], cfg, fq, total)
            elif i != cfg.cci_times - 1:
                fmask = _causal_mask(future.shape[1])
                mm = jnp.concatenate(
                    [jnp.ones((future.shape[1], lm + n), bool), fmask], axis=1
                )
                future = _decoder(
                    params["fut_fusions"][i], cfg, future, total,
                    tgt_mask=fmask, memory_mask=mm,
                )
        result["future_logits"] = _dense(future, params["classifier"])

    result["logits"] = _dense(output, params["classifier"])  # (B, n, C)
    return result


# ---------------------------------------------------------------------------
# streaming inference (FIFO long memory, compressed reuse)
# ---------------------------------------------------------------------------


class LSTRStream:
    """Online per-frame inference (reference LSTRStream.stream_inference,
    lstr.py:255-354): FIFO long-memory feature cache; the compressed memory
    is recomputed only when a new long-memory frame enters (every
    ``long_sample_rate`` steps), otherwise reused."""

    def __init__(self, params, cfg: LSTRConfig, long_sample_rate: int = 4):
        self.params = params
        self.cfg = cfg
        self.long_sample_rate = long_sample_rate
        din = cfg.visual_size + cfg.motion_size
        self._long = np.zeros((cfg.long_memory_num_samples, din), np.float32)
        self._long_valid = np.zeros((cfg.long_memory_num_samples,), bool)
        self._work: List[np.ndarray] = []
        self._compressed = None
        self._steps = 0
        self._compress = jax.jit(
            lambda p, lv, mask: compress_long_memory(
                p, cfg, lv[None, :, : cfg.visual_size],
                lv[None, :, cfg.visual_size :] if cfg.motion_size else None,
                mask[None],
            )
        )

    def step(self, feature: np.ndarray) -> np.ndarray:
        """feature: (visual_size + motion_size,) for the new frame; returns
        (num_classes,) logits for the newest work token."""
        cfg = self.cfg
        self._work.append(feature)
        if len(self._work) > cfg.work_memory_num_samples:
            # oldest work frame graduates into long memory every
            # long_sample_rate steps (FIFO drop otherwise)
            graduated = self._work.pop(0)
            if self._steps % self.long_sample_rate == 0:
                self._long = np.roll(self._long, -1, axis=0)
                self._long[-1] = graduated
                self._long_valid = np.roll(self._long_valid, -1)
                self._long_valid[-1] = True
                self._compressed = None  # invalidate
        self._steps += 1

        if self._compressed is None:
            self._compressed = self._compress(
                self.params, jnp.asarray(self._long), jnp.asarray(self._long_valid)
            )

        work = np.stack(self._work)
        lw = work.shape[0]
        pad = cfg.work_memory_num_samples - lw
        if pad:
            work = np.concatenate([np.zeros((pad, work.shape[1]), np.float32), work])
        wv = jnp.asarray(work)[None]
        p = self.params
        w = _fuse_features(
            p["feature_head_work"],
            wv[..., : cfg.visual_size],
            wv[..., cfg.visual_size :] if cfg.motion_size else None,
        )
        w = w + _pos_encoding(cfg.d_model, cfg.max_pos)[: w.shape[1]][None]
        mask = _causal_mask(w.shape[1])
        out = _decoder(p["dec_module"], cfg, w, self._compressed, tgt_mask=mask)
        logits = _dense(out, p["classifier"])
        return np.asarray(logits[0, -1])
