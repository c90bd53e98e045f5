"""StreamFormer TPU-native encoder core.

A functional (pure-pytree) re-design of the reference TimeSformer-SigLIP
backbone (reference: models/modeling_timesformer_siglip.py). One model core
serves both full-clip and streaming paths — the reference maintained a forked
copy for KV-caching (downstream/VideoQA/.../timesformer_encoder.py); here the
temporal attention takes an optional fixed-shape cache so XLA compiles a
single static program per shape bucket.

Layout: internally everything is ``(B, T, N, D)`` (batch, frames, patches,
hidden). The reference's packed ``(B, N*T, D)`` layout (n-major,
modeling_timesformer_siglip.py:452-457) only exists at its API boundary; all
compute is positionwise or one of two attention flattenings:

* temporal attention: over ``T``, batched over ``(B, N)``
  (reference ``(B*N, T, D)``, modeling_timesformer_siglip.py:938-941)
* spatial attention:  over ``N``, batched over ``(B, T)``
  (reference ``(B*T, N, D)``, modeling_timesformer_siglip.py:962-971)

so ``(B, T, N, D)`` reproduces the math exactly while letting ``pjit`` shard
``B`` (data) and ``N`` (sequence/patches — temporal attention has no
cross-patch interaction, SURVEY §5.7).

Parameters are stored float32 in nested dicts with ``kernel`` of shape
``(in, out)`` (JAX convention; transpose of torch ``weight``); compute happens
in ``cfg.dtype`` with attention softmax in float32.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from streamformer_tpu.config import StreamformerConfig

Params = Dict[str, Any]


# --------------------------------------------------------------------------
# Small building blocks
# --------------------------------------------------------------------------


def resolved_precision(cfg: StreamformerConfig) -> str:
    """Matmul precision: exact fp32 for parity runs, MXU-native for bf16."""
    if cfg.matmul_precision is not None:
        return cfg.matmul_precision
    return "highest" if cfg.dtype == "float32" else "default"


def _precise(fn):
    """Run ``fn`` under the config's matmul precision.

    XLA's fast conv/dot paths (oneDNN on CPU, bf16 passes on TPU) cost ~1e-2
    absolute error at fp32 — parity runs need "highest".
    """

    @functools.wraps(fn)
    def inner(*args, **kw):
        cfg = kw.get("cfg")
        if cfg is None:
            cfg = next(a for a in args if isinstance(a, StreamformerConfig))
        with jax.default_matmul_precision(resolved_precision(cfg)):
            return fn(*args, **kw)

    return inner


def _trunc_normal(rng, shape, std=0.02, dtype=jnp.float32):
    # matches torch nn.init.trunc_normal_(std=std) with bounds at 2*std
    return std * jax.random.truncated_normal(rng, -2.0, 2.0, shape, dtype)


def layer_norm(x: jnp.ndarray, p: Params, eps: float) -> jnp.ndarray:
    """LayerNorm over the last axis, computed in float32 for stability."""
    dt = x.dtype
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mean), axis=-1, keepdims=True)
    y = (x32 - mean) * jax.lax.rsqrt(var + eps)
    return (y * p["scale"] + p["bias"]).astype(dt)


def dense(x: jnp.ndarray, p: Params) -> jnp.ndarray:
    """Affine map with optional fused LoRA delta.

    LoRA follows the reference convention ``y = W x + B(A x)`` with no extra
    scaling (modeling_timesformer_siglip.py:536-541): ``lora_a`` is
    (in, r) normal(0, 0.02)-init, ``lora_b`` is (r, out) zero-init.

    Int8 serving: trees produced by ``ops.quant.quantize_encoder_params``
    carry ``kernel_q``/``kernel_scale`` instead of ``kernel`` and route to
    the s8s8s32 MXU path (2x bf16 peak on v5e).
    """
    if "kernel_q" in p:
        from streamformer_tpu.ops import quant

        return quant.int8_dense(x, p)
    y = x @ p["kernel"].astype(x.dtype)
    if "bias" in p and p["bias"] is not None:
        y = y + p["bias"].astype(x.dtype)
    if "lora_a" in p:
        y = y + (x @ p["lora_a"].astype(x.dtype)) @ p["lora_b"].astype(x.dtype)
    return y


def quantize_kv(x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Symmetric int8 quantization over the head dim.

    x: (..., dh) -> (int8 values (..., dh), float32 scales (...,)). Per-row
    absmax scaling keeps attention-output cosine > 0.999 while halving the
    KV cache's HBM footprint/traffic vs bf16 (the streaming decode is
    bandwidth-bound — SURVEY §7 hard part 3)."""
    ax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1)
    scale = jnp.maximum(ax, 1e-8) / 127.0
    q = jnp.clip(jnp.round(x.astype(jnp.float32) / scale[..., None]), -127, 127)
    return q.astype(jnp.int8), scale


def dequantize_kv(q: jnp.ndarray, scale: jnp.ndarray, dtype) -> jnp.ndarray:
    return (q.astype(jnp.float32) * scale[..., None]).astype(dtype)


def act_fn(x: jnp.ndarray, name: str = "gelu") -> jnp.ndarray:
    """HF ACT2FN subset: "gelu" is the exact erf GELU (the reference default,
    configuration_streamformer.py:101), "gelu_pytorch_tanh"/"gelu_new" the
    tanh approximation (SigLIP's native act)."""
    if name in ("gelu_pytorch_tanh", "gelu_new", "gelu_fast"):
        return jax.nn.gelu(x, approximate=True)
    if name == "relu":
        return jax.nn.relu(x)
    return jax.nn.gelu(x, approximate=False)


def gelu(x: jnp.ndarray) -> jnp.ndarray:
    """erf GELU (the reference MLP act), tanh-approximated under bf16.

    The erf costs ~42 us/layer of VPU time on the (B·N, 4D) intermediate
    (measured: 130 -> 88 us per MLP at B=8); max |erf - tanh| ~ 3e-3 sits
    below bf16 resolution at the same magnitudes, so bf16 compute keeps the
    fast form while fp32 (parity) runs stay exact.
    """
    return jax.nn.gelu(x, approximate=x.dtype == jnp.bfloat16)


def dropout(x, rate, rng, deterministic):
    if deterministic or rate == 0.0:
        return x
    keep = jax.random.bernoulli(rng, 1.0 - rate, x.shape)
    return jnp.where(keep, x / (1.0 - rate), 0.0).astype(x.dtype)


def drop_path(x, rate, rng, deterministic):
    """Stochastic depth on the leading (batch) axis.

    Reference: modeling_timesformer_siglip.py:461-484 (per-sample Bernoulli,
    scaled by keep prob). ``rate`` may be a traced scalar (the pipeline
    trunk scans layers with a stacked per-layer rate array); the ``== 0.0``
    shortcut only applies to concrete Python floats.
    """
    if deterministic or (isinstance(rate, float) and rate == 0.0):
        return x
    shape = (x.shape[0],) + (1,) * (x.ndim - 1)
    keep = jax.random.bernoulli(rng, 1.0 - rate, shape)
    return jnp.where(keep, x / (1.0 - rate), 0.0).astype(x.dtype)


# --------------------------------------------------------------------------
# Parameter initialization
# --------------------------------------------------------------------------


def _init_dense(rng, d_in, d_out, std=0.02, bias=True):
    p = {"kernel": _trunc_normal(rng, (d_in, d_out), std)}
    if bias:
        p["bias"] = jnp.zeros((d_out,), jnp.float32)
    return p


def _init_ln(d):
    return {"scale": jnp.ones((d,), jnp.float32), "bias": jnp.zeros((d,), jnp.float32)}


def init_layer_params(rng, cfg: StreamformerConfig) -> Params:
    d, m = cfg.hidden_size, cfg.intermediate_size
    ks = jax.random.split(rng, 8)
    p = {
        "layernorm_before": _init_ln(d),
        "layernorm_after": _init_ln(d),
        "attention": {
            "qkv": _init_dense(ks[0], d, 3 * d, bias=cfg.qkv_bias),
            "out": _init_dense(ks[1], d, d),
        },
        "mlp": {
            "fc1": _init_dense(ks[2], d, m),
            "fc2": _init_dense(ks[3], m, d),
        },
    }
    if cfg.attention_type == "divided_space_time":
        p.update(
            {
                "temporal_layernorm": _init_ln(d),
                "temporal_attention": {
                    "qkv": _init_dense(ks[4], d, 3 * d, bias=cfg.qkv_bias),
                    "out": _init_dense(ks[5], d, d),
                },
                "temporal_dense": _init_dense(ks[6], d, d),
                # zero-init tanh gate: SigLIP spatial weights start unperturbed
                # (reference modeling_timesformer_siglip.py:896)
                "temporal_attention_gating": jnp.zeros((), jnp.float32),
            }
        )
    return p


def init_params(rng, cfg: StreamformerConfig) -> Params:
    d = cfg.hidden_size
    ks = jax.random.split(rng, cfg.num_hidden_layers + 8)
    params = {
        "embeddings": {
            # HWIO conv kernel for NHWC input (torch OIHW transposed on import)
            "patch_proj": {
                "kernel": _trunc_normal(
                    ks[0], (cfg.patch_size, cfg.patch_size, cfg.num_channels, d)
                ),
                "bias": jnp.zeros((d,), jnp.float32),
            },
            "position_embeddings": jnp.zeros((cfg.num_patches, d), jnp.float32),
            "time_embeddings": jnp.zeros((cfg.num_frames, d), jnp.float32),
        },
        "layers": [
            init_layer_params(ks[1 + i], cfg) for i in range(cfg.num_hidden_layers)
        ],
        "post_layernorm": _init_ln(d),
        "map_head": {
            # reference head.probe ~ randn (modeling_timesformer_siglip.py:1133)
            # dedicated keys per tensor: reusing keys across q/fc1 etc. would
            # correlate from-scratch init (harmless after SigLIP import, but
            # wrong for scratch training)
            "probe": jax.random.normal(ks[-7], (d,), jnp.float32),
            "q": _init_dense(ks[-6], d, d),
            "k": _init_dense(ks[-5], d, d),
            "v": _init_dense(ks[-4], d, d),
            "out": _init_dense(ks[-3], d, d),
            "layernorm": _init_ln(d),
            "mlp": {
                "fc1": _init_dense(ks[-2], d, cfg.intermediate_size),
                "fc2": _init_dense(ks[-1], cfg.intermediate_size, d),
            },
        },
    }
    return params


# --------------------------------------------------------------------------
# Embeddings
# --------------------------------------------------------------------------


def interpolate_pos_embeddings(
    pos_emb: jnp.ndarray, h_patches: int, w_patches: int
) -> jnp.ndarray:
    """Bicubic resize of the (N, D) grid pos-emb for non-224 resolutions.

    Reference: modeling_timesformer_siglip.py:380-411 (F.interpolate bicubic,
    antialias). jax.image.resize('cubic') uses the same Keys kernel with
    anti-aliasing on downscale.
    """
    n, d = pos_emb.shape
    m = int(round(n**0.5))
    if (h_patches, w_patches) == (m, m):
        return pos_emb
    grid = pos_emb.reshape(m, m, d).astype(jnp.float32)
    out = jax.image.resize(grid, (h_patches, w_patches, d), method="cubic")
    return out.reshape(h_patches * w_patches, d).astype(pos_emb.dtype)


def time_embeddings_for_positions(
    time_emb: jnp.ndarray, start: jnp.ndarray, t_new: int, total: int
) -> jnp.ndarray:
    """Time embeddings for absolute frame positions [start, start+t_new).

    ``total`` (static) is the total sequence length after this step. When
    ``total`` exceeds the trained positions the table is nearest-interpolated
    to ``total`` then sliced — reference full-clip semantics
    (modeling_timesformer_siglip.py:434-451) and streaming semantics
    (timesformer_encoder.py:328-369). torch 'nearest' maps output index i to
    input index floor(i * T_trained / total).
    """
    t_trained = time_emb.shape[0]
    if total <= t_trained:
        table = time_emb
    else:
        idx = (jnp.arange(total) * t_trained) // total
        table = time_emb[idx]
    # start: () shared, or (B,) per-stream (ragged streaming) -> (B, t_new)
    start = jnp.asarray(start)
    pos = (start[:, None] if start.ndim == 1 else start) + jnp.arange(t_new)
    # clamp: positions beyond the (possibly interpolated) table reuse the
    # last embedding — out-of-bounds gathers would otherwise fill with NaN
    return jnp.take(table, pos, axis=0, mode="clip")


@_precise
def embed(
    params: Params,
    pixel_values: jnp.ndarray,
    cfg: StreamformerConfig,
    *,
    start_pos: jnp.ndarray | int = 0,
    total_frames: Optional[int] = None,
    rng=None,
    deterministic: bool = True,
) -> jnp.ndarray:
    """Patchify + positional + temporal embeddings.

    pixel_values: (B, T, C, H, W) float — same contract as the reference
    (modeling_timesformer_siglip.py:413-457). Returns (B, T, N, D).
    """
    b, t, c, h, w = pixel_values.shape
    dt = jnp.dtype(cfg.dtype)
    ps = cfg.patch_size
    hp, wp = h // ps, w // ps
    n = hp * wp
    x = pixel_values.astype(dt)
    # Patchify as a single MXU matmul: the stride-p pxp conv is exactly a
    # (C*p*p)->(D) projection of non-overlapping patches. Patch flattening
    # order (C, ph, pw) matches the torch conv weight layout.
    x = x.reshape(b * t, c, hp, ps, wp, ps)
    x = x.transpose(0, 2, 4, 1, 3, 5).reshape(b * t, n, c * ps * ps)
    kernel = params["embeddings"]["patch_proj"]["kernel"].astype(dt)  # HWIO
    wmat = kernel.transpose(2, 0, 1, 3).reshape(c * ps * ps, cfg.hidden_size)
    x = x @ wmat + params["embeddings"]["patch_proj"]["bias"].astype(dt)
    x = x.reshape(b, t, n, cfg.hidden_size)

    pos = interpolate_pos_embeddings(
        params["embeddings"]["position_embeddings"], hp, wp
    ).astype(dt)
    x = x + pos[None, None]
    if rng is not None and not deterministic:
        rng, sub = jax.random.split(rng)
        x = dropout(x, cfg.hidden_dropout_prob, sub, deterministic)

    if cfg.attention_type != "space_only":
        total = total_frames if total_frames is not None else t
        temb = time_embeddings_for_positions(
            params["embeddings"]["time_embeddings"], jnp.asarray(start_pos), t, total
        ).astype(dt)
        # (T, D) shared start, or (B, T, D) per-stream starts (ragged)
        x = x + (temb[None, :, None, :] if temb.ndim == 2
                 else temb[:, :, None, :])
        if rng is not None and not deterministic:
            rng, sub = jax.random.split(rng)
            x = dropout(x, cfg.hidden_dropout_prob, sub, deterministic)
    return x


# --------------------------------------------------------------------------
# Attention
# --------------------------------------------------------------------------


def _use_pallas(cfg: StreamformerConfig) -> bool:
    return cfg.use_pallas and jax.default_backend() == "tpu"


def _append_t_max() -> int:
    from streamformer_tpu.ops.attention import APPEND_T_MAX

    return APPEND_T_MAX


def auto_cache_mode(cfg: StreamformerConfig) -> str:
    """'ring' when the fused pos-major decode kernels serve the sliding
    window (TPU + pallas + pos_major layout), else 'linear' — the einsum
    fallback has no wrap-around decode, so off-kernel callers must size
    the capacity to the whole stream. Single home for the predicate shared
    by serving.StreamingEngine and extract.oad."""
    kernel = (
        _use_pallas(cfg) and cfg.use_pallas_streaming
        and cfg.cache_layout == "pos_major"
    )
    return "ring" if kernel else "linear"


def _qkv_heads(x_ln: jnp.ndarray, p: Params, num_heads: int):
    """Project to fused qkv and split into (q, k, v) with heads.

    Matches the reference fused-qkv layout: output dim ordered
    [q(D), k(D), v(D)], heads-major within each
    (modeling_timesformer_siglip.py:577-589).

    The split slices the flat lane dim at 128-aligned offsets (free on TPU)
    instead of materializing a (..., 3, H, dh) view, whose (3, dh<128)
    trailing tiles get physically padded ~2.7x (measured ~5% of the whole
    forward).
    """
    *lead, d = x_ln.shape
    qkv = dense(x_ln, p)  # (..., 3D)

    def heads(a):
        return a.reshape(*lead, num_heads, d // num_heads)

    return heads(qkv[..., :d]), heads(qkv[..., d : 2 * d]), heads(qkv[..., 2 * d :])


@_precise
def spatial_attention(
    x: jnp.ndarray, p: Params, cfg: StreamformerConfig
) -> jnp.ndarray:
    """Softmax attention over patches N, batched over (B, T).

    x: (B, T, N, D). Reference: TimesformerSelfAttention
    (modeling_timesformer_siglip.py:618-717) + output proj (:720-763).
    """
    b, t, n, d = x.shape
    h = cfg.num_attention_heads
    if _use_pallas(cfg) and cfg.use_pallas_spatial:
        # flat-D rows: heads are 64-lane slices inside the kernel; avoids
        # the tile-padded (..., H, dh) q/k/v the XLA path materializes
        from streamformer_tpu.ops import attention as pops

        qkv = dense(x, p["qkv"])  # (B, T, N, 3D)
        def rows(a):
            return a.reshape(b * t, n, d)

        ctx = pops.fused_spatial_flat(
            rows(qkv[..., :d]), rows(qkv[..., d : 2 * d]),
            rows(qkv[..., 2 * d :]), h,
        ).reshape(b, t, n, d)
        return dense(ctx, p["out"])

    scale = cfg.head_dim**-0.5
    q, k, v = _qkv_heads(x, p["qkv"], h)  # (B,T,N,H,dh)
    if x.dtype == jnp.bfloat16:
        # XLA's fused attention path: ~15% faster than the einsum formulation
        # on v5e; fp32 runs keep the einsum for exact parity
        fold = lambda a: a.reshape(b * t, n, h, cfg.head_dim)
        ctx = jax.nn.dot_product_attention(fold(q), fold(k), fold(v))
        ctx = ctx.reshape(b, t, n, d)
    else:
        scores = jnp.einsum(
            "btqhd,btkhd->bthqk", q, k, preferred_element_type=jnp.float32
        ) * scale
        probs = jax.nn.softmax(scores, axis=-1).astype(x.dtype)
        ctx = jnp.einsum("bthqk,btkhd->btqhd", probs, v)
        ctx = ctx.reshape(*x.shape)
    return dense(ctx, p["out"])


def _pm_kernel_dispatch(q_rows, kn, vn, cache, cache_len, cfg, h,
                        rows_per_stream=None):
    """Fused pos-major decode on flat-D rows: in-kernel plane append with
    the caches aliased in/out (a host-graph dus makes XLA relayout the big
    cache around the custom call — three full copies per layer, 2.9x step
    time; see ops/attention.py pm notes). Returns (ctx (R, D), cache).

    cache_len may be () (lockstep, (C, R, D) cache) or (B,) (ragged /
    continuous batching — same flat pos-major (C, R', D) layout with rows
    padded per stream, see init_cache(per_stream_len=True)); ragged needs
    rows_per_stream (= N). Both bf16/fp and int8 ragged caches run fused
    kernels; only multi-frame/non-causal shapes take the einsum paths."""
    from streamformer_tpu.ops import attention as pops

    r, d = q_rows.shape
    ragged = jnp.asarray(cache_len).ndim == 1
    quantized = "k_scale" in cache
    if ragged:
        n = rows_per_stream
        b = r // n
        n_pad = pops.ragged_row_pad(n, 32 if quantized else 8)

        def pad_rows(a, width=None):
            if n_pad == n:
                return a
            a = a.reshape((b, n) + a.shape[1:])
            pads = [(0, 0), (0, n_pad - n)] + [(0, 0)] * (a.ndim - 2)
            a = jnp.pad(a, pads)
            return a.reshape((b * n_pad,) + a.shape[2:])

        if quantized:
            knq, kns = quantize_kv(kn)  # per-row over D
            vnq, vns = quantize_kv(vn)
            ctx, k_out, v_out = pops.fused_temporal_decode_pm_int8_ragged(
                pad_rows(q_rows),
                pad_rows(knq), pad_rows(vnq),
                pad_rows(kns)[:, None], pad_rows(vns)[:, None],
                cache["k"], cache["v"],
                cache["k_scale"], cache["v_scale"],
                cache_len, n_pad,
                num_heads=h, out_dtype=q_rows.dtype,
            )
            cap = cache["k"].shape[0]
            # each stream's scale column lands at its own slot — B small
            # (n_pad, 1) dus's (the full-array one-hot select would read+
            # write the whole (R', C) scale array per layer)
            kns_p, vns_p = pad_rows(kns), pad_rows(vns)
            for key, s in (("k", kns_p), ("v", vns_p)):
                sc = cache[f"{key}_scale"]
                for bi in range(b):
                    sc = jax.lax.dynamic_update_slice(
                        sc,
                        jax.lax.dynamic_slice(
                            s, (bi * n_pad,), (n_pad,)
                        )[:, None],
                        (bi * n_pad, cache_len[bi] % cap),
                    )
                cache[f"{key}_scale"] = sc
        else:
            ctx, k_out, v_out = pops.fused_temporal_decode_pm_ragged(
                pad_rows(q_rows),
                pad_rows(kn.astype(cache["k"].dtype)),
                pad_rows(vn.astype(cache["v"].dtype)),
                cache["k"], cache["v"], cache_len, n_pad,
                num_heads=h, out_dtype=q_rows.dtype,
            )
        cache["k"] = k_out
        cache["v"] = v_out
        if n_pad != n:
            ctx = ctx.reshape(b, n_pad, d)[:, :n].reshape(r, d)
        return ctx, cache
    r_pad = cache["k"].shape[1]  # int8 rows padded to the 32-sublane tile
    if quantized:
        knq, kns = quantize_kv(kn)  # per-row over D
        vnq, vns = quantize_kv(vn)
        if r_pad != r:
            pad = [(0, r_pad - r), (0, 0)]
            q_rows = jnp.pad(q_rows, pad)
            knq = jnp.pad(knq, pad)
            vnq = jnp.pad(vnq, pad)
            kns = jnp.pad(kns, pad[:1])
            vns = jnp.pad(vns, pad[:1])
        ctx, k_out, v_out = pops.fused_temporal_decode_pm_int8(
            q_rows, knq, vnq, kns[:, None], vns[:, None],
            cache["k"], cache["v"],
            cache["k_scale"], cache["v_scale"],
            cache_len,
            num_heads=h,
            out_dtype=q_rows.dtype,
        )
        ctx = ctx[:r]
        cap = cache["k"].shape[0]
        for key, s in (("k", kns), ("v", vns)):
            # column cache_len mod C: identity for the linear cache,
            # wrap-around slot for the ring mode (matches the kernel's
            # plane write)
            cache[f"{key}_scale"] = jax.lax.dynamic_update_slice(
                cache[f"{key}_scale"], s[:, None], (0, cache_len % cap)
            )
    else:
        # no attend_cap bucketing needed: the kv index_map clamps block
        # reads to the valid prefix, so HBM traffic is O(cache_len)
        ctx, k_out, v_out = pops.fused_temporal_decode_pm(
            q_rows, kn.astype(cache["k"].dtype), vn.astype(cache["v"].dtype),
            cache["k"], cache["v"],
            cache_len,
            num_heads=h,
            out_dtype=q_rows.dtype,
        )
    cache["k"] = k_out
    cache["v"] = v_out
    return ctx, cache


def _ring_attend_pos_major(q, k, v, cache, cache_len, cfg, causal):
    """Ring (sliding-window) attention on the pos-major cache — einsum
    formulation for multi-frame appends / fp32 parity (the production t=1
    decode takes the fused-kernel path, whose slot-mod plane write and
    slot-exclusion mask implement the same window).

    Queries attend to the PRE-write cache plus the in-chunk keys: writing
    all T new frames before attention would evict up to T-1 old keys still
    inside the earliest queries' windows. Same mask math as the row-major
    ring branch; only the cache views/writes differ.
    """
    b, t, n, h, dh = q.shape
    d = h * dh
    cap = cache["k"].shape[0]
    r = b * n
    r_pad = cache["k"].shape[1]
    quantized = "k_scale" in cache
    if jnp.asarray(cache_len).ndim == 1:
        raise NotImplementedError(
            "ragged (per-stream) lengths reach the ring cache only through "
            "the t=1 fused-kernel decode (whose slot-mod write/mask handles "
            "them); the multi-frame einsum ring append is lockstep-only"
        )

    def view(key):  # (B, N, C, H, dh) pre-write window view
        arr = cache[key][:, :r].transpose(1, 0, 2)  # (R, C, D)
        arr = arr.reshape(b, n, cap, h, dh)
        if quantized:
            sc = cache[f"{key}_scale"][:r].reshape(b, n, cap)
            return (arr.astype(jnp.float32) * sc[..., None, None]).astype(
                q.dtype
            )
        return arr.astype(q.dtype)

    scale = dh**-0.5
    scores_old = jnp.einsum(
        "bqnhd,bnkhd->bnhqk", q, view("k"), preferred_element_type=jnp.float32
    ) * scale
    scores_new = jnp.einsum(
        "bqnhd,bknhd->bnhqk", q, k, preferred_element_type=jnp.float32
    ) * scale
    qpos = cache_len + jax.lax.broadcasted_iota(jnp.int32, (t, cap), 0)
    # slot s holds the newest absolute position p ≡ s (mod cap) with
    # p < cache_len; unwritten slots give p < 0
    s_idx = jax.lax.broadcasted_iota(jnp.int32, (t, cap), 1)
    kpos_old = s_idx + cap * jnp.floor_divide(cache_len - 1 - s_idx, cap)
    if causal:
        ok_old = (kpos_old >= 0) & (kpos_old > qpos - cap)
    else:
        last = cache_len + t - 1
        ok_old = (kpos_old >= 0) & (kpos_old > last - cap)
    ii = jax.lax.broadcasted_iota(jnp.int32, (t, t), 0)
    jj = jax.lax.broadcasted_iota(jnp.int32, (t, t), 1)
    # in-chunk keys need the same sliding-window lower bound as the cache
    # keys: when t > cap, query i must not see in-chunk keys older than its
    # cap-length window (key j's position is cache_len + j)
    if causal:
        ok_new = (jj <= ii) & (jj > ii - cap)
    else:
        ok_new = jj > (t - 1 - cap) if t > cap else jnp.ones((t, t), bool)
    scores = jnp.concatenate(
        [
            jnp.where(ok_old[None, None, None], scores_old, -jnp.inf),
            jnp.where(ok_new[None, None, None], scores_new, -jnp.inf),
        ],
        axis=-1,
    )
    probs = jax.nn.softmax(scores, axis=-1).astype(q.dtype)
    vals = jnp.concatenate(
        [view("v").transpose(0, 2, 1, 3, 4), v], axis=1
    )
    ctx = jnp.einsum("bnhqk,bknhd->bqnhd", probs, vals).reshape(b, t, n, d)

    # wrap-around write AFTER attention: slot = position mod capacity.
    # Only the last min(t, cap) frames survive a t > cap append — writing
    # all t would scatter duplicate slot indices (undefined winner).
    keep = min(t, cap)
    slots = (cache_len + jnp.arange(t)[t - keep:]) % cap
    k_p = k[:, t - keep:].transpose(1, 0, 2, 3, 4).reshape(keep, r, d)
    v_p = v[:, t - keep:].transpose(1, 0, 2, 3, 4).reshape(keep, r, d)
    for key, val in (("k", k_p), ("v", v_p)):
        if quantized:
            qv, s = quantize_kv(val)  # per-(t, row) over D
            if r_pad != r:
                qv = jnp.pad(qv, [(0, 0), (0, r_pad - r), (0, 0)])
                s = jnp.pad(s, [(0, 0), (0, r_pad - r)])
            cache[key] = cache[key].at[slots].set(qv)
            cache[f"{key}_scale"] = cache[f"{key}_scale"].at[:, slots].set(s.T)
        else:
            cache[key] = cache[key].at[slots].set(
                val.astype(cache[key].dtype)
            )
    return ctx, cache


def _streaming_attend_pos_major(q, k, v, cache, cache_len, cfg, causal,
                                attend_cap, new_valid=None):
    """Streaming temporal attention on the pos-major (C, B·N, D) cache —
    einsum formulation (fp32 parity, multi-frame appends, non-causal; the
    production t=1 decode takes the flat-D fused-kernel path in
    ``temporal_attention`` and never reaches here). Returns (ctx, cache)
    with ctx (B, T, N, D); the caller applies the output projection.

    int8 caches store per-(pos, patch-row) absmax scales in a row-major
    (R, C) array; dequant happens on the read view here (the kernel path
    folds it post-reduction).
    """
    b, t, n, h, dh = q.shape
    d = h * dh
    quantized = "k_scale" in cache
    r = b * n
    ragged = jnp.asarray(cache_len).ndim == 1  # per-stream (B,) lengths
    cap = cache["k"].shape[0]

    # (kernel dispatch for t==1 causal decode lives in ``temporal_attention``
    # — by construction this function is only reached when that condition
    # failed, so no re-check here)
    if ragged:
        return _ragged_attend_einsum(
            q, k, v, cache, cache_len, cfg, causal, attend_cap,
            new_valid=new_valid,
        )
    assert new_valid is None, (
        "new_valid (per-stream partial appends) needs a ragged "
        "per_stream_len cache"
    )

    # einsum fallback (fp32 parity, multi-frame appends, non-causal):
    # host-graph plane dus — contiguous, but XLA may relayout-copy the cache
    # around consumers; the kernel path above is the production decode
    # int8 caches are row-padded to the 32-sublane tile (init_cache)
    r_pad = cache["k"].shape[1]
    k_p = k.transpose(1, 0, 2, 3, 4).reshape(t, r, d)
    v_p = v.transpose(1, 0, 2, 3, 4).reshape(t, r, d)
    if quantized:
        for key, val in (("k", k_p), ("v", v_p)):
            qv, s = quantize_kv(val)  # per-(t, row) over D
            if r_pad != r:
                qv = jnp.pad(qv, [(0, 0), (0, r_pad - r), (0, 0)])
                s = jnp.pad(s, [(0, 0), (0, r_pad - r)])
            cache[key] = jax.lax.dynamic_update_slice(
                cache[key], qv, (cache_len, 0, 0)
            )
            cache[f"{key}_scale"] = jax.lax.dynamic_update_slice(
                cache[f"{key}_scale"], s.T, (0, cache_len)  # (R, T)
            )
    else:
        for key, val in (("k", k_p), ("v", v_p)):
            cache[key] = jax.lax.dynamic_update_slice(
                cache[key], val.astype(cache[key].dtype), (cache_len, 0, 0)
            )

    att_cap = cap
    if attend_cap is not None and attend_cap < cap:
        att_cap = attend_cap

    def view(key):
        arr = cache[key][:att_cap, :r].reshape(att_cap, b, n, h, dh)
        if quantized:
            sc = cache[f"{key}_scale"][:r, :att_cap]  # (R, C')
            sc = sc.T.reshape(att_cap, b, n)  # (C', B, N)
            return (arr.astype(jnp.float32) * sc[..., None, None]).astype(
                q.dtype
            )
        return arr.astype(q.dtype)

    scores = jnp.einsum(
        "bqnhd,cbnhd->bnhqc", q, view("k"),
        preferred_element_type=jnp.float32,
    ) * (dh**-0.5)
    qpos = cache_len + jax.lax.broadcasted_iota(jnp.int32, (t, att_cap), 0)
    kpos = jax.lax.broadcasted_iota(jnp.int32, (t, att_cap), 1)
    mask = kpos <= qpos if causal else kpos < (cache_len + t)
    scores = jnp.where(mask[None, None, None], scores, -jnp.inf)
    probs = jax.nn.softmax(scores, axis=-1).astype(q.dtype)
    ctx = jnp.einsum("bnhqc,cbnhd->bqnhd", probs, view("v"))
    return ctx.reshape(b, t, n, d), cache


def _ragged_attend_einsum(q, k, v, cache, cache_len, cfg, causal,
                          attend_cap, new_valid=None):
    """Einsum path for ragged (per-stream length) streaming on the
    padded-flat pos-major cache ((C, B·n_pad, D), row-major (R', C) int8
    scales — see init_cache(per_stream_len=True)). Serves fp32 parity,
    multi-frame appends and non-causal shapes; the t=1 causal decode takes
    fused_temporal_decode_pm_ragged (bf16/fp) or
    fused_temporal_decode_pm_int8_ragged instead. Masks, appends and
    positions are all per-stream.

    ``new_valid`` (B,) int32 in [0, t] marks how many of the t new frames
    are real per stream (None = all t): frames ti >= new_valid[b] neither
    append nor advance anything — their query outputs are garbage the
    caller discards. This is what lets a multi-stream serving engine
    advance every slot by its OWN staged count inside ONE t=k dispatch
    (StreamingEngine throughput mode) instead of scanning k t=1 steps:
    the t=1 decode re-reads the FULL temporal KV cache per appended frame
    (~half its step time at the flagship config), while one t=k append
    reads it once — the HBM-bandwidth argument, see PERF.md."""
    from streamformer_tpu.ops.attention import ragged_row_pad

    b, t, n, h, dh = q.shape
    d = h * dh
    quantized = "k_scale" in cache
    cap = cache["k"].shape[0]
    n_pad = cache["k"].shape[1] // b
    assert n_pad == ragged_row_pad(n, 32 if quantized else 8)
    assert attend_cap is None, "attend_cap bucketing is lockstep-only"
    if new_valid is not None:
        assert causal, "new_valid (partial multi-frame appends) is causal-only"

    def pad_n(a):  # (B, T, N, ...) -> (B, T, n_pad, ...)
        if n_pad == n:
            return a
        pads = [(0, 0)] * a.ndim
        pads[2] = (0, n_pad - n)
        return jnp.pad(a, pads)

    # per-stream appends FIRST (the new frames must be attendable, like the
    # lockstep path's pre-attention dus): frame ti lands at slot len[b] + ti
    # for stream b's rows (linear contract: len + t <= cap). One masked
    # scatter of the (t, R') new rows — invalid frames (ti >= new_valid[b])
    # are routed out of bounds and dropped; traffic is O(t·R·D) written
    # rows, not the O(t·C·R·D) full-cache one-hot rewrite a where() costs.
    kp = pad_n(k).transpose(1, 0, 2, 3, 4).reshape(t, b * n_pad, d)
    vp = pad_n(v).transpose(1, 0, 2, 3, 4).reshape(t, b * n_pad, d)
    slot_rows = jnp.repeat(cache_len, n_pad)  # (R,)
    r_ = b * n_pad
    pos = slot_rows[None, :] + jax.lax.broadcasted_iota(
        jnp.int32, (t, r_), 0
    )  # (t, R') destination slots
    if new_valid is not None:
        ok = jax.lax.broadcasted_iota(jnp.int32, (t, r_), 0) < jnp.repeat(
            new_valid, n_pad
        )[None, :]
        pos = jnp.where(ok, pos, cap)  # out of bounds -> dropped
    rows = jax.lax.broadcasted_iota(jnp.int32, (t, r_), 1)
    for key, val in (("k", kp), ("v", vp)):
        if quantized:
            qv, s = quantize_kv(val)  # (t, R', D) int8, (t, R') scales
            cache[key] = cache[key].at[pos, rows].set(
                qv.astype(cache[key].dtype), mode="drop"
            )
            cache[f"{key}_scale"] = cache[f"{key}_scale"].at[rows, pos].set(
                s, mode="drop"
            )
        else:
            cache[key] = cache[key].at[pos, rows].set(
                val.astype(cache[key].dtype), mode="drop"
            )

    def view(key):  # (C, B, N, H, dh) — padded rows sliced off
        arr = cache[key].reshape(cap, b, n_pad, h, dh)[:, :, :n]
        if quantized:
            sc = cache[f"{key}_scale"].T.reshape(cap, b, n_pad)[:, :, :n]
            return (arr.astype(jnp.float32) * sc[..., None, None]).astype(
                q.dtype
            )
        return arr.astype(q.dtype)

    scores = jnp.einsum(
        "bqnhd,cbnhd->bnhqc", q, view("k"),
        preferred_element_type=jnp.float32,
    ) * (dh**-0.5)
    qt_i = jax.lax.broadcasted_iota(jnp.int32, (t, cap), 0)
    kpos = jax.lax.broadcasted_iota(jnp.int32, (t, cap), 1)
    qpos = cache_len[:, None, None] + qt_i[None]  # (B, t, C)
    mask = (kpos[None] <= qpos if causal
            else kpos[None] < (cache_len[:, None, None] + t))
    scores = jnp.where(mask[:, None, None], scores, -jnp.inf)
    probs = jax.nn.softmax(scores, axis=-1).astype(q.dtype)
    ctx = jnp.einsum("bnhqc,cbnhd->bqnhd", probs, view("v"))
    return ctx.reshape(b, t, n, d), cache


@_precise
def temporal_attention(
    x: jnp.ndarray,
    p: Params,
    cfg: StreamformerConfig,
    *,
    causal: bool,
    cache_kv: Optional[Dict[str, jnp.ndarray]] = None,
    cache_len: Optional[jnp.ndarray] = None,
    attend_cap: Optional[int] = None,
    new_valid: Optional[jnp.ndarray] = None,
) -> jnp.ndarray | Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Attention over frames T, batched over (B, N), with optional KV cache.

    x: (B, T, N, D).

    Full-clip (cache_kv=None): lower-triangular causal mask when ``causal``
    (reference TimesformerCausalSelfAttention,
    modeling_timesformer_siglip.py:593-601).

    Streaming (cache_kv={"k","v"[,"k_scale","v_scale"]}): the new frames'
    K/V are written at positions [cache_len, cache_len+T) and query row i
    attends to absolute positions <= cache_len + i (reference streaming
    mask, timesformer_encoder.py:522-546). Returns (out, new_cache_kv);
    fixed capacity keeps shapes static for XLA. Cache layout per
    cfg.cache_layout: pos-major (C, B·N, D) flat leaves (the default — see
    init_cache and the ops/attention.py pm notes) or row-major
    (B, N, C, D); the ring mode wraps writes at slot (pos mod C) for a
    sliding window over the last C frames.
    """
    b, t, n, d = x.shape
    h = cfg.num_attention_heads

    if (
        cache_kv is None
        and causal
        and t <= 32
        and _use_pallas(cfg)
        and cfg.use_pallas_streaming
    ):
        # fused full-clip temporal attention: flat-D rows, no (H, dh)
        # tile-padded intermediates (ops/attention.py design notes);
        # 16-frame causal attention is tiny-matmul-bound for XLA (~3 TFLOP/s)
        from streamformer_tpu.ops import attention as pops

        qkv = dense(x, p["qkv"])  # (B, T, N, 3D), lane-aligned slices
        def rows(a):
            return a.transpose(0, 2, 1, 3).reshape(b * n, t, d)

        ctx = pops.fused_temporal_fullclip(
            rows(qkv[..., :d]), rows(qkv[..., d : 2 * d]),
            rows(qkv[..., 2 * d :]), h,
        )
        ctx = ctx.reshape(b, n, t, d).transpose(0, 2, 1, 3)
        return dense(ctx, p["out"])

    _ragged = cache_len is not None and jnp.asarray(cache_len).ndim == 1
    if (
        cache_kv is not None
        and cfg.cache_layout == "pos_major"
        and t == 1
        and causal
        and new_valid is None  # partial appends take the einsum path
        and _use_pallas(cfg)
        and cfg.use_pallas_streaming
    ):
        # serves BOTH cache modes: the kernels' plane write lands at slot
        # (len mod C) and the slot-exclusion mask turns the same program
        # into a sliding window when cfg.cache_mode == "ring"
        # production streaming decode: flat-D lane slices of the fused qkv —
        # the (B,T,N,H,dh) head split the generic path builds costs ~2.7x
        # tile-padded materializations plus a relayout back to flat rows
        cache = dict(cache_kv)
        d_ = d
        qkv = dense(x, p["qkv"])  # (B, 1, N, 3D)
        r = b * n
        ctx, cache = _pm_kernel_dispatch(
            qkv[..., :d_].reshape(r, d_),
            qkv[..., d_ : 2 * d_].reshape(r, d_),
            qkv[..., 2 * d_ :].reshape(r, d_),
            cache, cache_len, cfg, h,
            rows_per_stream=n if _ragged else None,
        )
        return dense(ctx.reshape(b, 1, n, d_), p["out"]), cache

    if (
        cache_kv is not None
        and cfg.cache_layout == "pos_major"
        and cfg.cache_mode != "ring"
        and _ragged
        # t past APPEND_T_MAX blows the kernel's VMEM budget at flagship
        # row blocks (t-scaled q/kn/vn/acc buffers); the engine chunks
        # bigger ticks into kernel-sized appends inside one dispatch
        # (serving._step_for)
        and 2 <= t <= _append_t_max()
        and causal
        and "k_scale" not in cache_kv
        and attend_cap is None
        and _use_pallas(cfg)
        and cfg.use_pallas_streaming
    ):
        # throughput-mode multi-frame append: ONE kernel pass appends each
        # stream's first new_valid[b] of the t new frames and answers all
        # t queries per cache read — the t=1 decode re-reads the full
        # temporal KV cache per frame (~half its step time at the flagship
        # config), so a scan of k t=1 steps pays that k times
        # (ops/attention.fused_temporal_append_pm_ragged; einsum oracle:
        # _ragged_attend_einsum with new_valid)
        from streamformer_tpu.ops import attention as pops

        cache = dict(cache_kv)
        n_pad = pops.ragged_row_pad(n, 8)
        qkv = dense(x, p["qkv"])  # (B, T, N, 3D)

        def rows(a):  # (B, T, N, D) -> (T, B*n_pad, D)
            if n_pad != n:
                a = jnp.pad(a, ((0, 0), (0, 0), (0, n_pad - n), (0, 0)))
            return a.transpose(1, 0, 2, 3).reshape(t, b * n_pad, d)

        valid = (jnp.full((b,), t, jnp.int32) if new_valid is None
                 else jnp.asarray(new_valid, jnp.int32))
        ctx, cache["k"], cache["v"] = pops.fused_temporal_append_pm_ragged(
            rows(qkv[..., :d]),
            rows(qkv[..., d : 2 * d]),
            rows(qkv[..., 2 * d :]),
            cache["k"], cache["v"], cache_len, valid, n_pad,
            num_heads=h,
        )
        ctx = ctx.reshape(t, b, n_pad, d)[:, :, :n].transpose(1, 0, 2, 3)
        return dense(ctx, p["out"]), cache

    scale = cfg.head_dim**-0.5
    q, k, v = _qkv_heads(x, p["qkv"], h)  # (B,T,N,H,dh)

    if cache_kv is None:
        if x.dtype == jnp.bfloat16:
            fold = lambda a: a.transpose(0, 2, 1, 3, 4).reshape(
                b * n, t, h, cfg.head_dim
            )
            ctx = jax.nn.dot_product_attention(
                fold(q), fold(k), fold(v), is_causal=causal
            )
            ctx = ctx.reshape(b, n, t, d).transpose(0, 2, 1, 3)
        else:
            scores = jnp.einsum(
                "bqnhd,bknhd->bnhqk", q, k, preferred_element_type=jnp.float32
            ) * scale
            if causal:
                mask = jnp.tril(jnp.ones((t, t), bool))
                scores = jnp.where(mask[None, None, None], scores, -jnp.inf)
            probs = jax.nn.softmax(scores, axis=-1).astype(x.dtype)
            ctx = jnp.einsum("bnhqk,bknhd->bqnhd", probs, v).reshape(b, t, n, d)
        return dense(ctx, p["out"])

    cache = dict(cache_kv)
    if cfg.cache_layout == "pos_major":
        if cfg.cache_mode == "ring":
            assert new_valid is None, (
                "new_valid holds are illegal in ring mode (a wrap-around "
                "dummy write would evict in-window history)"
            )
            ctx, cache = _ring_attend_pos_major(
                q, k, v, cache, cache_len, cfg, causal
            )
        else:
            ctx, cache = _streaming_attend_pos_major(
                q, k, v, cache, cache_len, cfg, causal, attend_cap,
                new_valid=new_valid,
            )
        return dense(ctx, p["out"]), cache
    assert new_valid is None, (
        "new_valid (per-stream partial appends) is a pos_major feature"
    )
    if _ragged:
        raise NotImplementedError(
            "ragged (per-stream) lengths are a pos_major-layout feature; "
            "the row-major compatibility layout is lockstep-only"
        )
    quantized = "k_scale" in cache
    cap = cache["k"].shape[2]
    dh = cfg.head_dim
    # new-frame K/V in cache layout: (B, T, N, H, dh) -> (B, N, T, H, dh);
    # the cache stores the flat-D form (B, N, C, D) — its physical TPU
    # layout equals row-major (D = k*128 lanes), so the decode kernel's
    # custom call takes it without a relayout copy (the 5-D (..., 12, 64)
    # form gets tile-padded and cost ~0.5 ms/layer in relayouts)
    k_c = k.transpose(0, 2, 1, 3, 4)
    v_c = v.transpose(0, 2, 1, 3, 4)

    def write(key, val, pos_slots=None):
        """Write new rows ((B,N,T',H,dh)) into cache[key] (+ int8 quantize).
        T' may be < T when the ring mode drops frames already evicted."""
        t_w = val.shape[2]
        if quantized:
            qv, s = quantize_kv(val)
            qv = qv.reshape(b, n, t_w, d)
            if pos_slots is None:
                cache[key] = jax.lax.dynamic_update_slice(
                    cache[key], qv, (0, 0, cache_len, 0)
                )
                cache[f"{key}_scale"] = jax.lax.dynamic_update_slice(
                    cache[f"{key}_scale"], s, (0, 0, cache_len, 0)
                )
            else:
                cache[key] = cache[key].at[:, :, pos_slots].set(qv)
                cache[f"{key}_scale"] = cache[f"{key}_scale"].at[
                    :, :, pos_slots
                ].set(s)
        else:
            val = val.astype(cache[key].dtype).reshape(b, n, t_w, d)
            if pos_slots is None:
                cache[key] = jax.lax.dynamic_update_slice(
                    cache[key], val, (0, 0, cache_len, 0)
                )
            else:
                cache[key] = cache[key].at[:, :, pos_slots].set(val)

    def full_kv(key, cap_limit=None):
        """(B, N, C', H, dh) dequantized view for the einsum path."""
        arr = cache[key]
        sl = arr[:, :, :cap_limit] if cap_limit else arr
        c_eff = sl.shape[2]
        sl = sl.reshape(b, n, c_eff, h, dh)
        if quantized:
            sc = cache[f"{key}_scale"]
            sc = sc[:, :, :cap_limit] if cap_limit else sc
            return dequantize_kv(sl, sc, q.dtype)
        return sl.astype(q.dtype)

    if cfg.cache_mode == "ring":
        # Sliding-window attention with wrap-around eviction. Queries attend
        # to the PRE-write cache plus the in-chunk keys: writing all T new
        # frames before attention would evict up to T-1 old keys still
        # inside the earliest queries' windows (each query i's window is the
        # cap positions ending at cache_len + i).
        scores_old = jnp.einsum(
            "bqnhd,bnkhd->bnhqk", q, full_kv("k"),
            preferred_element_type=jnp.float32,
        ) * scale
        scores_new = jnp.einsum(
            "bqnhd,bknhd->bnhqk", q, k,
            preferred_element_type=jnp.float32,
        ) * scale
        qpos = cache_len + jax.lax.broadcasted_iota(jnp.int32, (t, cap), 0)
        # slot s holds the newest absolute position p ≡ s (mod cap) with
        # p < cache_len; unwritten slots give p < 0
        s_idx = jax.lax.broadcasted_iota(jnp.int32, (t, cap), 1)
        kpos_old = s_idx + cap * jnp.floor_divide(cache_len - 1 - s_idx, cap)
        if causal:
            ok_old = (kpos_old >= 0) & (kpos_old > qpos - cap)
        else:
            last = cache_len + t - 1
            ok_old = (kpos_old >= 0) & (kpos_old > last - cap)
        ii = jax.lax.broadcasted_iota(jnp.int32, (t, t), 0)
        jj = jax.lax.broadcasted_iota(jnp.int32, (t, t), 1)
        # in-chunk keys carry the same window lower bound as the cache keys
        # (key j's position is cache_len + j) — matters when t > cap
        if causal:
            ok_new = (jj <= ii) & (jj > ii - cap)
        else:
            ok_new = (
                jj > (t - 1 - cap) if t > cap else jnp.ones((t, t), bool)
            )
        scores = jnp.concatenate(
            [
                jnp.where(ok_old[None, None, None], scores_old, -jnp.inf),
                jnp.where(ok_new[None, None, None], scores_new, -jnp.inf),
            ],
            axis=-1,
        )
        probs = jax.nn.softmax(scores, axis=-1).astype(x.dtype)
        vals = jnp.concatenate(
            [full_kv("v").astype(x.dtype).transpose(0, 2, 1, 3, 4), v], axis=1
        )
        ctx = jnp.einsum("bnhqk,bknhd->bqnhd", probs, vals).reshape(b, t, n, d)
        # wrap-around write AFTER attention: slot = position mod capacity;
        # keep only the last min(t, cap) frames (duplicate slots scatter
        # with an undefined winner when t > cap)
        keep = min(t, cap)
        slots = (cache_len + jnp.arange(t)[t - keep:]) % cap
        write("k", k_c[:, :, t - keep:], pos_slots=slots)
        write("v", v_c[:, :, t - keep:], pos_slots=slots)
        return dense(ctx, p["out"]), cache

    if (
        _use_pallas(cfg)
        and cfg.use_pallas_streaming
        and t == 1
        and causal
        and not quantized
        and cap % 8 == 0
    ):
        # Production decode path: the fused kernel appends the new frame's
        # K/V in-kernel (caches aliased in/out — a host-graph
        # dynamic_update_slice into the (B,N,C,D) layout makes XLA copy the
        # whole cache around the custom call) and its block index clamp
        # already bounds HBM reads to the valid prefix, so attend_cap
        # bucketing is unnecessary here.
        from streamformer_tpu.ops import attention as pops

        ctx, k_out, v_out = pops.fused_temporal_decode_inplace(
            q[:, 0].reshape(b * n, d),  # (R, D): (B,N,H,dh) is contiguous
            k_c.astype(cache["k"].dtype).reshape(b * n, d),
            v_c.astype(cache["v"].dtype).reshape(b * n, d),
            cache["k"].reshape(b * n, cap, d),
            cache["v"].reshape(b * n, cap, d),
            cache_len,
            num_heads=h,
            out_dtype=x.dtype,
        )
        cache["k"] = k_out.reshape(b, n, cap, d)
        cache["v"] = v_out.reshape(b, n, cap, d)
        ctx = ctx.reshape(b, 1, n, d)
        return dense(ctx, p["out"]), cache

    write("k", k_c)
    write("v", v_c)
    # capacity bucketing: attention reads only a static prefix of the cache
    # (callers pick the bucket >= cache_len + t host-side; one compiled
    # program per bucket). Cuts HBM traffic proportionally while the stream
    # is shorter than the full capacity.
    att_cap = cap
    if attend_cap is not None and attend_cap < cap:
        att_cap = attend_cap
    if (
        _use_pallas(cfg) and cfg.use_pallas_streaming and t == 1 and causal
        and quantized
    ):
        from streamformer_tpu.ops import attention as pops

        # int8 path: cache updated by the host graph, kernel fuses dequant
        ctx = pops.fused_temporal_decode(
            q[:, 0].reshape(b * n, d),
            cache["k"][:, :, :att_cap].reshape(b * n, att_cap, d),
            cache["v"][:, :, :att_cap].reshape(b * n, att_cap, d),
            cache["k_scale"][:, :, :att_cap].reshape(b * n, att_cap, h),
            cache["v_scale"][:, :, :att_cap].reshape(b * n, att_cap, h),
            cache_len,
            num_heads=h,
            out_dtype=x.dtype,
        ).reshape(b, 1, n, d)
    else:
        scores = jnp.einsum(
            "bqnhd,bnkhd->bnhqk",
            q,
            full_kv("k", att_cap),
            preferred_element_type=jnp.float32,
        ) * scale
        qpos = cache_len + jax.lax.broadcasted_iota(jnp.int32, (t, att_cap), 0)
        # query absolute position = cache_len + i; key position j valid
        # iff j <= cache_len + i (causal) and j < cache_len + t (written)
        kpos = jax.lax.broadcasted_iota(jnp.int32, (t, att_cap), 1)
        mask = kpos <= qpos if causal else kpos < (cache_len + t)
        scores = jnp.where(mask[None, None, None], scores, -jnp.inf)
        probs = jax.nn.softmax(scores, axis=-1).astype(x.dtype)
        ctx = jnp.einsum(
            "bnhqk,bnkhd->bqnhd", probs, full_kv("v", att_cap).astype(x.dtype)
        )
        ctx = ctx.reshape(b, t, n, d)
    return dense(ctx, p["out"]), cache


# --------------------------------------------------------------------------
# Transformer layer
# --------------------------------------------------------------------------


@_precise
def _maybe_shard_patches(x: jnp.ndarray, cfg: StreamformerConfig) -> jnp.ndarray:
    """Sequence-parallel constraint: (B, T, N, D) with B over "data" and the
    patch axis N over "model". Outside a mesh context this is a no-op."""
    if not cfg.shard_patches:
        return x
    try:
        from jax.sharding import PartitionSpec as P

        return jax.lax.with_sharding_constraint(
            x, P("data", None, "model", None)
        )
    except (ValueError, RuntimeError):
        return x


def layer_forward(
    p: Params,
    x: jnp.ndarray,
    cfg: StreamformerConfig,
    *,
    drop_path_rate: float = 0.0,
    cache_kv=None,
    cache_len=None,
    attend_cap=None,
    new_valid=None,
    rng=None,
    deterministic: bool = True,
):
    """One divided space-time block on (B, T, N, D).

    Reference: TimesformerLayerSigLIP.forward
    (modeling_timesformer_siglip.py:901-1004):
      1. temporal LN -> (causal) temporal attention -> out proj ->
         temporal_dense -> residual scaled by tanh(gate)
      2. LN -> spatial attention -> out proj -> residual
      3. LN -> MLP -> residual
    Returns (x, new_cache_kv) when streaming else x.
    """
    eps = cfg.layer_norm_eps
    x = _maybe_shard_patches(x, cfg)

    def dp(y, key):
        if rng is None or deterministic:
            return y
        if isinstance(drop_path_rate, float) and drop_path_rate == 0.0:
            return y
        return drop_path(y, drop_path_rate, jax.random.fold_in(rng, key), False)

    new_cache = None
    if cfg.attention_type == "divided_space_time":
        t_ln = layer_norm(x, p["temporal_layernorm"], eps)
        if cache_kv is not None:
            t_attn, new_cache = temporal_attention(
                t_ln,
                p["temporal_attention"],
                cfg,
                causal=cfg.enable_causal_temporal,
                cache_kv=cache_kv,
                cache_len=cache_len,
                attend_cap=attend_cap,
                new_valid=new_valid,
            )
        else:
            t_attn = temporal_attention(
                t_ln,
                p["temporal_attention"],
                cfg,
                causal=cfg.enable_causal_temporal,
            )
        t_res = dense(dp(t_attn, 0), p["temporal_dense"])
        gate = jnp.tanh(p["temporal_attention_gating"]).astype(x.dtype)
        x = x + gate * t_res

        s_ln = layer_norm(x, p["layernorm_before"], eps)
        s_attn = spatial_attention(s_ln, p["attention"], cfg)
        x = x + dp(s_attn, 1)
    else:  # space_only / joint_space_time: plain attention over the flattening
        s_ln = layer_norm(x, p["layernorm_before"], eps)
        if cfg.attention_type == "joint_space_time":
            b, t, n, d = x.shape
            flat = s_ln.reshape(b, 1, t * n, d)
            attn = spatial_attention(flat, p["attention"], cfg).reshape(b, t, n, d)
        else:
            attn = spatial_attention(s_ln, p["attention"], cfg)
        x = x + dp(attn, 1)

    m_ln = layer_norm(x, p["layernorm_after"], eps)
    m = dense(m_ln, p["mlp"]["fc1"])
    m = gelu(m)
    if rng is not None and not deterministic:
        m = dropout(
            m, cfg.hidden_dropout_prob, jax.random.fold_in(rng, 2), deterministic
        )
    m = dense(m, p["mlp"]["fc2"])
    if rng is not None and not deterministic:
        m = dropout(
            m, cfg.hidden_dropout_prob, jax.random.fold_in(rng, 3), deterministic
        )
    x = x + dp(m, 4)
    if cache_kv is not None:
        return x, new_cache
    return x


# --------------------------------------------------------------------------
# MAP pooling head
# --------------------------------------------------------------------------


@_precise
def map_pool(x: jnp.ndarray, p: Params, cfg: StreamformerConfig) -> jnp.ndarray:
    """SigLIP multihead-attention pooling of patch tokens, per frame.

    x: (B, T, N, D) -> (B, T, D). Reference:
    TimesformerSiglipMultiheadAttentionPoolingHead
    (modeling_timesformer_siglip.py:1128-1154): a learned probe attends over
    the N patch tokens (torch nn.MultiheadAttention semantics), then
    LN + MLP residual.
    """
    b, t, n, d = x.shape
    h = cfg.num_attention_heads
    dh = d // h
    scale = dh**-0.5
    probe = p["probe"].astype(x.dtype)  # (D,)
    q = dense(probe[None, :], p["q"])[0]
    q = q.reshape(h, dh)
    k = dense(x, p["k"]).reshape(b, t, n, h, dh)
    v = dense(x, p["v"]).reshape(b, t, n, h, dh)
    scores = jnp.einsum(
        "hd,btnhd->bthn", q, k, preferred_element_type=jnp.float32
    ) * scale
    probs = jax.nn.softmax(scores, axis=-1).astype(x.dtype)
    ctx = jnp.einsum("bthn,btnhd->bthd", probs, v).reshape(b, t, d)
    pooled = dense(ctx, p["out"])
    y = layer_norm(pooled, p["layernorm"], cfg.layer_norm_eps)
    y = dense(y, p["mlp"]["fc1"])
    y = act_fn(y, cfg.hidden_act)
    y = dense(y, p["mlp"]["fc2"])
    return pooled + y


# --------------------------------------------------------------------------
# Full model forward
# --------------------------------------------------------------------------


def _drop_path_rates(cfg: StreamformerConfig):
    l = cfg.num_hidden_layers
    if l == 1:
        return [0.0]
    return [cfg.drop_path_rate * i / (l - 1) for i in range(l)]


@_precise
def model_forward(
    params: Params,
    pixel_values: jnp.ndarray,
    cfg: StreamformerConfig,
    *,
    rng=None,
    deterministic: bool = True,
) -> Dict[str, jnp.ndarray]:
    """Full-clip forward.

    pixel_values: (B, T, C, H, W). Returns
    ``last_hidden_state`` (B, T, N, D) and ``pooler_output`` (B, T, D) —
    the published-checkpoint contract
    (TimesformerMultiTaskingModelSigLIP.forward,
    modeling_timesformer_siglip.py:1332-1354).
    """
    x = embed(params, pixel_values, cfg, rng=rng, deterministic=deterministic)
    rates = _drop_path_rates(cfg)

    def run_layer(x, i):
        lrng = None if rng is None else jax.random.fold_in(rng, 1000 + i)
        return layer_forward(
            params["layers"][i],
            x,
            cfg,
            drop_path_rate=rates[i],
            rng=lrng,
            deterministic=deterministic,
        )

    if cfg.remat == "layer":
        for i in range(cfg.num_hidden_layers):
            x = jax.checkpoint(functools.partial(run_layer, i=i))(x)
    else:
        for i in range(cfg.num_hidden_layers):
            x = run_layer(x, i)

    x = layer_norm(x, params["post_layernorm"], cfg.layer_norm_eps)
    pooled = map_pool(x, params["map_head"], cfg)
    return {"last_hidden_state": x, "pooler_output": pooled}


# --------------------------------------------------------------------------
# Streaming forward with fixed-capacity temporal KV cache
# --------------------------------------------------------------------------


def init_cache(
    cfg: StreamformerConfig,
    batch: int,
    num_patches: Optional[int] = None,
    capacity: Optional[int] = None,
    dtype=None,
    per_stream_len: bool = False,
) -> Params:
    """Preallocated temporal KV cache, one K/V pair per layer.

    ``per_stream_len=True`` makes ``cache["len"]`` a (batch,) vector so
    every stream in the batch advances independently (ragged streaming /
    continuous batching): one compiled step serves streams at mixed
    positions, and ``reset_streams`` re-admits a finished slot without
    recompiling or disturbing its neighbours. The reference has no analog —
    its HF DynamicCache advances all batch rows in lockstep
    (timesformer_encoder.py:517-546).

    Layout per cfg.cache_layout: "pos_major" (default) stores (C, B, N, D)
    so appends are contiguous plane updates (int8 scales per-(pos,row) in a
    (B, N, C) array); "row_major" stores (B, N, C, D) (int8 scales
    per-(pos,row,head), (B, N, C, H)) and is what the ring mode uses.

    The reference grows an HF DynamicCache unboundedly
    (timesformer_encoder.py:517-518); here capacity is static so the cache is
    HBM-resident with no reallocations and one compiled program serves every
    step.
    """
    n = num_patches if num_patches is not None else cfg.num_patches
    cap = capacity if capacity is not None else cfg.cache_capacity
    # precedence: explicit dtype arg > cfg.cache_dtype > cfg.dtype
    cache_dt = dtype if dtype is not None else (cfg.cache_dtype or cfg.dtype)
    h = cfg.num_attention_heads
    # pos-major serves both the linear and the ring (sliding-window) modes:
    # the fused kernel's plane write at slot (len mod C) plus the
    # slot-exclusion mask make the same kernel a sliding window
    pos_major = cfg.cache_layout == "pos_major"

    if per_stream_len:
        if not pos_major:
            raise NotImplementedError(
                "per-stream lengths are a pos_major-layout feature"
            )
        # Same flat pos-major (C, R, D) layout as lockstep (XLA keeps this
        # shape in the standard layout — see fused_temporal_decode_pm_ragged
        # notes), but rows are padded PER STREAM to a sublane multiple (8,
        # or 32 for int8 — the int8 tile granularity) so ragged kernel row
        # blocks never span two streams.
        from streamformer_tpu.ops.attention import ragged_row_pad

        n_pad = ragged_row_pad(n, 32 if str(cache_dt) == "int8" else 8)
        shape = (cap, batch * n_pad, cfg.hidden_size)

        def layer():
            if str(cache_dt) == "int8":
                return {
                    "k": jnp.zeros(shape, jnp.int8),
                    "v": jnp.zeros(shape, jnp.int8),
                    # per-(pos, row) scales, row-major (R', C) as lockstep
                    "k_scale": jnp.zeros((shape[1], cap), jnp.float32),
                    "v_scale": jnp.zeros((shape[1], cap), jnp.float32),
                }
            return {"k": jnp.zeros(shape, jnp.dtype(cache_dt)),
                    "v": jnp.zeros(shape, jnp.dtype(cache_dt))}

        return {
            "layers": [layer() for _ in range(cfg.num_hidden_layers)],
            "len": jnp.zeros((batch,), jnp.int32),
        }

    if pos_major:
        # position-major (C, B·N, D), flat 3-D ON PURPOSE: XLA gives the
        # equivalent 4-D (C, B, N, D) shape a permuted default layout
        # (major_to_minor (0,2,1,3)), which forces two full-cache relayout
        # copies per layer around the decode kernel (measured 2x step
        # time); the 3-D shape gets the standard layout the kernel pins.
        # The new frame's plane is appended IN-KERNEL (aliased in/out).
        r = batch * n
        if str(cache_dt) == "int8":
            # pad rows to the 32-sublane int8 tile so the fused kernel's
            # (CB, RB, D) blocks are legal at any batch; padded rows hold
            # zeros and are sliced off by every consumer
            r = -(-r // 32) * 32
        shape = (cap, r, cfg.hidden_size)

        def layer():
            if str(cache_dt) == "int8":
                return {
                    "k": jnp.zeros(shape, jnp.int8),
                    "v": jnp.zeros(shape, jnp.int8),
                    # per-(pos, patch-row) scales, row-major (R, C) so the
                    # kernel's (RB, C) tiles have lane dim == full C
                    "k_scale": jnp.zeros((r, cap), jnp.float32),
                    "v_scale": jnp.zeros((r, cap), jnp.float32),
                }
            dt = jnp.dtype(cache_dt)
            return {"k": jnp.zeros(shape, dt), "v": jnp.zeros(shape, dt)}
    else:
        # patch-row-major flat-D layout (B, N, C, D): each row's temporal
        # window is one contiguous DMA for the fused decode kernel, and
        # D = k*128 lanes keeps the physical TPU layout identical to
        # row-major so the kernel's custom call needs no relayout copy
        shape = (batch, n, cap, cfg.hidden_size)

        def layer():
            if str(cache_dt) == "int8":
                return {
                    "k": jnp.zeros(shape, jnp.int8),
                    "v": jnp.zeros(shape, jnp.int8),
                    "k_scale": jnp.zeros((batch, n, cap, h), jnp.float32),
                    "v_scale": jnp.zeros((batch, n, cap, h), jnp.float32),
                }
            dt = jnp.dtype(cache_dt)
            return {"k": jnp.zeros(shape, dt), "v": jnp.zeros(shape, dt)}

    # Per-layer leaves (not one stacked (L, ...) array): each leaf aliases its
    # donated input so the per-step HBM traffic is only the appended slice,
    # not a full-cache copy.
    return {
        "layers": [layer() for _ in range(cfg.num_hidden_layers)],
        "len": jnp.zeros((), jnp.int32),
    }


def reset_streams(cache: Params, done: jnp.ndarray) -> Params:
    """Re-admit finished stream slots in a per-stream-length cache.

    done: (B,) bool — True resets that stream's length to 0. Stale K/V
    content needs no clearing: every consumer masks positions >= len, so a
    reset slot starts attending only to frames appended after the reset.
    Jittable; use inside the serving loop to swap new streams into slots
    without touching the other streams or recompiling."""
    ln = cache["len"]
    assert ln.ndim == 1, "reset_streams needs init_cache(per_stream_len=True)"
    return {**cache, "len": jnp.where(done, 0, ln)}


@_precise
def streaming_forward(
    params: Params,
    pixel_values: jnp.ndarray,
    cache: Params,
    cfg: StreamformerConfig,
    *,
    total_frames_hint: Optional[int] = None,
    attend_capacity: Optional[int] = None,
    new_valid: Optional[jnp.ndarray] = None,
) -> Tuple[Dict[str, jnp.ndarray], Params]:
    """Append T new frames to the stream; returns (outputs, new_cache).

    Outputs cover only the new frames: ``last_hidden_state`` (B, T, N, D),
    ``pooler_output`` (B, T, D). Contract: for cache_len = s, the outputs
    equal the last T frames of a full-clip forward over all s+T frames
    (reference test_kvcache.py:55-88).

    Ragged / continuous batching: with ``init_cache(per_stream_len=True)``
    the cache's ``len`` is (B,) and each batch row advances independently —
    row b's outputs equal a lone stream at position len[b] (per-stream time
    embeddings, masks, appends). ``reset_streams`` re-admits finished
    slots. Pos-major layout only; t=1 causal decode runs the fused kernel
    (per-row-block lengths), other shapes the einsum path.

    ``total_frames_hint`` (static) is the sequence length used for
    time-embedding interpolation; by default the cache capacity governs —
    within trained positions (total <= num_frames trained) the table is
    indexed directly, matching the reference exactly.

    ``new_valid`` (B,) int32 in [0, T], ragged caches only: per-stream
    partial appends — stream b appends only its first new_valid[b] frames
    (its ``len`` advances by new_valid[b]); output columns past
    new_valid[b] are garbage the caller must discard. One t=k dispatch
    can then advance every serving slot by its OWN staged count
    (StreamingEngine.tick(frames=k)) while reading the temporal KV cache
    ONCE instead of k times (the t=1 decode is ~half cache-read-bound at
    the flagship config — PERF.md "Engine throughput mode").
    """
    b, t = pixel_values.shape[:2]
    cache_len = cache["len"]
    if new_valid is not None:
        assert jnp.asarray(cache_len).ndim == 1, (
            "new_valid (per-stream partial appends) needs "
            "init_cache(per_stream_len=True)"
        )
    total = total_frames_hint if total_frames_hint is not None else cfg.num_frames
    x = embed(
        params,
        pixel_values,
        cfg,
        start_pos=cache_len,
        total_frames=max(total, t),
    )
    new_layers = []
    for i in range(cfg.num_hidden_layers):
        x, new_cache_i = layer_forward(
            params["layers"][i],
            x,
            cfg,
            cache_kv=cache["layers"][i],
            cache_len=cache_len,
            attend_cap=attend_capacity,
            new_valid=new_valid,
        )
        new_layers.append(new_cache_i)
    x = layer_norm(x, params["post_layernorm"], cfg.layer_norm_eps)
    pooled = map_pool(x, params["map_head"], cfg)
    adv = t if new_valid is None else new_valid
    new_cache = {"layers": new_layers, "len": cache_len + adv}
    return {"last_hidden_state": x, "pooler_output": pooled}, new_cache
