"""Int8 weight + dynamic-activation quantization for the serving path.

The streaming encode step is MXU-compute-bound (bench.py: ~57 TFLOP/s bf16 of
the 197 TFLOP/s v5e bf16 peak); the v5e int8 MXU peak is 2x bf16, and a chained
microbenchmark of the step's dense shapes (1568x768 @ 768x3072 etc.) measures
int8-with-dynamic-activation-quant at 1.5x the bf16 wall clock. This module
provides:

* ``quantize_linear(p)``     — per-output-channel symmetric int8 weights
* ``int8_dense(x, p)``       — dynamic per-row activation quant + s8s8s32 dot
* ``quantize_encoder_params``— walk a backbone tree, quantizing every 2-D
                               dense kernel (patch-embed conv and embeddings
                               stay bf16/f32; LoRA deltas stay bf16)

This is a SERVING path: the int8 dot is not differentiable, the trainer never
produces quantized trees. Accuracy: per-row absmax activation scales plus
per-column weight scales keep encoder pooler-output cosine > 0.999 vs bf16
(tests/test_quant.py). The reference has no quantized inference at all
(SURVEY §6 — eager fp32/bf16 only), so this is capability beyond parity.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

Params = Dict[str, Any]

# dense kernels smaller than this many elements are left unquantized — the
# dynamic-quant overhead outweighs the MXU win for tiny matmuls
_MIN_KERNEL_ELEMENTS = 128 * 128


def quantize_linear(p: Params) -> Params:
    """{"kernel", "bias"?, "lora_*"?} -> int8 kernel + f32 per-column scales."""
    k = p["kernel"].astype(jnp.float32)
    scale = jnp.maximum(jnp.max(jnp.abs(k), axis=0), 1e-8) / 127.0  # (out,)
    q = jnp.clip(jnp.round(k / scale[None, :]), -127, 127).astype(jnp.int8)
    out = {"kernel_q": q, "kernel_scale": scale}
    for key in ("bias", "lora_a", "lora_b"):
        if key in p and p[key] is not None:
            out[key] = p[key]
    return out


def quantize_rows(x: jnp.ndarray):
    """Symmetric dynamic per-row int8: (R, K) -> (int8 (R, K), f32 (R,))."""
    x32 = x.astype(jnp.float32)
    ax = jnp.max(jnp.abs(x32), axis=-1)
    xs = jnp.maximum(ax, 1e-8) / 127.0
    xq = jnp.clip(jnp.round(x32 / xs[:, None]), -127, 127).astype(jnp.int8)
    return xq, xs


def int8_dense(x: jnp.ndarray, p: Params) -> jnp.ndarray:
    """y = x @ W + b with W int8 per-column and x dynamically int8 per row.

    The s8 x s8 -> s32 ``dot_general`` hits the MXU int8 path (2x bf16 peak
    on v5e); the f32 rescale fuses into the epilogue. LoRA deltas (if any)
    are applied in the activation dtype, unquantized, preserving the
    reference LoRA convention (modeling_timesformer_siglip.py:536-541).
    """
    *lead, kdim = x.shape
    x2 = x.reshape(-1, kdim)
    xq, xs = quantize_rows(x2)
    y = jax.lax.dot_general(
        xq,
        p["kernel_q"],
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    y = y.astype(jnp.float32) * xs[:, None] * p["kernel_scale"][None, :]
    y = y.astype(x.dtype).reshape(*lead, -1)
    if "bias" in p and p["bias"] is not None:
        y = y + p["bias"].astype(x.dtype)
    if "lora_a" in p:
        y = y + (x @ p["lora_a"].astype(x.dtype)) @ p["lora_b"].astype(x.dtype)
    return y


def quantize_kv4(x: jnp.ndarray) -> tuple:
    """Symmetric int4 quantization over the head dim, nibble-packed.

    x: (..., dh) -> (int8 packed (..., dh/2), float32 scales (...,)).
    Two 4-bit two's-complement values per byte (even head-dim index in the
    low nibble, odd in the high). Quarter the bf16 KV footprint — the
    capacity lever one step past int8 KV for long-context / high-occupancy
    LM serving on 16 GB chips (PERF.md "7B-class tower"). There is no int4
    MXU path on v5e; consumers dequantize to the compute dtype (the unpack
    is two shifts, fused by XLA into the attention reads), so this trades
    a little VPU work for 2x the slots x context of int8 at the same HBM.
    """
    dh = x.shape[-1]
    assert dh % 2 == 0, f"head_dim must be even to nibble-pack, got {dh}"
    ax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1)
    scale = jnp.maximum(ax, 1e-8) / 7.0
    q = jnp.clip(
        jnp.round(x.astype(jnp.float32) / scale[..., None]), -7, 7
    ).astype(jnp.int8)
    lo = jnp.bitwise_and(q[..., 0::2], jnp.int8(0x0F))
    hi = jnp.left_shift(q[..., 1::2], 4)
    return jnp.bitwise_or(hi, lo), scale


def dequantize_kv4(packed: jnp.ndarray, scale: jnp.ndarray, dtype) -> jnp.ndarray:
    """Inverse of :func:`quantize_kv4`: (..., dh/2) int8 + (...,) scales
    -> (..., dh) ``dtype``. Sign-extension via arithmetic shifts (numpy
    semantics: >> on int8 is arithmetic; << wraps mod 256, by design)."""
    lo = jnp.right_shift(jnp.left_shift(packed, 4), 4)
    hi = jnp.right_shift(packed, 4)
    q = jnp.stack([lo, hi], axis=-1).reshape(
        *packed.shape[:-1], packed.shape[-1] * 2
    )
    return (q.astype(jnp.float32) * scale[..., None]).astype(dtype)


def quantize_encoder_params(
    params: Params, min_elements: Optional[int] = None
) -> Params:
    """Quantize every large 2-D dense kernel in a param tree.

    Leaves everything else (layernorms, gates, embeddings, the 4-D
    patch-embed conv kernel, probe vectors) untouched. The returned tree is
    consumed transparently by ``models.encoder.dense`` AND
    ``models.language_model._dense`` (both dispatch on the presence of
    ``kernel_q``), so ``model_forward`` / ``streaming_forward`` / LM
    ``forward``/``greedy_generate`` and every fused-kernel path work
    unchanged. Works on any such tree despite the name — the LM's
    attn q/k/v/o and SwiGLU gate/up/down all match the walk.
    ``min_elements`` overrides the too-small-to-bother threshold (tests
    use 0 to force quantization of toy-sized kernels).
    """
    if min_elements is None:
        min_elements = _MIN_KERNEL_ELEMENTS

    def walk(node):
        if isinstance(node, dict):
            kern = node.get("kernel")
            if (
                kern is not None
                and hasattr(kern, "ndim")
                and kern.ndim == 2
                and kern.size >= min_elements
            ):
                return quantize_linear(node)
            out = {}
            for k, v in node.items():
                # the LM's untied vocab head is a bare (D, V) array — the
                # largest single decode matmul; quantize it too
                # (language_model.forward dispatches on lm_head_q)
                if (
                    k == "lm_head"
                    and hasattr(v, "ndim")
                    and v.ndim == 2
                    and v.size >= min_elements
                ):
                    q = quantize_linear({"kernel": v})
                    out["lm_head_q"] = q["kernel_q"]
                    out["lm_head_scale"] = q["kernel_scale"]
                else:
                    out[k] = walk(v)
            return out
        if isinstance(node, (list, tuple)):
            t = type(node)
            return t(walk(v) for v in node)
        return node

    return walk(params)
