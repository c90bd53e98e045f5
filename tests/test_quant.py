"""Int8 weight + dynamic-activation serving path (ops/quant.py).

The reference has no quantized inference (SURVEY §6); this is a
beyond-parity serving optimization. Correctness contract: quantized forward
tracks the float forward closely (per-row activation scales + per-column
weight scales), and the streaming==full-clip property (test_kvcache.py
contract) still holds within the quantized tree.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from streamformer_tpu.config import StreamformerConfig
from streamformer_tpu.models import encoder
from streamformer_tpu.ops import quant

pytestmark = pytest.mark.fast

CFG = StreamformerConfig(
    image_size=48,
    patch_size=16,
    num_frames=8,
    hidden_size=128,
    num_hidden_layers=2,
    num_attention_heads=4,
    intermediate_size=256,
    enable_causal_temporal=True,
    dtype="float32",
    use_pallas=False,
    cache_capacity=16,
)


def _cos(a, b):
    a = np.asarray(a, np.float64).ravel()
    b = np.asarray(b, np.float64).ravel()
    return float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-12))


def test_int8_dense_error_bound():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((64, 128)), jnp.float32)
    p = {
        "kernel": jnp.asarray(rng.standard_normal((128, 256)) * 0.05, jnp.float32),
        "bias": jnp.asarray(rng.standard_normal((256,)) * 0.01, jnp.float32),
    }
    exact = encoder.dense(x, p)
    qp = quant.quantize_linear(p)
    assert qp["kernel_q"].dtype == jnp.int8
    got = encoder.dense(x, qp)
    rel = np.linalg.norm(np.asarray(got - exact)) / np.linalg.norm(np.asarray(exact))
    assert rel < 0.03, rel


def test_int8_dense_preserves_lora():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((16, 128)), jnp.float32)
    p = {
        "kernel": jnp.asarray(rng.standard_normal((128, 128)) * 0.05, jnp.float32),
        "bias": jnp.zeros((128,), jnp.float32),
        "lora_a": jnp.asarray(rng.standard_normal((128, 4)) * 0.02, jnp.float32),
        "lora_b": jnp.asarray(rng.standard_normal((4, 128)) * 0.5, jnp.float32),
    }
    qp = quant.quantize_linear(p)
    with_lora = encoder.dense(x, qp)
    without = encoder.dense(x, {k: v for k, v in qp.items() if "lora" not in k})
    delta = (x @ p["lora_a"]) @ p["lora_b"]
    np.testing.assert_allclose(
        np.asarray(with_lora - without), np.asarray(delta), atol=1e-5
    )


def test_quantize_encoder_params_selective():
    params = encoder.init_params(jax.random.PRNGKey(0), CFG)
    qparams = quant.quantize_encoder_params(params)
    # large dense kernels quantized
    assert "kernel_q" in qparams["layers"][0]["attention"]["qkv"]
    assert "kernel_q" in qparams["layers"][0]["mlp"]["fc1"]
    assert "kernel_q" in qparams["map_head"]["k"]
    # 4-D patch conv, embeddings, layernorms untouched
    emb = qparams["embeddings"]
    assert "kernel" in emb["patch_proj"] and emb["patch_proj"]["kernel"].ndim == 4
    assert qparams["post_layernorm"]["scale"].dtype == jnp.float32
    assert qparams["layers"][0]["temporal_attention_gating"].shape == ()


def test_quantized_forward_tracks_float():
    params = encoder.init_params(jax.random.PRNGKey(0), CFG)
    for lp in params["layers"]:
        lp["temporal_attention_gating"] = jnp.asarray(0.7)
    rng = np.random.default_rng(2)
    px = jnp.asarray(rng.standard_normal((2, 8, 3, 48, 48)), jnp.float32)
    ref = encoder.model_forward(params, px, CFG)
    got = encoder.model_forward(quant.quantize_encoder_params(params), px, CFG)
    assert _cos(got["pooler_output"], ref["pooler_output"]) > 0.995
    assert _cos(got["last_hidden_state"], ref["last_hidden_state"]) > 0.995


def test_quantized_streaming_matches_quantized_fullclip():
    """The test_kvcache.py contract holds inside the quantized tree."""
    params = encoder.init_params(jax.random.PRNGKey(0), CFG)
    for lp in params["layers"]:
        lp["temporal_attention_gating"] = jnp.asarray(0.7)
    qparams = quant.quantize_encoder_params(params)
    rng = np.random.default_rng(3)
    px = jnp.asarray(rng.standard_normal((2, 8, 3, 48, 48)), jnp.float32)

    full = encoder.model_forward(qparams, px, CFG)
    cache = encoder.init_cache(CFG, batch=2)
    o1, cache = encoder.streaming_forward(qparams, px[:, :5], cache, CFG)
    o2, cache = encoder.streaming_forward(qparams, px[:, 5:], cache, CFG)
    stream = jnp.concatenate([o1["pooler_output"], o2["pooler_output"]], axis=1)
    np.testing.assert_allclose(
        np.asarray(stream), np.asarray(full["pooler_output"]), atol=2e-4
    )


def test_int8_weights_with_int8_ring_cache():
    """Full serving stack: quantized dense + int8 KV + ring eviction, run
    past capacity — stays finite and tracks the float full-clip closely
    within the window (examples/streaming_demo.py #4/#5 as a pinned test)."""
    cfg = CFG.replace(cache_mode="ring", cache_dtype="int8",
                      cache_capacity=6)
    params = encoder.init_params(jax.random.PRNGKey(0), cfg)
    for lp in params["layers"]:
        lp["temporal_attention_gating"] = jnp.asarray(0.7)
    qparams = quant.quantize_encoder_params(params)
    rng = np.random.default_rng(4)
    px = jnp.asarray(rng.standard_normal((2, 10, 3, 48, 48)), jnp.float32)

    cache = encoder.init_cache(cfg, batch=2)
    outs = []
    for t in range(10):  # wraps the 6-frame ring
        o, cache = encoder.streaming_forward(qparams, px[:, t : t + 1],
                                             cache, cfg)
        outs.append(np.asarray(o["pooler_output"], np.float32))
    got = np.concatenate(outs, axis=1)
    assert np.isfinite(got).all()
    # within the first `capacity` frames the ring == linear: compare the
    # prefix against the float full-clip forward
    ref = np.asarray(
        encoder.model_forward(params, px[:, :6], CFG)["pooler_output"],
        np.float32,
    )
    cos = _cos(got[:, :6], ref)
    assert cos > 0.98, cos
