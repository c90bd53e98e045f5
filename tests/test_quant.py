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


def test_int4_kv_pack_roundtrip():
    """quantize_kv4/dequantize_kv4 (ops/quant.py): nibble-pack two int4
    values per byte. Sign extension is exact for every representable level
    (-7..7), the packed plane is half the width, and the roundtrip error
    is bounded by half a quantization step (scale = absmax/7)."""
    rng = np.random.default_rng(11)
    x = jnp.asarray(rng.standard_normal((2, 5, 3, 8)), jnp.float32)
    packed, scale = quant.quantize_kv4(x)
    assert packed.shape == (2, 5, 3, 4) and packed.dtype == jnp.int8
    assert scale.shape == (2, 5, 3)
    y = quant.dequantize_kv4(packed, scale, jnp.float32)
    err = np.abs(np.asarray(y - x))
    bound = np.asarray(scale)[..., None] * 0.5 + 1e-6
    assert (err <= bound).all(), err.max()

    # every representable level survives exactly (incl. negatives in both
    # the low and the high nibble)
    levels = jnp.asarray(
        np.arange(-7, 8, dtype=np.float32)[None, :].repeat(2, 0)[:, :14]
    )
    p2, s2 = quant.quantize_kv4(levels)
    back = quant.dequantize_kv4(p2, s2, jnp.float32)
    np.testing.assert_allclose(np.asarray(back), np.asarray(levels),
                               atol=1e-6)


# ---------------------------------------------------------------------------
# task-level gates (VERDICT r4 weak #5): representation cosines can pass
# while argmaxes flip near decision boundaries — gate the actual task
# outputs: zero-shot top-1 and greedy answer tokens.


def _zero_shot_top1(pooled, label_table):
    """(argmax, top-2 margin) over the real zero-shot logits
    (heads.classification_head's normalized last-frame dot, minus the loss
    plumbing)."""
    img = np.asarray(pooled, np.float32)[:, -1, :]
    img = img / (np.linalg.norm(img, axis=-1, keepdims=True) + 1e-12)
    logits = img @ label_table.T
    part = np.sort(logits, axis=-1)
    return np.argmax(logits, axis=-1), part[:, -1] - part[:, -2]


def _assert_top1_agreement(ref, margin, got, what, near_tie=5e-3, max_flips=4):
    """Task gate: a CONFIDENT decision (top-2 margin above the int8
    perturbation scale) must never flip; flips are tolerated only at
    near-ties, where the float answer itself is arbitrary, and never more
    than max_flips/64 overall."""
    flips = ref != got
    confident = margin >= near_tie
    assert not (flips & confident).any(), (
        f"{what}: confident top-1 flipped (margins "
        f"{margin[flips & confident]})"
    )
    assert int(flips.sum()) <= max_flips, (
        f"{what}: {int(flips.sum())}/{len(ref)} top-1 flips"
    )


@pytest.fixture(scope="module")
def zs_fixture():
    """64-clip fixture batch + a label table built from held-out clips'
    float embeddings — realistic margins (a random-weight table makes the
    task degenerate and the gate meaningless)."""
    params = encoder.init_params(jax.random.PRNGKey(0), CFG)
    for lp in params["layers"]:
        lp["temporal_attention_gating"] = jnp.asarray(0.7)
    rng = np.random.default_rng(42)
    px = jnp.asarray(rng.standard_normal((64, 8, 3, 48, 48)), jnp.float32)
    held_out = jnp.asarray(
        rng.standard_normal((16, 8, 3, 48, 48)), jnp.float32
    )
    anchors = np.asarray(
        encoder.model_forward(params, held_out, CFG)["pooler_output"],
        np.float32,
    )[:, -1, :]
    table = anchors / (np.linalg.norm(anchors, axis=-1, keepdims=True) + 1e-12)
    return params, px, table


def test_int8_dense_zero_shot_top1_agreement(zs_fixture):
    """float vs int8-dense weights: no confident zero-shot top-1 flips."""
    params, px, table = zs_fixture
    ref, margin = _zero_shot_top1(
        encoder.model_forward(params, px, CFG)["pooler_output"], table
    )
    got, _ = _zero_shot_top1(
        encoder.model_forward(
            quant.quantize_encoder_params(params), px, CFG
        )["pooler_output"],
        table,
    )
    _assert_top1_agreement(ref, margin, got, "int8-dense")


def test_int8_kv_zero_shot_top1_agreement(zs_fixture):
    """float KV vs int8 KV cache (same float weights), streamed frame by
    frame: no confident final-frame zero-shot top-1 flips."""
    params, px, table = zs_fixture

    def stream_top1(cfg):
        cache = encoder.init_cache(cfg, batch=64)
        for t in range(8):
            out, cache = encoder.streaming_forward(
                params, px[:, t : t + 1], cache, cfg
            )
        return _zero_shot_top1(out["pooler_output"], table)

    ref, margin = stream_top1(CFG)
    got, _ = stream_top1(CFG.replace(cache_dtype="int8"))
    _assert_top1_agreement(ref, margin, got, "int8 KV")


def test_int8_tower_videoqa_greedy_token_agreement():
    """encoder->VideoQA: greedy answers from the int8-dense tower track the
    float tower (the LM-side int8-KV token gate's analog for the vision
    path) — >= 15/16 positional token agreement over 4 prompts."""
    from streamformer_tpu.downstream import videoqa as VQ
    from streamformer_tpu.downstream.vision_tower import TimesformerVisionTower
    from streamformer_tpu.models import language_model as LM

    cfg = CFG.replace(streaming_mode=True, context_length=8)
    params = encoder.init_params(jax.random.PRNGKey(0), cfg)
    for lp in params["layers"]:
        lp["temporal_attention_gating"] = jnp.asarray(0.7)
    lm_cfg = LM.LMConfig(
        vocab_size=64, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=64, tie_word_embeddings=True,
    )
    lm_params = LM.init_params(jax.random.PRNGKey(7), lm_cfg)
    proj = VQ.init_mm_projector(jax.random.PRNGKey(1), cfg.hidden_size, 32)

    rng = np.random.default_rng(5)
    video = jnp.asarray(
        rng.standard_normal((1, 8, 3, 48, 48)).astype(np.float32)
    )

    def answers(tower_params):
        tower = TimesformerVisionTower(cfg, tower_params)
        model = VQ.LlavaQwenModel(
            tower=tower, lm_cfg=lm_cfg,
            params={"projector": proj, "lm": lm_params},
        )
        outs = []
        for p in range(4):
            tower.clear_cache()
            prompt = np.array([3 + p, VQ.IMAGE_TOKEN_INDEX, 9, 12])
            outs.append(
                np.asarray(model.generate(prompt, video, max_new_tokens=4))
            )
        return np.concatenate(outs, axis=None)  # 16 tokens

    ref = answers(params)
    got = answers(quant.quantize_encoder_params(params))
    agree = int((ref == got).sum())
    assert agree >= 15, f"only {agree}/16 greedy tokens agree under int8 tower"
