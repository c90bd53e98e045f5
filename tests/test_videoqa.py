"""VideoQA multimodal integration: projector, splicing, streaming QA flow."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from streamformer_tpu.config import StreamformerConfig
from streamformer_tpu.downstream import videoqa as VQ
from streamformer_tpu.downstream.vision_tower import TimesformerVisionTower
from streamformer_tpu.models import encoder

CFG = StreamformerConfig(
    image_size=32, patch_size=16, num_frames=4, hidden_size=32,
    num_hidden_layers=1, num_attention_heads=4, intermediate_size=64,
    dtype="float32", use_pallas=False, cache_capacity=16,
    streaming_mode=True, context_length=4,
)
LM_DIM = 24
VOCAB = 50


def test_splice_expands_image_tokens():
    ids = np.array([5, VQ.IMAGE_TOKEN_INDEX, 7, 8])
    text = np.arange(4 * LM_DIM, dtype=np.float32).reshape(4, LM_DIM)
    img = np.ones((3, LM_DIM), np.float32) * 99
    labels = np.array([5, -100, 7, 8])
    out = VQ.splice_multimodal_inputs(ids, text, img, labels, max_len=10)
    assert out["inputs_embeds"].shape == (10, LM_DIM)
    # layout: tok0, img x3, tok2, tok3, pad x4
    assert (out["inputs_embeds"][1:4] == 99).all()
    assert out["attention_mask"].sum() == 6
    assert (out["labels"][1:4] == -100).all()
    assert out["labels"][4] == 7


def test_llava_stream_forward_and_streaming_qa(rng):
    params = encoder.init_params(jax.random.PRNGKey(0), CFG)
    tower = TimesformerVisionTower(CFG, params)
    proj = VQ.init_mm_projector(jax.random.PRNGKey(1), CFG.hidden_size, LM_DIM)
    embed_table = jnp.asarray(
        rng.standard_normal((VOCAB, LM_DIM)).astype(np.float32)
    )

    def embed_tokens(ids):
        return embed_table[ids]

    def lm_forward(embeds, mask):
        # toy LM: tied-embedding linear head
        return embeds @ embed_table.T

    model = VQ.LlavaStreamModel(tower, proj, embed_tokens, lm_forward)

    video = jnp.asarray(rng.standard_normal((1, 4, 3, 32, 32)).astype(np.float32))
    ids = np.array([3, VQ.IMAGE_TOKEN_INDEX, 9, 12])
    logits, spliced = model.forward(ids, video, max_len=16)
    assert logits.shape == (1, 16, VOCAB)
    assert np.isfinite(np.asarray(logits)).all()

    # streaming QA: feed more frames; the tower keeps the KV cache and the
    # context window slides (the test_kvcache.py usage pattern)
    logits2, _ = model.forward(ids, video, max_len=16)
    tower.clear_cache()
    logits3, _ = model.forward(ids, video, max_len=16)
    assert np.isfinite(np.asarray(logits2)).all()
    np.testing.assert_allclose(
        np.asarray(logits3), np.asarray(logits), atol=1e-4, rtol=1e-4
    )


def test_stage_policies():
    assert VQ.stage_policy(1)["train"] == {"projector"}
    assert "vision_tower" in VQ.stage_policy(3)["train"]
    assert VQ.stage_policy(3)["lr"]["vision_tower"] == 2e-6
