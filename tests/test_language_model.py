"""LM parity vs transformers (Qwen2/Llama oracles) + KV-cache decoding.

The reference vendors patched Llama/Qwen2.5 for VideoQA
(downstream/VideoQA/llava/model/language_model/*); here one functional
decoder covers both, verified against the actual HF implementations with
transplanted random weights.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from streamformer_tpu.models import language_model as LM

SMALL = LM.LMConfig(
    vocab_size=64,
    hidden_size=32,
    intermediate_size=64,
    num_hidden_layers=2,
    num_attention_heads=4,
    num_key_value_heads=2,
    max_position_embeddings=64,
    rope_theta=10000.0,
    rms_norm_eps=1e-6,
    tie_word_embeddings=True,
    attention_bias=True,
)


def _hf_logits(model, ids, mask):
    import torch

    with torch.no_grad():
        out = model(
            input_ids=torch.tensor(ids),
            attention_mask=torch.tensor(mask.astype(np.int64)),
        )
    return out.logits.numpy()


@pytest.mark.parametrize("family", ["qwen2", "llama"])
def test_lm_matches_transformers(rng, family):
    if family == "qwen2":
        from transformers import Qwen2Config, Qwen2ForCausalLM

        cfg = SMALL
        hf_cfg = Qwen2Config(
            vocab_size=cfg.vocab_size,
            hidden_size=cfg.hidden_size,
            intermediate_size=cfg.intermediate_size,
            num_hidden_layers=cfg.num_hidden_layers,
            num_attention_heads=cfg.num_attention_heads,
            num_key_value_heads=cfg.num_key_value_heads,
            max_position_embeddings=cfg.max_position_embeddings,
            rope_theta=cfg.rope_theta,
            rms_norm_eps=cfg.rms_norm_eps,
            tie_word_embeddings=True,
            attn_implementation="eager",
        )
        hf = Qwen2ForCausalLM(hf_cfg).eval()
    else:
        from transformers import LlamaConfig, LlamaForCausalLM

        cfg = SMALL.replace(attention_bias=False, tie_word_embeddings=False)
        hf_cfg = LlamaConfig(
            vocab_size=cfg.vocab_size,
            hidden_size=cfg.hidden_size,
            intermediate_size=cfg.intermediate_size,
            num_hidden_layers=cfg.num_hidden_layers,
            num_attention_heads=cfg.num_attention_heads,
            num_key_value_heads=cfg.num_key_value_heads,
            max_position_embeddings=cfg.max_position_embeddings,
            rope_theta=cfg.rope_theta,
            rms_norm_eps=cfg.rms_norm_eps,
            tie_word_embeddings=False,
            attention_bias=False,
            attn_implementation="eager",
        )
        hf = LlamaForCausalLM(hf_cfg).eval()

    sd = {k: v.numpy() for k, v in hf.state_dict().items()}
    if "lm_head.weight" not in sd:  # tied
        sd["lm_head.weight"] = sd["model.embed_tokens.weight"]
    params = LM.convert_hf_state_dict(sd, cfg)

    b, l = 2, 9
    ids = rng.integers(0, cfg.vocab_size, (b, l))
    mask = np.ones((b, l), np.int32)
    mask[1, -3:] = 0  # right padding on one row

    ref = _hf_logits(hf, ids, mask)
    emb = LM.embed_tokens(params, jnp.asarray(ids))
    out, _ = LM.forward(params, emb, cfg, attention_mask=jnp.asarray(mask))
    got = np.asarray(out["logits"])
    valid = mask.astype(bool)
    np.testing.assert_allclose(got[valid], ref[valid], atol=2e-4, rtol=2e-4)


def test_lm_cache_decode_matches_full_forward(rng):
    cfg = SMALL
    params = LM.init_params(jax.random.PRNGKey(0), cfg)
    b, l = 2, 6
    ids = rng.integers(0, cfg.vocab_size, (b, l))
    emb = LM.embed_tokens(params, jnp.asarray(ids))

    # incremental: prefill 4, then 2 single steps through the cache
    cache = LM.init_cache(cfg, b, capacity=16)
    am = jnp.concatenate(
        [jnp.ones((b, 6), jnp.int32), jnp.zeros((b, 10), jnp.int32)], axis=1
    )
    out_a, cache = LM.forward(params, emb[:, :4], cfg, attention_mask=am,
                              cache=cache)
    out_b, cache = LM.forward(params, emb[:, 4:5], cfg, attention_mask=am,
                              cache=cache)
    out_c, cache = LM.forward(params, emb[:, 5:6], cfg, attention_mask=am,
                              cache=cache)
    inc = np.concatenate(
        [np.asarray(out_a["logits"]), np.asarray(out_b["logits"]),
         np.asarray(out_c["logits"])], axis=1
    )
    out_full, _ = LM.forward(params, emb, cfg)
    np.testing.assert_allclose(
        inc, np.asarray(out_full["logits"]), atol=1e-4, rtol=1e-4
    )


def test_greedy_generate_deterministic(rng):
    cfg = SMALL
    params = LM.init_params(jax.random.PRNGKey(1), cfg)
    b, l = 2, 5
    ids = rng.integers(0, cfg.vocab_size, (b, l))
    emb = LM.embed_tokens(params, jnp.asarray(ids))
    t1 = LM.greedy_generate(params, cfg, emb, max_new_tokens=6)
    t2 = LM.greedy_generate(params, cfg, emb, max_new_tokens=6)
    assert t1.shape == (b, 6)
    np.testing.assert_array_equal(t1, t2)

    # oracle: step-by-step argmax with full recompute
    cur = emb
    toks = []
    for _ in range(6):
        out, _ = LM.forward(params, cur, cfg)
        nxt = np.asarray(jnp.argmax(out["logits"][:, -1], axis=-1))
        toks.append(nxt)
        cur = jnp.concatenate(
            [cur, LM.embed_tokens(params, jnp.asarray(nxt))[:, None]], axis=1
        )
    np.testing.assert_array_equal(t1, np.stack(toks, axis=1))


def test_greedy_generate_right_padded(rng):
    """A right-padded batch must generate EXACTLY what each row generates
    alone: the short row's first new token sits at position last_valid+1
    (HF position_ids-from-mask semantics), with no rotary gap across the
    pad span and no attention onto pad K/V."""
    cfg = SMALL
    params = LM.init_params(jax.random.PRNGKey(2), cfg)
    lens = [3, 7]
    l_pad = max(lens)
    ids = rng.integers(1, cfg.vocab_size, (2, l_pad))
    mask = np.zeros((2, l_pad), np.int32)
    for r, ln in enumerate(lens):
        mask[r, :ln] = 1
        ids[r, ln:] = 0
    emb = LM.embed_tokens(params, jnp.asarray(ids))
    batched = LM.greedy_generate(
        params, cfg, emb, max_new_tokens=6,
        attention_mask=jnp.asarray(mask),
    )
    for r, ln in enumerate(lens):
        solo = LM.greedy_generate(
            params, cfg, emb[r : r + 1, :ln], max_new_tokens=6
        )
        np.testing.assert_array_equal(batched[r], solo[0])


def test_lm_loss_ignore_index():
    logits = jnp.asarray(np.random.default_rng(0).standard_normal((1, 4, 8)),
                         jnp.float32)
    labels = jnp.asarray([[1, 2, -100, 3]])
    loss = LM.lm_loss(logits, labels)
    assert np.isfinite(float(loss))
    # all-ignored -> zero loss, no nan
    loss0 = LM.lm_loss(logits, jnp.full((1, 4), -100))
    assert float(loss0) == 0.0
