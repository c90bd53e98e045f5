"""Downstream suites: AR classification, LSTR OAD, streaming vision tower."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from streamformer_tpu.config import StreamformerConfig

CFG = StreamformerConfig(
    image_size=32,
    patch_size=16,
    num_frames=4,
    hidden_size=32,
    num_hidden_layers=2,
    num_attention_heads=4,
    intermediate_size=64,
    dtype="float32",
    use_pallas=False,
    cache_capacity=16,
    streaming_mode=True,
    context_length=6,
)


def test_ar_train_and_multiview_eval(rng):
    from streamformer_tpu.downstream import ar
    from streamformer_tpu.models import encoder

    num_classes = 5
    params = {
        "backbone": encoder.init_params(jax.random.PRNGKey(0), CFG),
        "head": ar.init_classifier_params(jax.random.PRNGKey(1), CFG, num_classes),
    }
    tx = optax.adamw(1e-3)
    opt_state = tx.init(params)
    step = ar.make_train_step(CFG, tx, num_classes)

    px = jnp.asarray(rng.standard_normal((4, 4, 3, 32, 32)).astype(np.float32))
    labels = jnp.asarray(rng.integers(0, num_classes, 4))
    losses = []
    for i in range(5):
        params, opt_state, loss = step(params, opt_state, px, labels,
                                       jax.random.PRNGKey(i))
        losses.append(float(loss))
    assert np.isfinite(losses).all()

    # multi-view final test: 2 views per video
    def batches():
        for view in range(2):
            yield px, labels, np.arange(4)

    out = ar.final_test(params, CFG, batches())
    assert 0 <= out["top1"] <= 100


def test_ar_model_ema_tracks_then_freezes(rng):
    """EMA shadow converges toward the live params while training and stays
    put when the live params stop moving (reference ModelEma semantics,
    downstream/AR/main_finetuning.py:53-55)."""
    from streamformer_tpu.downstream import ar
    from streamformer_tpu.models import encoder

    num_classes = 3
    params = {
        "backbone": encoder.init_params(jax.random.PRNGKey(0), CFG),
        "head": ar.init_classifier_params(jax.random.PRNGKey(1), CFG,
                                          num_classes),
    }
    tx = optax.adamw(1e-2)
    opt_state = tx.init(params)
    step = ar.make_train_step(CFG, tx, num_classes, use_mixup=False,
                              ema_decay=0.5)
    ema = ar.init_ema(params)

    px = jnp.asarray(rng.standard_normal((2, 4, 3, 32, 32)).astype(np.float32))
    labels = jnp.asarray(rng.integers(0, num_classes, 2))

    def dist(a, b):
        leaves = jax.tree.leaves(
            jax.tree.map(lambda x, y: jnp.sum((x - y) ** 2), a, b)
        )
        return float(jnp.sqrt(sum(leaves)))

    for i in range(3):
        params, ema, opt_state, loss = step(params, ema, opt_state, px,
                                            labels, jax.random.PRNGKey(i))
    d_during = dist(ema, params)
    assert d_during > 0  # shadow lags the live weights

    # freeze: repeated EMA updates with static params converge to them
    for _ in range(30):
        ema = ar.ema_update(ema, params, 0.5)
    assert dist(ema, params) < 1e-4 * max(d_during, 1.0)
    # EMA weights drive the standard eval path
    out = ar.validate(ema, CFG, [(px, labels)])
    assert 0 <= out["top1"] <= 100


def test_lstr_forward_and_stream():
    from streamformer_tpu.downstream import oad_lstr as L

    cfg = L.LSTRConfig(
        visual_size=16,
        d_model=32,
        num_heads=4,
        dim_feedforward=64,
        num_classes=6,
        long_memory_num_samples=16,
        work_memory_num_samples=4,
        anticipation_num_samples=2,
        future_num_samples=4,
        enc_queries_0=4,
        enc_queries_1=4,
        gen_queries=4,
        fut_queries=4,
        groups=4,
        cci_times=2,
    )
    params = L.init_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    visual = jnp.asarray(
        rng.standard_normal((2, 16 + 4, 16)).astype(np.float32)
    )
    out = L.forward(params, cfg, visual)
    assert out["logits"].shape == (2, 4 + 2, 6)  # work + anticipation tokens
    assert out["future_logits"].shape == (2, 4, 6)
    assert np.isfinite(np.asarray(out["logits"])).all()

    # streaming: per-frame logits over a short stream
    stream = L.LSTRStream(params, cfg, long_sample_rate=2)
    for t in range(10):
        logits = stream.step(rng.standard_normal(16).astype(np.float32))
        assert logits.shape == (6,)
        assert np.isfinite(logits).all()


def test_vision_tower_streaming_contract(rng):
    from streamformer_tpu.downstream.vision_tower import TimesformerVisionTower
    from streamformer_tpu.models import encoder

    params = encoder.init_params(jax.random.PRNGKey(0), CFG)
    for lp in params["layers"]:
        lp["temporal_attention_gating"] = jnp.asarray(0.6)
    tower = TimesformerVisionTower(CFG, params)

    video = jnp.asarray(
        rng.standard_normal((1, 8, 3, 32, 32)).astype(np.float32)
    )
    # stream in two chunks; features must equal a fresh full pass
    f1 = tower.forward(video[:, :4])
    f2 = tower.forward(video[:, 4:])
    assert f2.shape[1] == CFG.context_length  # sliding window for the LLM

    tower.clear_cache()
    full = tower.forward(video)  # one call, all 8 frames
    np.testing.assert_allclose(
        np.asarray(f2),
        np.asarray(full[:, -CFG.context_length :]),
        atol=1e-4,
        rtol=1e-4,
    )

    # clear_cache resets the stream (reference test_kvcache.py #3 == #2)
    tower.clear_cache()
    f1b = tower.forward(video[:, :4])
    np.testing.assert_allclose(np.asarray(f1b), np.asarray(f1), atol=1e-5)
