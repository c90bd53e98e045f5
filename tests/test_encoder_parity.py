"""Golden parity gate: JAX encoder vs the torch reference run on CPU.

Builds the reference TimesformerMultiTaskingModelSigLIP with random weights,
transplants its state dict into our param tree, and requires
``pooler_output`` / ``last_hidden_state`` to match within 1e-3 max-abs
(BASELINE.json config #1; SURVEY §7 stage 2 exit criterion).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from streamformer_tpu.config import StreamformerConfig
from streamformer_tpu.checkpoint import convert_backbone_state_dict
from streamformer_tpu.models import encoder

# small-but-faithful config: multi-head, multi-layer, causal
SMALL = dict(
    image_size=48,
    patch_size=16,
    num_frames=4,
    hidden_size=96,
    num_hidden_layers=3,
    num_attention_heads=4,
    intermediate_size=192,
    enable_causal_temporal=True,
)


def _build_torch_model(torch_reference_models, **overrides):
    import torch

    cfg_mod, model_mod = torch_reference_models
    torch.manual_seed(0)
    kwargs = dict(SMALL)
    kwargs.update(overrides)
    t_cfg = cfg_mod.StreamformerConfig(**kwargs)
    model = model_mod.TimesformerMultiTaskingModelSigLIP(t_cfg).eval()
    return model, t_cfg


def _jax_setup(model, **overrides):
    kwargs = dict(SMALL)
    kwargs.update(overrides)
    cfg = StreamformerConfig(dtype="float32", use_pallas=False, **kwargs)
    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    params = convert_backbone_state_dict(sd, cfg)
    return cfg, params


@pytest.mark.parametrize("causal", [True, False])
def test_full_clip_parity(torch_reference_models, rng, causal):
    import torch

    model, _ = _build_torch_model(
        torch_reference_models, enable_causal_temporal=causal
    )
    cfg, params = _jax_setup(model, enable_causal_temporal=causal)

    b, t = 2, SMALL["num_frames"]
    px = rng.standard_normal(
        (b, t, 3, SMALL["image_size"], SMALL["image_size"])
    ).astype(np.float32)

    with torch.no_grad():
        ref = model(torch.from_numpy(px))
    out = encoder.model_forward(params, jnp.asarray(px), cfg)

    ref_last = ref.last_hidden_state.numpy()  # (B, T, N, D)
    ref_pool = ref.pooler_output.numpy()  # (B, T, D)
    got_last = np.asarray(out["last_hidden_state"])
    got_pool = np.asarray(out["pooler_output"])

    assert got_last.shape == ref_last.shape
    assert got_pool.shape == ref_pool.shape
    np.testing.assert_allclose(got_last, ref_last, atol=1e-3, rtol=1e-3)
    np.testing.assert_allclose(got_pool, ref_pool, atol=1e-3, rtol=1e-3)


def test_fewer_frames_than_trained(torch_reference_models, rng):
    """T < trained frames: time-emb truncation path
    (modeling_timesformer_siglip.py:434-440)."""
    import torch

    model, _ = _build_torch_model(torch_reference_models)
    cfg, params = _jax_setup(model)
    b, t = 1, 2
    px = rng.standard_normal(
        (b, t, 3, SMALL["image_size"], SMALL["image_size"])
    ).astype(np.float32)
    with torch.no_grad():
        ref = model(torch.from_numpy(px))
    out = encoder.model_forward(params, jnp.asarray(px), cfg)
    np.testing.assert_allclose(
        np.asarray(out["last_hidden_state"]),
        ref.last_hidden_state.numpy(),
        atol=1e-3,
        rtol=1e-3,
    )


def test_more_frames_than_trained(torch_reference_models, rng):
    """T > trained frames: nearest time-emb interpolation
    (modeling_timesformer_siglip.py:441-449)."""
    import torch

    model, _ = _build_torch_model(torch_reference_models)
    cfg, params = _jax_setup(model)
    b, t = 1, 7
    px = rng.standard_normal(
        (b, t, 3, SMALL["image_size"], SMALL["image_size"])
    ).astype(np.float32)
    with torch.no_grad():
        ref = model(torch.from_numpy(px))
    out = encoder.model_forward(params, jnp.asarray(px), cfg)
    np.testing.assert_allclose(
        np.asarray(out["last_hidden_state"]),
        ref.last_hidden_state.numpy(),
        atol=1e-3,
        rtol=1e-3,
    )


def test_lora_spatial_parity(torch_reference_models, rng):
    """LoRA-injected spatial attention parity
    (modeling_timesformer_siglip.py:519-573, :731-757)."""
    import torch

    model, _ = _build_torch_model(torch_reference_models)
    model.add_lora_spatial()
    # give LoRA B nonzero values so the delta path is actually exercised
    with torch.no_grad():
        for name, p in model.named_parameters():
            if "lora_b" in name:
                p.normal_(0, 0.02)
    model = model.eval()
    cfg, params = _jax_setup(model)
    b, t = 1, SMALL["num_frames"]
    px = rng.standard_normal(
        (b, t, 3, SMALL["image_size"], SMALL["image_size"])
    ).astype(np.float32)
    with torch.no_grad():
        ref = model(torch.from_numpy(px))
    out = encoder.model_forward(params, jnp.asarray(px), cfg)
    np.testing.assert_allclose(
        np.asarray(out["last_hidden_state"]),
        ref.last_hidden_state.numpy(),
        atol=1e-3,
        rtol=1e-3,
    )


def test_non_square_input_resolution(torch_reference_models, rng):
    """Bicubic pos-emb interpolation for a different resolution
    (modeling_timesformer_siglip.py:380-411). Looser tolerance: antialiased
    bicubic kernels differ slightly between torch and jax.image."""
    import torch

    model, _ = _build_torch_model(torch_reference_models)
    cfg, params = _jax_setup(model)
    b, t, hw = 1, 2, 80
    px = rng.standard_normal((b, t, 3, hw, hw)).astype(np.float32)
    with torch.no_grad():
        ref = model(torch.from_numpy(px))
    out = encoder.model_forward(params, jnp.asarray(px), cfg)
    got = np.asarray(out["last_hidden_state"])
    refv = ref.last_hidden_state.numpy()
    assert got.shape == refv.shape
    # upsampled pos-emb: kernels agree on upsample, keep 1e-2 guard
    np.testing.assert_allclose(got, refv, atol=1e-2, rtol=1e-2)


def test_joint_space_time_parity(torch_reference_models, rng):
    """joint_space_time layer variant
    (modeling_timesformer_siglip.py:915-934)."""
    import torch

    model, _ = _build_torch_model(
        torch_reference_models, attention_type="joint_space_time",
        enable_causal_temporal=False,
    )
    cfg, params = _jax_setup(model, attention_type="joint_space_time",
                             enable_causal_temporal=False)
    b, t = 2, SMALL["num_frames"]
    px = rng.standard_normal(
        (b, t, 3, SMALL["image_size"], SMALL["image_size"])
    ).astype(np.float32)
    with torch.no_grad():
        ref = model(torch.from_numpy(px))
    out = encoder.model_forward(params, jnp.asarray(px), cfg)
    np.testing.assert_allclose(
        np.asarray(out["last_hidden_state"]), ref.last_hidden_state.numpy(),
        atol=1e-3, rtol=1e-3,
    )


def test_space_only_encoder_parity(torch_reference_models, rng):
    """space_only parity at the ENCODER level: the reference embeds
    space_only as (B*T, N, D) (modeling_timesformer_siglip.py:413-420, no
    time packing) but its multitask wrapper then reshapes assuming the
    n-major packed layout (:1332-1340), scrambling space_only outputs — a
    reference quirk in an unused combination. We match the encoder, not the
    scramble."""
    import torch

    model, _ = _build_torch_model(
        torch_reference_models, attention_type="space_only",
        enable_causal_temporal=False,
    )
    cfg, params = _jax_setup(model, attention_type="space_only",
                             enable_causal_temporal=False)
    b, t = 2, SMALL["num_frames"]
    px = rng.standard_normal(
        (b, t, 3, SMALL["image_size"], SMALL["image_size"])
    ).astype(np.float32)
    with torch.no_grad():
        emb = model.embeddings(torch.from_numpy(px))  # (B*T, N, D)
        enc = model.encoder(emb, num_frames=t)[0]
        ref = model.post_layernorm(enc).numpy()  # (B*T, N, D)
    out = encoder.model_forward(params, jnp.asarray(px), cfg)
    got = np.asarray(out["last_hidden_state"]).reshape(b * t, -1, cfg.hidden_size)
    np.testing.assert_allclose(got, ref, atol=1e-3, rtol=1e-3)


@pytest.mark.slow
def test_flagship_full_size_parity(torch_reference_models, rng):
    """Full-published-config parity gate (VERDICT r2 weak #3): torch
    reference at 768 hidden / 12 layers / 224^2 / T=16 / B=1 with random
    weights transplanted, fp32, 1e-3 on pooler_output/last_hidden_state —
    catches full-scale-only layout bugs (pos-emb grid, MAP-head packing,
    head-split order) that the toy-config gates cannot see. Plus the
    streaming==full-clip contract at the same size."""
    import torch

    FLAG = dict(
        image_size=224,
        patch_size=16,
        num_frames=16,
        hidden_size=768,
        num_hidden_layers=12,
        num_attention_heads=12,
        intermediate_size=3072,
        enable_causal_temporal=True,
    )
    model, _ = _build_torch_model(torch_reference_models, **FLAG)
    cfg, params = _jax_setup(model, **FLAG)

    px = rng.standard_normal((1, 16, 3, 224, 224)).astype(np.float32)
    with torch.no_grad():
        ref = model(torch.from_numpy(px))
    out = encoder.model_forward(params, jnp.asarray(px), cfg)

    ref_last = ref.last_hidden_state.numpy()  # (1, 16, 196, 768)
    ref_pool = ref.pooler_output.numpy()  # (1, 16, 768)
    got_last = np.asarray(out["last_hidden_state"])
    got_pool = np.asarray(out["pooler_output"])
    assert got_last.shape == ref_last.shape == (1, 16, 196, 768)
    assert got_pool.shape == ref_pool.shape == (1, 16, 768)
    np.testing.assert_allclose(got_last, ref_last, atol=1e-3, rtol=1e-3)
    np.testing.assert_allclose(got_pool, ref_pool, atol=1e-3, rtol=1e-3)

    # streaming == full-clip at the flagship size (test_kvcache.py contract)
    cfg_s = cfg.replace(cache_capacity=16)
    cache = encoder.init_cache(cfg_s, batch=1)
    o1, cache = encoder.streaming_forward(
        params, jnp.asarray(px[:, :8]), cache, cfg_s
    )
    o2, cache = encoder.streaming_forward(
        params, jnp.asarray(px[:, 8:]), cache, cfg_s
    )
    got_stream = np.concatenate(
        [np.asarray(o1["pooler_output"]), np.asarray(o2["pooler_output"])],
        axis=1,
    )
    np.testing.assert_allclose(got_stream, got_pool, atol=2e-4, rtol=2e-4)
