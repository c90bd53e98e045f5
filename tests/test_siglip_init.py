"""SigLIP weight surgery: at init (gate=0, zero time-emb) the StreamFormer
encoder must reproduce the SigLIP vision tower per frame — the property the
reference's surgery is designed for (initialize_SigLIP_weights.py:229-240:
temporal halves fresh, gate 0 so SigLIP is unperturbed)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from streamformer_tpu.config import StreamformerConfig
from streamformer_tpu.checkpoint.siglip_init import init_from_siglip
from streamformer_tpu.models import encoder, text_encoder


@pytest.fixture(scope="module")
def siglip():
    import torch
    from transformers import SiglipConfig, SiglipModel
    from transformers.models.siglip.configuration_siglip import (
        SiglipTextConfig as HFTextCfg,
        SiglipVisionConfig as HFVisionCfg,
    )

    torch.manual_seed(0)
    cfg = SiglipConfig.from_text_vision_configs(
        HFTextCfg(
            vocab_size=64,
            hidden_size=32,
            intermediate_size=64,
            num_hidden_layers=2,
            num_attention_heads=4,
            max_position_embeddings=8,
        ),
        HFVisionCfg(
            hidden_size=32,
            intermediate_size=64,
            num_hidden_layers=2,
            num_attention_heads=4,
            image_size=48,
            patch_size=16,
        ),
    )
    model = SiglipModel(cfg).eval()
    return model


def test_surgery_reproduces_siglip_vision(siglip, rng, tmp_path):
    import torch

    sd = {k: v.numpy() for k, v in siglip.state_dict().items()}
    cfg = StreamformerConfig(
        image_size=48,
        patch_size=16,
        num_frames=4,
        hidden_size=32,
        num_hidden_layers=2,
        num_attention_heads=4,
        intermediate_size=64,
        hidden_act="gelu_pytorch_tanh",  # SigLIP's native act
        dtype="float32",
        use_pallas=False,
    )
    audit = str(tmp_path / "audit.json")
    params, text_params, extras = init_from_siglip(sd, cfg, audit_path=audit)

    # gate must be zero; zero the fresh time embeddings for exact equality
    for lp in params["layers"]:
        assert float(lp["temporal_attention_gating"]) == 0.0
    params["embeddings"]["time_embeddings"] = jnp.zeros_like(
        params["embeddings"]["time_embeddings"]
    )

    px = rng.standard_normal((2, 1, 3, 48, 48)).astype(np.float32)
    out = encoder.model_forward(params, jnp.asarray(px), cfg)

    with torch.no_grad():
        ref = siglip.vision_model(torch.from_numpy(px[:, 0]))
    np.testing.assert_allclose(
        np.asarray(out["pooler_output"][:, 0]),
        ref.pooler_output.numpy(),
        atol=1e-3,
        rtol=1e-3,
    )
    np.testing.assert_allclose(
        np.asarray(out["last_hidden_state"][:, 0]),
        ref.last_hidden_state.numpy(),
        atol=1e-3,
        rtol=1e-3,
    )

    import json

    with open(audit) as f:
        a = json.load(f)
    assert "map_head" in a["loaded"] and any("temporal" in x for x in a["fresh_init"])


def test_surgery_text_tower_matches(siglip, rng):
    import torch

    sd = {k: v.numpy() for k, v in siglip.state_dict().items()}
    cfg = StreamformerConfig(
        image_size=48, patch_size=16, num_frames=4, hidden_size=32,
        num_hidden_layers=2, num_attention_heads=4, intermediate_size=64,
        dtype="float32", use_pallas=False,
    )
    tcfg = text_encoder.SiglipTextConfig(
        vocab_size=64, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=64,
        max_position_embeddings=8,
    )
    _, text_params, _ = init_from_siglip(sd, cfg, text_cfg=tcfg)
    ids = rng.integers(0, 64, (3, 8)).astype(np.int32)
    out = text_encoder.forward(text_params, jnp.asarray(ids), tcfg)
    with torch.no_grad():
        ref = siglip.text_model(torch.from_numpy(ids.astype(np.int64)))
    np.testing.assert_allclose(
        np.asarray(out["pooler_output"]), ref.pooler_output.numpy(),
        atol=1e-3, rtol=1e-3,
    )
