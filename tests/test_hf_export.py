"""Checkpoint export round-trips: JAX -> safetensors -> (a) our importer and
(b) the torch reference model itself."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from streamformer_tpu.config import StreamformerConfig
from streamformer_tpu.checkpoint import hf_export, hf_import
from streamformer_tpu.models import encoder

CFG = StreamformerConfig(
    image_size=48,
    patch_size=16,
    num_frames=4,
    hidden_size=96,
    num_hidden_layers=2,
    num_attention_heads=4,
    intermediate_size=192,
    dtype="float32",
    use_pallas=False,
)


def test_roundtrip_through_our_importer(tmp_path, rng):
    params = encoder.init_params(jax.random.PRNGKey(0), CFG)
    hf_export.save_pretrained(str(tmp_path), params, CFG)
    cfg2, params2 = hf_import.from_pretrained(str(tmp_path))
    assert cfg2.hidden_size == CFG.hidden_size
    px = jnp.asarray(rng.standard_normal((1, 4, 3, 48, 48)).astype(np.float32))
    a = encoder.model_forward(params, px, CFG)["pooler_output"]
    b = encoder.model_forward(params2, px, CFG)["pooler_output"]
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_export_loads_into_torch_reference(tmp_path, torch_reference_models, rng):
    """The real interop gate: our exported checkpoint must produce the same
    outputs in the PyTorch reference model."""
    import torch

    cfg_mod, model_mod = torch_reference_models
    params = encoder.init_params(jax.random.PRNGKey(1), CFG)
    # non-trivial gates so the temporal path is exercised
    for lp in params["layers"]:
        lp["temporal_attention_gating"] = jnp.asarray(0.3)
    sd = hf_export.backbone_to_state_dict(params, CFG)

    t_cfg = cfg_mod.StreamformerConfig(
        image_size=48, patch_size=16, num_frames=4, hidden_size=96,
        num_hidden_layers=2, num_attention_heads=4, intermediate_size=192,
        enable_causal_temporal=True,
    )
    model = model_mod.TimesformerMultiTaskingModelSigLIP(t_cfg)
    missing, unexpected = model.load_state_dict(
        {k: torch.from_numpy(np.asarray(v)) for k, v in sd.items()}, strict=False
    )
    # only the registered causal-mask buffers may be absent — the reference
    # ignores them at runtime (modeling_timesformer_siglip.py:515-517)
    assert all(m.endswith("attention.mask") for m in missing), missing
    assert not unexpected, unexpected
    model = model.eval()

    px = rng.standard_normal((1, 4, 3, 48, 48)).astype(np.float32)
    with torch.no_grad():
        ref = model(torch.from_numpy(px))
    ours = encoder.model_forward(params, jnp.asarray(px), CFG)
    np.testing.assert_allclose(
        np.asarray(ours["pooler_output"]),
        ref.pooler_output.numpy(),
        atol=1e-3,
        rtol=1e-3,
    )
