"""Capacity-bucketed streaming == full-capacity streaming (as long as the
bucket covers cache_len + t)."""

import pytest

pytestmark = pytest.mark.fast


import numpy as np
import jax
import jax.numpy as jnp

from streamformer_tpu.config import StreamformerConfig
from streamformer_tpu.models import encoder

CFG = StreamformerConfig(
    image_size=32,
    patch_size=16,
    num_frames=8,
    hidden_size=32,
    num_hidden_layers=2,
    num_attention_heads=4,
    intermediate_size=64,
    dtype="float32",
    use_pallas=False,
    cache_capacity=32,
)


def test_bucketed_matches_full_capacity(rng):
    params = encoder.init_params(jax.random.PRNGKey(0), CFG)
    for lp in params["layers"]:
        lp["temporal_attention_gating"] = jnp.asarray(0.8)
    px = jnp.asarray(rng.standard_normal((2, 6, 3, 32, 32)).astype(np.float32))

    def run(attend_capacity):
        cache = encoder.init_cache(CFG, batch=2)
        outs = []
        for t in range(6):
            out, cache = encoder.streaming_forward(
                params, px[:, t : t + 1], cache, CFG,
                attend_capacity=attend_capacity,
            )
            outs.append(np.asarray(out["pooler_output"]))
        return np.concatenate(outs, axis=1)

    full = run(None)
    bucketed = run(8)  # 8 >= 6 frames: must be identical
    np.testing.assert_allclose(bucketed, full, atol=1e-5, rtol=1e-5)
