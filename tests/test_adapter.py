"""ViT-Adapter: 4-scale FPN output contract (reference adapter forward,
modeling_timesformer_siglip_adapter.py:596-681)."""

import numpy as np
import jax
import jax.numpy as jnp

from streamformer_tpu.config import StreamformerConfig
from streamformer_tpu.models import adapter as A
from streamformer_tpu.models import encoder


def test_adapter_fpn_shapes_and_grads():
    cfg = StreamformerConfig(
        image_size=64,
        patch_size=16,
        num_frames=2,
        hidden_size=32,
        num_hidden_layers=4,
        num_attention_heads=4,
        intermediate_size=64,
        dtype="float32",
        use_pallas=False,
    )
    interaction = [[0, 1], [2, 3]]
    backbone = encoder.init_params(jax.random.PRNGKey(0), cfg)
    ap = A.init_adapter_params(
        jax.random.PRNGKey(1), cfg, conv_inplane=8, deform_num_heads=4,
        interaction_indexes=interaction,
    )
    rng = np.random.default_rng(0)
    px = jnp.asarray(rng.standard_normal((1, 2, 3, 64, 64)).astype(np.float32))
    out = A.adapter_forward(
        ap, backbone, px, cfg, deform_num_heads=4,
        interaction_indexes=interaction,
    )
    bt = 2
    assert out["res2"].shape == (bt, 16, 16, 32)  # 1/4
    assert out["res3"].shape == (bt, 8, 8, 32)  # 1/8
    assert out["res4"].shape == (bt, 4, 4, 32)  # 1/16
    assert out["res5"].shape == (bt, 2, 2, 32)  # 1/32
    for v in out.values():
        assert np.isfinite(np.asarray(v)).all()

    # adapter params receive gradients while computing a scalar loss
    def loss(ap):
        o = A.adapter_forward(
            ap, backbone, px, cfg, deform_num_heads=4,
            interaction_indexes=interaction,
        )
        return sum(jnp.sum(v**2) for v in o.values())

    g = jax.grad(loss)(ap)
    gmax = max(
        float(jnp.abs(x).max()) for x in jax.tree.leaves(g) if hasattr(x, "max")
    )
    assert np.isfinite(gmax) and gmax > 0
