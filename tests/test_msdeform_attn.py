"""MSDeformAttn core vs a torch grid_sample oracle (the kernel-vs-reference
pattern of the reference's own op test, downstream/OVIS/.../ops/test.py:
forward equality + gradient check)."""

import numpy as np
import pytest

pytestmark = pytest.mark.fast

import jax
import jax.numpy as jnp

from streamformer_tpu.ops import msdeform_attn as MS


def _torch_oracle(value, spatial_shapes, sampling_locations, attention_weights):
    """The documented semantics of ms_deform_attn_core_pytorch
    (ops/functions/ms_deform_attn_func.py): per-level grid_sample bilinear
    zeros align_corners=False, weighted sum over (L, P)."""
    import torch
    import torch.nn.functional as F

    value = torch.from_numpy(value)
    sampling_locations = torch.from_numpy(sampling_locations)
    attention_weights = torch.from_numpy(attention_weights)
    n, s, m, d = value.shape
    _, lq, _, l, p, _ = sampling_locations.shape
    splits = [h * w for h, w in spatial_shapes]
    value_list = value.split(splits, dim=1)
    grids = 2 * sampling_locations - 1
    sampled = []
    for lid, (h, w) in enumerate(spatial_shapes):
        v = value_list[lid].flatten(2).transpose(1, 2).reshape(n * m, d, h, w)
        g = grids[:, :, :, lid].transpose(1, 2).flatten(0, 1)  # (N*M, Lq, P, 2)
        sampled.append(
            F.grid_sample(v, g, mode="bilinear", padding_mode="zeros",
                          align_corners=False)
        )  # (N*M, D, Lq, P)
    aw = attention_weights.transpose(1, 2).reshape(n * m, 1, lq, l * p)
    out = (torch.stack(sampled, dim=-2).flatten(-2) * aw).sum(-1)
    return out.view(n, m * d, lq).transpose(1, 2).numpy()


@pytest.fixture()
def inputs(rng):
    n, m, d, lq, p = 2, 4, 8, 10, 3
    shapes = [(6, 8), (3, 4)]
    s = sum(h * w for h, w in shapes)
    l = len(shapes)
    value = rng.standard_normal((n, s, m, d)).astype(np.float32)
    loc = rng.uniform(-0.1, 1.1, (n, lq, m, l, p, 2)).astype(np.float32)
    aw = rng.random((n, lq, m, l, p)).astype(np.float32)
    aw /= aw.reshape(n, lq, m, -1).sum(-1)[..., None].reshape(n, lq, m, 1, 1)
    return value, shapes, loc, aw


def test_core_matches_torch_grid_sample(inputs):
    value, shapes, loc, aw = inputs
    ref = _torch_oracle(value, shapes, loc, aw)
    got = MS.ms_deform_attn_core(
        jnp.asarray(value), shapes, jnp.asarray(loc), jnp.asarray(aw)
    )
    np.testing.assert_allclose(np.asarray(got), ref, atol=1e-5, rtol=1e-5)


def test_core_gradients_flow(inputs):
    value, shapes, loc, aw = inputs

    def loss(value, loc, aw):
        return jnp.sum(
            MS.ms_deform_attn_core(value, shapes, loc, aw) ** 2
        )

    g = jax.grad(loss, argnums=(0, 1, 2))(
        jnp.asarray(value), jnp.asarray(loc), jnp.asarray(aw)
    )
    for gi in g:
        assert np.isfinite(np.asarray(gi)).all()
    assert np.abs(np.asarray(g[0])).max() > 0
    assert np.abs(np.asarray(g[1])).max() > 0  # grads wrt sampling locations


def test_module_init_and_forward(rng):
    d_model, heads, levels, points = 32, 4, 2, 4
    params = MS.init_msdeform_params(
        jax.random.PRNGKey(0), d_model, levels, heads, points
    )
    shapes = [(8, 8), (4, 4)]
    s = sum(h * w for h, w in shapes)
    b, lq = 2, 12
    query = jnp.asarray(rng.standard_normal((b, lq, d_model)).astype(np.float32))
    value = jnp.asarray(rng.standard_normal((b, s, d_model)).astype(np.float32))
    ref_pts = jnp.asarray(
        rng.uniform(0, 1, (b, lq, levels, 2)).astype(np.float32)
    )
    out = MS.ms_deform_attn(
        params, query, ref_pts, value, shapes, n_heads=heads, n_points=points
    )
    assert out.shape == (b, lq, d_model)
    assert np.isfinite(np.asarray(out)).all()
