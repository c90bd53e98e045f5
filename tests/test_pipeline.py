"""Pipeline parallelism: GPipe schedule == sequential trunk, forward and
backward, on the virtual 8-device CPU mesh.

The reference has no pipeline axis (DDP-only, utils.py:372-447); these
tests pin the TPU-native addition: shard_map + ppermute microbatch
pipeline over a ``pipe`` mesh axis (parallel/pipeline.py).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from streamformer_tpu.config import StreamformerConfig
from streamformer_tpu.models import encoder
from streamformer_tpu.parallel import pipeline as pp

CFG = StreamformerConfig(
    image_size=32,
    patch_size=16,
    num_frames=4,
    hidden_size=64,
    num_hidden_layers=4,
    num_attention_heads=4,
    intermediate_size=128,
    dtype="float32",
    use_pallas=False,
)


@pytest.fixture(scope="module")
def mesh():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    return pp.make_pipeline_mesh(data=2, pipe=4)


@pytest.fixture(scope="module")
def params():
    p = encoder.init_params(jax.random.PRNGKey(0), CFG)
    for lp in p["layers"]:
        # non-zero gate so the temporal branch contributes
        lp["temporal_attention_gating"] = jnp.asarray(0.7)
    return p


@pytest.fixture(scope="module")
def pixels():
    return jax.random.normal(
        jax.random.PRNGKey(1), (4, CFG.num_frames, 3, 32, 32), jnp.float32
    )


def test_pp_forward_matches_sequential(mesh, params, pixels):
    ref = encoder.model_forward(params, pixels, CFG)

    @jax.jit
    def run(p, x):
        return pp.model_forward_pp(
            p, x, CFG, mesh=mesh, num_microbatches=2
        )

    with mesh:
        got = run(params, pixels)
    np.testing.assert_allclose(
        np.asarray(got["pooler_output"]),
        np.asarray(ref["pooler_output"]),
        atol=2e-5,
        rtol=2e-5,
    )
    np.testing.assert_allclose(
        np.asarray(got["last_hidden_state"]),
        np.asarray(ref["last_hidden_state"]),
        atol=2e-5,
        rtol=2e-5,
    )


def test_pp_two_stage_odd_split(params, pixels):
    """pipe=2 (2 layers/stage), data=2, M=2 — a different fill/drain
    pattern than the 4-stage case."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    mesh2 = pp.make_pipeline_mesh(data=2, pipe=2)
    ref = encoder.model_forward(params, pixels, CFG)
    with mesh2:
        got = jax.jit(
            lambda p, x: pp.model_forward_pp(
                p, x, CFG, mesh=mesh2, num_microbatches=2
            )
        )(params, pixels)
    np.testing.assert_allclose(
        np.asarray(got["pooler_output"]),
        np.asarray(ref["pooler_output"]),
        atol=2e-5,
        rtol=2e-5,
    )


def test_pp_grads_match_sequential(mesh, params, pixels):
    """jax.grad through the ppermute schedule == grads of the plain
    trunk (the transpose of the pipeline is the backward pipeline)."""

    def loss_seq(p):
        out = encoder.model_forward(p, pixels, CFG)
        return jnp.sum(out["pooler_output"] ** 2)

    def loss_pp(p):
        out = pp.model_forward_pp(
            p, pixels, CFG, mesh=mesh, num_microbatches=2
        )
        return jnp.sum(out["pooler_output"] ** 2)

    g_ref = jax.grad(loss_seq)(params)
    with mesh:
        g_pp = jax.jit(jax.grad(loss_pp))(params)

    flat_ref, _ = jax.tree_util.tree_flatten(g_ref)
    flat_pp, _ = jax.tree_util.tree_flatten(g_pp)
    assert len(flat_ref) == len(flat_pp)
    for a, b in zip(flat_ref, flat_pp):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), atol=5e-4, rtol=5e-4
        )


def test_pp_dropout_decorrelated_across_microbatches(mesh, params):
    """Identical samples routed through DIFFERENT microbatches must draw
    different dropout masks — a layer-only RNG fold gave every microbatch
    the same (B/M, ...) mask, correlating regularization across the batch
    in a way the sequential trunk (one draw over the full B) never does."""
    import dataclasses

    cfg_d = dataclasses.replace(CFG, hidden_dropout_prob=0.3)
    # trunk-only (embed applies its own full-batch dropout, which already
    # decorrelates rows — the trunk is where the per-microbatch fold lives)
    n_patches = (32 // CFG.patch_size) ** 2 + 1
    one = jax.random.normal(
        jax.random.PRNGKey(3),
        (1, CFG.num_frames, n_patches, CFG.hidden_size), jnp.float32,
    )
    # 4 identical rows; data=2 shards x M=2 microbatches of 1 row each:
    # within a data shard, mb0's row == mb1's row
    x = jnp.tile(one, (4, 1, 1, 1))
    stacked, _ = pp.stack_pipeline_params(params, mesh.shape["pipe"])

    with mesh:
        out = jax.jit(
            lambda sl, h: pp.pipelined_trunk(
                sl, h, cfg_d, mesh=mesh, num_microbatches=2,
                rng=jax.random.PRNGKey(7), deterministic=False,
            )
        )(stacked, x)
    got = np.asarray(out)
    # rows 0/1 share a data shard (and rows 2/3): same input, different
    # microbatch -> different mask -> different output
    assert not np.allclose(got[0], got[1])
    assert not np.allclose(got[2], got[3])


def test_pp_placement_shards_stages(mesh, params):
    """Each pipe rank should hold 1/pipe of the layer stack — the memory
    win that motivates pipelining."""
    rest, stacked = pp.place_pipeline_params(params, mesh)
    qkv = stacked["attention"]["qkv"]["kernel"]  # (S, per, D, 3D)
    assert qkv.shape[0] == mesh.shape["pipe"]
    assert qkv.sharding.spec == P("pipe")
    # a single addressable shard covers exactly one stage
    shard = qkv.addressable_shards[0]
    assert shard.data.shape[0] == 1
    assert "layers" not in rest and "post_layernorm" in rest


def test_pp_stack_requires_divisibility(params):
    with pytest.raises(AssertionError):
        pp.stack_pipeline_params(params, 3)
