"""Multi-chip shardings on the virtual 8-device CPU mesh: TP param placement
and sharded-vs-single-device numerical equivalence."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from streamformer_tpu.config import StreamformerConfig
from streamformer_tpu.models import encoder
from streamformer_tpu.parallel.mesh import make_mesh
from streamformer_tpu.parallel import sharding as sh

CFG = StreamformerConfig(
    image_size=32,
    patch_size=16,
    num_frames=4,
    hidden_size=64,
    num_hidden_layers=2,
    num_attention_heads=4,
    intermediate_size=128,
    dtype="float32",
    use_pallas=False,
)


@pytest.fixture(scope="module")
def mesh():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    return make_mesh(data=4, model=2)


def test_param_specs(mesh):
    params = encoder.init_params(jax.random.PRNGKey(0), CFG)
    sharded = sh.shard_params(params, mesh)
    qkv = sharded["layers"][0]["attention"]["qkv"]["kernel"]
    out = sharded["layers"][0]["attention"]["out"]["kernel"]
    assert qkv.sharding.spec == P(None, "model")  # column parallel
    assert out.sharding.spec == P("model", None)  # row parallel
    ln = sharded["layers"][0]["layernorm_before"]["scale"]
    assert ln.sharding.spec == P()


def test_sharded_forward_matches_single_device(mesh, rng):
    params = encoder.init_params(jax.random.PRNGKey(0), CFG)
    for lp in params["layers"]:
        lp["temporal_attention_gating"] = jnp.asarray(0.5)
    px = jnp.asarray(rng.standard_normal((8, 4, 3, 32, 32)).astype(np.float32))

    ref = encoder.model_forward(params, px, CFG)["pooler_output"]

    params_s = sh.shard_params(params, mesh)
    px_s = jax.device_put(px, sh.batch_sharding(mesh))
    got = jax.jit(lambda p, x: encoder.model_forward(p, x, CFG)["pooler_output"])(
        params_s, px_s
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5,
                               rtol=2e-5)


def test_dryrun_multichip_entrypoint():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    import importlib
    import sys, os

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    ge = importlib.import_module("__graft_entry__")
    ge.dryrun_multichip(8)


def test_sequence_parallel_patch_axis(mesh, rng):
    """SP: patch axis N sharded over "model" via activation constraints
    (temporal attention is embarrassingly parallel over N, SURVEY §5.7);
    numerics identical to single-device."""
    from jax.sharding import NamedSharding

    cfg_sp = CFG.replace(shard_patches=True, image_size=64)
    cfg_ref = CFG.replace(image_size=64)
    params = encoder.init_params(jax.random.PRNGKey(0), cfg_ref)
    for lp in params["layers"]:
        lp["temporal_attention_gating"] = jnp.asarray(0.5)
    px = jnp.asarray(rng.standard_normal((4, 4, 3, 64, 64)).astype(np.float32))
    ref = encoder.model_forward(params, px, cfg_ref)["pooler_output"]
    sp_mesh = make_mesh(data=2, model=4)  # 16 patches over 4 shards
    with jax.set_mesh(sp_mesh):
        params_s = jax.device_put(params, NamedSharding(sp_mesh, P()))
        px_s = jax.device_put(px, NamedSharding(sp_mesh, P("data")))
        got = jax.jit(
            lambda p, x: encoder.model_forward(p, x, cfg_sp)["pooler_output"]
        )(params_s, px_s)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5,
                               rtol=2e-5)


def test_sharded_streaming_cache_matches_single_device(mesh, rng):
    """DP serving: batch-sharded streaming with the pos-major cache. The
    flat (C, B·N, D) cache shards on dim 1 — rows are b-major, so equal
    chunks align with batch boundaries when B % n_shards == 0 — and the
    sharded step must equal the unsharded one."""
    from jax.sharding import NamedSharding

    b = 2 * mesh.shape["data"]
    params = encoder.init_params(jax.random.PRNGKey(0), CFG)
    for lp in params["layers"]:
        lp["temporal_attention_gating"] = jnp.asarray(0.7)
    px = jnp.asarray(
        rng.standard_normal((b, 3, 3, 32, 32)).astype(np.float32)
    )

    def run(shard):
        cache = encoder.init_cache(CFG, batch=b)
        if shard:
            px_s = jax.device_put(px, NamedSharding(mesh, P("data")))
            cache = jax.tree.map(
                lambda x: jax.device_put(
                    x,
                    NamedSharding(
                        mesh, P(*([None, "data"] + [None] * (x.ndim - 2)))
                    ),
                )
                if x.ndim >= 2
                else x,
                cache,
            )
        else:
            px_s = px
        outs = []
        for t in range(3):
            out, cache = encoder.streaming_forward(
                params, px_s[:, t : t + 1], cache, CFG
            )
            outs.append(np.asarray(out["pooler_output"], np.float32))
        return np.concatenate(outs, axis=1)

    np.testing.assert_allclose(run(True), run(False), atol=1e-5, rtol=1e-5)


def test_lm_tp_sharded_decode_matches_single_device(mesh, rng):
    """LM tree TP specs (q/k/v/gate/up column, o/down row, vocab-sharded
    embedding + head): a TP=2 sharded greedy-decode step equals the
    replicated one (VERDICT r2 weak #5 — 7B vision-tower serving on 16 GB
    v5e chips needs the LM sharded, not just the encoder)."""
    from streamformer_tpu.models import language_model as LM

    cfg = LM.LMConfig(
        vocab_size=128, hidden_size=64, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2,
        intermediate_size=128, max_position_embeddings=32,
    )
    params = LM.init_params(jax.random.PRNGKey(0), cfg)

    # specs hit the LM leaves
    q_spec = sh.param_spec(
        (jax.tree_util.DictKey("layers"), jax.tree_util.SequenceKey(0),
         jax.tree_util.DictKey("attn"), jax.tree_util.DictKey("q"),
         jax.tree_util.DictKey("kernel")),
        params["layers"][0]["attn"]["q"]["kernel"],
    )
    assert q_spec == P(None, "model")
    emb_spec = sh.param_spec(
        (jax.tree_util.DictKey("embed_tokens"),), params["embed_tokens"]
    )
    assert emb_spec == P("model", None)

    sharded = sh.shard_params(params, mesh)
    emb = sharded["embed_tokens"]
    assert emb.sharding.spec == P("model", None)

    ids = jnp.asarray(rng.integers(0, 128, (2, 8)), jnp.int32)

    def step(p, ids):
        h = LM.embed_tokens(p, ids)
        out, _ = LM.forward(p, h, cfg)
        return out["logits"]

    ref = jax.jit(step)(params, ids)
    got = jax.jit(step)(sharded, ids)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(ref, np.float32),
        atol=2e-5, rtol=2e-5,
    )
