"""AOT export artifacts (streamformer_tpu/export.py).

Contract: a serialized artifact, deserialized with no model code in the
loop (jax.export bytes -> callable), reproduces the live jitted program
exactly — full-clip forward, streaming steps threading the cache, and
the ragged per-stream variant. The torch reference has no export path;
this is the deployment story of the rebuilt framework.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from streamformer_tpu.config import StreamformerConfig
from streamformer_tpu.models import encoder
from streamformer_tpu import export as EX

CFG = StreamformerConfig(
    image_size=32,
    patch_size=16,
    num_frames=8,
    hidden_size=64,
    num_hidden_layers=2,
    num_attention_heads=4,
    intermediate_size=128,
    dtype="float32",
    use_pallas=False,
    cache_capacity=8,
)


@pytest.fixture(scope="module")
def params():
    return encoder.init_params(jax.random.PRNGKey(0), CFG)


def test_full_clip_export_roundtrip(tmp_path, params):
    blob = EX.export_full_clip(CFG, batch=2, path=str(tmp_path / "fc.bin"))
    call = EX.load_exported(blob)
    call_from_file = EX.load_exported(str(tmp_path / "fc.bin"))

    px = jnp.asarray(
        np.random.default_rng(0).standard_normal((2, 8, 3, 32, 32)),
        jnp.float32,
    )
    ref = encoder.model_forward(params, px, CFG)
    got = call(params, px)
    np.testing.assert_array_equal(
        np.asarray(got["pooler_output"]), np.asarray(ref["pooler_output"])
    )
    np.testing.assert_array_equal(
        np.asarray(got["last_hidden_state"]),
        np.asarray(ref["last_hidden_state"]),
    )
    got2 = call_from_file(params, px)
    np.testing.assert_array_equal(
        np.asarray(got2["pooler_output"]), np.asarray(ref["pooler_output"])
    )


def test_streaming_export_threads_cache(params):
    """The exported step is stateless-callable: thread the cache through
    N steps and match the live streaming path frame for frame."""
    blob = EX.export_streaming_step(CFG, batch=1, t_new=1)
    call = EX.load_exported(blob)

    rng = np.random.default_rng(1)
    clip = jnp.asarray(
        rng.standard_normal((1, 6, 3, 32, 32)), jnp.float32
    )
    c_live = encoder.init_cache(CFG, batch=1)
    c_exp = encoder.init_cache(CFG, batch=1)
    for t in range(6):
        o_live, c_live = encoder.streaming_forward(
            params, clip[:, t : t + 1], c_live, CFG
        )
        o_exp, c_exp = call(params, clip[:, t : t + 1], c_exp)
        np.testing.assert_allclose(
            np.asarray(o_exp["pooler_output"]),
            np.asarray(o_live["pooler_output"]),
            rtol=0, atol=1e-6, err_msg=f"step {t}",
        )


def test_ragged_export(params):
    """per_stream_len export: mixed per-stream positions match lone
    streams through the exported program."""
    blob = EX.export_streaming_step(CFG, batch=2, t_new=1,
                                    per_stream_len=True)
    call = EX.load_exported(blob)

    rng = np.random.default_rng(2)
    clips = jnp.asarray(rng.standard_normal((2, 4, 3, 32, 32)), jnp.float32)

    # exported ragged: stream 0 starts 2 frames ahead of stream 1
    c = encoder.init_cache(CFG, batch=2, per_stream_len=True)
    for t in range(2):  # advance stream 0 only (stream 1 fed zeros, then
        # its rows reset below)
        o, c = call(params,
                    jnp.stack([clips[0, t], jnp.zeros_like(clips[0, t])])[
                        :, None
                    ], c)
    c = encoder.reset_streams(c, jnp.asarray([False, True]))
    outs = []
    for t in range(2):
        frames = jnp.stack([clips[0, 2 + t], clips[1, t]])[:, None]
        o, c = call(params, frames, c)
        outs.append(np.asarray(o["pooler_output"][:, 0]))

    # oracles: lone linear streams at their own positions
    c0 = encoder.init_cache(CFG, batch=1)
    ref0 = []
    for t in range(4):
        o, c0 = encoder.streaming_forward(params, clips[:1, t : t + 1],
                                          c0, CFG)
        ref0.append(np.asarray(o["pooler_output"][0, 0]))
    c1 = encoder.init_cache(CFG, batch=1)
    ref1 = []
    for t in range(2):
        o, c1 = encoder.streaming_forward(params, clips[1:, t : t + 1],
                                          c1, CFG)
        ref1.append(np.asarray(o["pooler_output"][0, 0]))

    np.testing.assert_allclose(outs[0][0], ref0[2], rtol=0, atol=1e-5)
    np.testing.assert_allclose(outs[1][0], ref0[3], rtol=0, atol=1e-5)
    np.testing.assert_allclose(outs[0][1], ref1[0], rtol=0, atol=1e-5)
    np.testing.assert_allclose(outs[1][1], ref1[1], rtol=0, atol=1e-5)


def test_quantized_weights_export(params):
    """int8-dense artifact: expects the quantize_encoder_params pytree and
    matches the live int8 serving path."""
    from streamformer_tpu.ops import quant

    blob = EX.export_streaming_step(CFG, batch=1, t_new=1,
                                    quantized_weights=True)
    call = EX.load_exported(blob)
    qparams = quant.quantize_encoder_params(params)

    rng = np.random.default_rng(3)
    clip = jnp.asarray(rng.standard_normal((1, 3, 3, 32, 32)), jnp.float32)
    c_live = encoder.init_cache(CFG, batch=1)
    c_exp = encoder.init_cache(CFG, batch=1)
    for t in range(3):
        o_live, c_live = encoder.streaming_forward(
            qparams, clip[:, t : t + 1], c_live, CFG
        )
        o_exp, c_exp = call(qparams, clip[:, t : t + 1], c_exp)
        np.testing.assert_allclose(
            np.asarray(o_exp["pooler_output"]),
            np.asarray(o_live["pooler_output"]),
            rtol=0, atol=1e-6,
        )


def test_sharded_forward_export(params):
    """GSPMD artifact on the 8-device virtual mesh (dp=4, mp=2): the
    partitioned program (collectives included) round-trips through
    serialize/deserialize and matches the unsharded forward."""
    from streamformer_tpu.parallel.mesh import make_mesh
    from streamformer_tpu.parallel import sharding as S

    mesh = make_mesh(data=4, model=2)
    blob = EX.export_sharded_forward(CFG, batch=4, mesh=mesh, num_frames=4)
    call = EX.load_exported(blob)

    px = jnp.asarray(
        np.random.default_rng(4).standard_normal((4, 4, 3, 32, 32)),
        jnp.float32,
    )
    ref = encoder.model_forward(params, px, CFG)
    sharded_params = S.shard_params(params, mesh)
    px_sharded = jax.device_put(px, S.batch_sharding(mesh))
    got = call(sharded_params, px_sharded)
    np.testing.assert_allclose(
        np.asarray(got["pooler_output"]), np.asarray(ref["pooler_output"]),
        rtol=0, atol=1e-5,
    )


def test_lm_decode_export():
    """The ragged LM decode artifact (the engine's greedy hot step, with
    the idle-slot hold) matches the live forward over a threaded cache:
    two slots at mixed depths, one held idle mid-run."""
    from streamformer_tpu.models import language_model as LM
    from test_language_model import SMALL as LM_CFG

    lm_params = LM.init_params(jax.random.PRNGKey(5), LM_CFG)
    blob = EX.export_lm_decode(LM_CFG, slots=2, capacity=12)
    call = EX.load_exported(blob)

    rng = np.random.default_rng(11)
    cache_a = LM.init_cache(LM_CFG, 2, 12, per_stream_len=True)
    cache_b = jax.tree.map(jnp.copy, cache_a)
    cache_a = {**cache_a, "len": jnp.asarray([0, 3], jnp.int32)}
    cache_b = {**cache_b, "len": jnp.asarray([0, 3], jnp.int32)}
    actives = [[True, True], [True, False], [True, True]]
    for act in actives:
        toks = jnp.asarray(rng.integers(0, LM_CFG.vocab_size, (2,)),
                           jnp.int32)
        ntok, cache_a = call(lm_params, toks, cache_a,
                             jnp.asarray(act))
        emb = LM.embed_tokens(lm_params, toks)[:, None]
        out_b, cache_b = LM.forward(lm_params, emb, LM_CFG, cache=cache_b)
        cache_b = {**cache_b, "len": jnp.where(
            jnp.asarray(act), cache_b["len"], cache_b["len"] - 1
        )}
        np.testing.assert_array_equal(
            np.asarray(ntok),
            np.argmax(np.asarray(out_b["logits"][:, -1]), -1),
        )
    np.testing.assert_array_equal(
        np.asarray(cache_a["len"]), np.asarray(cache_b["len"])
    )
    # idle-slot hold: slot 1 skipped one tick -> frontier one behind
    np.testing.assert_array_equal(np.asarray(cache_a["len"]), [3, 5])


def test_export_cli(tmp_path):
    out = tmp_path / "artifact.bin"
    EX.main(["--out", str(out), "--streaming", "--batch", "1",
             "--capacity", "8", "--num_frames", "8", "--dtype", "float32"])
    assert out.stat().st_size > 0
