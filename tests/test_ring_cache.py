"""Ring-buffer cache mode: equal to linear within capacity; windowed
sliding attention (fixed HBM, unbounded streams) beyond it."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from streamformer_tpu.config import StreamformerConfig
from streamformer_tpu.models import encoder

BASE = dict(
    image_size=32,
    patch_size=16,
    num_frames=4,
    hidden_size=32,
    num_hidden_layers=2,
    num_attention_heads=4,
    intermediate_size=64,
    dtype="float32",
    use_pallas=False,
)


def test_ring_equals_linear_within_capacity(rng):
    cfg_lin = StreamformerConfig(cache_capacity=8, cache_mode="linear", **BASE)
    cfg_ring = StreamformerConfig(cache_capacity=8, cache_mode="ring", **BASE)
    params = encoder.init_params(jax.random.PRNGKey(0), cfg_lin)
    for lp in params["layers"]:
        lp["temporal_attention_gating"] = jnp.asarray(0.7)
    px = jnp.asarray(rng.standard_normal((1, 6, 3, 32, 32)).astype(np.float32))

    def run(cfg):
        cache = encoder.init_cache(cfg, batch=1)
        outs = []
        for t in range(6):
            out, cache = encoder.streaming_forward(
                params, px[:, t : t + 1], cache, cfg
            )
            outs.append(np.asarray(out["pooler_output"]))
        return np.concatenate(outs, 1)

    np.testing.assert_allclose(run(cfg_ring), run(cfg_lin), atol=1e-5, rtol=1e-5)


def test_ring_attention_matches_windowed_reference(rng):
    """Unit-level oracle: stream T=1 steps through temporal_attention with a
    ring cache; reference = softmax attention over the last `cap` steps'
    K/V kept in an explicit python history."""
    cfg = StreamformerConfig(cache_capacity=4, cache_mode="ring", **BASE)
    d, h = cfg.hidden_size, cfg.num_attention_heads
    p = encoder.init_layer_params(jax.random.PRNGKey(1), cfg)[
        "temporal_attention"
    ]
    b, n = 2, 3
    cap = 4
    cache = encoder.init_cache(cfg, batch=b, num_patches=n, capacity=cap)
    cache = {"k": cache["layers"][0]["k"], "v": cache["layers"][0]["v"]}
    k_hist, v_hist = [], []
    for step in range(9):
        x = jnp.asarray(rng.standard_normal((b, 1, n, d)).astype(np.float32))
        out, cache = encoder.temporal_attention(
            x, p, cfg, causal=True, cache_kv=cache,
            cache_len=jnp.asarray(step, jnp.int32),
        )
        q, k, v = encoder._qkv_heads(x, p["qkv"], h)
        k_hist.append(np.asarray(k))
        v_hist.append(np.asarray(v))
        # reference: attend over the last <=cap steps
        lo = max(0, step + 1 - cap)
        ks = np.concatenate(k_hist[lo:], axis=1)  # (b, w, n, h, dh)
        vs = np.concatenate(v_hist[lo:], axis=1)
        scores = np.einsum("bqnhd,bknhd->bnhqk", np.asarray(q), ks) * (
            cfg.head_dim**-0.5
        )
        probs = np.exp(scores - scores.max(-1, keepdims=True))
        probs /= probs.sum(-1, keepdims=True)
        ctx = np.einsum("bnhqk,bknhd->bqnhd", probs, vs).reshape(b, 1, n, d)
        ref = ctx @ np.asarray(p["out"]["kernel"]) + np.asarray(p["out"]["bias"])
        np.testing.assert_allclose(np.asarray(out), ref, atol=1e-4, rtol=1e-4)


@pytest.mark.parametrize("layout", ["pos_major", "row_major"])
@pytest.mark.parametrize("t_chunk", [2, 3, 6])
def test_ring_attention_multiframe_matches_windowed_reference(
    rng, t_chunk, layout
):
    """T>1 appends after wraparound: every query in the chunk must see its
    exact cap-length window (earlier queries must NOT lose old keys to the
    chunk's own writes — regression for the write-before-attend bug).

    t_chunk=6 > cap=4 covers the chunk-bigger-than-window case (the OAD
    extractor streams chunk=16 into smaller ring capacities): in-chunk keys
    need the window lower bound and only the last cap frames may be
    written (duplicate ring slots scatter with an undefined winner)."""
    cfg = StreamformerConfig(
        cache_capacity=4, cache_mode="ring", cache_layout=layout, **BASE
    )
    d, h = cfg.hidden_size, cfg.num_attention_heads
    p = encoder.init_layer_params(jax.random.PRNGKey(1), cfg)[
        "temporal_attention"
    ]
    b, n = 2, 3
    cap = 4
    cache = encoder.init_cache(cfg, batch=b, num_patches=n, capacity=cap)
    cache = {"k": cache["layers"][0]["k"], "v": cache["layers"][0]["v"]}
    k_hist, v_hist = [], []
    pos = 0
    for _ in range(4):  # enough chunks to wrap the ring multiple times
        x = jnp.asarray(rng.standard_normal((b, t_chunk, n, d)).astype(np.float32))
        out, cache = encoder.temporal_attention(
            x, p, cfg, causal=True, cache_kv=cache,
            cache_len=jnp.asarray(pos, jnp.int32),
        )
        q, k, v = encoder._qkv_heads(x, p["qkv"], h)
        for j in range(t_chunk):
            k_hist.append(np.asarray(k[:, j : j + 1]))
            v_hist.append(np.asarray(v[:, j : j + 1]))
        # oracle: per query row i, softmax over its own window
        for i in range(t_chunk):
            qpos = pos + i
            lo = max(0, qpos + 1 - cap)
            ks = np.concatenate(k_hist[lo : qpos + 1], axis=1)
            vs = np.concatenate(v_hist[lo : qpos + 1], axis=1)
            qi = np.asarray(q[:, i : i + 1])
            scores = np.einsum("bqnhd,bknhd->bnhqk", qi, ks) * (
                cfg.head_dim**-0.5
            )
            probs = np.exp(scores - scores.max(-1, keepdims=True))
            probs /= probs.sum(-1, keepdims=True)
            ctx = np.einsum("bnhqk,bknhd->bqnhd", probs, vs).reshape(b, 1, n, d)
            ref = ctx @ np.asarray(p["out"]["kernel"]) + np.asarray(
                p["out"]["bias"]
            )
            np.testing.assert_allclose(
                np.asarray(out[:, i : i + 1]), ref, atol=1e-4, rtol=1e-4,
                err_msg=f"chunk at pos {pos}, query {i}",
            )
        pos += t_chunk


def test_ring_streams_beyond_capacity_stay_finite(rng):
    cfg = StreamformerConfig(cache_capacity=4, cache_mode="ring", **BASE)
    params = encoder.init_params(jax.random.PRNGKey(0), cfg)
    cache = encoder.init_cache(cfg, batch=1)
    px = jnp.asarray(rng.standard_normal((1, 12, 3, 32, 32)).astype(np.float32))
    step = jax.jit(
        lambda p, f, c: encoder.streaming_forward(p, f, c, cfg),
    )
    for t in range(12):  # 3x the capacity
        out, cache = step(params, px[:, t : t + 1], cache)
    assert int(cache["len"]) == 12
    assert np.isfinite(np.asarray(out["pooler_output"])).all()
