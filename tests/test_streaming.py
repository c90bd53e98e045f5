"""Streaming KV-cache == full-clip equivalence (the test_kvcache.py contract).

Reference correctness contract (downstream/VideoQA/test_kvcache.py:55-88):
encoding frames [s, s+k) with a cache of frames [0, s) must equal the
corresponding slice of a full-clip encode of frames [0, s+k).
"""

import numpy as np
import jax
import jax.numpy as jnp

from streamformer_tpu.config import StreamformerConfig
from streamformer_tpu.models import encoder

CFG = StreamformerConfig(
    image_size=48,
    patch_size=16,
    num_frames=8,
    hidden_size=96,
    num_hidden_layers=2,
    num_attention_heads=4,
    intermediate_size=192,
    enable_causal_temporal=True,
    dtype="float32",
    use_pallas=False,
    cache_capacity=16,
)


def _setup(t_total=8, b=2):
    params = encoder.init_params(jax.random.PRNGKey(0), CFG)
    # non-trivial temporal path: open the tanh gate
    for lp in params["layers"]:
        lp["temporal_attention_gating"] = jnp.asarray(0.7)
    rng = np.random.default_rng(1)
    px = rng.standard_normal((b, t_total, 3, 48, 48)).astype(np.float32)
    return params, jnp.asarray(px)


def test_streaming_matches_full_clip_two_chunks():
    params, px = _setup()
    full = encoder.model_forward(params, px, CFG)

    cache = encoder.init_cache(CFG, batch=2)
    out1, cache = encoder.streaming_forward(params, px[:, :5], cache, CFG)
    out2, cache = encoder.streaming_forward(params, px[:, 5:], cache, CFG)

    got_pool = np.concatenate(
        [np.asarray(out1["pooler_output"]), np.asarray(out2["pooler_output"])], axis=1
    )
    got_last = np.concatenate(
        [np.asarray(out1["last_hidden_state"]), np.asarray(out2["last_hidden_state"])],
        axis=1,
    )
    np.testing.assert_allclose(
        got_pool, np.asarray(full["pooler_output"]), atol=1e-4, rtol=1e-4
    )
    np.testing.assert_allclose(
        got_last, np.asarray(full["last_hidden_state"]), atol=1e-4, rtol=1e-4
    )
    assert int(cache["len"]) == 8


def test_streaming_frame_by_frame():
    """One frame per step — the O(1) incremental north-star path."""
    params, px = _setup()
    full = encoder.model_forward(params, px, CFG)
    cache = encoder.init_cache(CFG, batch=2)
    step = jax.jit(
        lambda p, f, c: encoder.streaming_forward(p, f, c, CFG),
        static_argnames=(),
    )
    pools = []
    for t in range(8):
        out, cache = step(params, px[:, t : t + 1], cache)
        pools.append(np.asarray(out["pooler_output"]))
    got = np.concatenate(pools, axis=1)
    np.testing.assert_allclose(
        got, np.asarray(full["pooler_output"]), atol=1e-4, rtol=1e-4
    )


def test_streaming_one_compiled_program():
    """Every step reuses one compiled XLA program (static cache shapes)."""
    params, px = _setup()
    cache = encoder.init_cache(CFG, batch=2)

    @jax.jit
    def step(p, f, c):
        return encoder.streaming_forward(p, f, c, CFG)

    for t in range(4):
        out, cache = step(params, px[:, t : t + 1], cache)
    assert step._cache_size() == 1


def test_cache_capacity_shapes_static():
    cache = encoder.init_cache(CFG, batch=3, capacity=32)
    assert len(cache["layers"]) == CFG.num_hidden_layers
    # pos-major layout (default): flat (C, B·N, D) — 3-D on purpose (the
    # 4-D shape gets a permuted XLA default layout that forces full-cache
    # relayout copies around the decode kernel); appends are in-kernel
    # plane writes on the aliased buffers
    assert cache["layers"][0]["k"].shape == (
        32,
        3 * CFG.num_patches,
        CFG.hidden_size,
    )
    # row-major kept for the ring mode (scattered slot writes)
    rm = encoder.init_cache(
        CFG.replace(cache_layout="row_major"), batch=3, capacity=32
    )
    assert rm["layers"][0]["k"].shape == (
        3,
        CFG.num_patches,
        32,
        CFG.hidden_size,
    )


def test_row_major_bf16_odd_capacity_decode(monkeypatch):
    """Row-major bf16 cache whose capacity is NOT a multiple of 8, with the
    Pallas flags on: too small for the in-place kernel, and it must NOT
    fall into the int8-fused branch (which reads the k_scale leaves a
    non-quantized cache doesn't have) — regression for a KeyError that only
    fired on TPU. Patching _use_pallas exercises the dispatch on CPU; the
    surviving einsum path never invokes a kernel."""
    params, px = _setup()
    cfg = CFG.replace(cache_layout="row_major", use_pallas_spatial=False)
    ref_cache = encoder.init_cache(cfg, batch=2, capacity=20)
    refs = []
    for t in range(4):
        out, ref_cache = encoder.streaming_forward(
            params, px[:, t : t + 1], ref_cache, cfg
        )
        refs.append(np.asarray(out["pooler_output"]))

    monkeypatch.setattr(encoder, "_use_pallas", lambda c: True)
    cache = encoder.init_cache(cfg, batch=2, capacity=20)
    for t in range(4):
        out, cache = encoder.streaming_forward(
            params, px[:, t : t + 1], cache, cfg
        )
        np.testing.assert_allclose(
            np.asarray(out["pooler_output"]), refs[t], atol=1e-5, rtol=1e-5
        )


def test_streaming_int8_cache_close_to_full_clip(rng):
    """cache_dtype="int8": streaming outputs track the full-clip forward
    within quantization noise (per-(row,pos,head) absmax int8)."""
    cfg = CFG.replace(cache_dtype="int8")
    params = encoder.init_params(jax.random.PRNGKey(0), cfg)
    for lp in params["layers"]:
        lp["temporal_attention_gating"] = jnp.asarray(0.7)
    px = jnp.asarray(rng.standard_normal((2, 4, 3, 48, 48)).astype(np.float32))
    full = encoder.model_forward(params, px, cfg)["pooler_output"]
    cache = encoder.init_cache(cfg, batch=2)
    assert cache["layers"][0]["k"].dtype == jnp.int8
    outs = []
    for t in range(4):
        out, cache = encoder.streaming_forward(params, px[:, t : t + 1], cache, cfg)
        outs.append(out["pooler_output"])
    got = jnp.concatenate(outs, axis=1)
    f = np.asarray(full, np.float32)
    g = np.asarray(got, np.float32)
    cos = (f * g).sum() / np.sqrt((f**2).sum() * (g**2).sum())
    assert cos > 0.999, cos
    np.testing.assert_allclose(g, f, atol=0.05)


def test_streaming_beyond_trained_positions_matches_full_clip():
    """Streams longer than the trained time-embedding table (the
    ``total > num_frames`` regime) still satisfy the streaming == full-clip
    contract when the caller passes ``total_frames_hint``.

    Chosen contract (deliberate deviation from the reference): ONE
    nearest-interpolated table for the whole stream, fixed by the
    ``total_frames_hint`` the stream announces up front, with positions past
    the table clamped to its last row (encoder.py
    time_embeddings_for_positions). The reference instead re-interpolates
    the table every step from the CURRENT total (timesformer_encoder.py:
    336-369), silently re-embedding PAST frames each step — cache-incoherent
    (cached K/V were computed under the old embeddings), so its own
    cache==full-clip contract cannot hold past the trained range. Ours does,
    because the full-clip path (model_forward, total = t) interpolates to
    the same final length.

    Fixture: 24-frame stream into a capacity-32 cache, trained positions =
    8 (CFG.num_frames), fed in uneven chunks.
    """
    t_total = 24
    cfg = CFG.replace(cache_capacity=32)
    params, px = _setup(t_total=t_total)
    full = encoder.model_forward(params, px, cfg)

    cache = encoder.init_cache(cfg, batch=2)
    outs = []
    for lo, hi in [(0, 3), (3, 11), (11, 16), (16, 24)]:
        o, cache = encoder.streaming_forward(
            params, px[:, lo:hi], cache, cfg, total_frames_hint=t_total
        )
        outs.append(o)
    got_pool = np.concatenate(
        [np.asarray(o["pooler_output"]) for o in outs], axis=1
    )
    got_last = np.concatenate(
        [np.asarray(o["last_hidden_state"]) for o in outs], axis=1
    )
    np.testing.assert_allclose(
        got_pool, np.asarray(full["pooler_output"]), atol=2e-4, rtol=2e-4
    )
    np.testing.assert_allclose(
        got_last, np.asarray(full["last_hidden_state"]), atol=2e-4, rtol=2e-4
    )

    # without the hint the stream clamps to the trained table: well-formed
    # (finite) but a DIFFERENT sequence than the interpolated full clip —
    # pin that the clamp path stays finite so the fallback is usable
    cache2 = encoder.init_cache(cfg, batch=2)
    o2, cache2 = encoder.streaming_forward(params, px, cache2, cfg)
    assert np.isfinite(np.asarray(o2["pooler_output"])).all()
