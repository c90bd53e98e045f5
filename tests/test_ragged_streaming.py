"""Ragged (per-stream length) streaming — continuous batching.

Contract: with ``init_cache(per_stream_len=True)`` every batch row advances
independently; row b of a ragged step equals a lone B=1 stream at the same
position fed the same frames (per-stream time embeddings, masks, appends).
The reference has no analog — its HF DynamicCache advances all rows in
lockstep (timesformer_encoder.py:517-546); this is a TPU-native serving
feature: one compiled program serves a batch of streams at mixed positions
and ``reset_streams`` re-admits finished slots without recompiling.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from streamformer_tpu.config import StreamformerConfig
from streamformer_tpu.models import encoder


def small_cfg(**kw):
    base = dict(
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
    base.update(kw)
    return StreamformerConfig(**base)


def drive(params, cfg, frames, cache):
    """One streaming step; returns (pooler (B, 1, D), cache)."""
    out, cache = encoder.streaming_forward(params, frames, cache, cfg)
    return out["pooler_output"], cache


@pytest.mark.fast
def test_ragged_rows_match_independent_streams():
    """Streams joining at different times: every ragged row reproduces a
    lone stream at its own position, bit-for-bit at fp32 einsum."""
    cfg = small_cfg()
    params = encoder.init_params(jax.random.PRNGKey(0), cfg)
    B, steps = 3, 7
    join = [0, 2, 4]
    frames = jnp.asarray(
        np.random.default_rng(1).standard_normal(
            (B, steps, 3, cfg.image_size, cfg.image_size)
        ),
        jnp.float32,
    )

    cache = encoder.init_cache(cfg, batch=B, per_stream_len=True)
    assert cache["len"].shape == (B,)
    ragged_out = []
    for s in range(steps):
        done = jnp.asarray([join[b] == s for b in range(B)])
        cache = encoder.reset_streams(cache, done)
        pooled, cache = drive(params, cfg, frames[:, s : s + 1], cache)
        ragged_out.append(np.asarray(pooled[:, 0]))
    assert cache["len"].tolist() == [steps - j for j in join]

    for b in range(B):
        solo = encoder.init_cache(cfg, batch=1)
        for s in range(join[b], steps):
            pooled, solo = drive(params, cfg, frames[b : b + 1, s : s + 1], solo)
            np.testing.assert_allclose(
                ragged_out[s][b],
                np.asarray(pooled[0, 0]),
                rtol=0,
                atol=1e-5,
                err_msg=f"stream {b} step {s}",
            )


@pytest.mark.fast
def test_ragged_int8_kv_matches_independent():
    """Ragged + int8 KV cache (einsum fallback path: one-hot plane/scale
    writes) matches independent int8 streams."""
    cfg = small_cfg(cache_dtype="int8")
    params = encoder.init_params(jax.random.PRNGKey(0), cfg)
    B, steps = 2, 5
    join = [0, 2]
    frames = jnp.asarray(
        np.random.default_rng(2).standard_normal(
            (B, steps, 3, cfg.image_size, cfg.image_size)
        ),
        jnp.float32,
    )
    cache = encoder.init_cache(cfg, batch=B, per_stream_len=True)
    ragged_out = []
    for s in range(steps):
        done = jnp.asarray([join[b] == s for b in range(B)])
        cache = encoder.reset_streams(cache, done)
        pooled, cache = drive(params, cfg, frames[:, s : s + 1], cache)
        ragged_out.append(np.asarray(pooled[:, 0]))
    for b in range(B):
        solo = encoder.init_cache(cfg, batch=1)
        for s in range(join[b], steps):
            pooled, solo = drive(params, cfg, frames[b : b + 1, s : s + 1], solo)
            np.testing.assert_allclose(
                ragged_out[s][b], np.asarray(pooled[0, 0]), rtol=0, atol=1e-5,
                err_msg=f"int8 stream {b} step {s}",
            )


@pytest.mark.fast
def test_ragged_decode_kernel_interpret():
    """The ragged decode kernel on the padded-flat (C, B·n_pad, D) cache
    (per-ROW-BLOCK scalar-prefetch lens, per-stream clamp + plane slot)
    matches a per-row softmax oracle, including the appended planes at
    each stream's own slot."""
    from streamformer_tpu.ops import attention as pops

    rng = np.random.default_rng(3)
    b, n_pad, cap, h, dh = 3, 8, 8, 2, 8
    d = h * dh
    r = b * n_pad
    lens = jnp.asarray([0, 3, 6], jnp.int32)
    q = jnp.asarray(rng.standard_normal((r, d)), jnp.float32)
    kn = jnp.asarray(rng.standard_normal((r, d)), jnp.float32)
    vn = jnp.asarray(rng.standard_normal((r, d)), jnp.float32)
    k_cache = jnp.asarray(rng.standard_normal((cap, r, d)), jnp.float32)
    v_cache = jnp.asarray(rng.standard_normal((cap, r, d)), jnp.float32)

    out, k2, v2 = pops.fused_temporal_decode_pm_ragged(
        q, kn, vn, k_cache, v_cache, lens, n_pad,
        num_heads=h, interpret=True,
    )

    for bb in range(b):
        L = int(lens[bb])
        for p in range(n_pad):
            row = bb * n_pad + p
            ks = np.concatenate(
                [np.asarray(k_cache[:L, row]), np.asarray(kn[row : row + 1])]
            )  # (L+1, D)
            vs = np.concatenate(
                [np.asarray(v_cache[:L, row]), np.asarray(vn[row : row + 1])]
            )
            got = np.asarray(out[row])
            for hh in range(h):
                sl = slice(hh * dh, (hh + 1) * dh)
                s = ks[:, sl] @ np.asarray(q[row, sl]) * dh**-0.5
                p_ = np.exp(s - s.max())
                p_ = p_ / p_.sum()
                want = p_ @ vs[:, sl]
                np.testing.assert_allclose(
                    got[sl], want, rtol=0, atol=1e-5,
                    err_msg=f"row {row} head {hh}",
                )
            # appended plane at the stream's own slot len[b] % cap
            np.testing.assert_allclose(
                np.asarray(k2[L % cap, row]), np.asarray(kn[row]), atol=0
            )
            np.testing.assert_allclose(
                np.asarray(v2[L % cap, row]), np.asarray(vn[row]), atol=0
            )


def test_multi_append_kernel_interpret():
    """The T-frame ragged append-and-attend kernel (StreamingEngine
    throughput mode: all T queries answered per cache read, new rows
    merged into [len, len+valid) during the aliased write-back) matches a
    per-row softmax oracle, including partial per-stream valid counts and
    the merged cache planes."""
    from streamformer_tpu.ops import attention as pops

    rng = np.random.default_rng(5)
    b, n_pad, cap, h, dh, t = 3, 8, 8, 2, 8, 3
    d = h * dh
    r = b * n_pad
    lens = jnp.asarray([0, 2, 5], jnp.int32)
    valid = jnp.asarray([3, 1, 0], jnp.int32)
    q = jnp.asarray(rng.standard_normal((t, r, d)), jnp.float32)
    kn = jnp.asarray(rng.standard_normal((t, r, d)), jnp.float32)
    vn = jnp.asarray(rng.standard_normal((t, r, d)), jnp.float32)
    k_cache = jnp.asarray(rng.standard_normal((cap, r, d)), jnp.float32)
    v_cache = jnp.asarray(rng.standard_normal((cap, r, d)), jnp.float32)

    out, k2, v2 = pops.fused_temporal_append_pm_ragged(
        q, kn, vn, k_cache, v_cache, lens, valid, n_pad,
        num_heads=h, interpret=True, cache_block=4,
    )

    for bb in range(b):
        L, V = int(lens[bb]), int(valid[bb])
        for p in range(n_pad):
            row = bb * n_pad + p
            for ti in range(t):  # every query, incl. ti >= V for ti < V' ...
                if ti >= max(V, 1) and V > 0:
                    continue  # garbage columns: no contract
                if V == 0 and ti > 0:
                    continue
                # query ti attends old cache [:L] + new frames [:ti+1]
                ks = np.concatenate(
                    [np.asarray(k_cache[:L, row]),
                     np.asarray(kn[: ti + 1, row])]
                )
                vs = np.concatenate(
                    [np.asarray(v_cache[:L, row]),
                     np.asarray(vn[: ti + 1, row])]
                )
                got = np.asarray(out[ti, row])
                for hh in range(h):
                    sl = slice(hh * dh, (hh + 1) * dh)
                    s = ks[:, sl] @ np.asarray(q[ti, row, sl]) * dh**-0.5
                    p_ = np.exp(s - s.max())
                    p_ = p_ / p_.sum()
                    want = p_ @ vs[:, sl]
                    np.testing.assert_allclose(
                        got[sl], want, rtol=0, atol=1e-5,
                        err_msg=f"row {row} q {ti} head {hh}",
                    )
            # merged planes: old content below len, new rows in
            # [len, len+valid)
            for slot in range(L):
                np.testing.assert_allclose(
                    np.asarray(k2[slot, row]), np.asarray(k_cache[slot, row]),
                    atol=0, err_msg=f"old k slot {slot} row {row}",
                )
            for off in range(V):
                np.testing.assert_allclose(
                    np.asarray(k2[L + off, row]), np.asarray(kn[off, row]),
                    atol=0, err_msg=f"new k slot {L+off} row {row}",
                )
                np.testing.assert_allclose(
                    np.asarray(v2[L + off, row]), np.asarray(vn[off, row]),
                    atol=0, err_msg=f"new v slot {L+off} row {row}",
                )


def test_multi_append_streaming_forward_parity():
    """streaming_forward routed through the multi-append kernel
    (interpret mode) equals the einsum path (use_pallas=False) for a
    ragged t=3 append with partial per-stream new_valid — outputs on the
    valid columns, appended planes, and the advanced lens."""
    from jax.experimental import pallas as pl
    from streamformer_tpu.ops import attention as A

    cfg_e = small_cfg()
    cfg_p = small_cfg(use_pallas=True)
    params = encoder.init_params(jax.random.PRNGKey(0), cfg_e)
    B, t = 3, 3
    valid = jnp.asarray([3, 1, 0], jnp.int32)
    lens0 = [2, 0, 4]
    frames_all = jnp.asarray(
        np.random.default_rng(7).standard_normal(
            (B, 6, 3, cfg_e.image_size, cfg_e.image_size)
        ),
        jnp.float32,
    )

    def prefill(cfg):
        # lockstep-append max(lens0) frames, then pin the mixed per-stream
        # lens: slots >= lens0[b] hold stale content both runs share, and
        # the appends under test overwrite [len, len+valid)
        cache = encoder.init_cache(cfg, batch=B, per_stream_len=True)
        for s in range(max(lens0)):
            _, cache = encoder.streaming_forward(
                params, frames_all[:, s : s + 1], cache, cfg)
        return {**cache, "len": jnp.asarray(lens0, jnp.int32)}

    new = frames_all[:, 3 : 3 + t]
    out_e, cache_e = encoder.streaming_forward(
        params, new, prefill(cfg_e), cfg_e, new_valid=valid)

    import unittest.mock as mock
    orig = pl.pallas_call
    with mock.patch.object(
        A.pl, "pallas_call",
        lambda *a, **k: orig(*a, **{**k, "interpret": True}),
    ), mock.patch.object(encoder, "_use_pallas", lambda cfg: cfg.use_pallas):
        out_p, cache_p = encoder.streaming_forward(
            params, new, prefill(cfg_p), cfg_p, new_valid=valid)

    assert cache_e["len"].tolist() == cache_p["len"].tolist() == \
        [l + int(v) for l, v in zip(lens0, valid)]
    for bq in range(B):
        v = int(valid[bq])
        if v:
            np.testing.assert_allclose(
                np.asarray(out_p["pooler_output"][bq, :v]),
                np.asarray(out_e["pooler_output"][bq, :v]),
                rtol=0, atol=1e-5, err_msg=f"stream {bq}",
            )
    for i in range(cfg_e.num_hidden_layers):
        for key in ("k", "v"):
            np.testing.assert_allclose(
                np.asarray(cache_p["layers"][i][key][:5]),
                np.asarray(cache_e["layers"][i][key][:5]),
                rtol=0, atol=1e-5, err_msg=f"layer {i} {key}",
            )


@pytest.mark.fast
def test_ragged_ring_wraparound_kernel():
    """Per-stream lengths PAST capacity: the same kernel's slot-mod plane
    write + slot-exclusion mask give each stream its own sliding window
    (ring mode per stream). Oracle: window of the last cap-1 cached
    positions (the slot the new frame overwrites is excluded) + the new
    frame."""
    from streamformer_tpu.ops import attention as pops

    rng = np.random.default_rng(7)
    b, n_pad, cap, h, dh = 2, 8, 8, 2, 8
    d = h * dh
    r = b * n_pad
    lens = jnp.asarray([11, 21], jnp.int32)  # both past capacity
    q = jnp.asarray(rng.standard_normal((r, d)), jnp.float32)
    kn = jnp.asarray(rng.standard_normal((r, d)), jnp.float32)
    vn = jnp.asarray(rng.standard_normal((r, d)), jnp.float32)
    k_cache = jnp.asarray(rng.standard_normal((cap, r, d)), jnp.float32)
    v_cache = jnp.asarray(rng.standard_normal((cap, r, d)), jnp.float32)

    out, k2, v2 = pops.fused_temporal_decode_pm_ragged(
        q, kn, vn, k_cache, v_cache, lens, n_pad,
        num_heads=h, interpret=True,
    )

    for bb in range(b):
        L = int(lens[bb])
        slot_new = L % cap
        valid = [s for s in range(cap) if s != slot_new]  # window slots
        for p in range(n_pad):
            row = bb * n_pad + p
            ks = np.concatenate(
                [np.asarray(k_cache[valid, row]), np.asarray(kn[row : row + 1])]
            )
            vs = np.concatenate(
                [np.asarray(v_cache[valid, row]), np.asarray(vn[row : row + 1])]
            )
            got = np.asarray(out[row])
            for hh in range(h):
                sl = slice(hh * dh, (hh + 1) * dh)
                s = ks[:, sl] @ np.asarray(q[row, sl]) * dh**-0.5
                p_ = np.exp(s - s.max())
                p_ = p_ / p_.sum()
                np.testing.assert_allclose(
                    got[sl], p_ @ vs[:, sl], rtol=0, atol=1e-5,
                    err_msg=f"row {row} head {hh}",
                )
            np.testing.assert_allclose(
                np.asarray(k2[slot_new, row]), np.asarray(kn[row]), atol=0
            )


@pytest.mark.fast
def test_ragged_guards():
    """Ring einsum appends and the row-major layout reject vector lens."""
    cfg = small_cfg(cache_mode="ring")
    params = encoder.init_params(jax.random.PRNGKey(0), cfg)
    cache = encoder.init_cache(cfg, batch=2, per_stream_len=True)
    frames = jnp.zeros((2, 1, 3, 32, 32), jnp.float32)
    with pytest.raises(NotImplementedError):
        encoder.streaming_forward(params, frames, cache, cfg)

    cfg_rm = small_cfg(cache_layout="row_major")
    with pytest.raises(NotImplementedError):
        encoder.init_cache(cfg_rm, batch=2, per_stream_len=True)

    with pytest.raises(AssertionError):
        encoder.reset_streams(
            encoder.init_cache(cfg, batch=2), jnp.zeros(2, bool)
        )


@pytest.mark.fast
def test_reset_stream_restarts_cleanly():
    """After reset_streams, a slot behaves exactly like a fresh stream."""
    cfg = small_cfg()
    params = encoder.init_params(jax.random.PRNGKey(0), cfg)
    frames = jnp.asarray(
        np.random.default_rng(4).standard_normal((2, 4, 3, 32, 32)),
        jnp.float32,
    )
    cache = encoder.init_cache(cfg, batch=2, per_stream_len=True)
    for s in range(2):  # both streams advance to len 2
        _, cache = drive(params, cfg, frames[:, s : s + 1], cache)
    cache = encoder.reset_streams(cache, jnp.asarray([False, True]))
    assert cache["len"].tolist() == [2, 0]
    pooled, cache = drive(params, cfg, frames[:, 2 : 3], cache)

    fresh = encoder.init_cache(cfg, batch=1)
    pooled_fresh, _ = drive(params, cfg, frames[1 : 2, 2 : 3], fresh)
    np.testing.assert_allclose(
        np.asarray(pooled[1, 0]), np.asarray(pooled_fresh[0, 0]), atol=1e-5
    )


def test_batched_extraction_matches_lone_streams():
    """extract_features_batched (continuous batching over a ragged cache)
    must return, per video, exactly what a lone B=1 stream produces —
    including videos admitted mid-run into recycled slots."""
    from streamformer_tpu.extract import oad

    cfg = small_cfg(cache_capacity=16)
    params = encoder.init_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(3)
    lens = [3, 7, 2, 6, 4]  # 5 videos over 2 slots -> mid-run admissions
    clips = [
        jnp.asarray(
            rng.standard_normal((l, 3, 32, 32)), jnp.float32
        )
        for l in lens
    ]

    feats = oad.extract_features_batched(params, cfg, clips, slots=2)

    assert [f.shape for f in feats] == [(l, cfg.hidden_size) for l in lens]
    from functools import partial

    step = jax.jit(partial(encoder.streaming_forward, cfg=cfg),
                   donate_argnums=(2,))
    worst = 0.0
    for clip, got in zip(clips, feats):
        solo = encoder.init_cache(cfg, batch=1, capacity=16)
        for t in range(clip.shape[0]):
            o, solo = step(params, clip[None, t : t + 1], solo)
            dev = float(
                np.abs(got[t] - np.asarray(o["pooler_output"][0, 0])).max()
            )
            worst = max(worst, dev)
    assert worst < 1e-4, worst


def test_extract_videos_batched_from_files(tmp_path):
    """File-level driver: decode (host-only prefetch thread) -> caller-
    thread device preprocess -> batched extract -> per-video .npy dumps,
    matching extract_features_batched on identically preprocessed clips."""
    import cv2

    from streamformer_tpu.extract import oad
    from streamformer_tpu.data import video_io

    cfg = small_cfg(cache_capacity=16)
    params = encoder.init_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(5)
    paths, lens = [], [4, 6, 3]
    for i, l in enumerate(lens):
        p = str(tmp_path / f"v{i}.avi")
        vw = cv2.VideoWriter(p, cv2.VideoWriter_fourcc(*"MJPG"), 24.0,
                             (40, 36))
        for _ in range(l):
            vw.write(rng.integers(0, 255, (36, 40, 3), np.uint8))
        vw.release()
        paths.append(p)

    out_dir = str(tmp_path / "feats")
    feats = oad.extract_videos_batched(
        params, cfg, paths, out_dir=out_dir, slots=2, group=2,
        target_fps=24.0,
    )
    assert [f.shape for f in feats] == [(l, cfg.hidden_size) for l in lens]

    # oracle: same decode + preprocess, straight through the batched core
    clips = []
    for p in paths:
        frames, fps = video_io.read_video_full(p)
        idx = video_io.resample_to_fps(len(frames), fps, 24.0)
        clips.append(np.asarray(
            oad.preprocess_frames(frames[idx], cfg.image_size), np.float32
        ))
    want = oad.extract_features_batched(
        params, cfg, [jnp.asarray(c) for c in clips], slots=2
    )
    for i, (got, ref) in enumerate(zip(feats, want)):
        np.testing.assert_allclose(got, ref, atol=1e-5, rtol=1e-5)
        saved = np.load(f"{out_dir}/v{i}.npy")
        np.testing.assert_allclose(saved, got, atol=0, rtol=0)


def test_batched_extraction_overflow_guard():
    """Off the fused ring path the ragged cache is linear: a clip longer
    than capacity must be rejected with the actionable message."""
    from streamformer_tpu.extract import oad

    cfg = small_cfg(cache_capacity=4)
    params = encoder.init_params(jax.random.PRNGKey(0), cfg)
    clip = jnp.zeros((9, 3, 32, 32), jnp.float32)
    with pytest.raises(ValueError, match="exceeds cache capacity"):
        oad.extract_features_batched(params, cfg, [clip], slots=1)


@pytest.mark.fast
def test_ragged_int8_kernel_interpret():
    """The ragged int8 decode kernel (per-ROW-BLOCK lens, fused dequant,
    32-sublane per-stream row padding) matches a dequantized per-row
    softmax oracle, including a stream past capacity (ring window) and
    the appended int8 planes at each stream's own slot."""
    from streamformer_tpu.ops import attention as pops

    rng = np.random.default_rng(11)
    b, n_pad, cap, h, dh = 2, 32, 8, 2, 8
    d = h * dh
    r = b * n_pad
    lens = jnp.asarray([3, 11], jnp.int32)  # stream 1 past capacity
    q = jnp.asarray(rng.standard_normal((r, d)), jnp.float32)
    knq = jnp.asarray(rng.integers(-127, 128, (r, d)), jnp.int8)
    vnq = jnp.asarray(rng.integers(-127, 128, (r, d)), jnp.int8)
    kns = jnp.asarray(rng.uniform(0.01, 0.1, (r, 1)), jnp.float32)
    vns = jnp.asarray(rng.uniform(0.01, 0.1, (r, 1)), jnp.float32)
    k_cache = jnp.asarray(rng.integers(-127, 128, (cap, r, d)), jnp.int8)
    v_cache = jnp.asarray(rng.integers(-127, 128, (cap, r, d)), jnp.int8)
    k_scale = jnp.asarray(rng.uniform(0.01, 0.1, (r, cap)), jnp.float32)
    v_scale = jnp.asarray(rng.uniform(0.01, 0.1, (r, cap)), jnp.float32)

    out, k2, v2 = pops.fused_temporal_decode_pm_int8_ragged(
        q, knq, vnq, kns, vns, k_cache, v_cache, k_scale, v_scale,
        lens, n_pad, num_heads=h, interpret=True,
    )

    for bb in range(b):
        L = int(lens[bb])
        slot_new = L % cap
        if L < cap:
            valid = list(range(L))  # linear prefix
        else:
            valid = [s for s in range(cap) if s != slot_new]  # ring window
        for p in range(0, n_pad, 7):  # sample rows
            row = bb * n_pad + p
            kd = (np.asarray(k_cache[valid, row], np.float32)
                  * np.asarray(k_scale[row, valid])[:, None])
            vd = (np.asarray(v_cache[valid, row], np.float32)
                  * np.asarray(v_scale[row, valid])[:, None])
            kn_f = np.asarray(knq[row], np.float32) * float(kns[row, 0])
            vn_f = np.asarray(vnq[row], np.float32) * float(vns[row, 0])
            ks = np.concatenate([kd, kn_f[None]])
            vs = np.concatenate([vd, vn_f[None]])
            got = np.asarray(out[row])
            for hh in range(h):
                sl = slice(hh * dh, (hh + 1) * dh)
                s = ks[:, sl] @ np.asarray(q[row, sl]) * dh**-0.5
                p_ = np.exp(s - s.max())
                p_ = p_ / p_.sum()
                np.testing.assert_allclose(
                    got[sl], p_ @ vs[:, sl], rtol=0, atol=1e-4,
                    err_msg=f"stream {bb} row {row} head {hh}",
                )
            np.testing.assert_array_equal(
                np.asarray(k2[slot_new, row]), np.asarray(knq[row])
            )
            np.testing.assert_array_equal(
                np.asarray(v2[slot_new, row]), np.asarray(vnq[row])
            )


def test_ragged_int8_full_path_kernel_matches_einsum(monkeypatch):
    """End-to-end ragged int8 through the FUSED kernel dispatch (interpret
    mode, _use_pallas forced): the full streaming_forward — quantize, pad
    to the 32-sublane stream stride, kernel, per-stream scale-column dus —
    must match the einsum ragged int8 path."""
    from jax.experimental import pallas as pl
    from streamformer_tpu.ops import attention as A

    orig = pl.pallas_call

    def patched(*args, **kw):
        kw["interpret"] = True
        return orig(*args, **kw)

    monkeypatch.setattr(A.pl, "pallas_call", patched)
    monkeypatch.setattr(encoder, "_use_pallas", lambda cfg: cfg.use_pallas)

    cfg = small_cfg(cache_dtype="int8", use_pallas=True,
                    use_pallas_streaming=True)
    cfg_ref = cfg.replace(use_pallas=False)
    params = encoder.init_params(jax.random.PRNGKey(0), cfg)
    B, steps = 2, 5
    frames = jnp.asarray(
        np.random.default_rng(13).standard_normal(
            (B, steps, 3, cfg.image_size, cfg.image_size)
        ),
        jnp.float32,
    )
    cache_k = encoder.init_cache(cfg, batch=B, per_stream_len=True)
    cache_e = encoder.init_cache(cfg_ref, batch=B, per_stream_len=True)
    for s in range(steps):
        if s == 2:  # re-admit stream 1 mid-run so the lens genuinely differ
            done = jnp.asarray([False, True])
            cache_k = encoder.reset_streams(cache_k, done)
            cache_e = encoder.reset_streams(cache_e, done)
        got, cache_k = drive(params, cfg, frames[:, s : s + 1], cache_k)
        want, cache_e = drive(params, cfg_ref, frames[:, s : s + 1], cache_e)
        assert int(cache_k["len"][0]) != int(cache_k["len"][1]) or s < 2
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=0, atol=2e-5,
            err_msg=f"step {s}",
        )


def test_batched_extraction_zero_length_clip():
    """A zero-length clip returns (0, D) and must not take a slot — the
    schedule's frame==len retire check can never fire for it, so admitting
    one used to spin the host scheduler forever (regression r4)."""
    from streamformer_tpu.extract import oad

    cfg = small_cfg(cache_capacity=16)
    params = encoder.init_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(5)
    clips = [
        jnp.asarray(rng.standard_normal((3, 3, 32, 32)), jnp.float32),
        jnp.zeros((0, 3, 32, 32), jnp.float32),
        jnp.asarray(rng.standard_normal((2, 3, 32, 32)), jnp.float32),
    ]
    feats = oad.extract_features_batched(params, cfg, clips, slots=2)
    assert [f.shape[0] for f in feats] == [3, 0, 2]
    ref = oad.extract_features_batched(params, cfg,
                                       [clips[0], clips[2]], slots=2)
    np.testing.assert_allclose(feats[0], ref[0], atol=1e-6)
    np.testing.assert_allclose(feats[2], ref[1], atol=1e-6)


def test_windowed_short_video_uses_real_frames():
    """Videos shorter than the window slide BACK onto real frames like the
    reference (extract_oad_feature.py:124-127) — the zero-pad version
    returned the padding frame's feature (regression r4)."""
    from streamformer_tpu.extract import oad

    cfg = small_cfg(cache_capacity=16)
    params = encoder.init_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(6)
    px = jnp.asarray(rng.standard_normal((3, 3, 32, 32)), jnp.float32)

    feats = oad.extract_features_windowed(params, cfg, px, window_size=6,
                                          stride=4)
    assert feats.shape == (1, cfg.hidden_size)
    full = encoder.model_forward(params, px[None], cfg)["pooler_output"]
    np.testing.assert_allclose(
        feats[0], np.asarray(full[0, -1], np.float32), atol=1e-5)
