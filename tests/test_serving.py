"""StreamingEngine: continuous-batching serving API.

Contract: every stream served by the slot-based engine produces exactly
the features of a lone B=1 stream — across FIFO admission into recycled
slots, bursty feeds (holds: starved linear slots pause and resume
losslessly), and incremental polls. The reference has no serving stack;
this is the productized form of the ragged per-stream cache
(examples/continuous_batching_demo.py -> streamformer_tpu/serving.py).
"""

from functools import partial

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from streamformer_tpu.config import StreamformerConfig
from streamformer_tpu.models import encoder
from streamformer_tpu.serving import StreamingEngine

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
    cache_capacity=16,
)


@pytest.fixture(scope="module")
def params():
    return encoder.init_params(jax.random.PRNGKey(0), CFG)


def lone_stream(params, clip):
    """Oracle: one frame at a time through a lone B=1 cache."""
    cfg = CFG.replace(cache_mode="linear")
    step = partial(encoder.streaming_forward, cfg=cfg)
    cache = encoder.init_cache(cfg, batch=1)
    out = []
    for t in range(clip.shape[0]):
        o, cache = step(params, jnp.asarray(clip[None, t : t + 1]), cache)
        out.append(np.asarray(o["pooler_output"][0, 0], np.float32))
    return np.stack(out)


def test_engine_matches_lone_streams(params):
    """4 streams over 2 slots, mid-run admissions, bulk feeds."""
    rng = np.random.default_rng(0)
    lens = [3, 6, 2, 5]
    clips = [rng.standard_normal((l, 3, 32, 32)).astype(np.float32)
             for l in lens]

    eng = StreamingEngine(params, CFG, slots=2)
    sids = []
    for clip in clips:
        sid = eng.open()
        eng.feed(sid, clip)
        eng.close(sid)
        sids.append(sid)
    ticks = eng.run_until_idle()
    assert ticks >= max(lens)

    for sid, clip in zip(sids, clips):
        feats, done = eng.poll(sid)
        assert done
        np.testing.assert_allclose(
            feats, lone_stream(params, clip), rtol=0, atol=1e-5,
            err_msg=f"stream {sid}",
        )


def test_engine_holds_pause_and_resume(params):
    """A starved linear slot holds (dummy frame, rolled-back length) and
    resumes exactly where it paused; a continuously-fed neighbour is
    unaffected."""
    rng = np.random.default_rng(1)
    slow = rng.standard_normal((4, 3, 32, 32)).astype(np.float32)
    fast = rng.standard_normal((8, 3, 32, 32)).astype(np.float32)

    eng = StreamingEngine(params, CFG, slots=2)
    s_slow, s_fast = eng.open(), eng.open()
    eng.feed(s_fast, fast)
    eng.close(s_fast)
    eng.feed(s_slow, slow[:2])  # first burst only
    for _ in range(5):  # slow starves after 2 ticks -> holds
        eng.tick()
    eng.feed(s_slow, slow[2:])  # resume
    eng.close(s_slow)
    eng.run_until_idle()

    feats_slow, done_slow = eng.poll(s_slow)
    feats_fast, done_fast = eng.poll(s_fast)
    assert done_slow and done_fast
    np.testing.assert_allclose(
        feats_slow, lone_stream(params, slow), rtol=0, atol=1e-5
    )
    np.testing.assert_allclose(
        feats_fast, lone_stream(params, fast), rtol=0, atol=1e-5
    )


def test_engine_incremental_poll(params):
    """poll() drains only the features produced since the last poll."""
    rng = np.random.default_rng(2)
    clip = rng.standard_normal((4, 3, 32, 32)).astype(np.float32)
    eng = StreamingEngine(params, CFG, slots=1)
    sid = eng.open()
    eng.feed(sid, clip)
    eng.tick()
    first, done = eng.poll(sid)
    assert first.shape == (1, CFG.hidden_size) and not done
    eng.close(sid)
    eng.run_until_idle()
    rest, done = eng.poll(sid)
    assert done and rest.shape == (3, CFG.hidden_size)
    np.testing.assert_allclose(
        np.concatenate([first, rest]), lone_stream(params, clip),
        rtol=0, atol=1e-5,
    )
    again, _ = eng.poll(sid)
    assert again.shape == (0, CFG.hidden_size)


def test_engine_linear_overflow_and_reclaim(params):
    """feed() past the linear cache capacity raises (the append would have
    nowhere to land and the window would silently go stale); poll() after
    completion reclaims per-stream bookkeeping — a long-lived engine stays
    O(live streams) — and keeps answering (empty, True); the freed slot is
    recyclable for a later admission."""
    rng = np.random.default_rng(4)
    clip = rng.standard_normal((2, 3, 32, 32)).astype(np.float32)
    eng = StreamingEngine(params, CFG, slots=1)
    sid = eng.open()
    eng.feed(sid, clip)
    with pytest.raises(ValueError, match="exceed"):
        eng.feed(sid, rng.standard_normal(
            (CFG.cache_capacity, 3, 32, 32)).astype(np.float32))
    eng.close(sid)
    eng.run_until_idle()
    feats, done = eng.poll(sid)
    assert done and feats.shape == (2, CFG.hidden_size)
    assert sid not in eng._results and sid not in eng._queues
    again, done = eng.poll(sid)
    assert done and again.shape == (0, CFG.hidden_size)

    sid2 = eng.open()
    eng.feed(sid2, clip)
    eng.close(sid2)
    eng.run_until_idle()
    feats2, done2 = eng.poll(sid2)
    assert done2
    np.testing.assert_allclose(
        feats2, lone_stream(params, clip), rtol=0, atol=1e-5
    )


def test_engine_close_unadmitted_then_poll(params):
    """A stream opened, closed empty, and polled BEFORE ever being
    admitted must answer (empty, True) and leave the pending queue clean —
    regression: the reclaim used to leave the sid in _pending, and the
    next tick's admission loop crashed on the popped bookkeeping."""
    rng = np.random.default_rng(5)
    eng = StreamingEngine(params, CFG, slots=1)
    busy = eng.open()
    eng.feed(busy, rng.standard_normal((2, 3, 32, 32)).astype(np.float32))
    eng.tick()  # occupy the only slot
    ghost = eng.open()  # queued behind the busy slot
    eng.close(ghost)  # closed with nothing fed
    f, done = eng.poll(ghost)  # reclaim while still pending
    assert done and f.shape == (0, CFG.hidden_size)
    eng.close(busy)
    eng.run_until_idle()  # regression: KeyError here before the fix
    f, done = eng.poll(busy)
    assert done and f.shape == (2, CFG.hidden_size)
    with pytest.raises(AssertionError, match="unknown stream"):
        eng.poll(999)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_engine_fuzzed_schedules(params, seed):
    """Randomized schedules: interleaved open/feed/close/tick/poll over
    few slots must be schedule-invariant — every stream's features equal
    its lone oracle no matter the action order."""
    rng = np.random.default_rng(100 + seed)
    eng = StreamingEngine(params, CFG, slots=2)
    clips, fed, closed, acc = {}, {}, set(), {}
    next_frames = {}
    opened = []

    for _ in range(120):
        act = rng.choice(["open", "feed", "close", "tick", "poll"])
        live = [s for s in opened if s not in closed]
        if act == "open" and len(opened) < 7:
            sid = eng.open()
            opened.append(sid)
            n = int(rng.integers(1, 6))
            clips[sid] = rng.standard_normal(
                (n, 3, 32, 32)).astype(np.float32)
            next_frames[sid] = 0
            acc[sid] = []
        elif act == "feed" and live:
            sid = int(rng.choice(live))
            pos = next_frames[sid]
            if pos < len(clips[sid]):
                k = int(rng.integers(1, len(clips[sid]) - pos + 1))
                eng.feed(sid, clips[sid][pos:pos + k])
                next_frames[sid] = pos + k
        elif act == "close" and live:
            sid = int(rng.choice(live))
            if next_frames[sid] == len(clips[sid]):  # fully fed
                eng.close(sid)
                closed.add(sid)
        elif act == "tick":
            eng.tick()
        elif act == "poll" and opened:
            sid = int(rng.choice(opened))
            f, _ = eng.poll(sid)
            if sid in acc and len(f):
                acc[sid].append(f)

    # drain: feed+close everything, run to completion, final polls
    for sid in opened:
        if next_frames[sid] < len(clips[sid]):
            eng.feed(sid, clips[sid][next_frames[sid]:])
        if sid not in closed:
            eng.close(sid)
    eng.run_until_idle()
    for sid in opened:
        f, done = eng.poll(sid)
        assert done, sid
        if len(f):
            acc[sid].append(f)
        got = (np.concatenate(acc[sid]) if acc[sid]
               else np.zeros((0, CFG.hidden_size), np.float32))
        np.testing.assert_allclose(
            got, lone_stream(params, clips[sid]), rtol=0, atol=1e-5,
            err_msg=f"stream {sid} (seed {seed})",
        )


def test_engine_ring_feed_or_close_contract(params, monkeypatch):
    """Ring mode cannot hold a starved stream — the engine must say so
    loudly instead of corrupting the sliding window. (Ragged ring runs
    only on the fused decode; interpret mode stands in for the TPU.)"""
    from jax.experimental import pallas as pl
    from streamformer_tpu.ops import attention as A

    orig = pl.pallas_call
    monkeypatch.setattr(
        A.pl, "pallas_call",
        lambda *a, **k: orig(*a, **{**k, "interpret": True}),
    )
    monkeypatch.setattr(encoder, "_use_pallas", lambda cfg: cfg.use_pallas)

    rng = np.random.default_rng(3)
    cfg = CFG.replace(use_pallas=True, cache_capacity=8)
    eng = StreamingEngine(params, cfg, slots=1, mode="ring")
    sid = eng.open()
    eng.feed(sid, rng.standard_normal((1, 3, 32, 32)).astype(np.float32))
    eng.tick()
    with pytest.raises(AssertionError, match="starved a ring-mode slot"):
        eng.tick()  # starved, not closed


def test_engine_nonpow2_stage_depth(params):
    """The staging ring's pow-2 padded scatter must not alias real frames
    when the ring depth is not a power of two (padding rows wrapping mod
    depth would collide with valid rows; they must be dropped instead)."""
    rng = np.random.default_rng(7)
    n = 5  # pads to 8 > depth=6: rows 5..7 wrap onto ring slots 0..2
    clip = rng.standard_normal((n, 3, 32, 32)).astype(np.float32)

    eng = StreamingEngine(params, CFG, slots=1, stage_depth=6)
    sid = eng.open()
    eng.feed(sid, clip)
    eng.close(sid)
    eng.run_until_idle()
    feats, done = eng.poll(sid)
    assert done
    np.testing.assert_allclose(
        feats, lone_stream(params, clip), rtol=0, atol=1e-5)


def test_engine_uint8_staging_matches_float_feed(params):
    """uint8 staging + on-device (x/255 - mean)/std == feeding host-
    normalized fp32 frames up to fp32 rounding (XLA compiles the divide
    as a reciprocal multiply, so exact bit-equality with numpy's divide
    is not guaranteed — the contract is fp32-level equivalence)."""
    rng = np.random.default_rng(3)
    raw = rng.integers(0, 256, (7, 3, 32, 32), dtype=np.uint8)
    mean = (0.481, 0.457, 0.408)
    std = (0.268, 0.261, 0.275)

    e8 = StreamingEngine(params, CFG, slots=2, stage_dtype="uint8",
                         normalize=(mean, std))
    s8 = e8.open()
    e8.feed(s8, raw)
    e8.close(s8)
    e8.run_until_idle()
    got, done = e8.poll(s8)
    assert done

    m = np.asarray(mean, np.float32).reshape(1, 3, 1, 1)
    sd = np.asarray(std, np.float32).reshape(1, 3, 1, 1)
    host = (raw.astype(np.float32) / 255.0 - m) / sd
    ef = StreamingEngine(params, CFG, slots=2)
    sf = ef.open()
    ef.feed(sf, host)
    ef.close(sf)
    ef.run_until_idle()
    ref, _ = ef.poll(sf)
    np.testing.assert_allclose(got, ref, atol=1e-6)

    with pytest.raises(AssertionError, match="uint8"):
        e2 = StreamingEngine(params, CFG, slots=1, stage_dtype="uint8")
        e2.feed(e2.open(), host)  # float frames rejected on the u8 path


def test_feed_stages_at_ingest_before_any_tick(params):
    """Eager slot grant: a feed() on a freshly opened stream (or one
    opened after earlier streams finished) stages to the device BEFORE
    any tick, so ingest upload never lands inside the serving loop."""
    rng = np.random.default_rng(4)
    clip = rng.standard_normal((5, 3, 32, 32)).astype(np.float32)

    eng = StreamingEngine(params, CFG, slots=1)
    a = eng.open()
    eng.feed(a, clip)
    assert eng._wr[0] == 5 and eng._slot_sid[0] == a  # staged pre-tick
    eng.close(a)
    eng.run_until_idle()
    fa, done = eng.poll(a)
    assert done

    # second generation: the slot is still formally held by the finished
    # stream until reclaim — feed() must reclaim + grant + stage eagerly
    b = eng.open()
    eng.feed(b, clip[:3])
    assert eng._slot_sid[0] == b and eng._wr[0] == 3
    eng.feed(b, clip[3:])
    assert eng._wr[0] == 5
    eng.close(b)
    eng.run_until_idle()
    fb, done = eng.poll(b)
    assert done
    np.testing.assert_allclose(fa, fb, atol=1e-6)
    np.testing.assert_allclose(fa, lone_stream(params, clip), atol=1e-5)


def test_engine_overflow_drain_restages_as_ring_frees(params):
    """A stream fed more frames than the staging ring holds keeps frames
    in the host queue and re-stages them tick by tick as the ring frees —
    output must still equal the lone-stream oracle (uint8 path, so the
    overflow drain and the on-device normalize compose)."""
    rng = np.random.default_rng(9)
    raw = rng.integers(0, 256, (10, 3, 32, 32), dtype=np.uint8)

    eng = StreamingEngine(params, CFG, slots=1, stage_depth=4,
                          stage_dtype="uint8")
    sid = eng.open()
    eng.feed(sid, raw)  # 10 frames into a depth-4 ring: 6 overflow
    assert eng._wr[0] == 4 and len(eng._queues[sid]) == 6
    eng.close(sid)
    eng.run_until_idle()
    feats, done = eng.poll(sid)
    assert done and feats.shape[0] == 10

    host = raw.astype(np.float32) / 255.0
    e2 = StreamingEngine(params, CFG, slots=1)
    s2 = e2.open()
    e2.feed(s2, host)
    e2.close(s2)
    e2.run_until_idle()
    ref, _ = e2.poll(s2)
    np.testing.assert_allclose(feats, ref, atol=1e-6)


def test_engine_mesh_sharded_matches_unsharded(params):
    """mesh= shards the slot axis of cache + staging ring over the data
    axis (multi-chip serving): outputs must equal the unsharded engine
    exactly across admission churn and uint8 staging."""
    from jax.sharding import Mesh

    devs = np.array(jax.devices()[:4])
    mesh = Mesh(devs, ("data",))
    rng = np.random.default_rng(11)
    clips = {i: rng.integers(0, 256, (n, 3, 32, 32), dtype=np.uint8)
             for i, n in enumerate([5, 3, 6, 2, 4, 7])}  # 6 streams, 4 slots

    def run(mesh):
        eng = StreamingEngine(params, CFG, slots=4, stage_dtype="uint8",
                              mesh=mesh)
        sids = {}
        for i, c in clips.items():
            sids[i] = eng.open()
            eng.feed(sids[i], c[: len(c) // 2])
        for i, c in clips.items():
            eng.feed(sids[i], c[len(c) // 2:])
            eng.close(sids[i])
        eng.run_until_idle()
        return {i: eng.poll(s)[0] for i, s in sids.items()}

    sharded, plain = run(mesh), run(None)
    for i in clips:
        np.testing.assert_allclose(sharded[i], plain[i], atol=1e-6,
                                   err_msg=f"stream {i}")


def test_engine_mesh_int8_scale_sharding(params):
    """int8 KV scale leaves are (rows, capacity) — rows at dim 0, unlike
    the (capacity, rows, D) k/v planes — and must shard their ROW axis
    (regression r4: a bare ndim rule sharded the scales' capacity dim,
    buying an all-gather per tick)."""
    from jax.sharding import Mesh, PartitionSpec as P

    mesh = Mesh(np.array(jax.devices()[:4]), ("data",))
    cfg = CFG.replace(cache_dtype="int8")
    eng = StreamingEngine(params, cfg, slots=4, mesh=mesh)
    lay = eng._cache["layers"][0]
    assert lay["k"].sharding.spec == P(None, "data", None), lay["k"].sharding
    assert lay["k_scale"].sharding.spec == P("data", None), \
        lay["k_scale"].sharding
    assert eng._cache["len"].sharding.spec == P("data")
    assert eng._stage.sharding.spec[0] == "data"


def test_engine_multiframe_tick_matches_single(params):
    """Throughput mode: tick(frames=k) scans k frames per dispatch with
    per-slot valid counts — features must EXACTLY match the frames=1
    engine and the lone-stream oracle, across uneven stream lengths
    (partial counts + holds inside the scan), mid-run admission into
    recycled slots, and a mixed k-then-1 schedule."""
    rng = np.random.default_rng(11)
    lens = [3, 9, 2, 7, 5]
    clips = [rng.standard_normal((l, 3, 32, 32)).astype(np.float32)
             for l in lens]

    def run(frames, interleave=False):
        eng = StreamingEngine(params, CFG, slots=2)
        sids = []
        for clip in clips:
            sid = eng.open()
            eng.feed(sid, clip)
            eng.close(sid)
            sids.append(sid)
        if interleave:  # alternate k and 1 ticks: schedule independence
            while eng.tick(frames=frames) or eng.tick():
                pass
        else:
            eng.run_until_idle(frames=frames)
        out = []
        for sid in sids:
            feats, done = eng.poll(sid)
            assert done
            out.append(feats)
        return out

    base = run(1)
    for sid, (clip, ref) in enumerate(zip(clips, base)):
        np.testing.assert_allclose(ref, lone_stream(params, clip),
                                   rtol=0, atol=1e-5)
    for got, ref in zip(run(4), base):
        np.testing.assert_allclose(got, ref, rtol=0, atol=1e-6)
    for got, ref in zip(run(3, interleave=True), base):
        np.testing.assert_allclose(got, ref, rtol=0, atol=1e-6)


def test_engine_multiframe_int8_and_odd_k(params):
    """Two _step_for dispatch guards: an int8-KV engine keeps the
    scan-of-t=1 formulation (the multi-append kernel is bf16/fp-only and
    the einsum fallback would dequantize the full cache per chunk), and
    frames=9 rebalances its chunks to avoid a t=1 tail — both must still
    equal the frames=1 engine."""
    rng = np.random.default_rng(29)
    lens = [3, 9, 5]
    clips = [rng.standard_normal((l, 3, 32, 32)).astype(np.float32)
             for l in lens]

    def run(cfg, frames):
        eng = StreamingEngine(params, cfg, slots=2)
        sids = []
        for clip in clips:
            sid = eng.open()
            eng.feed(sid, clip)
            eng.close(sid)
            sids.append(sid)
        eng.run_until_idle(frames=frames)
        return [eng.poll(sid)[0] for sid in sids]

    cfg8 = CFG.replace(cache_dtype="int8")
    base8 = run(cfg8, 1)
    for got, ref in zip(run(cfg8, 4), base8):
        np.testing.assert_allclose(got, ref, rtol=0, atol=1e-5)

    eng = StreamingEngine(params, CFG, slots=2)
    step9 = eng._step_for(9)  # compiles with chunks [7, 2], not [8, 1]
    assert step9 is not None
    base = run(CFG, 1)
    for got, ref in zip(run(CFG, 9), base):
        np.testing.assert_allclose(got, ref, rtol=0, atol=1e-6)


def test_engine_multiframe_kernel_path(params, monkeypatch):
    """The linear throughput tick through the REAL kernel path
    (fused_temporal_append_pm_ragged, interpret mode standing in for the
    TPU): engine features still equal the frames=1 einsum engine across
    uneven lengths, partial counts and mid-run admission — pins the full
    engine integration (staging gather, admit resets, new_valid demux)
    on the code path production serves."""
    from jax.experimental import pallas as pl
    from streamformer_tpu.ops import attention as A

    rng = np.random.default_rng(23)
    lens = [3, 9, 2, 7]
    clips = [rng.standard_normal((l, 3, 32, 32)).astype(np.float32)
             for l in lens]

    def run(cfg, frames):
        eng = StreamingEngine(params, cfg, slots=2)
        sids = []
        for clip in clips:
            sid = eng.open()
            eng.feed(sid, clip)
            eng.close(sid)
            sids.append(sid)
        eng.run_until_idle(frames=frames)
        return [eng.poll(sid)[0] for sid in sids]

    base = run(CFG, 1)  # einsum engine oracle

    orig = pl.pallas_call
    monkeypatch.setattr(
        A.pl, "pallas_call",
        lambda *a, **k: orig(*a, **{**k, "interpret": True}),
    )
    monkeypatch.setattr(encoder, "_use_pallas", lambda cfg: cfg.use_pallas)
    got = run(CFG.replace(use_pallas=True), 4)
    for sid, (g, ref) in enumerate(zip(got, base)):
        np.testing.assert_allclose(g, ref, rtol=0, atol=1e-5,
                                   err_msg=f"stream {sid}")
    # frames > 8 chunk into sequential <=8-frame kernel appends inside
    # ONE dispatch (the kernel's VMEM cap) — chunk 2 must see chunk 1
    # through the cache
    got12 = run(CFG.replace(use_pallas=True), 12)
    for sid, (g, ref) in enumerate(zip(got12, base)):
        np.testing.assert_allclose(g, ref, rtol=0, atol=1e-5,
                                   err_msg=f"stream {sid} frames=12")


def test_engine_multiframe_ring_min_avail(params, monkeypatch):
    """Ring mode cannot hold, so a k-frame tick must run min-over-slots
    frames; outputs still equal the lone ring stream. (Ragged ring runs
    only on the fused decode; interpret mode stands in for the TPU.)"""
    from jax.experimental import pallas as pl
    from streamformer_tpu.ops import attention as A

    orig = pl.pallas_call
    monkeypatch.setattr(
        A.pl, "pallas_call",
        lambda *a, **k: orig(*a, **{**k, "interpret": True}),
    )
    monkeypatch.setattr(encoder, "_use_pallas", lambda cfg: cfg.use_pallas)

    cfg = CFG.replace(cache_mode="ring", cache_capacity=4, use_pallas=True)
    rng = np.random.default_rng(13)
    clips = [rng.standard_normal((6, 3, 32, 32)).astype(np.float32),
             rng.standard_normal((9, 3, 32, 32)).astype(np.float32)]

    def lone_ring(clip):
        step = partial(encoder.streaming_forward, cfg=cfg)
        cache = encoder.init_cache(cfg, batch=1)
        out = []
        for t in range(clip.shape[0]):
            o, cache = step(params, jnp.asarray(clip[None, t:t + 1]), cache)
            out.append(np.asarray(o["pooler_output"][0, 0], np.float32))
        return np.stack(out)

    eng = StreamingEngine(params, cfg, slots=2, mode="ring")
    sids = []
    for clip in clips:
        sid = eng.open()
        eng.feed(sid, clip)
        eng.close(sid)
        sids.append(sid)
    eng.run_until_idle(frames=4)
    for sid, clip in zip(sids, clips):
        feats, done = eng.poll(sid)
        assert done
        np.testing.assert_allclose(feats, lone_ring(clip),
                                   rtol=0, atol=1e-5, err_msg=f"s{sid}")


def test_engine_multiframe_uint8_staging(params):
    """frames=k composes with on-device uint8 normalization (the
    in-scan gather + normalize must equal the float-fed frames=1 run)."""
    rng = np.random.default_rng(17)
    raw = rng.integers(0, 256, size=(7, 3, 32, 32), dtype=np.uint8)
    mean = (0.48, 0.46, 0.41)
    std = (0.27, 0.26, 0.28)
    m = np.asarray(mean, np.float32).reshape(1, 3, 1, 1)
    s = np.asarray(std, np.float32).reshape(1, 3, 1, 1)
    as_float = (raw.astype(np.float32) / 255.0 - m) / s

    ref_eng = StreamingEngine(params, CFG, slots=2)
    r = ref_eng.open()
    ref_eng.feed(r, as_float)
    ref_eng.close(r)
    ref_eng.run_until_idle()
    ref, _ = ref_eng.poll(r)

    eng = StreamingEngine(params, CFG, slots=2, stage_dtype="uint8",
                          normalize=(mean, std))
    sid = eng.open()
    eng.feed(sid, raw)
    eng.close(sid)
    eng.run_until_idle(frames=4)
    feats, done = eng.poll(sid)
    assert done
    np.testing.assert_allclose(feats, ref, rtol=0, atol=1e-5)
