"""Benchmark: streaming frames/sec/chip on the flagship StreamFormer encoder.

Measures the BASELINE.json north-star metric — frame-incremental streaming
encode (224^2, temporal KV-cache resident in HBM, O(1) per frame). Prints ONE
JSON line:
  {"metric": ..., "value": N, "unit": "frames/sec/chip", "vs_baseline": N,
   "mfu": ..., "tflops": ..., "torch_reference_fps_measured": ...}

Evidence contract (VERDICT r3 items 1 & 7):

* The headline is measured FIRST and seeded into ``_PARTIAL``; everything
  after it runs inside ``try``/``finally`` so no secondary section — however
  it fails — can prevent the measured headline from emitting (BENCH_r03 was
  lost exactly this way: an unguarded 512-context RESOURCE_EXHAUSTED killed
  the process after the headline had already been measured).
* Every secondary section runs through ``_section`` (guarded, logged) and
  allocates its device buffers in its own function scope so they free on
  return — no section inherits another's HBM residue. The 7.4 GB 512-context
  section runs FIRST among the secondaries, when HBM is cleanest.
* The watchdog (device/tunnel stall) never lets stale numbers occupy live
  fields: if nothing was measured this run it emits ``"value": null`` with
  the last good run's numbers under ``"stale_fallback"`` — validated against
  this host and a freshness window — so a parser always sees "no measurement
  this run" first. ``BENCH_LAST_GOOD.json`` is a local artifact (gitignored),
  stamped with host/commit/timestamp.

Timing notes: on the axon TPU tunnel ``block_until_ready`` does not
synchronize, so we use two-point differencing (K1 vs K2 chained steps, scalar
fetch as the sync barrier) which cancels the tunnel roundtrip.

Baselines (BASELINE.md records the protocol):

* ``torch_reference_fps_measured``: the ACTUAL PyTorch reference streaming
  path (downstream/VideoQA/.../timesformer_encoder.py with HF DynamicCache,
  the test_kvcache.py contract) run on THIS host's CPU, eager fp32, batch 1,
  per-frame encode at a warmed 16-frame context. Measured, not estimated.
  Set STREAMFORMER_BENCH_SKIP_TORCH=1 to skip.
* ``vs_baseline``: ratio against an ESTIMATED H100 streaming rate of 300
  frames/sec/chip for the same eager-torch path (dispatch-bound; the
  reference publishes no throughput numbers, SURVEY §6). >= 2.0 meets the
  BASELINE.json "2x H100 fps/chip" target. The measured same-host torch
  number plus ``mfu`` (fraction of v5e bf16 peak actually sustained)
  anchor this estimate.
"""

import json
import os
import platform
import subprocess
import sys
import threading
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

if os.environ.get("STREAMFORMER_BENCH_CPU") == "1":
    # dev smoke: the profile pins JAX_PLATFORMS=axon (which overrides the
    # env var), so forcing CPU needs the in-process config call
    jax.config.update("jax_platforms", "cpu")

# Persistent XLA compilation cache: every jit program in this bench is cached
# under the repo so re-runs (and the driver's run after our warm-up) skip the
# 20-40s/program cold compiles that previously forced budget-guard skips of
# secondary metrics (VERDICT r2 "what's weak" #1).
_REPO = os.path.dirname(os.path.abspath(__file__))
_CACHE_DIR = os.path.join(_REPO, ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _CACHE_DIR)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

from streamformer_tpu.config import StreamformerConfig
from streamformer_tpu.models import encoder
from streamformer_tpu.utils import profiling

H100_REFERENCE_FPS_EST = 300.0
_HEADLINE_METRIC = "frames/sec/chip streaming encode (224^2, KV-cache)"

# Watchdog: the one JSON line MUST emit even if the device (or its tunnel)
# stalls mid-metric — a hung secondary measurement must not erase the
# already-measured headline. main() fills _PARTIAL as metrics land; if the
# deadline passes before the normal emit, the watchdog prints whatever has
# been measured (with a "note") and hard-exits.
_PARTIAL: dict = {}
_EMITTED = threading.Event()
_DEADLINE_S = float(os.environ.get("STREAMFORMER_BENCH_DEADLINE_S", "2400"))

_LAST_GOOD = os.path.join(_REPO, "BENCH_LAST_GOOD.json")
_LAST_GOOD_MAX_AGE_S = 14 * 86400.0


def _emit(result: dict) -> None:
    if not _EMITTED.is_set():
        _EMITTED.set()
        print(json.dumps(result), flush=True)


def _git_commit() -> str:
    try:
        return subprocess.run(
            ["git", "-C", _REPO, "rev-parse", "--short", "HEAD"],
            capture_output=True, text=True, timeout=10,
        ).stdout.strip() or "unknown"
    except Exception:
        return "unknown"


def _load_stale_fallback() -> dict:
    """Last successful run's numbers, ONLY if recorded on this host recently.
    Returned for the ``stale_fallback`` field — never for live fields."""
    try:
        with open(_LAST_GOOD) as f:
            prev = json.load(f)
        meta = prev.get("_meta", {})
        if meta.get("host") != platform.node():
            return {}
        if time.time() - float(meta.get("timestamp", 0)) > _LAST_GOOD_MAX_AGE_S:
            return {}
        return prev
    except Exception:
        return {}


def _watchdog():
    if _EMITTED.wait(timeout=_DEADLINE_S):
        return
    out = dict(_PARTIAL)
    if "value" not in out:
        # nothing measured this run (tunnel outages can stall the very first
        # device op for hours). Live fields stay null — a parser must see
        # "no measurement this run"; the previous run's numbers ride along
        # under stale_fallback for a human reader only.
        out = {
            "metric": _HEADLINE_METRIC,
            "value": None,
            "unit": "frames/sec/chip",
            "vs_baseline": None,
        }
        stale = _load_stale_fallback()
        if stale:
            out["stale_fallback"] = stale
    out["note"] = (
        f"watchdog: device stalled; partial results emitted at "
        f"{_DEADLINE_S:.0f}s"
    )
    _emit(out)
    sys.stdout.flush()
    os._exit(3)


def _section(name: str, fn) -> None:
    """Run one secondary measurement; failures log and move on (VERDICT r3
    item 1b: every section guarded — results land in _PARTIAL, never in
    section-local state a crash could strand)."""
    try:
        fn()
    except Exception as e:  # noqa: BLE001 — the bench line must survive
        print(f"# {name} section skipped: {type(e).__name__}: {e}",
              file=sys.stderr)


def measure_torch_reference(batch: int = 1, context: int = 16, steps: int = 5):
    """Per-frame streaming encode fps of the PyTorch reference on this host.

    Imports (never copies) the reference's VideoQA streaming model
    (timesformer_encoder.py) with a stubbed ``llava.utils``, random weights,
    eager fp32 CPU, HF DynamicCache: warm ``context - 1`` frames, then time
    single-frame forwards — the exact per-frame cost the reference pays in
    the test_kvcache.py streaming contract. Threads are pinned and the
    median of ``steps`` timings is reported: BASELINE.md recorded a 2.3x
    swing (1.02-2.37 fps) under host load with unpinned min-of-3.
    """
    import types
    import importlib.util

    import torch

    torch.set_num_threads(min(8, os.cpu_count() or 8))
    torch.set_num_interop_threads(1)

    if "llava" not in sys.modules:
        llava = types.ModuleType("llava")
        u = types.ModuleType("llava.utils")
        u.rank0_print = lambda *a, **k: None
        llava.utils = u
        sys.modules["llava"] = llava
        sys.modules["llava.utils"] = u
    spec = importlib.util.spec_from_file_location(
        "ref_timesformer_encoder",
        "/root/reference/downstream/VideoQA/llava/model/multimodal_encoder/"
        "timesformer_encoder.py",
    )
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)

    cfg = m.StreamformerConfig(num_frames=16)
    model = m.TimesformerMultiTaskingModelSigLIP(cfg).eval()
    from transformers.cache_utils import DynamicCache

    torch.manual_seed(0)
    frame = torch.randn(batch, 1, 3, 224, 224)
    import copy

    with torch.no_grad():
        cache = DynamicCache()
        warm = torch.randn(batch, context - 1, 3, 224, 224)
        model(warm, use_cache=True, past_key_values=cache)
        # every step (warmup + timed) runs against a COPY of the
        # post-warm cache so the measured context is FIXED at `context`
        # (cached context-1 + the new frame) — letting the DynamicCache
        # grow across timed steps measured contexts 17..21 instead of the
        # stated 16, biasing the baseline slow. The copy happens outside
        # the timed region.
        model(frame, use_cache=True, past_key_values=copy.deepcopy(cache))
        times = []
        for _ in range(steps):
            c = copy.deepcopy(cache)
            t0 = time.perf_counter()
            model(frame, use_cache=True, past_key_values=c)
            times.append(time.perf_counter() - t0)
    dt = float(np.median(times))
    return batch / dt, dt


def main():
    t_start = time.perf_counter()
    threading.Thread(target=_watchdog, daemon=True).start()
    on_tpu = any(d.platform == "tpu" for d in jax.devices())
    if on_tpu:
        # the BASELINE.json metric is 16-frame-context streaming encode —
        # capacity 16 bounds the attention context (and HBM traffic) to it
        cfg = StreamformerConfig(dtype="bfloat16", cache_capacity=16)
        batch, k1, k2 = 8, 3, 23
    else:  # CPU smoke mode
        cfg = StreamformerConfig(
            image_size=32,
            patch_size=16,
            num_frames=4,
            hidden_size=64,
            num_hidden_layers=2,
            num_attention_heads=4,
            intermediate_size=128,
            dtype="float32",
            use_pallas=False,
            cache_capacity=8,
        )
        batch, k1, k2 = 2, 1, 4

    params = encoder.init_params(jax.random.PRNGKey(0), cfg)
    params = jax.tree.map(lambda x: x.astype(jnp.dtype(cfg.dtype)), params)
    frame = jnp.asarray(
        np.random.default_rng(0).standard_normal(
            (batch, 1, 3, cfg.image_size, cfg.image_size)
        ),
        dtype=jnp.dtype(cfg.dtype),
    )
    reps = 3

    def two_point(timed, ka=k1, kb=k2):
        ta = min(timed(ka) for _ in range(reps))
        tb = min(timed(kb) for _ in range(reps))
        return (tb - ta) / (kb - ka)

    # ---- headline: 16f-context streaming encode -------------------------
    try:
        @partial(jax.jit, donate_argnums=(2,))
        def step(params, frame, c):
            # steady-state 16f context: hold the cache at capacity-1 so each
            # step attends the full 16-frame window
            c = {**c, "len": jnp.full((), cfg.cache_capacity - 1, jnp.int32)}
            out, c = encoder.streaming_forward(params, frame, c, cfg)
            return out["pooler_output"], c

        cache = encoder.init_cache(cfg, batch=batch)
        pooled, cache = step(params, frame, cache)  # compile
        _ = float(jnp.sum(pooled))

        def timed(k):
            nonlocal cache
            t0 = time.perf_counter()
            pooled = None
            for _ in range(k):
                pooled, cache = step(params, frame, cache)
            _ = float(jnp.sum(pooled))  # sync barrier through the tunnel
            return time.perf_counter() - t0

        dt = two_point(timed)
        del cache  # free the ~0.9 GB headline cache before the secondaries

        fps = batch / dt
        flops = profiling.streaming_step_flops(cfg, batch, cfg.cache_capacity)
        tflops = flops / dt / 1e12
        mfu = tflops / 197.0 if on_tpu else float("nan")  # v5e bf16 peak
    except Exception as e:
        # no headline: emit an honest null line and fail the run — stale or
        # secondary numbers must never stand in for the north-star metric
        _emit({
            "metric": _HEADLINE_METRIC,
            "value": None,
            "unit": "frames/sec/chip",
            "vs_baseline": None,
            "error": f"{type(e).__name__}: {e}",
        })
        raise

    # headline measured: seed the watchdog's partial line so a later stall
    # or crash can no longer lose it
    _PARTIAL.update({
        "metric": _HEADLINE_METRIC,
        "value": round(fps, 2),
        "unit": "frames/sec/chip",
        "vs_baseline": round(fps / H100_REFERENCE_FPS_EST, 3),
        "mfu": round(mfu, 4) if np.isfinite(mfu) else None,
        "tflops": round(tflops, 2),
        "p50_latency_ms_per_frame": round(dt * 1e3, 2),
    })

    # With the persistent compilation cache every secondary metric fits the
    # driver budget (warm-cache full run ~2 min); the guards below are only a
    # catastrophic backstop (e.g. cache dir wiped AND compiles pathologically
    # slow) so the bench line always emits.
    def budget_left(limit_s):
        return time.perf_counter() - t_start < limit_s

    # ---- secondary sections ---------------------------------------------
    # Each allocates its device buffers in function scope (freed on return)
    # and writes its result straight into _PARTIAL.

    def sec_512(cfg512, field):
        """Long-context streaming (512-frame window, batch 2 — the bf16
        512-cap cache at batch 8 exceeds HBM). Runs FIRST among the
        secondaries: its ~7.4 GB cache wants the cleanest HBM. The decode is
        HBM-bound on the KV reads; the int8-KV variant halves that traffic
        (pos-major cache, fused dequant; rows padded to the 32-sublane int8
        tile)."""
        b512 = 2
        frame512 = frame[:b512]

        @partial(jax.jit, donate_argnums=(2,))
        def step512(params, frame, c):
            c = {**c, "len": jnp.full((), 511, jnp.int32)}
            out, c = encoder.streaming_forward(params, frame, c, cfg512)
            return out["pooler_output"], c

        c512 = encoder.init_cache(cfg512, batch=b512)
        pooled, c512 = step512(params, frame512, c512)
        _ = float(jnp.sum(pooled))

        def timed512(k):
            nonlocal c512
            t0 = time.perf_counter()
            pooled = None
            for _ in range(k):
                pooled, c512 = step512(params, frame512, c512)
            _ = float(jnp.sum(pooled))
            return time.perf_counter() - t0

        _PARTIAL[field] = round(b512 / two_point(timed512), 2)

    def sec_int8():
        """int8 serving path: per-column int8 weights + dynamic per-row
        activation quant (ops/quant.py) — the step is MXU-bound, v5e int8
        peak is 2x bf16."""
        from streamformer_tpu.ops import quant

        qparams = quant.quantize_encoder_params(jax.tree.map(lambda x: x,
                                                             params))

        @partial(jax.jit, donate_argnums=(2,))
        def step_q(qparams, frame, c):
            c = {**c, "len": jnp.full((), cfg.cache_capacity - 1, jnp.int32)}
            out, c = encoder.streaming_forward(qparams, frame, c, cfg)
            return out["pooler_output"], c

        cq = encoder.init_cache(cfg, batch=batch)
        pooled, cq = step_q(qparams, frame, cq)
        _ = float(jnp.sum(pooled))

        def timed_q(k):
            nonlocal cq
            t0 = time.perf_counter()
            pooled = None
            for _ in range(k):
                pooled, cq = step_q(qparams, frame, cq)
            _ = float(jnp.sum(pooled))
            return time.perf_counter() - t0

        _PARTIAL["fps_int8_serving"] = round(batch / two_point(timed_q), 2)

    def sec_ring():
        """Unbounded streaming: ring (sliding-window) cache mode — same
        fused kernel with the plane write at slot (len mod C) and the
        slot-exclusion mask; len pinned deep past capacity so every step is
        post-wraparound steady state."""
        cfg_ring = cfg.replace(cache_mode="ring", cache_layout="pos_major")

        @partial(jax.jit, donate_argnums=(2,))
        def step_r(params, frame, c):
            c = {**c, "len": jnp.full((), 10_000, jnp.int32)}
            out, c = encoder.streaming_forward(params, frame, c, cfg_ring)
            return out["pooler_output"], c

        cr = encoder.init_cache(cfg_ring, batch=batch)
        pooled, cr = step_r(params, frame, cr)
        _ = float(jnp.sum(pooled))

        def timed_r(k):
            nonlocal cr
            t0 = time.perf_counter()
            pooled = None
            for _ in range(k):
                pooled, cr = step_r(params, frame, cr)
            _ = float(jnp.sum(pooled))
            return time.perf_counter() - t0

        _PARTIAL["fps_ring_unbounded"] = round(batch / two_point(timed_r), 2)

    def sec_ragged():
        """Ragged serving (continuous batching): per-stream lengths — every
        batch row at its own position, one compiled program. Steady-state
        mixed positions pinned in-jit; beyond-reference capability (the
        torch reference's DynamicCache is lockstep-only)."""
        lens_mixed = [(3 + 7 * i) % cfg.cache_capacity for i in range(batch)]

        @partial(jax.jit, donate_argnums=(2,))
        def step_g(params, frame, c):
            c = {**c, "len": jnp.asarray(lens_mixed, jnp.int32)}
            out, c = encoder.streaming_forward(params, frame, c, cfg)
            return out["pooler_output"], c

        cg = encoder.init_cache(cfg, batch=batch, per_stream_len=True)
        pooled, cg = step_g(params, frame, cg)
        _ = float(jnp.sum(pooled))

        def timed_g(k):
            nonlocal cg
            t0 = time.perf_counter()
            pooled = None
            for _ in range(k):
                pooled, cg = step_g(params, frame, cg)
            _ = float(jnp.sum(pooled))
            return time.perf_counter() - t0

        _PARTIAL["fps_ragged_serving"] = round(batch / two_point(timed_g), 2)

    def sec_engine_encode():
        """StreamingEngine END-TO-END fps (VERDICT r3 item 2): the same
        ragged step served through the engine's host loop (admit + stash +
        device staging-ring gathers). Compare against fps_ragged_serving —
        the gap is the host tick cost. Ingest is uint8 (decoded video) with
        on-device normalize; feed() stages at ingest time, so the serve
        window measures the tick loop while the ingest upload is reported
        separately (engine_ingest_mb_per_sec) — through the axon tunnel
        that upload is ~30 MB/s and would swamp any serve measurement; on
        a real TPU host it is a multi-GB/s DMA overlapped with compute."""
        from streamformer_tpu.serving import StreamingEngine

        eng = StreamingEngine(
            params, cfg, slots=batch, mode="linear", collect="pooled",
            stage_dtype="uint8",
            normalize=((0.481, 0.457, 0.408), (0.268, 0.261, 0.275)),
        )
        # capacity frames per stream => the k=8 throughput ticks all run
        # FULL (16 = 2x8); a capacity-1 feed leaves a 7-frame tail tick
        # that still pays k=8 compute — a workload-tail artifact, not
        # steady-state serving cost
        n_frames = cfg.cache_capacity
        clip = np.random.default_rng(4).integers(
            0, 256, (n_frames, 3, cfg.image_size, cfg.image_size),
            dtype=np.uint8,
        )

        def engine_run(frames):
            sids = [eng.open() for _ in range(batch)]
            t_in = time.perf_counter()
            for s in sids:
                eng.feed(s, clip)  # eager grant: stages to device here
                eng.close(s)
            # block_until_ready doesn't sync through the axon tunnel; a
            # tiny dependent fetch does
            float(jnp.sum(eng._stage[0, 0, 0, 0].astype(jnp.float32)))
            ingest = time.perf_counter() - t_in
            t0 = time.perf_counter()
            eng.run_until_idle(frames=frames)
            # serve window syncs on a dependent SCALAR of the last tick's
            # output — the same barrier the bare sections use. The feature
            # DOWNLOAD is then timed separately (engine_output_mb_per_sec),
            # mirroring the ingest treatment: the bare fps_ragged_serving
            # number this gate compares against never pays its output
            # fetch (two-point differencing), and on a real TPU host the
            # ~0.26 MB/window download is DMA noise, while through the
            # tunnel (~10-30 MB/s) it would dominate the window.
            if eng._stash:
                float(jnp.sum(eng._stash[-1][0][0, 0].astype(jnp.float32)))
            t_serve = time.perf_counter() - t0
            t1 = time.perf_counter()
            total = sum(len(eng.poll(s)[0]) for s in sids)
            t_drain = time.perf_counter() - t1
            out_mb = total * cfg.hidden_size * 2 / 1e6  # bf16 features
            return (total / t_serve,
                    clip.nbytes * batch / 1e6 / ingest,
                    out_mb / max(t_drain, 1e-9))

        # throughput mode: 8 frames per dispatch — ONE t=8 ragged append
        # (ops/attention.fused_temporal_append_pm_ragged) that reads the
        # temporal KV cache once for all 8 frames and runs 8x bigger
        # spatial/MLP GEMMs; the t=1 decode re-reads the full cache per
        # frame (~half its step time at this config), which capped the
        # r4 scan-of-t=1 engine at 66% of the bare ragged step. The
        # latency mode (frames=1) is reported alongside.
        for fr in (8, 1):
            engine_run(fr)  # warm: compile step + staging write
        # best run BY FPS; a plain max() over the tuples would compare
        # lexicographically and pair the winning fps with an unrelated
        # ingest number on ties
        fps, mbs, omb = max((engine_run(8) for _ in range(2)),
                            key=lambda r: r[0])
        fps1, _, _ = max((engine_run(1) for _ in range(2)),
                         key=lambda r: r[0])
        _PARTIAL["fps_engine_streaming"] = round(fps, 2)
        _PARTIAL["fps_engine_streaming_frames1"] = round(fps1, 2)
        _PARTIAL["engine_ingest_mb_per_sec"] = round(mbs, 1)
        _PARTIAL["engine_output_mb_per_sec"] = round(omb, 1)

        # device-path rate of the SAME compiled throughput tick, measured
        # with the SAME two-point differencing as fps_ragged_serving —
        # sync/dispatch latency cancels in both, so this pair is the
        # apples-to-apples engine-vs-bare comparison (the window number
        # above additionally pays one tunnel-latency sync per ~70 ms
        # window, which a real TPU host doesn't). Profile: admits off,
        # len past capacity => every cache slot attended (the saturated
        # 16-frame-context steady state).
        step8 = eng._step_for(8)
        admit_d = jnp.zeros(batch, bool)
        nav_d = jnp.full(batch, 8, jnp.int32)
        # copies, not the live buffers: step8 donates args 2-3, and
        # handing it eng's own cache would delete the engine's buffers
        st = {"c": jax.tree.map(jnp.copy, eng._cache),
              "rd": jnp.copy(eng._rd_dev)}

        def timed_e(k):
            o = None
            t0 = time.perf_counter()
            for _ in range(k):
                o, st["c"], st["rd"] = step8(
                    params, eng._stage, st["rd"], st["c"], admit_d, nav_d)
            _ = float(jnp.sum(o.astype(jnp.float32)))
            return time.perf_counter() - t0

        timed_e(1)
        dt8 = two_point(timed_e, 2, 10)
        _PARTIAL["fps_engine_dispatch"] = round(batch * 8 / dt8, 2)

    def sec_train():
        """Training throughput: full fwd+bwd+adamw on the flagship encoder
        with an AR-style classification loss (16-frame clips, bf16). Params
        and optimizer state are donated; the section works on its own param
        copy so later sections keep the originals."""
        import optax

        tx = optax.adamw(1e-4)
        w_cls = jnp.asarray(
            np.random.default_rng(1).standard_normal(
                (cfg.hidden_size, 400)
            ) * 0.02,
            jnp.bfloat16,
        )
        clips = jnp.asarray(
            np.random.default_rng(2).standard_normal(
                (batch, cfg.num_frames, 3, cfg.image_size, cfg.image_size)
            ),
            jnp.bfloat16,
        )
        labels = jnp.zeros((batch,), jnp.int32)
        p_t = jax.tree.map(jnp.copy, params)
        opt_state = tx.init(p_t)

        def loss_fn(p):
            out = encoder.model_forward(p, clips, cfg)
            logits = out["pooler_output"][:, -1] @ w_cls
            return optax.softmax_cross_entropy_with_integer_labels(
                logits.astype(jnp.float32), labels
            ).mean()

        @partial(jax.jit, donate_argnums=(0, 1))
        def train_step(p, s):
            loss, grads = jax.value_and_grad(loss_fn)(p)
            updates, s = tx.update(grads, s, p)
            return optax.apply_updates(p, updates), s, loss

        p_t, opt_state, loss = train_step(p_t, opt_state)
        _ = float(loss)

        def timed_t(k):
            nonlocal p_t, opt_state
            t0 = time.perf_counter()
            loss = None
            for _ in range(k):
                p_t, opt_state, loss = train_step(p_t, opt_state)
            _ = float(loss)
            return time.perf_counter() - t0

        dt_t = two_point(timed_t, 2, 6)
        # fwd + bwd ~ 3x forward FLOPs; full clip = T-frame "step"
        fl_t = 3 * profiling.streaming_step_flops(
            cfg, batch, cfg.num_frames, t_new=cfg.num_frames
        )
        _PARTIAL["train_clips_per_sec"] = round(batch / dt_t, 2)
        _PARTIAL["train_mfu"] = round(fl_t / dt_t / 1e12 / 197.0, 4)

    def sec_preproc():
        """BASELINE.json config #2: the on-device Kinetics train-augment
        pipeline (rand_augment + random-resized-crop + flip + normalize +
        random erasing), decoded-uint8 -> model input, batched 16-frame
        clips."""
        from streamformer_tpu.data.collate import make_train_augment

        aug = make_train_augment(crop_size=cfg.image_size)
        clips_u8 = jnp.asarray(
            np.random.default_rng(3).integers(
                0, 256, (batch, 16, 256, 320, 3), dtype=np.uint8
            )
        )
        rngk = jax.random.PRNGKey(0)
        out = aug(rngk, clips_u8)
        _ = float(jnp.sum(out.astype(jnp.float32)))

        def timed_p(k):
            t0 = time.perf_counter()
            out = None
            for i in range(k):
                out = aug(jax.random.fold_in(rngk, i), clips_u8)
            _ = float(jnp.sum(out.astype(jnp.float32)))
            return time.perf_counter() - t0

        _PARTIAL["preprocess_fps_on_device"] = round(
            batch * 16 / two_point(timed_p, 2, 10), 1
        )

    def sec_host_decode():
        """SURVEY §7 hard-part 7 (host decode bandwidth), VERDICT r3 item 6:
        the FULL ingest path — mp4 decode (cv2 VideoReader) + TSN sparse
        sampling + H2D upload + on-device train augment — measured as
        clips/sec. This is the host-side ceiling the 'no host round-trips'
        pipeline claims sit on."""
        import cv2

        from streamformer_tpu.data.collate import make_train_augment
        from streamformer_tpu.data.video_io import (VideoReader,
                                                    sparse_sample_indices)

        path = os.path.join("/tmp", "streamformer_bench_clip.mp4")
        h, w, n_total = 256, 320, 120
        vw = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), 30.0,
                             (w, h))
        if not vw.isOpened():
            raise RuntimeError("cv2 VideoWriter(mp4v) unavailable")
        rng = np.random.default_rng(5)
        # textured frames (uniform noise compresses terribly; gradient +
        # noise is a realistic decode load)
        base = (np.linspace(0, 255, w, dtype=np.float32)[None, :, None]
                * np.ones((h, 1, 3), np.float32))
        for i in range(n_total):
            f = base + rng.normal(0, 20, (h, w, 3)) + 60 * np.sin(i / 7.0)
            vw.write(np.clip(f, 0, 255).astype(np.uint8))
        vw.release()

        aug = make_train_augment(crop_size=cfg.image_size)
        rngk = jax.random.PRNGKey(0)
        srng = np.random.default_rng(6)

        def one_clip(i):
            vr = VideoReader(path)
            idx = sparse_sample_indices(len(vr), 16, mode="train", rng=srng)
            frames = vr.get_batch(idx)  # (16, H, W, 3) uint8
            vr.close()
            return aug(jax.random.fold_in(rngk, i), jnp.asarray(frames[None]))

        out = one_clip(0)  # warm: compile the (1, 16, H, W, 3) augment
        _ = float(jnp.sum(out.astype(jnp.float32)))

        def timed_d(k):
            t0 = time.perf_counter()
            out = None
            for i in range(k):
                out = one_clip(i)
            _ = float(jnp.sum(out.astype(jnp.float32)))
            return time.perf_counter() - t0

        n = 8
        t = min(timed_d(n) for _ in range(2))
        _PARTIAL["host_decode_clips_per_sec"] = round(n / t, 2)
        try:
            os.remove(path)
        except OSError:
            pass

    lm_state = {}

    def sec_lm_decode():
        """Continuous-batching LM decode (lm_serving): tokens/sec across 8
        ragged slots at steady state, capacity-512 cache — the VideoQA
        serving path's decode rate (a 0.5B-class tower config; the flagship
        encoder above is the headline, this is the serving-stack
        secondary)."""
        from streamformer_tpu.models import language_model as LMM

        lm_cfg = LMM.LMConfig(
            vocab_size=32_000, hidden_size=1024,
            num_hidden_layers=16, num_attention_heads=16,
            num_key_value_heads=4, intermediate_size=2816,
            max_position_embeddings=1024, dtype="bfloat16",
        )
        lm_params = LMM.init_params(jax.random.PRNGKey(7), lm_cfg)
        CAPL = 512

        def measure(S, field):
            lm_cache = LMM.init_cache(lm_cfg, S, CAPL, per_stream_len=True)
            lens0 = jnp.asarray(
                np.random.default_rng(8).integers(64, 448, (S,)), jnp.int32
            )

            @partial(jax.jit, donate_argnums=(2,))
            def lm_step(p, toks, cache):
                # pin mixed steady-state depths: every step attends a
                # 64-448-deep window per slot (ragged), like live traffic
                cache = {**cache, "len": lens0}
                emb = LMM.embed_tokens(p, toks)[:, None]
                out, cache = LMM.forward(p, emb, lm_cfg, cache=cache)
                return (
                    jnp.argmax(out["logits"][:, -1], -1).astype(jnp.int32),
                    cache,
                )

            toks = jnp.zeros((S,), jnp.int32)
            toks, lm_cache = lm_step(lm_params, toks, lm_cache)
            _ = int(jnp.sum(toks))

            def timed_lm(k):
                nonlocal toks, lm_cache
                t0 = time.perf_counter()
                for _ in range(k):
                    toks, lm_cache = lm_step(lm_params, toks, lm_cache)
                _ = int(jnp.sum(toks))
                return time.perf_counter() - t0

            _PARTIAL[field] = round(S / two_point(timed_lm), 1)

        measure(8, "lm_decode_tok_per_sec")
        # throughput-oriented occupancy: decode amortizes the per-step
        # weight read over more slots (4334 -> 6353 -> 7261 tok/s at
        # S=8/32/64 measured r4; latency 1.9 -> 5.0 -> 8.8 ms/step) —
        # report the 32-slot point (good tput/latency balance)
        measure(32, "lm_decode_tok_per_sec_32slots")
        lm_state["cfg"] = lm_cfg
        lm_state["params"] = lm_params  # reused by sec_lm_engine

    def sec_lm_engine():
        """The same decode served END-TO-END through the continuous-batching
        DecodeEngine: token-ID ingest (IDs embedded on device inside the
        fused prefill — what a text server receives; the r4 engine's whole
        gap to its bare step was uploading (L, D) prompt embeds through
        the ~15 MB/s tunnel), one fused dispatch per prefill chunk,
        admission interleaved one chunk per tick, and 8 decode steps
        scanned per dispatch. Publishes a MEASURED prefill/decode
        decomposition of the timed window (VERDICT r4 #1): each dispatched
        program is timed blocked and multiplied by the engine's dispatch
        counters — `lm_engine_prefill_share` is the prefill fraction of
        the window, `lm_engine_decode_only_tok_per_sec` the rate with
        prefill time excised. Compare against lm_decode_tok_per_sec;
        PERF.md carries the per-tick budget."""
        from streamformer_tpu.lm_serving import DecodeEngine

        lm_cfg, lm_params = lm_state["cfg"], lm_state["params"]
        # ONE long-lived engine, as deployed: constructing an engine per run
        # re-traces every jit closure (seconds of host Python) and times
        # compilation, not serving
        eng = DecodeEngine(
            lm_params, lm_cfg, slots=8, capacity=512,
            max_new_tokens=64, prefill_buckets=(64, 128, 256, 448),
            decode_steps_per_tick=8,
        )
        rngp = np.random.default_rng(9)
        prompts = [
            rngp.integers(0, lm_cfg.vocab_size,
                          (int(rngp.integers(64, 448)),))
            for _ in range(16)  # 2 occupancy rounds over 8 slots
        ]

        def engine_run():
            s0 = {"chunks": dict(eng.stats["prefill_chunks"]),
                  "by_k": dict(eng.stats["decode_by_k"])}
            sids = [eng.open_tokens(p) for p in prompts]
            t0 = time.perf_counter()
            eng.run_until_idle()
            total = sum(len(eng.poll(s)[0]) for s in sids)
            dt = time.perf_counter() - t0
            chunks = {lb: n - s0["chunks"].get(lb, 0)
                      for lb, n in eng.stats["prefill_chunks"].items()}
            by_k = {k: n - s0["by_k"].get(k, 0)
                    for k, n in eng.stats["decode_by_k"].items()}
            return total / dt, total, dt, chunks, by_k

        engine_run()  # warm: compile prefill buckets + k-step decode
        best = max((engine_run() for _ in range(2)), key=lambda r: r[0])
        fps, total, window, chunks, by_k = best
        _PARTIAL["lm_engine_tok_per_sec"] = round(fps, 1)

        # measured decomposition: time each dispatched program and multiply
        # by the window's dispatch counts. Timing is PIPELINED (reps
        # back-to-back dispatches, one block at the end, divided by reps)
        # because that is how the window accrues them — a lone blocked
        # dispatch pays the full tunnel roundtrip (~25 ms), ~4-10x its
        # pipelined marginal cost. The engine is idle now — donating its
        # cache/token mirror into the probe dispatches is harmless.
        def timed_prog(fn, block, reps=8):
            fn()
            block()  # settle
            t0 = time.perf_counter()
            for _ in range(reps):
                fn()
            block()
            return (time.perf_counter() - t0) / reps

        block = lambda: jax.block_until_ready(eng._last_tok_dev)
        chunk_t = {}
        for lb in chunks:
            dev = jax.device_put(np.zeros((1, lb), np.int32))
            prog = eng._fused_chunk_for(lb, True)

            def one_chunk(lb=lb, dev=dev, prog=prog):
                _, eng._cache, eng._last_tok_dev = prog(
                    eng.params, dev, eng._cache, eng._last_tok_dev,
                    jnp.asarray(0, jnp.int32), jnp.asarray(0, jnp.int32),
                    jnp.asarray(lb, jnp.int32), jnp.asarray(0, jnp.int32))

            chunk_t[lb] = timed_prog(one_chunk, block)
        dec_t = {}
        for k in by_k:
            prog = eng._decode_for(k)

            def one_dec(prog=prog):
                eng._last_tok_dev, eng._cache, eng._counts_dev, _ = prog(
                    eng.params, eng._last_tok_dev, eng._cache,
                    eng._active_dev, eng._sids_dev, eng._counts_dev)

            dec_t[k] = timed_prog(one_dec, block)
        prefill_s = sum(chunk_t[lb] * n for lb, n in chunks.items())
        decode_s = sum(dec_t[k] * n for k, n in by_k.items())
        _PARTIAL["lm_engine_prefill_share"] = round(prefill_s / window, 3)
        _PARTIAL["lm_engine_decode_only_tok_per_sec"] = round(
            total / max(window - prefill_s, 1e-9), 1)
        _PARTIAL["lm_engine_decomp"] = {
            "window_s": round(window, 4),
            "prefill_s": round(prefill_s, 4),
            "decode_s": round(decode_s, 4),
            "chunk_ms": {lb: round(t * 1e3, 3) for lb, t in chunk_t.items()},
            "chunk_counts": chunks,
            "decode_dispatch_ms": {k: round(t * 1e3, 3)
                                   for k, t in dec_t.items()},
            "decode_dispatch_counts": by_k,
        }

    def sec_lm_7b():
        """Qwen2.5-7B-geometry int8 decode on ONE 16 GB chip (the
        reference's VideoQA tower is Qwen2.5-7B on 80 GB GPUs,
        downstream/VideoQA/scripts/*7b*). int8 weights (~8.2 GB incl. the
        bf16 embedding) + int8 KV fit the v5e-lite HBM; weights are built
        on device already quantized — a real deployment quantizes trained
        weights host-side (ops/quant walk), but for throughput the values
        are random either way and this skips a ~7 GB tunnel upload.
        Decode is weights-bandwidth-bound, so measured tok/s tracks
        HBM-BW/weight-bytes; 32 slots amortize the read 4x."""
        from streamformer_tpu.models import language_model as LMM

        cfg7 = LMM.LMConfig(
            vocab_size=152_064, hidden_size=3584,
            num_hidden_layers=28, num_attention_heads=28,
            num_key_value_heads=4, intermediate_size=18_944,
            max_position_embeddings=2048, dtype="bfloat16",
        )
        d, m, dh = cfg7.hidden_size, cfg7.intermediate_size, cfg7.head_dim
        hq, hkv = cfg7.num_attention_heads, cfg7.num_key_value_heads

        @jax.jit
        def build(key):
            ks = iter(jax.random.split(key, cfg7.num_hidden_layers * 7 + 3))

            def dense(i, o):
                q = jax.random.randint(next(ks), (i, o), -127, 128, jnp.int8)
                return {"kernel_q": q,
                        "kernel_scale": jnp.full((o,), 0.02 / 127,
                                                 jnp.float32)}

            def layer():
                return {
                    "input_layernorm": jnp.ones((d,), jnp.float32),
                    "post_attention_layernorm": jnp.ones((d,), jnp.float32),
                    "attn": {"q": dense(d, hq * dh), "k": dense(d, hkv * dh),
                             "v": dense(d, hkv * dh), "o": dense(hq * dh, d)},
                    "mlp": {"gate": dense(d, m), "up": dense(d, m),
                            "down": dense(m, d)},
                }

            head = dense(d, cfg7.vocab_size)
            return {
                "embed_tokens": (jax.random.normal(
                    next(ks), (cfg7.vocab_size, d), jnp.bfloat16) * 0.02),
                "layers": [layer() for _ in range(cfg7.num_hidden_layers)],
                "norm": jnp.ones((d,), jnp.float32),
                "lm_head_q": head["kernel_q"],
                "lm_head_scale": head["kernel_scale"],
            }

        p7 = build(jax.random.PRNGKey(0))

        def measure(S, field):
            cache = LMM.init_cache(cfg7, S, 512, per_stream_len=True,
                                   cache_dtype="int8")
            lens0 = jnp.asarray(
                np.random.default_rng(8).integers(64, 448, (S,)), jnp.int32)

            @partial(jax.jit, donate_argnums=(2,))
            def step(p, toks, cache):
                cache = {**cache, "len": lens0}
                emb = LMM.embed_tokens(p, toks)[:, None]
                out, cache = LMM.forward(p, emb, cfg7, cache=cache)
                return (jnp.argmax(out["logits"][:, -1], -1)
                        .astype(jnp.int32), cache)

            toks = jnp.zeros((S,), jnp.int32)
            toks, cache = step(p7, toks, cache)
            _ = int(jnp.sum(toks))

            def timed(k):
                nonlocal toks, cache
                t0 = time.perf_counter()
                for _ in range(k):
                    toks, cache = step(p7, toks, cache)
                _ = int(jnp.sum(toks))
                return time.perf_counter() - t0

            _PARTIAL[field] = round(S / two_point(timed), 1)

        measure(8, "lm7b_int8_tok_per_sec")
        measure(32, "lm7b_int8_tok_per_sec_32slots")

    try:
        if on_tpu:
            if budget_left(1300):
                _section("512-context", lambda: sec_512(
                    cfg.replace(cache_capacity=512),
                    "fps_512f_context_batch2"))
            if budget_left(1400):
                _section("512-int8kv", lambda: sec_512(
                    cfg.replace(cache_capacity=512, cache_dtype="int8"),
                    "fps_512_int8kv"))
            if budget_left(1500):
                _section("int8-serving", sec_int8)
            if budget_left(1600):
                _section("ring", sec_ring)
            if budget_left(1650):
                _section("ragged", sec_ragged)
            if budget_left(1700):
                _section("engine-encode", sec_engine_encode)
            if budget_left(1800):
                _section("train", sec_train)
            if budget_left(1900):
                _section("preproc", sec_preproc)
            if budget_left(1950):
                _section("host-decode", sec_host_decode)
            if budget_left(2100):
                _section("lm-decode", sec_lm_decode)
            if lm_state and budget_left(2150):
                _section("lm-engine", sec_lm_engine)
            # LAST: the 7B program is the slowest compile (~5 min through
            # the tunnel) and the largest allocation (~8.5 GB) — nothing
            # downstream can be hurt if it exhausts either budget. Its gate
            # must exceed every earlier gate (a lower one silently skipped
            # the 7B metric on exactly the slow runs that reached it late).
            if budget_left(2200):
                _section("lm-7b-int8", sec_lm_7b)

        if (
            os.environ.get("STREAMFORMER_BENCH_SKIP_TORCH") != "1"
            and os.path.isdir("/root/reference")
        ):
            _section("torch-reference", lambda: _PARTIAL.update({
                "torch_reference_fps_measured": round(
                    measure_torch_reference()[0], 2),
                "torch_reference_host": "same-host CPU eager fp32 batch1",
            }))
    finally:
        # the headline was measured before this block — emit it NO MATTER
        # WHAT happened above (VERDICT r3 item 1c)
        result = {
            "metric": _HEADLINE_METRIC,
            "value": _PARTIAL.get("value"),
            "unit": "frames/sec/chip",
            "vs_baseline": _PARTIAL.get("vs_baseline"),
            "mfu": _PARTIAL.get("mfu"),
            "tflops": _PARTIAL.get("tflops"),
            "torch_reference_fps_measured": _PARTIAL.get(
                "torch_reference_fps_measured"),
            "torch_reference_host": _PARTIAL.get("torch_reference_host"),
            "h100_fps_estimate": H100_REFERENCE_FPS_EST,
            "fps_512f_context_batch2": _PARTIAL.get(
                "fps_512f_context_batch2"),
            "fps_512_int8kv": _PARTIAL.get("fps_512_int8kv"),
            "fps_int8_serving": _PARTIAL.get("fps_int8_serving"),
            "fps_ring_unbounded": _PARTIAL.get("fps_ring_unbounded"),
            "fps_ragged_serving": _PARTIAL.get("fps_ragged_serving"),
            "fps_engine_streaming": _PARTIAL.get("fps_engine_streaming"),
            "fps_engine_streaming_frames1": _PARTIAL.get(
                "fps_engine_streaming_frames1"),
            "engine_ingest_mb_per_sec": _PARTIAL.get(
                "engine_ingest_mb_per_sec"),
            "engine_output_mb_per_sec": _PARTIAL.get(
                "engine_output_mb_per_sec"),
            "fps_engine_dispatch": _PARTIAL.get("fps_engine_dispatch"),
            "lm_decode_tok_per_sec": _PARTIAL.get("lm_decode_tok_per_sec"),
            "lm_decode_tok_per_sec_32slots": _PARTIAL.get(
                "lm_decode_tok_per_sec_32slots"),
            "lm7b_int8_tok_per_sec": _PARTIAL.get("lm7b_int8_tok_per_sec"),
            "lm7b_int8_tok_per_sec_32slots": _PARTIAL.get(
                "lm7b_int8_tok_per_sec_32slots"),
            "lm_engine_tok_per_sec": _PARTIAL.get("lm_engine_tok_per_sec"),
            "lm_engine_prefill_share": _PARTIAL.get(
                "lm_engine_prefill_share"),
            "lm_engine_decode_only_tok_per_sec": _PARTIAL.get(
                "lm_engine_decode_only_tok_per_sec"),
            "lm_engine_decomp": _PARTIAL.get("lm_engine_decomp"),
            "train_clips_per_sec": _PARTIAL.get("train_clips_per_sec"),
            "train_mfu": _PARTIAL.get("train_mfu"),
            "p50_latency_ms_per_frame": _PARTIAL.get(
                "p50_latency_ms_per_frame"),
            "preprocess_fps_on_device": _PARTIAL.get(
                "preprocess_fps_on_device"),
            "host_decode_clips_per_sec": _PARTIAL.get(
                "host_decode_clips_per_sec"),
        }
        _emit(result)
        if on_tpu and result["value"]:
            # local artifact for the watchdog's stale_fallback (gitignored;
            # stamped so a different host / old run never masquerades)
            try:
                result["_meta"] = {
                    "host": platform.node(),
                    "commit": _git_commit(),
                    "timestamp": time.time(),
                }
                with open(_LAST_GOOD, "w") as f:
                    json.dump(result, f)
            except OSError:
                pass
        print(
            f"# per-step latency: {dt * 1e3:.2f} ms | batch={batch} | "
            f"capacity={cfg.cache_capacity} | "
            f"platform={'tpu' if on_tpu else 'cpu-smoke'} | "
            f"analytic {tflops:.1f} TFLOP/s ({mfu * 100:.1f}% of v5e peak)",
            file=sys.stderr,
        )


if __name__ == "__main__":
    main()
