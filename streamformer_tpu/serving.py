"""Continuous-batching streaming-encode serving engine.

Productizes the ragged per-stream cache (``init_cache(per_stream_len=True)``,
``reset_streams``) into a serving API: ``slots`` concurrent streams advance
through ONE compiled step per tick, each at its own position; finished or
closed streams free their slot for the next queued request without
recompiling or disturbing neighbours. The reference has no serving stack at
all — its KV-cache model (VideoQA's timesformer_encoder.py DynamicCache)
only ever advances a whole batch in lockstep.

Semantics:

* ``open()`` admits a stream (immediately if a slot is free, else queued
  FIFO); ``feed(sid, frames)`` enqueues host frames; ``poll(sid)`` drains
  the pooled features produced so far; ``close(sid)`` marks end-of-stream —
  the slot is recycled once its queue drains.
* One ``tick()`` advances every occupied slot that has a frame queued by
  exactly one frame (the production fused t=1 ragged decode, bf16/fp or
  int8 KV).
* Starved slots (open stream, empty queue) are HELD: they are fed a dummy
  frame whose output is discarded and whose cache length is rolled back
  inside the same compiled step, so the stream resumes exactly where it
  paused. Holds are a LINEAR-cache feature: the dummy append lands at the
  stream's own next position (masked from every consumer, overwritten by
  the next real frame). The ring (sliding-window) cache cannot hold — its
  wrap-around write would clobber the oldest in-window position — so in
  ring mode a starved stream blocks the tick (feed-or-close contract,
  asserted).

The scheduling/host loop is deliberately synchronous-dispatch only — all
device work stays on the caller's thread (two threads jit-dispatching
deadlocks the axon tunnel), and nothing here reads device outputs until
``poll``/``tick`` returns them, so dispatch pipelines ahead of the chip.

Zero-upload ticks (the DecodeEngine pattern applied to frames): ``feed``
bulk-uploads frames ONCE into a per-slot device staging ring; the compiled
tick gathers each slot's next frame from the ring at its device-resident
read pointer and advances the pointer in-program. A steady-state tick
uploads nothing — host→device traffic happens at ingest (feed) time, in
clip-sized transfers, where it belongs in a pipelined server. Without
staging every tick paid a blocking (slots,1,C,H,W) upload on the dispatch
thread (~2.4 MB ≈ 24–110 ms through the axon tunnel vs a ~4 ms step).
"""

from __future__ import annotations

from collections import deque
from functools import partial
from typing import Dict, List, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from .config import StreamformerConfig
from .models import encoder


class StreamingEngine:
    """Slot-based continuous-batching server for streaming encode.

    ``collect='pooled'`` accumulates (t, D) pooled features per stream
    (the OAD/feature-serving contract); ``collect=None`` discards outputs
    (cache-building only, e.g. a VideoQA prefill fleet).
    """

    def __init__(
        self,
        params,
        cfg: StreamformerConfig,
        slots: int = 8,
        capacity: Optional[int] = None,
        mode: str = "auto",
        collect: Optional[str] = "pooled",
        stage_depth: Optional[int] = None,
        stage_dtype: Optional[str] = None,
        normalize: Optional[Tuple] = None,
        mesh: Optional["jax.sharding.Mesh"] = None,
        mesh_axis: str = "data",
    ):
        capacity = capacity or cfg.cache_capacity
        if mode == "auto":
            mode = encoder.auto_cache_mode(cfg)
        assert mode in ("linear", "ring"), mode
        self.cfg = cfg.replace(cache_mode=mode, cache_capacity=capacity)
        self.params = params
        self.slots = slots
        self.mode = mode
        self.collect = collect
        self._dt = jnp.dtype(self.cfg.dtype)
        self._cache = encoder.init_cache(
            self.cfg, batch=slots, capacity=capacity, per_stream_len=True
        )
        # per-slot device staging ring: feed() writes clips here in bulk
        # (one upload per feed), the tick gathers frame = stage[s, rd % Q]
        # on device. Q >= capacity so a linear-mode stream always fits;
        # ring-mode streams that outrun Q overflow to the host queue and
        # re-stage as the ring drains.
        self._stage_depth = int(stage_depth or capacity)
        # uint8 staging: feed() takes decoded 0..255 frames as-is and the
        # tick normalizes ON DEVICE after the gather — 4x less ingest
        # traffic and a 4x smaller ring than fp32/bf16 staging, and the
        # host never touches float pixels (the decoded-video serving path)
        assert stage_dtype in (None, "uint8"), stage_dtype
        self._stage_u8 = stage_dtype == "uint8"
        assert normalize is None or self._stage_u8, \
            "normalize applies to uint8 staging (float feeds pre-normalize)"
        self._norm = None
        if normalize is not None:
            mean, std = normalize
            self._norm = (np.asarray(mean, np.float32).reshape(1, 1, -1, 1, 1),
                          np.asarray(std, np.float32).reshape(1, 1, -1, 1, 1))
        c, hw = 3, self.cfg.image_size
        self._stage = jnp.zeros(
            (slots, self._stage_depth, c, hw, hw),
            jnp.uint8 if self._stage_u8 else self._dt,
        )
        self._rd_dev = jnp.zeros((slots,), jnp.int32)  # in-program read ptrs
        self._wr = [0] * slots  # absolute frames staged, host-side
        self._rd = [0] * slots  # absolute frames consumed (host mirror)
        self._write = self._make_stage_write()
        self._step = self._make_step()
        self._step_k = {}  # frames-per-dispatch -> compiled multi-frame tick
        self._slot_sid: List[Optional[int]] = [None] * slots
        self._queues: Dict[int, deque] = {}
        self._closed: set = set()
        self._results: Dict[int, list] = {}
        self._served: Dict[int, int] = {}
        self._fed: Dict[int, int] = {}  # total frames fed per stream
        self._pending: deque = deque()  # sids waiting for a slot
        self._admit_next: set = set()  # slots granted since the last tick
        self._next_sid = 0
        # device-side output stash: (tick outputs, per-slot sid) demuxed
        # lazily at poll time so ticks never sync on the device; bounded —
        # tick() force-drains past _stash_limit so a caller that never
        # polls cannot grow device-resident state without bound
        self._stash: List[Tuple[jnp.ndarray, List[Optional[int]]]] = []
        self._stash_limit = 256
        # device mirrors of the (admit, active) tick operands: re-uploaded
        # only when the pattern changes (steady state: admit all-False,
        # active constant) — each small upload costs ~1 ms of tunnel
        # latency against a ~4 ms step
        self._flags_key: Optional[bytes] = None
        self._admit_dev = jnp.zeros((slots,), bool)
        self._active_dev = jnp.zeros((slots,), bool)
        # multi-chip serving: shard the slot axis of every large per-slot
        # buffer over `mesh_axis` — each device serves slots/n_devices
        # streams with NO cross-device traffic in the steady-state tick
        # (the ragged cache's per-stream rows and the staging ring are both
        # slot-local; params are replicated). The host loop is unchanged:
        # GSPMD keeps donated outputs on their input shardings, so one
        # engine drives the whole mesh. Host<->device transfers (staging
        # writes, stash drains) route per-shard automatically.
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P
            assert slots % mesh.shape[mesh_axis] == 0, (
                f"slots={slots} must divide over mesh axis "
                f"'{mesh_axis}'={mesh.shape[mesh_axis]}"
            )
            repl = NamedSharding(mesh, P())
            self.params = jax.device_put(self.params, repl)
            # cache leaves, keyed by name because the stream-row axis
            # moves: flat pos-major k/v are (C, B*N, D) — rows at dim 1
            # (b-major, chunks align with stream boundaries) — while the
            # int8 k_scale/v_scale are (B*N, C) — rows at dim 0 (a bare
            # ndim rule would shard the scales' CAPACITY dim and buy an
            # all-gather per tick); (B,) lens shard dim 0
            def _spec(path, x):
                name = str(path[-1].key) if hasattr(path[-1], "key") else ""
                if name.endswith("_scale"):
                    return P(mesh_axis, *([None] * (x.ndim - 1)))
                if x.ndim >= 2:
                    return P(None, mesh_axis, *([None] * (x.ndim - 2)))
                return P(mesh_axis)

            self._cache = jax.tree_util.tree_map_with_path(
                lambda path, x: jax.device_put(
                    x, NamedSharding(mesh, _spec(path, x))),
                self._cache,
            )
            self._stage = jax.device_put(
                self._stage,
                NamedSharding(mesh, P(mesh_axis, *([None] * 4))),
            )
            # tiny (slots,) operands stay replicated: rebuilding them is a
            # scalar upload and the gathers they index are slot-local
            for name in ("_rd_dev", "_admit_dev", "_active_dev"):
                setattr(self, name,
                        jax.device_put(getattr(self, name), repl))

    # -- one compiled tick ------------------------------------------------
    def _make_step(self):
        cfg = self.cfg
        slots, depth = self.slots, self._stage_depth
        u8, norm, dt = self._stage_u8, self._norm, self._dt

        # donate cache + read ptrs (both replaced every tick); NEVER donate
        # admit/active — they are cached device operands reused across
        # ticks (donating them works on CPU, which ignores donation, but
        # deletes the buffer on TPU and poisons the next tick)
        @partial(jax.jit, donate_argnums=(2, 3))
        def step(params, stage, rd, cache, admit, active):
            # admitted slots restart their staging read pointer (the host
            # re-stages the new stream from ring position 0)
            rd = jnp.where(admit, 0, rd)
            frame = stage[jnp.arange(slots), rd % depth][:, None]
            if u8:
                # normalize on device in fp32, then cast once — the same
                # (x/255 - mean)/std a host-side fp32 preprocess computes,
                # equal to feeding normalized floats up to fp32 rounding
                # (tests/test_serving.py pins it at 1e-6)
                f = frame.astype(jnp.float32) / 255.0
                if norm is not None:
                    f = (f - norm[0]) / norm[1]
                frame = f.astype(dt)
            cache = encoder.reset_streams(cache, admit)
            out, cache = encoder.streaming_forward(params, frame, cache,
                                                   cfg=cfg)
            # roll held slots back: their dummy append stays masked (len
            # unchanged => consumers never see position len) and the next
            # real frame overwrites the same slot. A held slot's gathered
            # frame is stale ring content — discarded the same way the old
            # zeros dummy was.
            cache = {**cache,
                     "len": jnp.where(active, cache["len"],
                                      cache["len"] - 1)}
            rd = jnp.where(active, rd + 1, rd)
            return out["pooler_output"], cache, rd

        return step

    def _step_for(self, k: int):
        """Compiled MULTI-FRAME tick (throughput mode, VERDICT r4 #5).

        Linear mode: ONE t=k streaming_forward append — slot s consumes its
        OWN ``navail[s]`` staged frames via the per-stream partial-append
        path (``new_valid``, encoder._ragged_attend_einsum). This is the
        HBM-bandwidth play, not just dispatch amortization: the t=1 decode
        kernel re-reads the FULL temporal KV cache per appended frame
        (~half its step time at the flagship config), while one t=k append
        reads it once and runs k-fold bigger spatial/MLP GEMMs on the MXU —
        measured >1.7x the scan-of-k formulation end-to-end (PERF.md
        "Engine throughput mode").

        Ring mode: holds are illegal (a wrap-around dummy write would evict
        in-window history) and the ragged ring decode is kernel-only, so it
        keeps the lax.scan of k t=1 steps; tick() already forces uniform
        consumption (min over slots) there.

        Outputs come back (slots, k, D); the host trims row s to
        navail[s]."""
        if k in self._step_k:
            return self._step_k[k]
        cfg = self.cfg
        slots, depth = self.slots, self._stage_depth
        u8, norm, dt = self._stage_u8, self._norm, self._dt

        def _normalize(frames):
            if not u8:
                return frames
            f = frames.astype(jnp.float32) / 255.0
            if norm is not None:
                f = (f - norm[0]) / norm[1]
            return f.astype(dt)

        # quantized caches keep the scan: the multi-append kernel is
        # bf16/fp-only, and routing an int8-KV tick through the einsum
        # path would dequantize + relayout the full cache per chunk —
        # measured SLOWER than the scanned fused int8 t=1 decode
        # (PERF.md formulation table)
        if self.mode != "ring" and cfg.cache_dtype is None:
            from streamformer_tpu.ops.attention import APPEND_T_MAX

            # the append kernel's VMEM budget caps one call at
            # APPEND_T_MAX frames; bigger ticks chain chunked appends
            # INSIDE the one dispatch (still one cache read per chunk,
            # one dispatch+sync per tick; chunk i+1's queries see chunk
            # i via the cache). A t=1 tail (k % max == 1) would silently
            # drop that chunk to the einsum path (the kernel needs t>=2)
            # — rebalance the last two chunks instead.
            chunks = [APPEND_T_MAX] * (k // APPEND_T_MAX)
            if k % APPEND_T_MAX:
                chunks.append(k % APPEND_T_MAX)
            if len(chunks) > 1 and chunks[-1] == 1:
                chunks[-2] -= 1
                chunks[-1] = 2

            @partial(jax.jit, donate_argnums=(2, 3))
            def step_k(params, stage, rd, cache, admit, navail):
                rd = jnp.where(admit, 0, rd)
                cache = encoder.reset_streams(cache, admit)
                outs = []
                ci = 0
                for kk in chunks:
                    idx = (rd[:, None] + ci + jnp.arange(kk)[None]) % depth
                    frames = _normalize(
                        stage[jnp.arange(slots)[:, None], idx]
                    )  # (slots, kk, C, H, W)
                    nv = jnp.clip(navail - ci, 0, kk)
                    out, cache = encoder.streaming_forward(
                        params, frames, cache, cfg=cfg, new_valid=nv,
                    )
                    outs.append(out["pooler_output"])
                    ci += kk
                pooled = (outs[0] if len(outs) == 1
                          else jnp.concatenate(outs, axis=1))
                return pooled, cache, rd + navail

            self._step_k[k] = step_k
            return step_k

        @partial(jax.jit, donate_argnums=(2, 3))
        def step_k(params, stage, rd, cache, admit, navail):
            rd = jnp.where(admit, 0, rd)
            cache = encoder.reset_streams(cache, admit)

            def body(carry, i):
                cache, rd = carry
                active = i < navail
                frame = _normalize(
                    stage[jnp.arange(slots), rd % depth][:, None]
                )
                out, cache = encoder.streaming_forward(params, frame, cache,
                                                       cfg=cfg)
                cache = {**cache,
                         "len": jnp.where(active, cache["len"],
                                          cache["len"] - 1)}
                rd = jnp.where(active, rd + 1, rd)
                return (cache, rd), out["pooler_output"][:, 0]

            (cache, rd), seq = jax.lax.scan(
                body, (cache, rd), jnp.arange(k))
            return jnp.moveaxis(seq, 0, 1), cache, rd  # (slots, k, D)

        self._step_k[k] = step_k
        return step_k

    def _make_stage_write(self):
        depth = self._stage_depth

        @partial(jax.jit, donate_argnums=(0,))
        def write(stage, clip, slot, start, valid):
            # masked modular scatter: clip rows land at ring positions
            # (start + i) % depth; clip is padded to a pow-2 length so
            # recompiles are bounded by log2(depth) shapes. Padding rows
            # (valid=False) are routed out of bounds and dropped — mapping
            # them in-bounds would alias real rows when depth is not a
            # power of two (duplicate-index scatter picks an unspecified
            # winner, so a padding row could clobber a real frame).
            idx = (start + jnp.arange(clip.shape[0])) % depth
            idx = jnp.where(valid, idx, depth)
            return stage.at[slot, idx].set(clip, mode="drop")

        return write

    def _stage_frames(self, s: int, q: deque) -> int:
        """Bulk-upload as many of ``q``'s frames as fit in slot ``s``'s
        staging ring; returns the number staged (popped from ``q``)."""
        free = self._stage_depth - (self._wr[s] - self._rd[s])
        n = min(len(q), free)
        if n <= 0:
            return 0
        chunk = np.stack([q.popleft() for _ in range(n)])
        tpad = 1 << (n - 1).bit_length()  # next pow2 >= n
        if tpad > n:
            chunk = np.concatenate(
                [chunk, np.zeros((tpad - n,) + chunk.shape[1:], chunk.dtype)]
            )
        valid = np.arange(tpad) < n
        self._stage = self._write(
            self._stage, jnp.asarray(chunk),
            jnp.asarray(s, jnp.int32),
            jnp.asarray(self._wr[s] % self._stage_depth, jnp.int32),
            jnp.asarray(valid),
        )
        self._wr[s] += n
        return n

    # -- public API --------------------------------------------------------
    def open(self) -> int:
        """Admit a new stream; returns its id (slot granted now or FIFO)."""
        sid = self._next_sid
        self._next_sid += 1
        self._queues[sid] = deque()
        self._results[sid] = []
        self._served[sid] = 0
        self._fed[sid] = 0
        self._pending.append(sid)
        return sid

    def feed(self, sid: int, frames) -> None:
        """Enqueue (t, C, H, W) host frames for stream ``sid``.

        In linear cache mode a stream is bounded by the cache capacity —
        feeding past it would silently attend a stale window (the append
        one-hot has nowhere to land), so it raises instead (the same
        contract extract_features_batched enforces). Ring mode streams are
        unbounded (sliding window)."""
        assert sid in self._queues and sid not in self._closed, sid
        if self._stage_u8:
            frames = np.asarray(frames)
            assert frames.dtype == np.uint8, (
                f"uint8-staging engine feeds decoded uint8 frames, got "
                f"{frames.dtype} (normalization happens on device)"
            )
        else:
            frames = np.asarray(frames, self._dt)
        if (self.mode == "linear"
                and self._fed[sid] + len(frames) > self.cfg.cache_capacity):
            raise ValueError(
                f"stream {sid}: {self._fed[sid] + len(frames)} frames exceed "
                f"the linear cache capacity {self.cfg.cache_capacity}; use "
                "mode='ring' (sliding window) for unbounded streams"
            )
        self._fed[sid] += len(frames)
        for f in frames:
            self._queues[sid].append(f)
        # live-fed slotted streams stage at ingest time (one bulk upload
        # per feed call) so the tick itself uploads nothing; granting is
        # eager so a stream opened after others finished starts staging on
        # its FIRST feed, not after the next tick reclaims the slot
        self._grant_slots()
        if sid in self._slot_sid:
            s = self._slot_sid.index(sid)
            if self._wr[s] - self._rd[s] < self._stage_depth:
                self._stage_frames(s, self._queues[sid])

    def close(self, sid: int) -> None:
        """End-of-stream: remaining queued frames still get served."""
        self._closed.add(sid)

    def active_streams(self) -> int:
        return len(self._pending) + sum(
            s is not None for s in self._slot_sid
        )

    def _grant_slots(self) -> None:
        """Retire drained closed streams, grant free slots to feedable
        pending streams (strict FIFO: the head blocks until it can feed).

        Called from both feed() and tick() so staging starts at ingest
        time; a granted slot is recorded in ``_admit_next`` and its cache
        reset happens on the next tick (the compiled step's ``admit``)."""
        for s in range(self.slots):
            if s in self._admit_next:
                continue  # freshly granted; its admit tick hasn't run yet
            sid = self._slot_sid[s]
            if sid is not None and (
                sid not in self._queues  # reclaimed by poll()
                or (sid in self._closed and not self._queues[sid]
                    and self._wr[s] == self._rd[s])
            ):
                self._slot_sid[s] = None
            while self._slot_sid[s] is None and self._pending:
                head = self._pending[0]
                if head not in self._queues or (
                    head in self._closed and not self._queues[head]
                ):
                    self._pending.popleft()  # reclaimed / nothing to serve
                    continue
                if self._queues[head]:
                    self._slot_sid[s] = self._pending.popleft()
                    self._admit_next.add(s)
                    # restart the slot's staging ring for the new stream
                    # (the compiled step resets its read pointer on admit)
                    self._wr[s] = self._rd[s] = 0
                    self._stage_frames(s, self._queues[head])
                break

    def tick(self, frames: int = 1) -> bool:
        """Advance every feedable slot by up to ``frames`` staged frames in
        ONE dispatch; returns False when there was nothing to do (no
        occupied slot fed, nothing admitted).

        ``frames=1`` is the latency mode (one frame per occupied slot per
        dispatch). ``frames=k>1`` is the throughput mode: a compiled
        k-step scan per dispatch. In linear mode slots consume their OWN
        count (0..k — holds fill the difference); in ring mode holds are
        illegal (the wrap-around dummy write would evict in-window
        history), so the dispatch runs min-over-slots frames and the tick
        falls back toward 1 as any slot runs dry."""
        # only streams that can feed on grant take a slot (an idle admit
        # would start ring streams with a hold, which ring cannot do)
        self._grant_slots()
        admit = np.zeros(self.slots, bool)
        for s in self._admit_next:
            admit[s] = True
        self._admit_next.clear()

        avail = np.zeros(self.slots, np.int64)
        fed_sids: List[Optional[int]] = [None] * self.slots
        for s in range(self.slots):
            sid = self._slot_sid[s]
            if sid is None:
                continue
            if self._queues[sid] and self._wr[s] - self._rd[s] < \
                    self._stage_depth:
                # overflow drain: host-queued frames re-stage as the ring
                # frees (ring-mode streams fed faster than consumption)
                self._stage_frames(s, self._queues[sid])
            avail[s] = self._wr[s] - self._rd[s]
            if avail[s] > 0:
                fed_sids[s] = sid
            else:
                assert self.mode == "linear" or sid in self._closed, (
                    f"stream {sid} starved a ring-mode slot: the sliding-"
                    "window cache cannot hold (its wrap-around write would "
                    "evict in-window history) — feed() it every tick or "
                    "close() it"
                )
        if not avail.any() and not admit.any():
            return False

        k = max(1, int(frames))
        if k > 1 and self.mode == "ring":
            # every occupied slot must consume exactly k (no ring holds)
            k = max(1, min(int(a) for a in avail[avail > 0])) if \
                avail.any() else 1
            k = min(k, frames)
            # floor to a power of two: min-avail varies tick to tick with
            # heterogeneous stream lengths, and every distinct k compiles
            # its own scan program — unbounded k values caused a compile
            # storm (one ~10-40 s tunnel compile per new k) in the
            # batched extractor; log2(frames) programs serve all of them,
            # the remainder frames just land in the next tick
            k = 1 << (k.bit_length() - 1)
        navail = np.minimum(avail, k).astype(np.int32)

        if k == 1:
            active = navail > 0
            key = admit.tobytes() + active.tobytes()
            if key != self._flags_key:
                self._flags_key = key
                self._admit_dev = jnp.asarray(admit)
                self._active_dev = jnp.asarray(active)
            pooled, self._cache, self._rd_dev = self._step(
                self.params, self._stage, self._rd_dev, self._cache,
                self._admit_dev, self._active_dev,
            )
            pooled_n = 1
        else:
            key = admit.tobytes() + navail.tobytes()
            if key != self._flags_key:
                self._flags_key = key
                self._admit_dev = jnp.asarray(admit)
                self._active_dev = jnp.asarray(navail)
            pooled, self._cache, self._rd_dev = self._step_for(k)(
                self.params, self._stage, self._rd_dev, self._cache,
                self._admit_dev, self._active_dev,
            )
            pooled_n = k
        for s in range(self.slots):
            self._rd[s] += int(navail[s])
        if self.collect:
            self._stash.append((pooled, pooled_n, fed_sids, navail))
            if len(self._stash) >= self._stash_limit:
                self._drain_stash()  # bound device-resident outputs
        for s, sid in enumerate(fed_sids):
            if sid is not None:
                self._served[sid] += int(navail[s])
        return True

    def _drain_stash(self) -> None:
        if not self._stash:
            return
        entries, self._stash = self._stash, []
        # one bulk transfer for all stashed ticks: every entry is
        # (slots, n_i, D) device output (n_i = 1 for latency ticks, k for
        # multi-frame ticks; row s carries navail[s] valid columns)
        block = np.asarray(
            jnp.concatenate([e[0] for e in entries], axis=1), np.float32
        )
        off = 0
        for (_, n, sids, navail) in entries:
            for s, sid in enumerate(sids):
                if sid is not None and sid in self._results:
                    for i in range(int(navail[s])):
                        self._results[sid].append(block[s, off + i])
            off += n

    def poll(self, sid: int) -> Tuple[np.ndarray, bool]:
        """(new (t, D) features since last poll, stream finished?).

        Per-stream bookkeeping is reclaimed on the poll that observes
        completion — a long-lived engine serving many short streams stays
        O(live streams), not O(streams ever opened): a reclaimed sid is
        recognized by absence (valid id, no bookkeeping) and keeps
        answering (empty, True)."""
        assert 0 <= sid < self._next_sid, f"unknown stream {sid}"
        empty = np.zeros((0, self.cfg.hidden_size), np.float32)
        if sid not in self._queues:  # reclaimed: finished earlier
            return empty, True
        self._drain_stash()
        out = self._results[sid]
        feats = np.stack(out) if out else empty
        self._results[sid] = []
        # staged frames leave the host queue at feed time, so completion is
        # "every frame ever fed has been served", not an empty queue
        done = (sid in self._closed and not self._queues[sid]
                and self._served[sid] == self._fed[sid])
        if done:
            for d in (self._queues, self._results, self._served, self._fed):
                d.pop(sid, None)
            self._closed.discard(sid)
            if sid in self._pending:  # closed empty before ever admitted
                self._pending.remove(sid)
        return feats, done

    def has_work(self) -> bool:
        """True iff tick() would actually feed a frame — the engine's own
        admission rules, for actors/servers that must never spin on no-op
        ticks (e.g. a stream opened but not yet fed). Kept here, next to
        _grant_slots/tick, so scheduling changes stay in ONE place."""
        if any(
            sid is not None
            and (self._wr[s] > self._rd[s] or self._queues.get(sid))
            for s, sid in enumerate(self._slot_sid)
        ):
            return True
        slot_free = any(
            sid is None or sid not in self._queues
            or (sid in self._closed and not self._queues[sid]
                and self._wr[s] == self._rd[s])
            for s, sid in enumerate(self._slot_sid)
        )
        if not slot_free:
            return False
        for h in self._pending:  # effective FIFO head decides admission
            if h not in self._queues or (
                h in self._closed and not self._queues[h]
            ):
                continue
            return bool(self._queues[h])
        return False

    def run_until_idle(self, max_ticks: int = 1_000_000,
                       frames: int = 1) -> int:
        """Drive ticks until every stream drains; returns ticks run.
        ``frames`` forwards to tick() (throughput mode k>1)."""
        n = 0
        while n < max_ticks and self.tick(frames=frames):
            n += 1
        return n
