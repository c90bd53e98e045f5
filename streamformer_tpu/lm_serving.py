"""Continuous-batching LM decode engine (the VideoQA tower's server side).

The torch reference generates with HF `model.generate` — one lockstep
batch, every sequence padded to the longest prompt and decoded until the
last one finishes (downstream/VideoQA/llava). This engine serves
generation the way the video encoder's StreamingEngine serves encode:
``slots`` concurrent requests advance through ONE compiled ragged decode
step per tick, each at its own depth (cache ``len`` is per-stream), and a
finished request frees its slot for the next queued prompt immediately —
no recompile, no tail-latency coupling between requests.

Structure:

* Prefill: a queued prompt is padded up to a small set of bucket lengths
  (one compiled program per bucket) and run through a batch-1 forward with
  a scalar-length cache; its K/V planes are then scattered into the
  engine cache's slot row and ``len[slot]`` set to the true prompt length.
  Pad rows land past the frontier, where every later mask excludes them
  until the decode frontier overwrites them — same invariant the video
  engine relies on.
* Decode: one jitted t=1 ragged step for all slots. Idle slots are fed a
  dummy token whose cache row is rolled back inside the same program (the
  ``len - 1`` hold), so occupancy changes never retrace.
* Finish: EOS, per-request ``max_new_tokens``, or cache capacity. The
  slot is freed at the next tick; the next prefill's ``len[slot]`` write
  re-admits the row (stale K/V is masked, never cleared).

Host loop syncs one small (slots,) token array per tick — the decode is
dispatch-pipelined otherwise. Prompts are EMBEDDINGS (L, D), so the
VideoQA image-token splicing (vision features interleaved with text)
composes directly: build the spliced embeds, hand them to ``open``.
"""

from __future__ import annotations

from collections import deque
from functools import partial
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from .models import language_model as LM

__all__ = ["DecodeEngine"]


class DecodeEngine:
    def __init__(
        self,
        params,
        cfg: "LM.LMConfig",
        slots: int = 8,
        capacity: int = 512,
        max_new_tokens: int = 128,
        eos_token_id: Optional[int] = None,
        prefill_buckets: Sequence[int] = (32, 64, 128, 256),
        temperature: float = 0.0,
        top_k: Optional[int] = None,
        top_p: Optional[float] = None,
        seed: int = 0,
        cache_dtype: Optional[str] = None,
        eos_interval: int = 8,
        mesh: Optional["jax.sharding.Mesh"] = None,
        mesh_axis: str = "data",
    ):
        """``temperature=0`` (default) decodes greedily. With
        ``temperature>0``, tokens are sampled from the tempered softmax,
        optionally truncated by ``top_k`` and/or nucleus ``top_p``.
        Sampling is reproducible PER REQUEST: the key is
        fold_in(fold_in(seed, sid), n_generated), independent of slot
        placement or what else is in flight.

        ``eos_interval`` — with an ``eos_token_id``, how many ticks may
        pass between EOS checks. ``>1`` keeps the engine on the sync-free
        path (tokens stay device-resident; EOS is detected lazily at the
        periodic drain, delivered output trimmed at the first EOS), at
        the cost of up to ``eos_interval - 1`` wasted decode steps per
        finishing stream — a bargain when per-tick host syncs dominate
        the step (the TPU tunnel's ~1 ms dispatch latency vs a ~0.5 ms
        decode). ``1`` restores the legacy check-every-token path."""
        self.params = params
        self.cfg = cfg
        self.slots = slots
        self.capacity = capacity
        self.max_new_tokens = max_new_tokens
        self.eos_token_id = eos_token_id
        self.temperature = float(temperature)
        self.top_k = top_k
        self.top_p = top_p
        self._base_key = jax.random.PRNGKey(seed)
        self.cache_dtype = cache_dtype  # None | "int8" (half the KV HBM)
        self.buckets = sorted(b for b in prefill_buckets if b <= capacity)
        assert self.buckets, "no prefill bucket fits the capacity"
        self._cache = LM.init_cache(cfg, slots, capacity,
                                    per_stream_len=True,
                                    cache_dtype=cache_dtype)
        # ONE persistent batch-1 prefill cache, recycled across requests:
        # allocating it per prefill costs ~2 x num_layers zeros dispatches
        # (~16 ms of tunnel latency each admit — measured dominant in the
        # r3 prefill budget). write_slot hands it back with len zeroed;
        # stale K/V rows need no clearing (masked by len everywhere).
        # Headroom of one bucket past capacity: the LAST chunk's padded
        # append may overhang (pos + lb > capacity), and a capacity-sized
        # cache would let dynamic_update_slice CLAMP the start, silently
        # relocating the chunk over valid rows. write_slot copies only the
        # first `capacity` positions, so the overhang rows never escape.
        self._prefill_cache = LM.init_cache(
            cfg, 1, capacity + self.buckets[-1], cache_dtype=cache_dtype
        )
        self._decode = self._make_decode()
        self._prefill = {}  # bucket length -> compiled chunk program
        self._write_slot = self._make_write_slot()
        # host bookkeeping (incl. a host mirror of per-slot cache lengths,
        # so ticks never read the device)
        self._slot_sid: List[Optional[int]] = [None] * slots
        self._last_tok = np.zeros(slots, np.int32)
        self._host_len = np.zeros(slots, np.int64)
        self._host_gen = np.zeros(slots, np.int32)  # tokens sampled so far
        self._pending: deque = deque()  # (sid, embeds, max_new)
        self._results: Dict[int, list] = {}
        self._done: set = set()
        self._budget: Dict[int, int] = {}  # sid -> remaining new tokens
        self._next_sid = 0
        # SYNC-FREE fast path: sampled tokens stay device-resident, feed
        # the next step directly, and drain to the results in one bulk
        # transfer at poll time (and, with an eos_token_id, every
        # eos_interval ticks so EOS streams finish at most that late).
        # Finish accounting per tick is count-based (budget / capacity);
        # EOS finishes happen at the drain, which trims the delivered
        # tokens at the first EOS. With the tunnel's ~1 ms dispatch
        # latency a per-tick sync would dominate the step itself.
        self.eos_interval = max(1, int(eos_interval))
        self._sync_free = eos_token_id is None or self.eos_interval > 1
        self._last_tok_dev = jnp.zeros((slots,), jnp.int32)
        # device mirrors of the tick operands: occupancy arrays re-upload
        # only when the slot map changes, and the fold_in counts advance
        # inside the decode program — a steady-state tick is ONE dispatch
        # with zero host->device transfers (each small upload costs ~1 ms
        # through the tunnel, several times the decode itself)
        self._occupancy: Tuple[Optional[int], ...] = tuple([None] * slots)
        self._active_dev = jnp.zeros((slots,), bool)
        self._sids_dev = jnp.zeros((slots,), jnp.int32)
        self._counts_dev = jnp.zeros((slots,), jnp.int32)
        # stash entries: (device tokens, slot->sid map) per tick, or
        # (device scalar, sid) per prefill
        self._stash: List[Tuple[jnp.ndarray, object]] = []
        self._stash_limit = 512
        self._ticks_since_drain = 0
        self._eos_trimmed: set = set()  # sids finished by a drained EOS
        # multi-chip DATA-parallel serving: shard the slot axis of the big
        # KV cache over `mesh_axis` — each device decodes slots/n_devices
        # streams (params replicated; the batch-1 prefill cache and the
        # tiny (slots,) operands stay replicated — write_slot's masked
        # dynamic-update touches one shard). Composes with the TP specs in
        # parallel/sharding.py on a 2-D mesh by replicating params over
        # `data` and sharding them over `model` instead.
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P
            assert slots % mesh.shape[mesh_axis] == 0, (
                f"slots={slots} must divide over mesh axis "
                f"'{mesh_axis}'={mesh.shape[mesh_axis]}"
            )
            repl = NamedSharding(mesh, P())
            self.params = jax.device_put(self.params, repl)
            # LM cache leaves: k/v (+scales) are (B, cap, ...) — batch dim
            # 0 — and "len" is (B,): all shard on dim 0
            self._cache = jax.tree.map(
                lambda x: jax.device_put(
                    x, NamedSharding(mesh, P(*(
                        [mesh_axis] + [None] * (x.ndim - 1))))),
                self._cache,
            )
            self._prefill_cache = jax.device_put(self._prefill_cache, repl)
            for name in ("_last_tok_dev", "_active_dev", "_sids_dev",
                         "_counts_dev"):
                setattr(self, name,
                        jax.device_put(getattr(self, name), repl))

    # -- compiled programs --------------------------------------------------
    def _select_fn(self):
        """(logits (V,), key) -> token, per the engine's sampling config.
        Trace-time branches only — greedy engines never touch the RNG."""
        temp, top_k, top_p = self.temperature, self.top_k, self.top_p

        def select(logits, key):
            if temp <= 0.0:
                return jnp.argmax(logits).astype(jnp.int32)
            l = logits.astype(jnp.float32) / temp
            if top_k is not None:
                kth = jax.lax.top_k(l, top_k)[0][-1]
                l = jnp.where(l < kth, -jnp.inf, l)
            if top_p is not None:
                srt = jnp.sort(l)[::-1]
                probs = jax.nn.softmax(srt)
                cum = jnp.cumsum(probs)
                # keep the smallest prefix with cumulative mass >= top_p
                # (the first token crossing the threshold stays in)
                cut = jnp.sum(cum - probs < top_p)  # number kept
                thresh = srt[jnp.maximum(cut - 1, 0)]
                l = jnp.where(l < thresh, -jnp.inf, l)
            return jax.random.categorical(key, l).astype(jnp.int32)

        return select

    def _keys(self, sids, counts):
        """Per-request keys inside jit: fold_in(fold_in(seed, sid), n)."""
        base = self._base_key

        def one(s, n):
            return jax.random.fold_in(jax.random.fold_in(base, s), n)

        return jax.vmap(one)(sids, counts)

    def _make_decode(self):
        cfg, select, keys_of = self.cfg, self._select_fn(), self._keys

        @partial(jax.jit, donate_argnums=(2, 5))
        def step(params, toks, cache, active, sids, counts):
            emb = LM.embed_tokens(params, toks)[:, None]  # (S, 1, D)
            out, cache = LM.forward(params, emb, cfg, cache=cache)
            # hold idle slots: the dummy row just written is rolled back
            # out of the frontier (masked everywhere, overwritten later)
            cache = {
                **cache,
                "len": jnp.where(active, cache["len"], cache["len"] - 1),
            }
            ntok = jax.vmap(select)(
                out["logits"][:, -1], keys_of(sids, counts)
            )
            # counts advance ON DEVICE so steady-state ticks upload nothing
            return ntok, cache, counts + active.astype(counts.dtype)

        return step

    def _chunk_for(self, lb: int):
        """Compiled prefill chunk: append lb (end-padded) prompt positions
        to a batch-1 scalar-length cache, roll the frontier back to the
        true chunk length, return the next-token argmax at the chunk's
        last valid position. Chaining these serves prompts of ANY length
        up to the cache capacity with a bounded set of programs."""
        if lb in self._prefill:
            return self._prefill[lb]
        cfg = self.cfg

        select, keys_of = self._select_fn(), self._keys

        @partial(jax.jit, donate_argnums=(2,))
        def chunk(params, emb, small, true_lc, sid):
            out, small = LM.forward(params, emb, cfg, cache=small)
            # pad rows sit past the rolled-back frontier: masked for every
            # later query, overwritten by the next chunk's append
            small = {
                **small,
                "len": small["len"] - (emb.shape[1] - true_lc),
            }
            tok = jax.vmap(select)(
                out["logits"][0, true_lc - 1][None],
                keys_of(sid[None], jnp.zeros((1,), jnp.int32)),
            )[0]
            return tok, small

        self._prefill[lb] = chunk
        return chunk

    def _make_write_slot(self):
        n_layers = self.cfg.num_hidden_layers

        cap = self.capacity

        @partial(jax.jit, donate_argnums=(0, 1))
        def write_slot(small, big, slot, true_len):
            layers = []
            for i in range(n_layers):
                bg, sm = big["layers"][i], small["layers"][i]
                layers.append({
                    # the prefill cache carries one bucket of overhang
                    # headroom; only the slot's capacity-many rows land
                    key: jax.lax.dynamic_update_slice(
                        bg[key], sm[key][:, :cap],
                        (slot,) + (0,) * (bg[key].ndim - 1),
                    )
                    for key in bg  # k/v (+ k_scale/v_scale when int8)
                })
            ln = big["len"].at[slot].set(true_len)
            # hand the (donated) prefill cache back with its frontier reset
            # so the next admit reuses the buffers — layer planes alias
            # through unchanged, so this costs nothing
            small_reset = {"layers": small["layers"],
                           "len": jnp.zeros_like(small["len"])}
            return {"layers": layers, "len": ln}, small_reset

        return write_slot

    # -- public API ----------------------------------------------------------
    def open(self, prompt_embeds, max_new_tokens: Optional[int] = None) -> int:
        """Queue a request. ``prompt_embeds`` is (L, D) — token embeddings,
        optionally with vision features spliced in (VideoQA contract)."""
        emb = np.asarray(prompt_embeds)
        if emb.ndim != 2 or len(emb) == 0:
            raise ValueError(
                f"prompt_embeds must be (L>=1, D), got {emb.shape}"
            )
        if len(emb) > self.capacity:
            raise ValueError(
                f"prompt length {len(emb)} exceeds the cache capacity "
                f"{self.capacity} (long prompts prefill in chunks, but the "
                "whole prompt must fit the cache)"
            )
        budget = (
            self.max_new_tokens if max_new_tokens is None else max_new_tokens
        )
        if budget < 1:
            raise ValueError(
                f"max_new_tokens must be >= 1, got {budget} (the prefill "
                "itself produces the first token)"
            )
        sid = self._next_sid
        self._next_sid += 1
        self._results[sid] = []
        self._budget[sid] = budget
        self._pending.append((sid, emb))
        return sid

    def _run_prefill(self, sid: int, emb: np.ndarray):
        """Chunked prefill on the engine's recycled batch-1 cache; returns
        (first generated token — a DEVICE scalar, unsynced — and the filled
        small cache, which write_slot must hand back reset)."""
        small = self._prefill_cache
        pos, tok = 0, None
        lmax = self.buckets[-1]
        while pos < len(emb):
            piece = emb[pos : pos + lmax]
            lc = len(piece)
            lb = next(b for b in self.buckets if b >= lc)
            pad = np.zeros((lb - lc, emb.shape[1]), emb.dtype)
            embp = jnp.asarray(np.concatenate([piece, pad])[None])
            tok, small = self._chunk_for(lb)(
                self.params, embp, small, jnp.asarray(lc, jnp.int32),
                jnp.asarray(sid, jnp.int32),
            )
            pos += lc
        return tok, small

    def _admit(self) -> int:
        """Admit pending prompts while free slots remain. Loops so a
        prefill that finishes instantly (EOS/budget-1 on its first token)
        hands its slot straight to the next queued request."""
        n = 0
        while self._pending:
            s = next(
                (i for i in range(self.slots) if self._slot_sid[i] is None),
                None,
            )
            if s is None:
                break
            sid, emb = self._pending.popleft()
            true_len = len(emb)
            tok, small = self._run_prefill(sid, emb)
            self._cache, self._prefill_cache = self._write_slot(
                small, self._cache,
                jnp.asarray(s, jnp.int32), jnp.asarray(true_len, jnp.int32),
            )
            self._slot_sid[s] = sid
            self._host_len[s] = true_len
            self._host_gen[s] = 1  # the prefill token used key n=0
            if self._sync_free:
                self._last_tok_dev = self._last_tok_dev.at[s].set(tok)
                self._stash.append((tok, sid))
                self._bookkeep(s)
            else:
                t = int(tok)  # EOS checking needs the value: sync here
                self._last_tok[s] = t
                self._emit(s, t)
            n += 1
        return n

    def _emit(self, s: int, tok: int):
        sid = self._slot_sid[s]
        self._results[sid].append(tok)
        self._budget[sid] -= 1
        eos = self.eos_token_id is not None and tok == self.eos_token_id
        if eos or self._budget[sid] <= 0:
            self._done.add(sid)
            self._slot_sid[s] = None

    def _bookkeep(self, s: int):
        """Count-based finish accounting for the sync-free path (token
        values are still on the device)."""
        sid = self._slot_sid[s]
        self._budget[sid] -= 1
        if self._budget[sid] <= 0:
            self._done.add(sid)
            self._slot_sid[s] = None

    def _drain_stash(self) -> None:
        if not self._stash:
            return
        self._ticks_since_drain = 0
        entries, self._stash = self._stash, []
        # ONE device concat + ONE transfer: a device_get over the raw list
        # pays the tunnel roundtrip PER ARRAY (~10 ms each — measured as the
        # dominant engine cost in r3: 1.4 s of a 1.8 s run for 126 stashed
        # ticks); flattening on device first makes the drain one roundtrip.
        flat = jax.device_get(
            jnp.concatenate([e[0].reshape(-1) for e in entries])
            if len(entries) > 1 else entries[0][0].reshape(-1)
        )
        off = 0
        for (arr, m) in entries:
            n = int(np.prod(arr.shape)) if arr.ndim else 1
            v = flat[off:off + n]
            off += n
            if isinstance(m, int):  # prefill scalar: m is the sid
                self._deliver(m, int(v[0]))
            else:  # tick row: m maps slot -> sid (None = idle)
                for s, sid in enumerate(m):
                    if sid is not None:
                        self._deliver(sid, int(v[s]))

    def _deliver(self, sid: int, tok: int) -> None:
        """Append one drained token to a stream, finishing it at EOS.
        Tokens decoded after an already-seen EOS (the lazy-check
        overshoot) are dropped; the overshoot cache rows never matter —
        the stream is done and its slot is reclaimed here (unless
        count-based finish already recycled it to another request)."""
        if sid in self._eos_trimmed or sid not in self._results:
            return
        self._results[sid].append(tok)
        if self.eos_token_id is not None and tok == self.eos_token_id:
            self._eos_trimmed.add(sid)
            self._done.add(sid)
            for s in range(self.slots):
                if self._slot_sid[s] == sid:
                    self._slot_sid[s] = None

    def tick(self) -> bool:
        """Retire capacity-full slots, admit pending prompts, then decode
        every occupied slot one token. Returns False when idle."""
        # capacity guard FIRST (a frontier row cannot take another token —
        # the append would clamp onto the last row) so the freed slot is
        # available to _admit within this same tick; retiring after
        # admission can otherwise report idle with requests still queued
        for s in range(self.slots):
            if (self._slot_sid[s] is not None
                    and self._host_len[s] >= self.capacity):
                self._done.add(self._slot_sid[s])
                self._slot_sid[s] = None
        admitted = self._admit()
        # exclude capacity-full slots (a prompt of length == capacity is
        # admitted full: its prefill token is its only output) — decoding
        # one would clamp the append onto the last valid KV row, corrupting
        # it; the guard above retires the slot next tick
        active_slots = [s for s in range(self.slots)
                        if self._slot_sid[s] is not None
                        and self._host_len[s] < self.capacity]
        if not active_slots:
            return admitted > 0  # prefill-only tick still made progress
        occupancy = tuple(self._slot_sid)
        if occupancy != self._occupancy:
            self._occupancy = occupancy
            active = np.zeros(self.slots, bool)
            active[active_slots] = True
            sids = np.asarray(
                [sid if sid is not None else 0 for sid in self._slot_sid],
                np.int32,
            )
            self._active_dev = jnp.asarray(active)
            self._sids_dev = jnp.asarray(sids)
            # _host_gen MUST be snapshotted: on the CPU backend jnp.asarray
            # of a numpy array is ZERO-COPY (the device buffer aliases host
            # memory), and the sync-free path mutates _host_gen in place
            # right after the async dispatch — the program would read the
            # post-increment counts and sample with the wrong fold_in keys.
            self._counts_dev = jnp.asarray(self._host_gen.copy()
                                           .astype(np.int32))
        toks_in = (self._last_tok_dev if self._sync_free
                   else jnp.asarray(self._last_tok))
        toks, self._cache, self._counts_dev = self._decode(
            self.params, toks_in, self._cache,
            self._active_dev, self._sids_dev, self._counts_dev,
        )
        if self._sync_free:
            # tokens never touch the host: they feed the next step and
            # drain to results in bulk at poll time
            self._last_tok_dev = toks
            self._stash.append(
                (toks, [self._slot_sid[s] if s in active_slots else None
                        for s in range(self.slots)])
            )
            for s in active_slots:
                self._host_len[s] += 1
                self._host_gen[s] += 1
                self._bookkeep(s)
            self._ticks_since_drain += 1
            if (len(self._stash) >= self._stash_limit  # bound device mem
                    or (self.eos_token_id is not None
                        and self._ticks_since_drain >= self.eos_interval)):
                self._drain_stash()
        else:
            toks = np.asarray(toks)
            for s in active_slots:
                self._host_len[s] += 1
                self._host_gen[s] += 1
                self._last_tok[s] = toks[s]
                self._emit(s, int(toks[s]))
        return True

    def poll(self, sid: int) -> Tuple[List[int], bool]:
        """(new tokens since last poll, finished?).

        Bookkeeping is reclaimed on the poll that observes completion —
        the engine stays O(live requests); a reclaimed id keeps answering
        ([], True) by absence."""
        assert 0 <= sid < self._next_sid, f"unknown request {sid}"
        self._drain_stash()  # sync-free path: bulk-fetch stashed tokens
        if sid not in self._results:  # reclaimed: finished earlier
            return [], True
        out = self._results[sid]
        done = sid in self._done
        if done:
            self._results.pop(sid)
            self._budget.pop(sid, None)
            self._done.discard(sid)
            self._eos_trimmed.discard(sid)
        else:
            self._results[sid] = []
        return out, done

    def has_work(self) -> bool:
        """True iff tick() would make progress — every occupied slot
        decodes every tick, and a pending request implies either admission
        (free slot) or decode progress. Lives on the engine so servers
        never re-encode scheduling rules."""
        return bool(self._pending) or any(
            sid is not None for sid in self._slot_sid
        )

    def run_until_idle(self, max_ticks: int = 100_000) -> int:
        n = 0
        while n < max_ticks and self.tick():
            n += 1
        return n
