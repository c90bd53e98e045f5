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

* Ingest: ``open_tokens`` takes token IDs (bytes through the
  host↔device link, embedded ON DEVICE inside the prefill program) —
  the text-serving path. ``open`` takes (L, D) embeddings for the
  VideoQA vision-splice contract; a device-resident ``jax.Array``
  passes through WITHOUT a host roundtrip (the spliced embeds come off
  the vision tower already on device), and a host array starts its
  upload asynchronously at ``open`` time, overlapping earlier ticks.
  Measured on the axon tunnel (~15 MB/s H2D): a 448x1024 fp32 prompt
  costs ~129 ms to upload vs ~5 ms for its token IDs — the r4 engine's
  entire gap to its bare decode step was this upload.
* Prefill: the prompt is cut into bucket-padded chunks at ``open``
  (one compiled program per bucket length). Each chunk is ONE fused
  dispatch: slice the slot's row out of the big cache (+ one bucket of
  zero headroom so the padded append never clamps at the capacity
  edge), run the chunk forward against that batch-1 ragged view,
  write the row back, advance ``len[slot]`` to the true prefix length,
  and sample the next token from the vocab head applied to ONE hidden
  row (the full-chunk logits are DCE'd). Pad rows land past the
  frontier, masked for every later query until overwritten — the same
  invariant the decode's idle-slot rollback relies on.
* Interleaved admission: at most ``prefill_chunks_per_tick`` prefill
  chunks dispatch per tick (default 1), so a burst of opens never
  serializes the decode loop — occupied slots keep decoding while a
  new prompt's chunks trickle in between ticks. Results are
  tick-schedule-independent: each stream's tokens depend only on its
  own cache row (greedy) or its (sid, count) fold_in key (sampled).
* Decode: one jitted ragged step for all slots; idle slots are fed a
  dummy token whose cache row is rolled back inside the same program
  (the ``len - 1`` hold), so occupancy changes never retrace. With
  ``decode_steps_per_tick=k > 1`` the tick runs a ``lax.scan`` of k
  steps in ONE dispatch — on a tunnel where dispatch latency (~1.5 ms)
  is ~5x the device step (~0.3 ms), this is the decode-side analog of
  the video engine's multi-frame tick. The engine drops to 1-step
  ticks whenever any active slot is within k of its budget or the
  cache capacity, so counts never overshoot.
* Finish: EOS, per-request ``max_new_tokens``, or cache capacity. The
  slot is freed at the next tick; the next prefill re-admits the row
  (stale K/V is masked, never cleared).

Host loop is sync-free: sampled tokens stay device-resident, feed the
next step directly, and drain to the results in one bulk transfer at
poll time (or every ``eos_interval`` ticks when an EOS id is set).
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
        prefill_chunks_per_tick: Optional[int] = 1,
        decode_steps_per_tick: int = 1,
    ):
        """``temperature=0`` (default) decodes greedily. With
        ``temperature>0``, tokens are sampled from the tempered softmax,
        optionally truncated by ``top_k`` and/or nucleus ``top_p``.
        Sampling is reproducible PER REQUEST: the key is
        fold_in(fold_in(seed, sid), n_generated), independent of slot
        placement, tick schedule, or what else is in flight.

        ``eos_interval`` — with an ``eos_token_id``, how many ticks may
        pass between EOS checks. ``>1`` keeps the engine on the sync-free
        path (tokens stay device-resident; EOS is detected lazily at the
        periodic drain, delivered output trimmed at the first EOS), at
        the cost of up to ``eos_interval - 1`` wasted decode steps per
        finishing stream — a bargain when per-tick host syncs dominate
        the step (the TPU tunnel's ~1 ms dispatch latency vs a ~0.3 ms
        decode). ``1`` restores the legacy check-every-token path.

        ``prefill_chunks_per_tick`` — how many prefill chunk dispatches
        a tick may issue before its decode step (admission interleaving).
        ``None`` admits every pending prompt eagerly (legacy behavior).

        ``decode_steps_per_tick`` — k>1 scans k ragged decode steps in
        one dispatch (amortizes dispatch latency k-fold). Requires the
        sync-free path; the engine adaptively falls back to single-step
        ticks near budget/capacity edges, so outputs are identical to
        k=1."""
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
        # None | "int8" (half the KV HBM) | "int4" (quarter — nibble-packed,
        # 2x the slots x context of int8 on the same chip; ops/quant.py)
        self.cache_dtype = cache_dtype
        self.buckets = sorted(b for b in prefill_buckets if b <= capacity)
        assert self.buckets, "no prefill bucket fits the capacity"
        self.prefill_chunks_per_tick = prefill_chunks_per_tick
        self.decode_steps_per_tick = max(1, int(decode_steps_per_tick))
        self._cache = LM.init_cache(cfg, slots, capacity,
                                    per_stream_len=True,
                                    cache_dtype=cache_dtype)
        self._decode = {}  # k (steps per dispatch) -> compiled program
        self._prefill = {}  # (bucket length, tokens?) -> fused program
        # host bookkeeping (incl. a host mirror of per-slot cache lengths,
        # so ticks never read the device)
        self._slot_sid: List[Optional[int]] = [None] * slots
        self._last_tok = np.zeros(slots, np.int32)
        self._host_len = np.zeros(slots, np.int64)
        self._host_gen = np.zeros(slots, np.int32)  # tokens sampled so far
        # pending entries: (sid, [(bucket, device chunk, true_lc), ...],
        # true prompt length, tokens?)
        self._pending: deque = deque()
        self._inflight: Optional[dict] = None  # partially-prefilled admit
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
        assert self.decode_steps_per_tick == 1 or self._sync_free, (
            "decode_steps_per_tick > 1 needs the sync-free path "
            "(eos_interval > 1 or no eos_token_id)"
        )
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
        # stash entries: ((k, S) or (S,) device tokens, slot->sid map) per
        # tick, or (device scalar, sid) per prefill
        self._stash: List[Tuple[jnp.ndarray, object]] = []
        self._stash_limit = 512
        self._ticks_since_drain = 0
        self._eos_trimmed: set = set()  # sids finished by a drained EOS
        # dispatch counters for the measured prefill/decode decomposition
        # (bench.py times each compiled program once, blocked, and
        # multiplies by these counts — see PERF.md "engine vs bare step")
        self.stats = {"prefill_chunks": {}, "decode_dispatches": 0,
                      "decode_steps": 0, "decode_by_k": {}, "admits": 0,
                      "prefill_positions": 0}
        # multi-chip DATA-parallel serving: shard the slot axis of the big
        # KV cache over `mesh_axis` — each device decodes slots/n_devices
        # streams (params replicated; the tiny (slots,) operands stay
        # replicated; the fused prefill's row slice/update touches one
        # shard). Composes with the TP specs in parallel/sharding.py on a
        # 2-D mesh by replicating params over `data` and sharding them
        # over `model` instead.
        self._mesh = mesh
        self._repl = None
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P
            assert slots % mesh.shape[mesh_axis] == 0, (
                f"slots={slots} must divide over mesh axis "
                f"'{mesh_axis}'={mesh.shape[mesh_axis]}"
            )
            self._repl = NamedSharding(mesh, P())
            self.params = jax.device_put(self.params, self._repl)
            # LM cache leaves: k/v (+scales) are (B, cap, ...) — batch dim
            # 0 — and "len" is (B,): all shard on dim 0
            self._cache = jax.tree.map(
                lambda x: jax.device_put(
                    x, NamedSharding(mesh, P(*(
                        [mesh_axis] + [None] * (x.ndim - 1))))),
                self._cache,
            )
            for name in ("_last_tok_dev", "_active_dev", "_sids_dev",
                         "_counts_dev"):
                setattr(self, name,
                        jax.device_put(getattr(self, name), self._repl))

    # -- compiled programs ----------------------------------------------------
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

    def _decode_for(self, k: int):
        """Compiled k-step ragged decode: lax.scan over the single-step
        body, ONE dispatch for k tokens per occupied slot. k=1 is the
        plain step."""
        if k in self._decode:
            return self._decode[k]
        cfg, select, keys_of = self.cfg, self._select_fn(), self._keys

        @partial(jax.jit, donate_argnums=(2, 5))
        def step_k(params, toks, cache, active, sids, counts):
            def one(carry, _):
                toks, cache, counts = carry
                emb = LM.embed_tokens(params, toks)[:, None]  # (S, 1, D)
                out, cache = LM.forward(params, emb, cfg, cache=cache)
                # hold idle slots: the dummy row just written is rolled
                # back out of the frontier (masked everywhere,
                # overwritten later)
                cache = {
                    **cache,
                    "len": jnp.where(active, cache["len"],
                                     cache["len"] - 1),
                }
                ntok = jax.vmap(select)(
                    out["logits"][:, -1], keys_of(sids, counts)
                )
                # counts advance ON DEVICE so steady-state ticks upload
                # nothing
                counts = counts + active.astype(counts.dtype)
                return (ntok, cache, counts), ntok

            (toks, cache, counts), seq = jax.lax.scan(
                one, (toks, cache, counts), None, length=k
            )
            return toks, cache, counts, seq  # seq: (k, S)

        self._decode[k] = step_k
        return step_k

    def _fused_chunk_for(self, lb: int, tokens: bool):
        """Fused prefill chunk: ONE dispatch that (1) embeds the chunk's
        token IDs on device (``tokens=True``) or takes bucket-padded
        embeddings, (2) slices the slot's row out of the big cache with
        ``lb`` rows of zero headroom (the padded append may overhang the
        capacity edge; a capacity-sized buffer would let
        dynamic_update_slice CLAMP the start, silently relocating the
        chunk over valid rows — only the first ``capacity`` positions are
        written back), (3) runs the chunk forward against that batch-1
        ragged view at frontier ``pos0``, (4) writes the row back with
        ``len[slot] = pos0 + true_lc``, and (5) samples the next token
        from the vocab head applied to the ONE hidden row at
        ``true_lc - 1`` (the (lb, V) chunk logits are never formed — jit
        DCEs forward's unused logits output). Chaining these serves
        prompts of ANY length up to the cache capacity with a bounded
        set of programs."""
        key = (lb, tokens)
        if key in self._prefill:
            return self._prefill[key]
        cfg, cap = self.cfg, self.capacity
        select, keys_of = self._select_fn(), self._keys

        @partial(jax.jit, donate_argnums=(2, 3))
        def chunk(params, payload, big, ltd, slot, pos0, true_lc, sid):
            emb = (LM.embed_tokens(params, payload) if tokens
                   else payload)  # (1, lb, D)
            view_layers = []
            for pl in big["layers"]:
                v = {}
                for kk, plane in pl.items():
                    row = jax.lax.dynamic_slice(
                        plane, (slot,) + (0,) * (plane.ndim - 1),
                        (1,) + plane.shape[1:])
                    pad = jnp.zeros((1, lb) + plane.shape[2:], plane.dtype)
                    v[kk] = jnp.concatenate([row, pad], axis=1)
                view_layers.append(v)
            view = {"layers": view_layers, "len": pos0[None]}
            out, view = LM.forward(params, emb, cfg, cache=view)
            h = jax.lax.dynamic_slice(
                out["last_hidden_state"], (0, true_lc - 1, 0),
                (1, 1, out["last_hidden_state"].shape[-1]))
            tok = jax.vmap(select)(
                LM.lm_logits(params, h, cfg)[0],
                keys_of(sid[None], jnp.zeros((1,), jnp.int32)),
            )[0]
            layers = []
            for bg, v in zip(big["layers"], view["layers"]):
                layers.append({
                    kk: jax.lax.dynamic_update_slice(
                        bg[kk], v[kk][:, :cap],
                        (slot,) + (0,) * (bg[kk].ndim - 1),
                    )
                    for kk in bg  # k/v (+ k_scale/v_scale when int8)
                })
            ln = big["len"].at[slot].set(pos0 + true_lc)
            # the sampled token also seeds the slot's next decode input —
            # updating the (S,) mirror here saves a dispatch per admit
            return tok, {"layers": layers, "len": ln}, ltd.at[slot].set(tok)

        self._prefill[key] = chunk
        return chunk

    # -- ingest ----------------------------------------------------------------
    def _put(self, x):
        """Device placement that respects the engine's mesh (replicated
        operands on a sharded engine; plain async upload otherwise)."""
        return jax.device_put(x, self._repl) if self._repl is not None \
            else jax.device_put(x)

    def _chunkify(self, payload, tokens: bool) -> List[tuple]:
        """Cut a prompt into bucket-padded device chunks at open() time —
        uploads (host payloads) start here, asynchronously, overlapping
        earlier ticks; device payloads are padded on device and never
        touch the host."""
        lmax = self.buckets[-1]
        L = payload.shape[0]
        chunks = []
        pos = 0
        while pos < L:
            lc = min(L - pos, lmax)
            lb = next(b for b in self.buckets if b >= lc)
            piece = payload[pos:pos + lc]
            if tokens:
                padded = np.zeros((lb,), np.int32)
                padded[:lc] = piece
                dev = self._put(padded[None])
            elif isinstance(payload, jax.Array):
                if lb > lc:
                    piece = jnp.concatenate(
                        [piece, jnp.zeros((lb - lc,) + piece.shape[1:],
                                          piece.dtype)])
                dev = piece[None]
                if self._repl is not None:
                    dev = self._put(dev)
            else:
                # host embeds upload at the model dtype: bf16 halves the
                # tunnel traffic of an fp32 payload (forward casts anyway)
                pad = np.zeros((lb - lc,) + piece.shape[1:], piece.dtype)
                dev = self._put(
                    np.concatenate([piece, pad])[None]
                    .astype(jnp.dtype(self.cfg.dtype)))
            chunks.append((lb, dev, lc))
            pos += lc
        return chunks

    # -- public API ------------------------------------------------------------
    def open(self, prompt_embeds, max_new_tokens: Optional[int] = None) -> int:
        """Queue a request. ``prompt_embeds`` is (L, D) — token embeddings,
        optionally with vision features spliced in (VideoQA contract). A
        ``jax.Array`` stays on device (zero-copy ingest for spliced
        prompts built from device-resident vision features); a host array
        begins uploading immediately."""
        emb = prompt_embeds if isinstance(prompt_embeds, jax.Array) \
            else np.asarray(prompt_embeds)
        if emb.ndim != 2 or emb.shape[0] == 0:
            raise ValueError(
                f"prompt_embeds must be (L>=1, D), got {emb.shape}"
            )
        return self._enqueue(emb, tokens=False,
                             max_new_tokens=max_new_tokens)

    def open_tokens(self, token_ids,
                    max_new_tokens: Optional[int] = None) -> int:
        """Queue a request from token IDs (L,). The prompt is embedded ON
        DEVICE inside the prefill program — the host→device payload is L
        int32s, not LxD floats (~1000x less tunnel traffic; the measured
        difference on the axon link is ~129 ms vs ~5 ms per 448-token
        prompt). Use ``open`` only when the prompt embeds carry spliced
        vision features."""
        ids = np.asarray(token_ids, np.int32)
        if ids.ndim != 1 or len(ids) == 0:
            raise ValueError(f"token_ids must be (L>=1,), got {ids.shape}")
        return self._enqueue(ids, tokens=True, max_new_tokens=max_new_tokens)

    def _enqueue(self, payload, tokens: bool,
                 max_new_tokens: Optional[int]) -> int:
        L = payload.shape[0]
        if L > self.capacity:
            raise ValueError(
                f"prompt length {L} exceeds the cache capacity "
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
        self._pending.append((sid, self._chunkify(payload, tokens), L,
                              tokens))
        return sid

    # -- admission ---------------------------------------------------------------
    def _advance_prefill(self, max_chunks: Optional[int]) -> int:
        """Dispatch up to ``max_chunks`` prefill chunk programs (None =
        unbounded), starting/continuing/finishing admissions in strict
        FIFO order. Returns the number of admissions COMPLETED."""
        finished = 0
        issued = 0
        while max_chunks is None or issued < max_chunks:
            if self._inflight is None:
                if not self._pending:
                    break
                s = next(
                    (i for i in range(self.slots)
                     if self._slot_sid[i] is None),
                    None,
                )
                if s is None:
                    break
                sid, chunks, true_len, tokens = self._pending.popleft()
                self._inflight = {
                    "sid": sid, "slot": s, "chunks": list(chunks),
                    "true_len": true_len, "tokens": tokens, "pos": 0,
                }
            inf = self._inflight
            lb, dev, lc = inf["chunks"].pop(0)
            tok, self._cache, self._last_tok_dev = self._fused_chunk_for(
                lb, inf["tokens"])(
                self.params, dev, self._cache, self._last_tok_dev,
                jnp.asarray(inf["slot"], jnp.int32),
                jnp.asarray(inf["pos"], jnp.int32),
                jnp.asarray(lc, jnp.int32),
                jnp.asarray(inf["sid"], jnp.int32),
            )
            inf["pos"] += lc
            issued += 1
            self.stats["prefill_chunks"][lb] = (
                self.stats["prefill_chunks"].get(lb, 0) + 1)
            self.stats["prefill_positions"] += lc
            if inf["chunks"]:
                continue  # more chunks of this prompt on later ticks
            # admission complete: publish the slot
            s, sid = inf["slot"], inf["sid"]
            self._inflight = None
            self._slot_sid[s] = sid
            self._host_len[s] = inf["true_len"]
            self._host_gen[s] = 1  # the prefill token used key n=0
            self.stats["admits"] += 1
            finished += 1
            if self._sync_free:
                self._stash.append((tok, sid))
                self._bookkeep(s)
            else:
                t = int(tok)  # EOS checking needs the value: sync here
                self._last_tok[s] = t
                self._emit(s, t)
        return finished

    def _emit(self, s: int, tok: int):
        sid = self._slot_sid[s]
        self._results[sid].append(tok)
        self._budget[sid] -= 1
        eos = self.eos_token_id is not None and tok == self.eos_token_id
        if eos or self._budget[sid] <= 0:
            self._done.add(sid)
            self._slot_sid[s] = None

    def _bookkeep(self, s: int, n: int = 1):
        """Count-based finish accounting for the sync-free path (token
        values are still on the device)."""
        sid = self._slot_sid[s]
        self._budget[sid] -= n
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
            else:  # tick rows: m maps slot -> sid (None = idle); a k-step
                # tick contributes k rows of S in decode order
                S = self.slots
                for r in range(n // S):
                    for s, sid in enumerate(m):
                        if sid is not None:
                            self._deliver(sid, int(v[r * S + s]))

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
        """Retire capacity-full slots, advance admissions by a bounded
        number of prefill chunks, then decode every occupied slot (k
        tokens per dispatch when the schedule allows). Returns False when
        idle."""
        # capacity guard FIRST (a frontier row cannot take another token —
        # the append would clamp onto the last row) so the freed slot is
        # available to admission within this same tick; retiring after
        # admission can otherwise report idle with requests still queued
        for s in range(self.slots):
            if (self._slot_sid[s] is not None
                    and self._host_len[s] >= self.capacity):
                self._done.add(self._slot_sid[s])
                self._slot_sid[s] = None
        admitted = self._advance_prefill(self.prefill_chunks_per_tick)
        progressed = admitted > 0 or self._inflight is not None
        # exclude capacity-full slots (a prompt of length == capacity is
        # admitted full: its prefill token is its only output) — decoding
        # one would clamp the append onto the last valid KV row, corrupting
        # it; the guard above retires the slot next tick
        active_slots = [s for s in range(self.slots)
                        if self._slot_sid[s] is not None
                        and self._host_len[s] < self.capacity]
        if not active_slots:
            return progressed  # prefill-only tick still made progress
        # k-step schedule: every active slot must be able to absorb k
        # tokens (budget AND capacity); otherwise fall back to 1 so
        # count-based finish never overshoots a budget or the cache edge
        k = self.decode_steps_per_tick
        if k > 1:
            room = min(
                min(self._budget[self._slot_sid[s]] for s in active_slots),
                min(self.capacity - int(self._host_len[s])
                    for s in active_slots),
            )
            if room < k:
                k = 1
        occupancy = tuple(self._slot_sid)
        if occupancy != self._occupancy:
            self._occupancy = occupancy
            active = np.zeros(self.slots, bool)
            active[active_slots] = True
            sids = np.asarray(
                [sid if sid is not None else 0 for sid in self._slot_sid],
                np.int32,
            )
            self._active_dev = self._put(jnp.asarray(active))
            self._sids_dev = self._put(jnp.asarray(sids))
            # _host_gen MUST be snapshotted: on the CPU backend jnp.asarray
            # of a numpy array is ZERO-COPY (the device buffer aliases host
            # memory), and the sync-free path mutates _host_gen in place
            # right after the async dispatch — the program would read the
            # post-increment counts and sample with the wrong fold_in keys.
            self._counts_dev = self._put(jnp.asarray(
                self._host_gen.copy().astype(np.int32)))
        toks_in = (self._last_tok_dev if self._sync_free
                   else jnp.asarray(self._last_tok))
        toks, self._cache, self._counts_dev, seq = self._decode_for(k)(
            self.params, toks_in, self._cache,
            self._active_dev, self._sids_dev, self._counts_dev,
        )
        self.stats["decode_dispatches"] += 1
        self.stats["decode_steps"] += k
        self.stats["decode_by_k"][k] = self.stats["decode_by_k"].get(k, 0) + 1
        if self._sync_free:
            # tokens never touch the host: they feed the next step and
            # drain to results in bulk at poll time
            self._last_tok_dev = toks
            self._stash.append(
                (seq, [self._slot_sid[s] if s in active_slots else None
                       for s in range(self.slots)])
            )
            for s in active_slots:
                self._host_len[s] += k
                self._host_gen[s] += k
                self._bookkeep(s, k)
            self._ticks_since_drain += 1
            if (len(self._stash) >= self._stash_limit  # bound device mem
                    or (self.eos_token_id is not None
                        and self._ticks_since_drain >= self.eos_interval)):
                self._drain_stash()
        else:
            row = np.asarray(seq)[-1]
            for s in active_slots:
                self._host_len[s] += 1
                self._host_gen[s] += 1
                self._last_tok[s] = row[s]
                self._emit(s, int(row[s]))
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
        decodes every tick, a mid-prefill admission advances, and a
        pending request implies either admission (free slot) or decode
        progress. Lives on the engine so servers never re-encode
        scheduling rules."""
        return (bool(self._pending) or self._inflight is not None
                or any(sid is not None for sid in self._slot_sid))

    def run_until_idle(self, max_ticks: int = 100_000) -> int:
        n = 0
        while n < max_ticks and self.tick():
            n += 1
        return n
