"""Continuous-batching serving demo: ragged per-stream cache lengths.

A serving fleet rarely sees streams start and stop in lockstep. With
``init_cache(per_stream_len=True)`` every batch row advances at its own
position (``cache["len"]`` is ``(B,)``): one compiled step serves a batch
of mixed-position streams, and ``reset_streams`` re-admits a finished slot
for a new stream without recompiling or touching its neighbours.

The demo runs a 4-slot server for 8 "requests" of different lengths:
requests are admitted into free slots as they arrive, stepped together in
one jit'd call per tick, and their pooled features are checked against
independently-encoded lone streams (the correctness contract).

Run: python examples/continuous_batching_demo.py
STREAMFORMER_DEMO_SMOKE=1 shrinks to a toy config so the demo finishes in
seconds on a CPU (the default flagship 768x12 config wants a TPU).
"""

import os
import sys
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
from streamformer_tpu.config import StreamformerConfig
from streamformer_tpu.models import encoder


def main():
    if os.environ.get("STREAMFORMER_DEMO_SMOKE") == "1":
        cfg = StreamformerConfig(
            image_size=48, num_frames=8, hidden_size=96,
            num_hidden_layers=3, num_attention_heads=4,
            intermediate_size=192, dtype="float32", use_pallas=False,
            cache_capacity=16,
        )
    else:
        cfg = StreamformerConfig(dtype="float32", use_pallas=False,
                                 cache_capacity=16)
    params = encoder.init_params(jax.random.PRNGKey(0), cfg)

    SLOTS = 4
    rng = np.random.default_rng(0)
    # 8 requests, 2-6 frames each, arriving one per tick
    requests = [rng.standard_normal((n_frames, 3, cfg.image_size,
                                     cfg.image_size)).astype(np.float32)
                for n_frames in rng.integers(2, 7, size=8)]

    step = jax.jit(partial(encoder.streaming_forward, cfg=cfg),
                   donate_argnums=(2,))

    cache = encoder.init_cache(cfg, batch=SLOTS, per_stream_len=True)
    slot_req = [None] * SLOTS       # which request occupies each slot
    slot_done = [0] * SLOTS         # frames served so far per slot
    pending = list(range(len(requests)))
    results = {i: [] for i in range(len(requests))}

    tick = 0
    while pending or any(r is not None for r in slot_req):
        # admit: fill every free slot, resetting its length to 0
        free = jnp.asarray([slot_req[s] is None for s in range(SLOTS)])
        cache = encoder.reset_streams(cache, free)
        for s in range(SLOTS):
            if slot_req[s] is None and pending:
                slot_req[s] = pending.pop(0)
                slot_done[s] = 0
                print(f"tick {tick}: request {slot_req[s]} -> slot {s}")

        # one frame per occupied slot (idle slots get zeros, output unused)
        frame = np.zeros((SLOTS, 1, 3, cfg.image_size, cfg.image_size),
                         np.float32)
        for s in range(SLOTS):
            if slot_req[s] is not None:
                frame[s, 0] = requests[slot_req[s]][slot_done[s]]
        out, cache = step(params, jnp.asarray(frame), cache)

        # collect outputs; retire finished requests
        pooled = np.asarray(out["pooler_output"][:, 0])
        for s in range(SLOTS):
            r = slot_req[s]
            if r is None:
                continue
            results[r].append(pooled[s])
            slot_done[s] += 1
            if slot_done[s] == len(requests[r]):
                print(f"tick {tick}: request {r} finished ({slot_done[s]} "
                      f"frames), slot {s} free")
                slot_req[s] = None
        tick += 1

    # contract: every request's outputs equal a lone stream's
    worst = 0.0
    solo_step = jax.jit(partial(encoder.streaming_forward, cfg=cfg),
                        donate_argnums=(2,))
    for r, clip in enumerate(requests):
        solo = encoder.init_cache(cfg, batch=1)
        for t in range(len(clip)):
            o, solo = solo_step(
                params, jnp.asarray(clip[None, t : t + 1]), solo
            )
            dev = float(np.abs(results[r][t] -
                               np.asarray(o["pooler_output"][0, 0])).max())
            worst = max(worst, dev)
    print(f"\nserved {len(requests)} requests on {SLOTS} slots in {tick} "
          f"ticks; worst deviation vs lone streams: {worst:.2e}")
    assert worst < 1e-4, "continuous-batching contract violated"
    print("contract holds: ragged rows == independent streams")


if __name__ == "__main__":
    main()
