"""Tracing / timing utilities.

The reference has no real profiler — DeepSpeed flops_profiler in the config
factory (utils.py:1028-1034) plus manual wall-clock behind log_time flags
(tools/finetune_tools.py:79-175) with cuda.synchronize per step. Here:

* ``trace(logdir)``: jax.profiler TensorBoard trace context;
* ``timed(fn, ...)``: two-point-differencing steady-state timer — the only
  reliable timing on transports where ``block_until_ready`` does not
  synchronize (e.g. the axon tunnel; see .claude/skills/verify/SKILL.md);
* ``flops_estimate(cfg, ...)``: analytic encoder FLOPs for MFU accounting.
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable, Optional

import jax
import jax.numpy as jnp


@contextlib.contextmanager
def trace(logdir: str):
    """TensorBoard trace of everything inside the context."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def timed(
    fn: Callable[[], jnp.ndarray],
    k1: int = 2,
    k2: int = 12,
    reps: int = 2,
) -> float:
    """Seconds per call of ``fn`` (which must return an array depending on
    the full computation). Two-point differencing cancels transport
    roundtrips; the scalar fetch is the sync barrier."""
    r = fn()
    _ = float(jnp.sum(r))

    def run(k):
        t0 = time.perf_counter()
        out = None
        for _ in range(k):
            out = fn()
        _ = float(jnp.sum(out))
        return time.perf_counter() - t0

    t1 = min(run(k1) for _ in range(reps))
    t2 = min(run(k2) for _ in range(reps))
    return (t2 - t1) / (k2 - k1)


def encoder_flops(cfg, batch: int, frames: int) -> float:
    """Analytic forward FLOPs of the divided space-time encoder."""
    d, m = cfg.hidden_size, cfg.intermediate_size
    n = cfg.num_patches
    tokens = batch * frames * n
    per_token_layer = 2 * d * (3 * d + d) * 2 + 2 * d * d + 2 * 2 * d * m
    proj = tokens * per_token_layer * cfg.num_hidden_layers
    spatial_attn = 4 * batch * frames * n * n * d * cfg.num_hidden_layers
    temporal_attn = 4 * batch * n * frames * frames * d * cfg.num_hidden_layers
    patchify = 2 * tokens * (cfg.patch_size**2 * cfg.num_channels) * d
    return float(proj + spatial_attn + temporal_attn + patchify)


def mfu(cfg, batch: int, frames: int, seconds: float, peak_tflops: float = 197.0):
    """Model FLOPs utilization vs chip peak (v5e bf16 = 197 TFLOPS)."""
    return encoder_flops(cfg, batch, frames) / seconds / (peak_tflops * 1e12)


def streaming_step_flops(cfg, batch: int, context: int, t_new: int = 1) -> float:
    """Analytic FLOPs of one streaming encode step (t_new frames appended,
    temporal attention over ``context`` cached+new positions).

    Covers patchify, per-layer projections (temporal+spatial qkv/out,
    temporal_dense, MLP), the two attention einsums, and the MAP pool head.
    """
    d, m, n, L = (
        cfg.hidden_size,
        cfg.intermediate_size,
        cfg.num_patches,
        cfg.num_hidden_layers,
    )
    tokens = batch * t_new * n
    per_token_layer = 2 * d * (3 * d + d) * 2 + 2 * d * d + 2 * 2 * d * m
    proj = tokens * per_token_layer * L
    spatial_attn = 4 * batch * t_new * n * n * d * L
    temporal_attn = 4 * batch * n * t_new * context * d * L
    patchify = 2 * tokens * (cfg.patch_size**2 * cfg.num_channels) * d
    # MAP head: k/v projections over n tokens, out proj, MLP, probe attention
    map_head = batch * t_new * (2 * 2 * n * d * d + 2 * d * d + 4 * d * m + 4 * n * d)
    return float(proj + spatial_attn + temporal_attn + patchify + map_head)
