"""Streaming vision tower for VideoQA (LLaVA-style integration).

Rebuild of TimesformerVisionTower
(downstream/VideoQA/llava/model/multimodal_encoder/timesformer_encoder.py:
1462-1567): holds the temporal KV cache across calls, concatenates new
frame features along time, exposes only the last ``context_length`` frames
to the LLM, and supports ``clear_cache()``. The image processor
(SigLIP resize/rescale/normalize(0.5), :1395-1459) runs on device.

The core difference from the reference: the cache is a fixed-capacity
donated buffer (one compiled step program), not a growing DynamicCache.
"""

from __future__ import annotations

from functools import partial
from typing import Dict, List, Optional

import numpy as np
import jax
import jax.numpy as jnp

from streamformer_tpu.config import StreamformerConfig
from streamformer_tpu.models import encoder
from streamformer_tpu.data import transforms as T


class TimesformerVisionTower:
    """Stateful streaming tower. ``forward`` consumes (B, T_new, C, H, W)
    pixel values and returns per-frame features for the LLM."""

    def __init__(
        self,
        cfg: StreamformerConfig,
        params,
        streaming_mode: Optional[bool] = None,
        context_length: Optional[int] = None,
        select_feature: str = "patch",
    ):
        self.cfg = cfg
        self.params = params
        # config.json-driven fields (reference :1494-1500)
        self.streaming_mode = (
            streaming_mode if streaming_mode is not None else cfg.streaming_mode
        )
        self.context_length = (
            context_length if context_length is not None else cfg.context_length
        )
        self.select_feature = select_feature
        self._cache = None
        self._history: Optional[jnp.ndarray] = None  # (B, t, N, D)
        # One consistent time-embedding table for the whole stream (nearest-
        # interpolated to the cache capacity when beyond trained positions).
        # The reference reinterpolates to the *current* total every step
        # (timesformer_encoder.py:328-369), which silently gives cached K/V a
        # different embedding table than later queries; a fixed table is
        # self-consistent and identical within trained positions.
        self._total_hint = max(cfg.num_frames, cfg.cache_capacity)
        self._step = jax.jit(
            partial(
                encoder.streaming_forward,
                cfg=cfg,
                total_frames_hint=self._total_hint,
            ),
            donate_argnums=(2,),
        )
        self._full = jax.jit(
            lambda p, x: encoder.model_forward(p, x, cfg)
        )

    # ------------------------------------------------------------------

    @property
    def hidden_size(self):
        return self.cfg.hidden_size

    @property
    def num_patches(self):
        return self.cfg.num_patches

    def clear_cache(self):
        """Reset the stream (reference clear_cache, :1528-1530)."""
        self._cache = None
        self._history = None

    def preprocess(self, images_u8: np.ndarray) -> jnp.ndarray:
        """(T, H, W, C) uint8 -> (T, C, size, size) normalized (reference
        image processor :1395-1459: resize -> rescale 1/255 -> normalize .5)."""
        x = T.resize(jnp.asarray(images_u8), (self.cfg.image_size, self.cfg.image_size))
        x = (x - 0.5) / 0.5
        return T.to_model_input(x)

    def forward(self, pixel_values) -> jnp.ndarray:
        """(B, T_new, C, H, W) -> (B, t_ctx, N, D) patch features
        (``select_feature='patch'``) with t_ctx = min(total, context_length)
        (reference forward :1532-1544). ``None`` returns the held streaming
        context without consuming new frames (the reference's
        generate(images=None)-after-streaming contract)."""
        if pixel_values is None:
            if not self.streaming_mode or self._history is None:
                raise ValueError(
                    "pixel_values=None reuses the streaming context, but "
                    + ("the tower is not in streaming mode"
                       if not self.streaming_mode
                       else "no frames have been streamed yet")
                )
            return self._history
        b = pixel_values.shape[0]
        px = pixel_values.astype(jnp.dtype(self.cfg.dtype))
        if not self.streaming_mode:
            out = self._full(self.params, px)
            return out["last_hidden_state"]

        if self._cache is None:
            # linear mode streams on the RAGGED (per-stream-length) cache:
            # its multi-frame appends run the fused append kernel on TPU
            # (ops/attention.fused_temporal_append_pm_ragged — one cache
            # read per chunk), where the lockstep multi-frame einsum pays
            # tile-padded relayouts of the whole cache per layer. Lens
            # stay uniform (one stream per row); ring mode keeps the
            # lockstep cache (ragged ring is t=1-kernel-only).
            self._cache = encoder.init_cache(
                self.cfg, batch=b,
                per_stream_len=self.cfg.cache_mode != "ring",
            )
        ln = self._cache["len"]
        cur = int(ln if ln.ndim == 0 else ln[0])
        if self.cfg.cache_mode != "ring":
            total = cur + px.shape[1]
            if total > self.cfg.cache_capacity:
                raise ValueError(
                    f"stream length {total} exceeds cache_capacity "
                    f"{self.cfg.cache_capacity} in linear cache mode; use "
                    "cache_mode='ring' for unbounded streams (sliding "
                    "window in fixed HBM) or clear_cache() to restart"
                )
        if self.cfg.cache_mode != "ring" and px.shape[1] > 1:
            # chunk at the append kernel's VMEM cap; chunk i+1 attends
            # chunk i through the cache (contract-equal to one append)
            from streamformer_tpu.ops.attention import APPEND_T_MAX

            outs = []
            for ci in range(0, px.shape[1], APPEND_T_MAX):
                out, self._cache = self._step(
                    self.params, px[:, ci : ci + APPEND_T_MAX], self._cache)
                outs.append(out["last_hidden_state"])
            new = (outs[0] if len(outs) == 1
                   else jnp.concatenate(outs, axis=1))
        else:
            out, self._cache = self._step(self.params, px, self._cache)
            new = out["last_hidden_state"]  # (B, T_new, N, D)
        self._history = (
            new
            if self._history is None
            else jnp.concatenate([self._history, new], axis=1)
        )
        # LLM sees a sliding window; encoder cache keeps the longer history
        if self._history.shape[1] > self.context_length:
            self._history = self._history[:, -self.context_length :]
        return self._history

    __call__ = forward
