"""Long-video per-frame feature extraction for OAD.

Rebuild of extract_oad_feature.py (143 LoC): decode -> resize224/center-crop
/normalize(0.5) -> resample to 24 fps -> per-frame 768-d features -> .npy
(L x D), consumed by the OAD detector's data layer
(downstream/OAD/.../perframe_data_layers.py:18).

Two modes:

* ``windowed`` — reference-faithful: slide a ``window_size``-frame window
  with ``stride`` and take the last-frame pooled feature per window
  (extract_oad_feature.py:34-35,122-133). Cost: O(L * window) encodes.
  Yields ~L/stride rows — one per WINDOW, the reference's temporal rate.
* ``streaming`` (default) — TPU-native improvement: one causal pass with the
  temporal KV cache; every frame's pooled feature falls out of a single
  chunked encode. A fixed-capacity cache bounds the attention context to the
  last ``capacity`` frames, which *contains* the reference's 6-frame window
  context, so features are at least as informed at O(L) encodes.
  Yields L rows — one per FRAME.

The two modes therefore differ in temporal resolution (L vs ~L/stride
rows): pick ONE per feature store — an OAD data layer calibrated to
per-frame targets cannot mix files from both modes.
"""

from __future__ import annotations

import os
import threading
from functools import lru_cache, partial
from typing import List, Optional, Sequence

import numpy as np
import jax
import jax.numpy as jnp

from streamformer_tpu.config import StreamformerConfig
from streamformer_tpu.models import encoder
from streamformer_tpu.data import transforms as T
from streamformer_tpu.data import video_io


def preprocess_frames(frames_u8: np.ndarray, size: int = 224) -> jnp.ndarray:
    """Resize short side -> center crop -> normalize(0.5) -> (T, C, H, W)
    (reference transform stack, extract_oad_feature.py:42-48)."""
    x = jnp.asarray(frames_u8)
    x = T.resize_short_side(x, size)
    x = T.center_crop(x, (size, size))
    x = (x - 0.5) / 0.5
    return T.to_model_input(x)


def extract_features_streaming(
    params,
    cfg: StreamformerConfig,
    pixel_values: jnp.ndarray,  # (L, C, H, W) preprocessed frames
    chunk: int = 16,
    capacity: Optional[int] = None,
) -> np.ndarray:
    """One causal pass over the video; returns (L, D) per-frame features.

    Uses the ring (sliding-window) cache mode: every frame attends exactly
    the last ``capacity`` frames with no context resets (a linear cache
    would have to restart when full, dropping history at window
    boundaries). The window contains the reference's 6-frame context
    (extract_oad_feature.py:34-35), so features are at least as informed at
    O(L) total encode cost instead of O(L * window)."""
    capacity = capacity or cfg.cache_capacity
    cfg = cfg.replace(cache_mode="ring", cache_capacity=capacity)
    l = pixel_values.shape[0]
    pad = (-l) % chunk
    if pad:
        pixel_values = jnp.concatenate(
            [pixel_values, jnp.zeros((pad,) + pixel_values.shape[1:],
                                     pixel_values.dtype)]
        )
    n_chunks = pixel_values.shape[0] // chunk
    cache = encoder.init_cache(cfg, batch=1, capacity=capacity)

    step = _streaming_step(cfg)
    feats = []
    for i in range(n_chunks):
        clip = pixel_values[i * chunk : (i + 1) * chunk][None]  # (1, chunk, C, H, W)
        out, cache = step(params, clip.astype(jnp.dtype(cfg.dtype)), cache)
        feats.append(np.asarray(out["pooler_output"][0], np.float32))
    out = np.concatenate(feats, axis=0)
    return out[:l]


@lru_cache(maxsize=None)
def _streaming_step(cfg: StreamformerConfig):
    """jit wrappers are memoized per config: a fresh wrapper per call has
    its own trace cache, so every extract_* call would otherwise retrace
    (and re-XLA-compile) the full encoder."""
    return jax.jit(
        partial(encoder.streaming_forward, cfg=cfg), donate_argnums=(2,)
    )


@lru_cache(maxsize=None)
def _windowed_fwd(cfg: StreamformerConfig):
    return jax.jit(
        lambda p, x: encoder.model_forward(p, x, cfg)["pooler_output"])


@lru_cache(maxsize=None)
def _batched_engine(cfg: StreamformerConfig, slots: int, mode: str):
    """Engines are memoized per (cfg, slots, mode) like the lone-stream
    jit wrappers above: every StreamingEngine owns fresh jit closures, so
    a per-call engine would re-trace (and re-XLA-compile) the full
    encoder on EVERY extraction call — tens of seconds through the
    compile tunnel. A finished engine is clean (all streams retired), so
    reuse is safe; ``params`` is a dispatch operand the caller swaps."""
    from streamformer_tpu.serving import StreamingEngine

    return StreamingEngine(None, cfg, slots=slots, mode=mode,
                           collect="pooled")


def extract_features_batched(
    params,
    cfg: StreamformerConfig,
    clips: Sequence[jnp.ndarray],  # each (L_i, C, H, W), preprocessed
    slots: int = 8,
    capacity: Optional[int] = None,
    frames_per_tick: int = 8,
) -> List[np.ndarray]:
    """Continuous-batching extraction: many videos through one ragged cache.

    ``extract_features_streaming`` runs one video at a time — batch 1
    leaves the chip mostly idle (the MXU wants B·N-row matmuls). Here
    ``slots`` videos stream together through ``serving.StreamingEngine``
    (per-stream-length cache, strict-FIFO slot recycling): frames are
    bulk-staged into the engine's per-slot device ring at feed time (one
    transfer per admitted video, not one per tick), and
    ``frames_per_tick`` frames advance per dispatch — the linear-mode
    multi-frame append kernel reads the temporal KV cache once per chunk
    instead of once per frame (ops/attention
    fused_temporal_append_pm_ragged; ring mode scans fused t=1 decodes).
    The reference shards its video list across 8 GPUs instead
    (extract_oad_feature.py; one video per process).

    Context semantics match ``extract_features_streaming``: each frame
    attends the last ``capacity`` frames. The sliding window needs the
    fused ring decode (TPU); off-TPU the einsum fallback serves a linear
    ragged cache, so ``capacity`` must cover the longest clip there.

    Returns per-clip (L_i, D) float32 feature arrays, input order.
    """
    from streamformer_tpu.serving import StreamingEngine

    capacity = capacity or cfg.cache_capacity
    mode = encoder.auto_cache_mode(cfg)
    lens = [int(c.shape[0]) for c in clips]
    if mode == "linear" and lens and max(lens) > capacity:
        raise ValueError(
            f"longest clip ({max(lens)} frames) exceeds cache capacity "
            f"{capacity}: the ragged sliding-window (ring) path needs the "
            "fused TPU decode; off-TPU raise `capacity` to cover the clip"
        )
    cfg = cfg.replace(cache_mode=mode, cache_capacity=capacity)

    eng = _batched_engine(cfg, slots, mode)
    eng.params = params  # an operand of every dispatch, never baked in
    sids = []
    for clip in clips:
        sid = eng.open()
        # zero-length clips: open+close with no frames — the engine
        # retires them without ever taking a slot; poll answers (0, D)
        if clip.shape[0]:
            eng.feed(sid, np.asarray(clip, np.float32))
        eng.close(sid)
        sids.append(sid)
    eng.run_until_idle(frames=max(1, int(frames_per_tick)))
    return [eng.poll(sid)[0] for sid in sids]


def extract_videos_batched(
    params,
    cfg: StreamformerConfig,
    video_paths: Sequence[str],
    out_dir: Optional[str] = None,
    slots: int = 8,
    group: Optional[int] = None,
    target_fps: float = 24.0,
    **kw,
) -> List[np.ndarray]:
    """Decode + batched-extract a video list; optionally save .npy each.

    Videos are processed in groups of ``group`` (default ``4 * slots``) so
    host memory holds one group of decoded clips at a time; the next
    group decodes on a host thread while the TPU serves the current one
    (host-only thread — all device work stays on the caller's thread).
    """
    group = group or 4 * slots
    dt = jnp.dtype(cfg.dtype)

    def load_group(paths):
        """HOST-ONLY (runs on the prefetch thread): decode + fps-resample
        to uint8 numpy. No jnp/device calls here — concurrent dispatch from
        two threads deadlocks some PJRT transports (the axon tunnel among
        them); device preprocess happens on the caller's thread below."""
        raw = []
        for p in paths:
            frames, fps = video_io.read_video_full(p)
            idx = video_io.resample_to_fps(len(frames), fps, target_fps)
            raw.append(frames[idx])
        return raw

    def to_device_clips(raw):
        # caller-thread device preprocess (one-dispatch-thread rule)
        return [np.asarray(preprocess_frames(f, cfg.image_size), dt)
                for f in raw]

    groups = [list(video_paths[i : i + group])
              for i in range(0, len(video_paths), group)]
    feats_all: List[np.ndarray] = []
    nxt = {"clips": load_group(groups[0])} if groups else {}
    for gi, paths in enumerate(groups):
        if "error" in nxt:  # prefetch thread failed: surface the real cause
            raise RuntimeError(
                f"decoding group {gi} (videos {nxt['paths']}) failed"
            ) from nxt["error"]
        clips = to_device_clips(nxt["clips"])
        th = None
        if gi + 1 < len(groups):
            nxt = {}

            def _prefetch(paths_next=groups[gi + 1], out=nxt):
                try:
                    out["clips"] = load_group(paths_next)
                except Exception as e:  # re-raised on the consumer thread
                    out["error"] = e
                    out["paths"] = paths_next

            th = threading.Thread(target=_prefetch)
            th.start()
        feats = extract_features_batched(params, cfg, clips, slots=slots,
                                         **kw)
        if out_dir:
            os.makedirs(out_dir, exist_ok=True)
            for p, f in zip(paths, feats):
                name = os.path.splitext(os.path.basename(p))[0]
                np.save(os.path.join(out_dir, name + ".npy"), f)
        feats_all.extend(feats)
        if th is not None:
            th.join()
    return feats_all


def extract_features_windowed(
    params,
    cfg: StreamformerConfig,
    pixel_values: jnp.ndarray,  # (L, C, H, W)
    window_size: int = 6,
    stride: int = 4,
) -> np.ndarray:
    """Reference-faithful sliding-window extraction
    (extract_oad_feature.py:34-35,122-133): encode each window, keep the
    last-frame pooled feature."""
    l = pixel_values.shape[0]
    w = min(window_size, l)
    starts = list(range(0, max(l - window_size, 0) + 1, stride)) or [0]
    # overhanging/short windows slide BACK onto real frames — the
    # reference never pads (frame_q = data[len-6:] when start+6 > len,
    # extract_oad_feature.py:124-127), so position -1 is always a real
    # frame; zero-padding here returned the pad frame's feature for
    # short videos (regression r4)
    windows = [pixel_values[min(s, l - w): min(s, l - w) + w]
               for s in starts]
    batch = jnp.stack(windows).astype(jnp.dtype(cfg.dtype))

    fwd = _windowed_fwd(cfg)
    feats = np.asarray(fwd(params, batch), np.float32)  # (W, w, D)
    return feats[:, -1]  # last frame summarizes (causal)


def extract_video(
    params,
    cfg: StreamformerConfig,
    video_path: str,
    out_path: Optional[str] = None,
    target_fps: float = 24.0,
    mode: str = "streaming",
    **kw,
) -> np.ndarray:
    frames, fps = video_io.read_video_full(video_path)
    idx = video_io.resample_to_fps(len(frames), fps, target_fps)
    frames = frames[idx]
    px = preprocess_frames(frames, cfg.image_size).astype(jnp.dtype(cfg.dtype))
    if mode == "streaming":
        feats = extract_features_streaming(params, cfg, px, **kw)
    else:
        feats = extract_features_windowed(params, cfg, px, **kw)
    if out_path:
        os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
        np.save(out_path, feats)
    return feats
