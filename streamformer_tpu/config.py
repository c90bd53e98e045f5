"""Model configuration for StreamFormer-TPU.

TPU-native rebuild of the reference StreamFormer configuration
(reference: models/configuration_streamformer.py:27-135). We use a frozen
dataclass instead of an HF ``PretrainedConfig`` so the config is hashable and
can be closed over by ``jax.jit`` as a static argument. ``from_dict`` /
``to_dict`` keep JSON interop with HF-style ``config.json`` files so
checkpoints exported by the reference load unchanged.
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Any, Optional, Tuple


@dataclasses.dataclass(frozen=True)
class StreamformerConfig:
    """Architecture hyperparameters (defaults mirror the reference defaults).

    Reference field-for-field parity: configuration_streamformer.py:90-135.
    TPU-specific additions are grouped at the bottom.
    """

    image_size: int = 224
    patch_size: int = 16
    num_channels: int = 3
    num_frames: int = 16
    hidden_size: int = 768
    num_hidden_layers: int = 12
    num_attention_heads: int = 12
    intermediate_size: int = 3072
    hidden_act: str = "gelu"
    hidden_dropout_prob: float = 0.0
    attention_probs_dropout_prob: float = 0.0
    initializer_range: float = 0.02
    layer_norm_eps: float = 1e-6
    qkv_bias: bool = True
    attention_type: str = "divided_space_time"
    drop_path_rate: float = 0.0
    enable_causal_temporal: bool = True
    add_lora_spatial: bool = False
    lora_rank: int = 32

    # Streaming-inference fields consumed from checkpoint config.json by the
    # reference VideoQA tower (timesformer_encoder.py:1494-1500).
    streaming_mode: bool = False
    context_length: int = 16

    # ---- TPU-native additions (no reference equivalent) ----
    # Fixed capacity (in frames) of the temporal KV ring buffer used for
    # streaming inference. Static so XLA compiles one program.
    cache_capacity: int = 64
    # Cache behavior past capacity: "linear" stops at the buffer edge (the
    # stream must fit in capacity); "ring" wraps - attention becomes a
    # sliding window over the last cache_capacity frames, so streams are
    # unbounded in fixed HBM (the reference's DynamicCache grows without
    # bound; SURVEY §5.7 flags the windowed ring as the fix).
    cache_mode: str = "linear"
    # KV-cache storage dtype: None follows ``dtype``; "int8" stores
    # quantized K/V (per-(patch,pos,head) absmax scales) — half the HBM
    # traffic of bf16, dequantized inside the fused Pallas decode kernel.
    cache_dtype: Optional[str] = None
    # KV-cache memory layout:
    # * "pos_major" (default): K/V stored (C, B, N, D) — appending a frame
    #   is ONE contiguous plane dynamic_update_slice that XLA performs in
    #   place on the donated buffer, and the decode kernel reads stream at
    #   the HBM roofline (measured 104 us vs 234 us row-major per layer at
    #   B=8/capacity 16 on v5e). int8 caches work at any capacity (scales
    #   are per-(pos, patch-row), stored (B, N, C)).
    # * "row_major": K/V stored (B, N, C, D) — each patch row's window is
    #   contiguous; kept as a compatibility/fallback layout. Ring
    #   (sliding-window) mode runs on BOTH layouts; pos_major is the
    #   production ring path (fused-kernel slot write +
    #   _ring_attend_pos_major) and is what bench.py measures.
    cache_layout: str = "pos_major"
    # Compute dtype for the encoder ("bfloat16" on TPU, "float32" for parity
    # tests). Params are always stored float32; cast on entry.
    dtype: str = "bfloat16"
    # Use fused Pallas kernels for the divided attention when on TPU.
    use_pallas: bool = True
    # The fused streaming decode kernels (ops/attention.fused_temporal_
    # decode_pm / _pm_int8): pos-major in-kernel plane append at the HBM
    # roofline (104 us/layer at B=8/capacity 16 on v5e), O(valid-length)
    # reads, fused int8 dequant, and ring (sliding-window) wraparound in the
    # same program. Engages for single-frame causal appends; other shapes
    # fall back to the einsum path.
    use_pallas_streaming: bool = True
    # The fused flat-D spatial attention kernel
    # (ops/attention.fused_spatial_flat): heads as 64-lane slices, no
    # tile-padded (..., H, dh) intermediates — with the temporal kernel it
    # takes the B8/T16 bf16 forward from 106.5 to 78.5 ms on v5e.
    use_pallas_spatial: bool = True
    # Matmul precision: None = auto ("highest" for float32 parity runs,
    # "default" for bf16 TPU runs).
    matmul_precision: Optional[str] = None
    # remat ("gradient checkpointing") granularity: "none" | "layer"
    remat: str = "none"
    # Sequence parallelism: shard the patch axis N over the "model" mesh
    # axis inside the encoder (temporal attention has no cross-patch
    # interaction - SURVEY §5.7 - so only the spatial attention gathers).
    shard_patches: bool = False

    # ---- derived helpers ----
    @property
    def num_patches(self) -> int:
        return (self.image_size // self.patch_size) ** 2

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_attention_heads

    @property
    def patches_per_side(self) -> int:
        return self.image_size // self.patch_size

    def replace(self, **kw: Any) -> "StreamformerConfig":
        return dataclasses.replace(self, **kw)

    # ---- JSON / HF interop ----
    def to_dict(self) -> dict:
        d = dataclasses.asdict(self)
        d["model_type"] = "timesformer"
        return d

    @classmethod
    def from_dict(cls, d: dict) -> "StreamformerConfig":
        known = {f.name for f in dataclasses.fields(cls)}
        return cls(**{k: v for k, v in d.items() if k in known})

    @classmethod
    def from_pretrained(cls, path: str) -> "StreamformerConfig":
        """Load from a directory containing an HF-style config.json."""
        cfg_path = os.path.join(path, "config.json") if os.path.isdir(path) else path
        with open(cfg_path) as f:
            return cls.from_dict(json.load(f))

    def save_pretrained(self, path: str) -> None:
        os.makedirs(path, exist_ok=True)
        with open(os.path.join(path, "config.json"), "w") as f:
            json.dump(self.to_dict(), f, indent=2)
