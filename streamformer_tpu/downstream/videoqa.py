"""VideoQA (LLaVA-style) multimodal integration.

Rebuild of the reference's LLaVA-NeXT fork essentials
(downstream/VideoQA/llava/model/llava_arch.py, 640 LoC):

* mm projector (``mlp2x_gelu``): vision features -> LM embedding space;
* multimodal input preparation: splice per-frame vision tokens into the
  text-token embedding sequence at <image> placeholder positions with the
  matching attention mask / label padding (llava_arch.py
  prepare_inputs_labels_for_multimodal);
* the streaming vision tower (vision_tower.py) supplies features with the
  sliding ``context_length`` window;
* 3-stage training recipes (scripts/train/stage{1,2,3}*.sh) expressed as
  trainable-mask + lr-scale policies.

The language model itself is pluggable: any callable
``lm(embeds, attention_mask) -> logits`` plus its embedding table. (The
reference vendors patched Llama/Qwen2.5; weights are external to this
repo — pair with any JAX LM implementation.)
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

Params = Dict[str, Any]

IMAGE_TOKEN_INDEX = -200  # reference llava constant


def init_mm_projector(rng, vision_dim: int, lm_dim: int) -> Params:
    """mlp2x_gelu projector (reference build_vision_projector)."""
    k1, k2 = jax.random.split(rng)
    return {
        "fc1": {
            "kernel": 0.02 * jax.random.normal(k1, (vision_dim, lm_dim)),
            "bias": jnp.zeros((lm_dim,)),
        },
        "fc2": {
            "kernel": 0.02 * jax.random.normal(k2, (lm_dim, lm_dim)),
            "bias": jnp.zeros((lm_dim,)),
        },
    }


def mm_projector(p: Params, x: jnp.ndarray) -> jnp.ndarray:
    y = x @ p["fc1"]["kernel"] + p["fc1"]["bias"]
    y = jax.nn.gelu(y, approximate=False)
    return y @ p["fc2"]["kernel"] + p["fc2"]["bias"]


def splice_multimodal_inputs(
    input_ids: np.ndarray,  # (L,) with IMAGE_TOKEN_INDEX placeholders
    text_embeds: np.ndarray,  # (L, D) embeddings of input_ids (junk at imgs)
    image_features: np.ndarray,  # (Timg, D) projected vision tokens
    labels: Optional[np.ndarray] = None,  # (L,) or None; -100 = ignore
    max_len: Optional[int] = None,
) -> Dict[str, np.ndarray]:
    """Host-side splice (reference prepare_inputs_labels_for_multimodal):
    each <image> placeholder expands into the full vision-token block;
    labels over vision tokens are ignore (-100). Returns fixed-length
    (padded) embeds/mask/labels."""
    img_pos = np.where(input_ids == IMAGE_TOKEN_INDEX)[0]
    pieces, label_pieces = [], []
    prev = 0
    for pos in img_pos:
        pieces.append(text_embeds[prev:pos])
        label_pieces.append(labels[prev:pos] if labels is not None else None)
        pieces.append(image_features)
        if labels is not None:
            label_pieces.append(np.full(len(image_features), -100, np.int64))
        prev = pos + 1
    pieces.append(text_embeds[prev:])
    if labels is not None:
        label_pieces.append(labels[prev:])
    embeds = np.concatenate(pieces, axis=0)
    lab = np.concatenate(label_pieces) if labels is not None else None
    mask = np.ones(len(embeds), bool)
    if max_len is not None:
        pad = max_len - len(embeds)
        if pad < 0:
            embeds, mask = embeds[:max_len], mask[:max_len]
            if lab is not None:
                lab = lab[:max_len]
        elif pad > 0:
            embeds = np.concatenate(
                [embeds, np.zeros((pad, embeds.shape[1]), embeds.dtype)]
            )
            mask = np.concatenate([mask, np.zeros(pad, bool)])
            if lab is not None:
                lab = np.concatenate([lab, np.full(pad, -100, np.int64)])
    out = {"inputs_embeds": embeds, "attention_mask": mask}
    if lab is not None:
        out["labels"] = lab
    return out


@dataclasses.dataclass
class LlavaStreamModel:
    """Vision tower + projector + pluggable LM (reference LlavaQwen path,
    llava/model/language_model/*). ``lm_forward(embeds, mask) -> logits``."""

    tower: Any  # TimesformerVisionTower
    projector_params: Params
    embed_tokens: Callable[[jnp.ndarray], jnp.ndarray]
    lm_forward: Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray]
    pool_vision: str = "frame_mean"  # per-frame token pooling before the LM

    def encode_video(self, pixel_values: jnp.ndarray) -> jnp.ndarray:
        """(B, T, C, H, W) -> (B, T_ctx * tokens_per_frame, lm_dim)."""
        feats = self.tower.forward(pixel_values)  # (B, t, N, D)
        b, t, n, d = feats.shape
        if self.pool_vision == "frame_mean":
            feats = feats.mean(axis=2)  # one token per frame
            feats = feats.reshape(b, t, d)
        else:
            feats = feats.reshape(b, t * n, d)
        return mm_projector(self.projector_params, feats)

    def forward(self, input_ids: np.ndarray, pixel_values, labels=None,
                max_len: Optional[int] = None):
        img_feats = np.asarray(self.encode_video(pixel_values)[0], np.float32)
        safe_ids = np.where(input_ids == IMAGE_TOKEN_INDEX, 0, input_ids)
        text_embeds = np.asarray(
            self.embed_tokens(jnp.asarray(safe_ids)), np.float32
        )
        spliced = splice_multimodal_inputs(
            input_ids, text_embeds, img_feats, labels, max_len
        )
        logits = self.lm_forward(
            jnp.asarray(spliced["inputs_embeds"])[None],
            jnp.asarray(spliced["attention_mask"])[None],
        )
        return logits, spliced


# ---------------------------------------------------------------------------
# 3-stage training recipes (reference scripts/train/stage{1,2,3}*.sh)
# ---------------------------------------------------------------------------


def stage_policy(stage: int) -> Dict[str, Any]:
    """Trainable parts + lr scales per stage:
    1: projector pretrain (mm_tunable_parts=mm_mlp_adapter, ZeRO-3 analog);
    2: image-QA SFT (projector + LM);
    3: video-QA SFT with vision tower at lr 2e-6 (stage3...sh:28-36)."""
    if stage == 1:
        return {
            "train": {"projector"},
            "lr": {"projector": 1e-3},
        }
    if stage == 2:
        return {
            "train": {"projector", "lm"},
            "lr": {"projector": 2e-5, "lm": 2e-5},
        }
    return {
        "train": {"projector", "lm", "vision_tower"},
        "lr": {"projector": 2e-5, "lm": 2e-5, "vision_tower": 2e-6},
    }
