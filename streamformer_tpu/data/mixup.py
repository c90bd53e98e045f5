"""On-device Mixup / CutMix for video batches.

Reference: datasets/mixup.py (timm port, 402 LoC): per-batch mixup lambda ~
Beta(alpha, alpha), optional CutMix with Beta(cutmix_alpha, cutmix_alpha)
and a centered random bbox; labels become soft targets with smoothing.
Batched 'flip' mixing partner (x mixed with x.flip(0)) — we reproduce that
(mode='batch').
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def one_hot(labels, num_classes, on_value=1.0, off_value=0.0):
    oh = jax.nn.one_hot(labels, num_classes)
    return oh * (on_value - off_value) + off_value


def mixup_target(labels, num_classes, lam, smoothing=0.0):
    off = smoothing / num_classes
    on = 1.0 - smoothing + off
    y1 = one_hot(labels, num_classes, on, off)
    y2 = one_hot(labels[::-1], num_classes, on, off)
    return y1 * lam + y2 * (1.0 - lam)


def _rand_bbox(rng, h, w, lam):
    """CutMix box with area ratio (1 - lam), centered at a random point."""
    ratio = jnp.sqrt(1.0 - lam)
    cut_h = (h * ratio).astype(jnp.int32)
    cut_w = (w * ratio).astype(jnp.int32)
    ky, kx = jax.random.split(rng)
    cy = jax.random.randint(ky, (), 0, h)
    cx = jax.random.randint(kx, (), 0, w)
    y1 = jnp.clip(cy - cut_h // 2, 0, h)
    y2 = jnp.clip(cy + cut_h // 2, 0, h)
    x1 = jnp.clip(cx - cut_w // 2, 0, w)
    x2 = jnp.clip(cx + cut_w // 2, 0, w)
    return y1, y2, x1, x2


def mixup_batch(
    rng,
    clips: jnp.ndarray,  # (B, T, H, W, C) or (B, T, C, H, W) float
    labels: jnp.ndarray,  # (B,) int
    num_classes: int,
    mixup_alpha: float = 0.8,
    cutmix_alpha: float = 1.0,
    switch_prob: float = 0.5,
    label_smoothing: float = 0.1,
    channels_last: bool = True,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Batch-mode mixup/cutmix: mix with the batch reversed (timm 'batch').

    Returns (mixed_clips, soft_targets (B, num_classes)).
    """
    k_lam, k_switch, k_clam, k_box = jax.random.split(rng, 4)
    use_cutmix = jax.random.bernoulli(k_switch, switch_prob) & (cutmix_alpha > 0)

    lam_mix = jax.random.beta(k_lam, mixup_alpha, mixup_alpha) if mixup_alpha > 0 else 1.0
    lam_cut = (
        jax.random.beta(k_clam, cutmix_alpha, cutmix_alpha)
        if cutmix_alpha > 0
        else 1.0
    )

    flipped = clips[::-1]
    if channels_last:
        h, w = clips.shape[2], clips.shape[3]
        y1, y2, x1, x2 = _rand_bbox(k_box, h, w, lam_cut)
        ys = jnp.arange(h)[:, None]
        xs = jnp.arange(w)[None, :]
        box = (ys >= y1) & (ys < y2) & (xs >= x1) & (xs < x2)
        cut = jnp.where(box[None, None, :, :, None], flipped, clips)
        lam_cut_eff = 1.0 - ((y2 - y1) * (x2 - x1)) / (h * w)
    else:
        h, w = clips.shape[3], clips.shape[4]
        y1, y2, x1, x2 = _rand_bbox(k_box, h, w, lam_cut)
        ys = jnp.arange(h)[:, None]
        xs = jnp.arange(w)[None, :]
        box = (ys >= y1) & (ys < y2) & (xs >= x1) & (xs < x2)
        cut = jnp.where(box[None, None, None, :, :], flipped, clips)
        lam_cut_eff = 1.0 - ((y2 - y1) * (x2 - x1)) / (h * w)

    mixed_mix = clips * lam_mix + flipped * (1.0 - lam_mix)
    mixed = jnp.where(use_cutmix, cut, mixed_mix)
    lam = jnp.where(use_cutmix, lam_cut_eff, lam_mix)
    targets = mixup_target(labels, num_classes, lam, label_smoothing)
    return mixed, targets


def soft_target_cross_entropy(logits, targets):
    """Loss for mixup soft targets (timm SoftTargetCrossEntropy)."""
    return -jnp.mean(jnp.sum(targets * jax.nn.log_softmax(logits, -1), axis=-1))
