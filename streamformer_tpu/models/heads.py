"""Multitask heads: global (classification/retrieval), temporal
(grounding/localization), spatial (VIS/ReferVOS) supervision via SigLIP
text-embedding dot products.

TPU-native redesign of the reference heads
(models/modeling_timesformer_siglip.py:1624-2482). Heads here are pure
functions on static-shape arrays:

* ragged per-sample structures (per-dataset label tables, variable-size
  masks, gt segment lists) are padded + masked host-side by the data
  pipeline — heads receive fixed-shape tensors with ignore markers, instead
  of the reference's Python loops over the batch;
* distributed terms (ring SigLIP, all-gather contrastive) use
  ``jax.lax.ppermute`` / ``all_gather`` via streamformer_tpu.parallel when a
  named ``data`` axis is in scope, and degrade to single-shard math
  otherwise (the reference *requires* an initialized process group even on 1
  GPU — modeling_timesformer_siglip.py:1929,2294; we don't).

Common convention: ``logit_scale`` is exp(logit_scale_param) already applied
by callers? No — heads take the raw parameters (log-scale, bias), matching
the reference (logit_scale=log 10, logit_bias=-2,
modeling_timesformer_siglip.py:1363-1364) and exponentiate internally.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from streamformer_tpu.parallel.contrastive import (
    all_gather_features,
    axis_rank,
    siglip_ring_loss,
)

Params = Dict[str, Any]

# CLIP-style prompt-ensembling templates (the standard public CLIP/Kinetics
# prompt set; reference VIDEO_TEMPLATES/SCENE_TEMPLATES,
# modeling_timesformer_siglip.py:34-85).
VIDEO_TEMPLATES = [
    "a photo of {}.",
    "a photo of a person {}.",
    "a photo of a person using {}.",
    "a photo of a person doing {}.",
    "a photo of a person during {}.",
    "a photo of a person performing {}.",
    "a photo of a person practicing {}.",
    "a video of {}.",
    "a video of a person {}.",
    "a video of a person using {}.",
    "a video of a person doing {}.",
    "a video of a person during {}.",
    "a video of a person performing {}.",
    "a video of a person practicing {}.",
    "a example of {}.",
    "a example of a person {}.",
    "a example of a person using {}.",
    "a example of a person doing {}.",
    "a example of a person during {}.",
    "a example of a person performing {}.",
    "a example of a person practicing {}.",
    "a demonstration of {}.",
    "a demonstration of a person {}.",
    "a demonstration of a person using {}.",
    "a demonstration of a person doing {}.",
    "a demonstration of a person during {}.",
    "a demonstration of a person performing {}.",
    "a demonstration of a person practicing {}.",
]
SCENE_TEMPLATES = ["{}"]



def _f32(fn):
    """Heads always compute at full fp32 matmul precision — their matmuls are
    tiny (B x D x L) and loss math should not run on fast low-precision
    paths."""
    import functools

    @functools.wraps(fn)
    def inner(*a, **k):
        with jax.default_matmul_precision("highest"):
            return fn(*a, **k)

    return inner

def _norm(x, axis=-1, eps=1e-12):
    # eps clamp matches torch F.normalize: an all-zero row (zero-padded
    # caption, masked frame) must yield zeros, not NaN logits
    n = jnp.linalg.norm(x, axis=axis, keepdims=True)
    return x / jnp.maximum(n, eps)


def _logits(sim, logit_scale, logit_bias):
    return sim * jnp.exp(logit_scale) + logit_bias


def _logsig_loss(labels, logits):
    return -jnp.sum(jax.nn.log_sigmoid(labels * logits))


# ---------------------------------------------------------------------------
# Global heads
# ---------------------------------------------------------------------------


@_f32
def classification_head(
    pooler_output: jnp.ndarray,  # (B, T, D)
    label_embeddings: jnp.ndarray,  # (L, D) prompt-ensembled, L2-normalized
    labels: jnp.ndarray,  # (B,) int
    logit_scale: jnp.ndarray,
    logit_bias: jnp.ndarray,
):
    """Sigmoid-BCE zero-shot classification on the last-frame feature.

    Reference: TimesformerVideoClassificationHead
    (modeling_timesformer_siglip.py:1704-1726): normalize last-frame pooled
    feature, dot with label embeds, SigLIP ±1 targets, sum / B.
    """
    # the reference DETACHES the label embeddings (:1710) — the zero-shot
    # class anchors never receive gradients; stop_gradient is the exact
    # backward-semantics mirror (pinned in tests/test_grad_parity.py)
    label_embeddings = jax.lax.stop_gradient(label_embeddings)
    img = _norm(pooler_output[:, -1, :])  # causal: last frame sees all
    logits = _logits(img @ label_embeddings.T, logit_scale, logit_bias)  # (B, L)
    b, l = logits.shape
    targets = -jnp.ones((b, l), logits.dtype)
    targets = targets.at[jnp.arange(b), labels].set(1.0)
    loss = _logsig_loss(targets, logits) / b
    return loss, logits


@_f32
def classification_linear_head(
    pooler_output: jnp.ndarray,
    params: Params,  # {"kernel": (D, L), "bias": (L,)}
    labels: jnp.ndarray,
):
    """CE over a linear classifier on the last-frame pooled feature
    (reference TimesformerVideoClassificationLinearHead, :1624-1648)."""
    feat = pooler_output[:, -1, :]
    logits = feat @ params["kernel"] + params["bias"]
    logp = jax.nn.log_softmax(logits, axis=-1)
    loss = -jnp.mean(jnp.take_along_axis(logp, labels[:, None], axis=1))
    return loss, logits


@_f32
def retrieval_head(
    pooler_output: jnp.ndarray,  # (B, T, D)
    text_embeds: jnp.ndarray,  # (B, D) caption embeddings (pooled text tower)
    logit_scale: jnp.ndarray,
    logit_bias: jnp.ndarray,
    axis_name: Optional[str] = "data",
):
    """Video-text retrieval with the full ring SigLIP loss.

    Reference: TimesformerVideoRetrievalHead (:2285-2351) — last-frame
    feature as the video embedding, SigLipLoss over the ring.
    """
    img = _norm(pooler_output[:, -1, :])
    txt = _norm(text_embeds)
    loss = siglip_ring_loss(img, txt, jnp.exp(logit_scale), logit_bias, axis_name)
    logits = img @ txt.T * jnp.exp(logit_scale)
    return loss, logits


# ---------------------------------------------------------------------------
# Temporal heads
# ---------------------------------------------------------------------------


@_f32
def grounding_head(
    pooler_output: jnp.ndarray,  # (B, T, D)
    text_embeds: jnp.ndarray,  # (B, D)
    frame_labels: jnp.ndarray,  # (B, T) in {0, 1} (0 -> negative)
    logit_scale: jnp.ndarray,
    logit_bias: jnp.ndarray,
):
    """Per-frame caption-similarity grounding.

    Reference: TimesformerTemporalGroundingHead (:2354-2397): sigmoid-BCE of
    (B,T,D)x(B,D) similarity, labels 0 mapped to -1, sum / B.
    """
    img = _norm(pooler_output)
    txt = _norm(text_embeds)
    sim = jnp.einsum("btd,bd->bt", img, txt)
    logits = _logits(sim, logit_scale, logit_bias)
    labels = jnp.where(frame_labels == 0, -1.0, frame_labels.astype(logits.dtype))
    loss = _logsig_loss(labels, logits) / logits.shape[0]
    return loss, logits


@_f32
def grounding_contrastive_head(
    pooler_output: jnp.ndarray,  # (B, T, D)
    text_embeds: jnp.ndarray,  # (B, D)
    frame_labels: jnp.ndarray,  # (B, T) in {0,1} -> {-1,+1}
    logit_scale: jnp.ndarray,
    logit_bias: jnp.ndarray,
    axis_name: Optional[str] = "data",
):
    """Global-batch frame-vs-caption contrastive grounding.

    Reference: TimesformerTemporalGroundingContrastiveHead (:2400-2482):
    all-gather frames/captions/targets, labels matrix -1 except each video's
    own caption column which carries its per-frame ±1 targets.
    """
    b, t, d = pooler_output.shape
    img = _norm(pooler_output).reshape(b * t, d)
    txt = _norm(text_embeds)
    targets = jnp.where(frame_labels == 0, -1, frame_labels).astype(jnp.float32)

    img_all = all_gather_features(img, axis_name)  # (W*B*t, D)
    txt_all = all_gather_features(txt, axis_name)  # (W*B, D)
    tgt_all = all_gather_features(targets, axis_name)  # (W*B, T)

    logits = _logits(img_all @ txt_all.T, logit_scale, logit_bias)
    total_b = txt_all.shape[0]
    # labels[i*t + k, j] = tgt_all[i, k] if i == j else -1
    row_video = jnp.repeat(jnp.arange(total_b), t)  # (W*B*t,)
    col_video = jnp.arange(total_b)
    onehot = row_video[:, None] == col_video[None, :]
    per_frame = tgt_all.reshape(total_b * t, 1)
    labels = jnp.where(onehot, per_frame, -1.0)
    loss = _logsig_loss(labels, logits) / (total_b * t)
    return loss, logits


@_f32
def naive_localization_head(
    pooler_output: jnp.ndarray,  # (B*W, T, D) windowed full-video features
    label_embeddings: jnp.ndarray,  # (L, D)
    target_labels: jnp.ndarray,  # (B, W*T, L) in {-1, 0, +1}, built host-side
    logit_scale: jnp.ndarray,
    logit_bias: jnp.ndarray,
):
    """Windowed TAL head (THUMOS14-style full-video training).

    Reference: TimesformerNaiveLocalizationHead (:2081-2185). Window
    reshaping [B*W, T, D] -> [B, W*T, D] with the window size derived from
    the rasterized targets' static shape; per-frame sigmoid-BCE vs label
    embeds. The (gt_segments -> per-frame ±1/0) target rasterization happens
    host-side (the reference loops in Python per sample, :2155-2177).
    """
    d = pooler_output.shape[-1]
    window_size = target_labels.shape[1]
    seq = pooler_output.reshape(-1, window_size, d)
    img = _norm(seq)
    txt = _norm(label_embeddings)
    logits = _logits(jnp.einsum("btd,ld->btl", img, txt), logit_scale, logit_bias)
    loss = _logsig_loss(target_labels, logits) / (
        target_labels.shape[0] * target_labels.shape[1]
    )
    return loss, logits


@_f32
def universal_localization_head(
    pooler_output: jnp.ndarray,  # (B, T, D)
    label_embeddings: jnp.ndarray,  # (B, L_max, D) per-sample dataset tables
    class_mask: jnp.ndarray,  # (B, L_max) bool — valid classes per dataset
    frame_labels: jnp.ndarray,  # (B, T) int, -1 = background
    logit_scale: jnp.ndarray,
    logit_bias: jnp.ndarray,
):
    """Per-frame localization against per-dataset label tables.

    Reference: TimesformerUniversalLocalizationHead (:2188-2282): targets -1
    everywhere, +1 at (frame, its class) for foreground frames; per-sample
    sum / T then mean over batch. Per-dataset tables are gathered host-side
    into a padded (B, L_max, D) tensor + mask (the reference loops datasets
    in Python).
    """
    img = _norm(pooler_output)
    logits = _logits(
        jnp.einsum("btd,bld->btl", img, label_embeddings), logit_scale, logit_bias
    )
    b, t, l = logits.shape
    fg = frame_labels >= 0
    cls = jnp.where(fg, frame_labels, 0)
    onehot = jax.nn.one_hot(cls, l, dtype=logits.dtype) * fg[..., None]
    targets = 2.0 * onehot - 1.0
    per_elem = -jax.nn.log_sigmoid(targets * logits) * class_mask[:, None, :]
    loss = jnp.sum(per_elem) / t / b
    return loss, logits


# ---------------------------------------------------------------------------
# Spatial (dense) heads
# ---------------------------------------------------------------------------


def dense_projection_params(map_head: Params) -> Params:
    """Frozen copy of the MAP head's V/out-proj/LN/MLP used to project patch
    tokens into the pooled-embedding space (reference
    _dense_feature_projection weight surgery,
    modeling_timesformer_siglip.py:1764-1795)."""
    return jax.tree.map(
        jax.lax.stop_gradient,
        {
            "v": map_head["v"],
            "out": map_head["out"],
            "layernorm": map_head["layernorm"],
            "mlp": map_head["mlp"],
        },
    )


@_f32
def dense_feature_projection(x: jnp.ndarray, p: Params, eps: float = 1e-6):
    """(..., N, D) patch features -> pooled-embedding space."""

    def dense(x, q):
        return x @ q["kernel"].astype(x.dtype) + q["bias"].astype(x.dtype)

    y = dense(x, p["v"])
    y = dense(y, p["out"])
    residual = y
    y32 = y.astype(jnp.float32)
    mean = jnp.mean(y32, -1, keepdims=True)
    var = jnp.mean(jnp.square(y32 - mean), -1, keepdims=True)
    ln = (
        (y32 - mean) * jax.lax.rsqrt(var + eps) * p["layernorm"]["scale"]
        + p["layernorm"]["bias"]
    ).astype(y.dtype)
    m = dense(ln, p["mlp"]["fc1"])
    m = jax.nn.gelu(m, approximate=False)
    m = dense(m, p["mlp"]["fc2"])
    return residual + m


def _bilinear_resize_logits(logits_tphw, out_h, out_w):
    """(T, hp, wp, L) -> (T, out_h, out_w, L), align_corners=False bilinear
    (matches torch F.interpolate default / jax.image 'linear')."""
    t, hp, wp, l = logits_tphw.shape
    return jax.image.resize(logits_tphw, (t, out_h, out_w, l), method="linear")


@_f32
def vis_segmentation_head(
    last_hidden_state: jnp.ndarray,  # (B, T, N, D)
    proj_params: Params,  # dense_projection_params(map_head)
    label_embeddings: jnp.ndarray,  # (B, L_sel, D) pre-sampled per sample
    class_mask: jnp.ndarray,  # (B, L_sel) bool
    mask_target: jnp.ndarray,  # (B, T, H_out, W_out) int, -1 = ignore
    logit_scale: jnp.ndarray,
    logit_bias: jnp.ndarray,
):
    """Per-pixel CE open-vocabulary VIS head.

    Reference: TimesformerUniversalVideoInstanceSegmentationHead
    (:1729-1918). The <=100-class negative sampling + label remapping
    (:1844-1882) runs host-side in the data pipeline (arbitrary Python);
    the head receives the selected (B, L_sel, D) tables and the remapped
    mask target already rasterized at a static (H_out, W_out).
    """
    b, t, n, d = last_hidden_state.shape
    hp = int(round(n**0.5))
    dense = dense_feature_projection(last_hidden_state, proj_params)
    img = _norm(dense)
    logits = _logits(
        jnp.einsum("btpd,bld->btpl", img, label_embeddings), logit_scale, logit_bias
    )
    out_h, out_w = mask_target.shape[2], mask_target.shape[3]
    logits = logits.reshape(b, t, hp, hp, -1)

    def per_sample(lg, mt, cm):
        lg = _bilinear_resize_logits(lg.reshape(t, hp, hp, -1), out_h, out_w)
        lg = jnp.where(cm[None, None, None, :], lg, -jnp.inf)
        logp = jax.nn.log_softmax(lg, axis=-1)
        valid = mt >= 0
        cls = jnp.where(valid, mt, 0)
        nll = -jnp.take_along_axis(logp, cls[..., None], axis=-1)[..., 0]
        total = jnp.sum(nll * valid)
        count = jnp.sum(valid)
        return jnp.where(count > 0, total / jnp.maximum(count, 1), 0.0)

    losses = jax.vmap(per_sample)(logits, mask_target, class_mask)
    return jnp.mean(losses), logits


@_f32
def refervos_contrastive_head(
    last_hidden_state: jnp.ndarray,  # (B, T, N, D)
    proj_params: Params,
    text_embeds: jnp.ndarray,  # (B, D) expression embeddings
    mask_target: jnp.ndarray,  # (B, T, H_out, W_out) in {-1 ignore, 0 bg, 1 fg}
    logit_scale: jnp.ndarray,
    logit_bias: jnp.ndarray,
    axis_name: Optional[str] = "data",
):
    """Pixel-to-caption contrastive CE (ReferVOS).

    Reference: TimesformerVideoContrastiveCrossEntropySegmentationHead
    (:1921-2078): text embeds all-gathered across shards; pixel (i) in video
    b is a positive for caption column rank*B + b; CE over the global
    caption axis with ignore outside the mask. Background pixels are ignored
    (labels -1) exactly as the reference (:2060-2064 — only mask==1 pixels
    get a positive index; everything else stays ignore).
    """
    b, t, n, d = last_hidden_state.shape
    hp = int(round(n**0.5))
    dense = dense_feature_projection(last_hidden_state, proj_params)
    img = _norm(dense)
    txt_all = all_gather_features(_norm(text_embeds), axis_name)  # (W*B, D)
    sim = jnp.einsum("btpd,nd->btpn", img, txt_all)
    logits = _logits(sim, logit_scale, logit_bias)

    rank = axis_rank(axis_name)
    out_h, out_w = mask_target.shape[2], mask_target.shape[3]

    def per_sample(lg, mt, idx):
        lg = _bilinear_resize_logits(lg.reshape(t, hp, hp, -1), out_h, out_w)
        logp = jax.nn.log_softmax(lg, axis=-1)
        valid = mt == 1
        nll = -logp[..., idx]
        total = jnp.sum(nll * valid)
        count = jnp.sum(valid)
        return jnp.where(count > 0, total / jnp.maximum(count, 1), 0.0)

    idxs = rank * b + jnp.arange(b)
    losses = jax.vmap(per_sample)(logits, mask_target, idxs)
    return jnp.mean(losses), logits
