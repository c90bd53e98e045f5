"""CTVIS contrastive-training plugin for online VIS.

Rebuild of the reference's CTCLPlugin
(downstream/OVIS/ctvis/modeling/cl_plugin/ct_cl_plugin.py, 470 LoC): during
training, instance embeddings of the same identity across frames form
positives and all other instances form negatives; the contrastive item loss
(InfoNCE-style with an auxiliary cosine loss) teaches the association
embedding the tracker uses at inference.

Functional form: given per-frame query embeddings and the Hungarian-matched
ground-truth instance ids, build (anchor, contrast) pairs between a key
frame and a reference frame and compute the contrastive loss with masked
identity targets.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def contrastive_items(
    key_embeds: jnp.ndarray,  # (Qk, D) matched key-frame embeddings
    ref_embeds: jnp.ndarray,  # (Qr, D) reference-frame embeddings
    key_ids: jnp.ndarray,  # (Qk,) instance ids, -1 = unmatched
    ref_ids: jnp.ndarray,  # (Qr,) instance ids, -1 = unmatched
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Pairwise logits + same-identity targets + validity mask."""
    sim = key_embeds @ ref_embeds.T  # (Qk, Qr)
    same = (key_ids[:, None] == ref_ids[None, :]) & (key_ids[:, None] >= 0)
    valid = (key_ids[:, None] >= 0) & (ref_ids[None, :] >= 0)
    return sim, same.astype(jnp.float32), valid


def contrastive_loss(
    key_embeds: jnp.ndarray,
    ref_embeds: jnp.ndarray,
    key_ids: jnp.ndarray,
    ref_ids: jnp.ndarray,
    temperature: float = 1.0,
) -> jnp.ndarray:
    """InfoNCE over reference instances per anchor + auxiliary cosine loss
    (the reference's loss_track/loss_track_aux pair)."""
    logits, targets, valid = contrastive_items(
        key_embeds, ref_embeds, key_ids, ref_ids
    )
    logits = logits / temperature
    # InfoNCE with possibly-multiple positives: -log(sum_pos / sum_all)
    masked = jnp.where(valid, logits, -1e30)
    logz = jax.nn.logsumexp(masked, axis=1)
    pos_masked = jnp.where(valid & (targets > 0), logits, -1e30)
    logpos = jax.nn.logsumexp(pos_masked, axis=1)
    has_pos = (targets * valid).sum(1) > 0
    nce = jnp.where(has_pos, logz - logpos, 0.0)
    n = jnp.maximum(has_pos.sum(), 1)
    loss_nce = nce.sum() / n

    # aux cosine: pull same-id cosine to 1, push different-id to < margin
    kn = key_embeds / jnp.linalg.norm(key_embeds, axis=-1, keepdims=True)
    rn = ref_embeds / jnp.linalg.norm(ref_embeds, axis=-1, keepdims=True)
    cos = kn @ rn.T
    aux = jnp.where(
        targets > 0, (1 - cos) ** 2, jnp.maximum(cos - 0.3, 0.0) ** 2
    )
    loss_aux = jnp.sum(aux * valid) / jnp.maximum(valid.sum(), 1)
    return loss_nce + loss_aux


def multi_ref_contrastive_loss(
    embeds: jnp.ndarray,  # (F, Q, D) per-frame matched query embeddings
    ids: jnp.ndarray,  # (F, Q) instance ids, -1 = unmatched/invalid
    one_direction: bool = True,
    reid_weight: float = 2.0,
    aux_reid_weight: float = 3.0,
) -> jnp.ndarray:
    """Multi-reference-frame contrastive loss (reference MultiRefCLPlugin,
    downstream/OVIS/ctvis/modeling/cl_plugin/multi_ref_cl_plugin.py:71-212).

    Every frame j acts as the anchor (only frame 0 when ``one_direction``,
    matching the reference's early ``break`` at :139-140); for each valid
    anchor instance, positives are its matched queries in every OTHER frame
    where it is valid, negatives are all other valid queries of those
    frames. The reference's per-item loss ``logsumexp(pad(neg - pos, 1))``
    equals ``log1p(exp(logsumexp(neg) + logsumexp(-pos)))`` since the pair
    sum factorizes — that closed form keeps this fully masked/jittable
    (static shapes; no per-instance Python loops or random negative
    subsampling — the reference samples 99 of its 100 queries, i.e.
    effectively all, :112-115). The aux term is the same squared error
    between cosine similarity and the 0/1 identity label (:205-208).
    """
    f, q, d = embeds.shape
    anchors = 1 if one_direction else f

    def per_anchor(j):
        a_emb = embeds[j]  # (Q, D)
        a_ids = ids[j]  # (Q,)
        other = jnp.arange(f) != j  # (F,)
        valid_ref = (ids >= 0) & other[:, None]  # (F, Q)
        same = (a_ids[:, None, None] == ids[None]) & valid_ref[None]
        neg = valid_ref[None] & ~same  # (Qa, F, Q)
        logits = jnp.einsum("qd,fkd->qfk", a_emb, embeds)
        lse_neg = jax.nn.logsumexp(
            jnp.where(neg, logits, -1e30), axis=(1, 2)
        )
        lse_negpos = jax.nn.logsumexp(
            jnp.where(same, -logits, -1e30), axis=(1, 2)
        )
        has_pos = (a_ids >= 0) & same.any(axis=(1, 2))
        nce = jnp.where(has_pos, jnp.log1p(jnp.exp(
            jnp.clip(lse_neg + lse_negpos, -30.0, 30.0)
        )), 0.0)

        an = a_emb / jnp.maximum(
            jnp.linalg.norm(a_emb, axis=-1, keepdims=True), 1e-6
        )
        en = embeds / jnp.maximum(
            jnp.linalg.norm(embeds, axis=-1, keepdims=True), 1e-6
        )
        cos = jnp.einsum("qd,fkd->qfk", an, en)
        pair = (same | neg) & has_pos[:, None, None]
        aux = (cos - same.astype(cos.dtype)) ** 2
        return (
            nce.sum(),
            has_pos.sum(),
            jnp.sum(aux * pair),
            pair.sum(),
        )

    nce_s, n_anc, aux_s, n_pair = 0.0, 0, 0.0, 0
    for j in range(anchors):  # F is a small static constant (2-16 frames)
        a, b, c, e = per_anchor(j)
        nce_s, n_anc = nce_s + a, n_anc + b
        aux_s, n_pair = aux_s + c, n_pair + e
    loss_reid = nce_s / jnp.maximum(n_anc, 1)
    loss_aux = aux_s / jnp.maximum(n_pair, 1)
    return reid_weight * loss_reid + aux_reid_weight * loss_aux


def cl_loss_from_config(
    embeds, ids, extras: Optional[dict] = None
) -> jnp.ndarray:
    """CL_PLUGIN_NAME dispatch (reference CL_PLUGIN_REGISTRY): ``CTCLPlugin``
    -> pairwise key/ref loss on the first two frames, ``MultiRefCLPlugin``
    -> all-frame variant, both honoring the d2-config weights."""
    extras = extras or {}
    name = extras.get("cl_plugin_name", "CTCLPlugin")
    rw = extras.get("reid_weight", 2.0)
    aw = extras.get("aux_reid_weight", 3.0)
    if name == "MultiRefCLPlugin":
        return multi_ref_contrastive_loss(
            embeds, ids, one_direction=extras.get("one_direction", True),
            reid_weight=rw, aux_reid_weight=aw,
        )
    if name == "CTCLPlugin":
        return contrastive_loss(embeds[0], embeds[1], ids[0], ids[1])
    raise ValueError(f"unknown CL plugin {name!r}")
