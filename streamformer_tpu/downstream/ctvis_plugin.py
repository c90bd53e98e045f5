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
