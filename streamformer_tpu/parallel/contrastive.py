"""Contrastive losses and their multi-chip forms.

The reference implements a hand-rolled NCCL ring with custom autograd
(neighbour_exchange*, modeling_timesformer_siglip.py:92-190) feeding
``SigLipLoss`` (:193-297), plus ``dist.all_gather`` global-batch variants
(:2000-2002, :2448-2464). On TPU these become ``jax.lax.ppermute`` /
``jax.lax.all_gather`` inside ``shard_map`` — differentiable by
construction, riding the ICI torus.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp


def sigmoid_pair_loss(logits: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    """SigLIP pairwise loss term: -sum(logsigmoid(labels * logits)).

    ``labels`` in {-1, +1} (0 entries contribute log 2 — callers mask first).
    """
    return -jnp.sum(jax.nn.log_sigmoid(labels * logits))


def _pair_logits(img, txt, logit_scale, logit_bias):
    # full-precision pairwise logits: loss math must not take XLA's fast
    # low-precision dot paths
    logits = logit_scale * jnp.einsum(
        "id,jd->ij", img, txt, precision=jax.lax.Precision.HIGHEST
    )
    return logits + logit_bias


def siglip_local_loss(
    img: jnp.ndarray,
    txt: jnp.ndarray,
    logit_scale: jnp.ndarray,
    logit_bias: jnp.ndarray,
    *,
    negative_only: bool = False,
) -> jnp.ndarray:
    """Single-shard SigLIP loss (reference SigLipLoss._loss, :220-243).

    img/txt: (B, D) L2-normalized. labels = 2*I - 1 (or all -1 when
    ``negative_only``); loss summed then divided by local B.
    """
    b = img.shape[0]
    logits = _pair_logits(img, txt, logit_scale, logit_bias)
    labels = -jnp.ones((b, txt.shape[0]), logits.dtype)
    if not negative_only:
        labels = labels + 2 * jnp.eye(b, txt.shape[0], dtype=logits.dtype)
    return sigmoid_pair_loss(logits, labels) / b


def siglip_ring_loss(
    img: jnp.ndarray,
    txt: jnp.ndarray,
    logit_scale: jnp.ndarray,
    logit_bias: jnp.ndarray,
    axis_name: Optional[str] = "data",
) -> jnp.ndarray:
    """Ring SigLIP loss — call inside shard_map/pjit with a named ``data``
    axis; each shard holds its local (B, D) img/txt.

    Equivalent to the reference's bidirectional neighbour-exchange ring
    (SigLipLoss.forward, :244-296): local positives+negatives, then
    world_size-1 negative-only terms against every other shard's text
    features, rotated via ppermute (both directions to use full ICI
    bisection bandwidth like the reference's bidir ring).

    Returns the per-shard loss (callers typically jnp.mean via psum outside
    or let pjit average gradients).
    """
    loss = siglip_local_loss(img, txt, logit_scale, logit_bias)
    if axis_name is None:
        return loss
    try:
        world = jax.lax.axis_size(axis_name)
    except NameError:
        return loss
    if world == 1:
        return loss

    n_bidir, remainder = divmod(world - 1, 2)
    right = [(i, (i + 1) % world) for i in range(world)]
    left = [(i, (i - 1) % world) for i in range(world)]

    txt_to_left, txt_to_right = txt, txt
    for _ in range(n_bidir):
        recv_from_right = jax.lax.ppermute(txt_to_left, axis_name, left)
        recv_from_left = jax.lax.ppermute(txt_to_right, axis_name, right)
        for f in (recv_from_right, recv_from_left):
            loss = loss + siglip_local_loss(
                img, f, logit_scale, logit_bias, negative_only=True
            )
        txt_to_left, txt_to_right = recv_from_right, recv_from_left
    if remainder:
        recv = jax.lax.ppermute(txt_to_right, axis_name, right)
        loss = loss + siglip_local_loss(
            img, recv, logit_scale, logit_bias, negative_only=True
        )
    return loss


def all_gather_features(x: jnp.ndarray, axis_name: Optional[str]) -> jnp.ndarray:
    """Concatenate per-shard features along the batch dim (reference
    dist.all_gather usage). No-op outside a named axis."""
    if axis_name is None:
        return x
    try:
        jax.lax.axis_size(axis_name)
    except NameError:
        return x
    return jax.lax.all_gather(x, axis_name, axis=0, tiled=True)


def axis_rank(axis_name: Optional[str]) -> jnp.ndarray:
    if axis_name is None:
        return jnp.zeros((), jnp.int32)
    try:
        return jax.lax.axis_index(axis_name)
    except NameError:
        return jnp.zeros((), jnp.int32)
