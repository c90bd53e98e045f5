"""Optimizer factory: decay/no-decay groups, layer-decay (LLRD), schedules.

Rebuild of the reference optim_factory.py (239 LoC) + utils.py cosine
schedules (:574-605) on optax:

* no weight decay for biases and rank<=1 params (optim_factory.py:72-77);
* optional layer-wise lr decay: scale = decay_rate^(num_layers - layer_id)
  with embeddings at layer 0, encoder layer i at i+1, everything else at
  num_layers+1 (LayerDecayValueAssigner, optim_factory.py:48-56);
* cosine lr schedule with linear warmup and a cosine weight-decay schedule
  (utils.py:574-605 precomputes per-iteration arrays; optax schedules are
  the closed-form equivalent).
"""

from __future__ import annotations

import re
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import optax


def weight_decay_mask(params) -> Any:
    """True where weight decay applies (rank >= 2 kernels).

    Passed to optax as a *callable* so it is evaluated on the params tree the
    transform actually sees — inside ``optax.multi_transform`` frozen leaves
    become ``MaskedNode`` (no pytree children), and a precomputed full tree
    would no longer match the structure.
    """
    return jax.tree.map(lambda p: getattr(p, "ndim", 0) >= 2, params)


def _layer_id_of_path(path, num_layers: int) -> int:
    keys = [getattr(k, "key", getattr(k, "idx", None)) for k in path]
    if "embeddings" in keys:
        return 0
    if "layers" in keys:
        i = keys.index("layers")
        return int(keys[i + 1]) + 1
    return num_layers + 1


def layer_decay_scales(params, num_layers: int, decay_rate: float):
    """Per-leaf lr multiplier tree (LLRD)."""

    def scale(path, p):
        lid = _layer_id_of_path(path, num_layers)
        return decay_rate ** (num_layers + 1 - lid)

    return jax.tree_util.tree_map_with_path(scale, params)


def scale_by_tree(scales) -> optax.GradientTransformation:
    def init(params):
        return optax.EmptyState()

    def update(updates, state, params=None):
        return jax.tree.map(lambda u, s: u * s, updates, scales), state

    return optax.GradientTransformation(init, update)


def scale_by_layer_decay(num_layers: int, decay_rate: float) -> optax.GradientTransformation:
    """LLRD computed lazily from each update leaf's *path*.

    Unlike :func:`scale_by_tree` with a precomputed template tree, this
    composes with ``optax.multi_transform``/``optax.masked``: frozen leaves
    arrive as ``MaskedNode`` (zero pytree children) and are simply skipped by
    the path-wise map instead of raising a structure mismatch.
    """

    def init(params):
        return optax.EmptyState()

    def update(updates, state, params=None):
        def scale(path, u):
            lid = _layer_id_of_path(path, num_layers)
            return u * (decay_rate ** (num_layers + 1 - lid))

        return jax.tree_util.tree_map_with_path(scale, updates), state

    return optax.GradientTransformation(init, update)


def cosine_lr_schedule(
    base_lr: float,
    min_lr: float,
    epochs: int,
    steps_per_epoch: int,
    warmup_epochs: float = 0.0,
    warmup_steps: int = -1,
    warmup_lr: float = 1e-6,
):
    """Per-step cosine schedule with linear warmup (utils.py:574-605)."""
    total = epochs * steps_per_epoch
    warm = warmup_steps if warmup_steps > 0 else int(warmup_epochs * steps_per_epoch)
    return optax.join_schedules(
        [
            optax.linear_schedule(warmup_lr, base_lr, max(warm, 1)),
            optax.cosine_decay_schedule(
                base_lr, max(total - warm, 1), alpha=min_lr / max(base_lr, 1e-12)
            ),
        ],
        [warm],
    )


def cosine_wd_schedule(wd: float, wd_end: Optional[float], epochs, steps_per_epoch):
    if wd_end is None or wd_end == wd:
        return lambda step: wd
    total = max(epochs * steps_per_epoch, 1)
    return optax.cosine_decay_schedule(wd, total, alpha=wd_end / max(wd, 1e-12))


def create_optimizer(
    params,
    lr_schedule,
    weight_decay: float = 0.05,
    wd_schedule=None,
    betas=(0.9, 0.999),
    eps: float = 1e-8,
    clip_grad: Optional[float] = None,
    layer_decay: Optional[float] = None,
    num_layers: int = 12,
    trainable_mask=None,
    opt_name: str = "adamw",
) -> optax.GradientTransformation:
    """AdamW (default, optim_factory.py:107) with decay masking, optional
    LLRD, grad clipping, and a trainable mask (frozen params get zero
    updates — the reference freezes via requires_grad)."""
    # callable: evaluated on the tree the transform sees (MaskedNode-safe)
    mask = weight_decay_mask

    chain = []
    if clip_grad is not None:
        chain.append(optax.clip_by_global_norm(clip_grad))
    if opt_name == "adamw":
        chain.append(optax.scale_by_adam(b1=betas[0], b2=betas[1], eps=eps))
    elif opt_name == "sgd":
        chain.append(optax.trace(decay=betas[0]))
    elif opt_name == "lion":
        chain.append(optax.scale_by_lion(b1=betas[0], b2=betas[1]))
    else:
        raise ValueError(opt_name)

    if wd_schedule is not None:
        chain.append(
            optax.inject_hyperparams(
                lambda weight_decay: optax.add_decayed_weights(weight_decay, mask)
            )(weight_decay=wd_schedule)
        )
    elif weight_decay:
        chain.append(optax.add_decayed_weights(weight_decay, mask))

    if layer_decay is not None and layer_decay < 1.0:
        chain.append(scale_by_layer_decay(num_layers, layer_decay))

    chain.append(optax.inject_hyperparams(optax.scale_by_learning_rate)(lr_schedule))

    tx = optax.chain(*chain)
    if trainable_mask is not None:
        tx = optax.multi_transform(
            {"train": tx, "freeze": optax.set_to_zero()},
            jax.tree.map(lambda t: "train" if t else "freeze", trainable_mask),
        )
    return tx


def scale_lr(base_lr: float, total_batch_size: int, num_sample: int = 1) -> float:
    """Linear lr scaling rule (run_finetuning_multi_task.py:386-388)."""
    return base_lr * total_batch_size * num_sample / 256.0


# ---------------------------------------------------------------------------
# trainable-parameter masks (freeze / LoRA policies)
# ---------------------------------------------------------------------------


def trainable_mask_all(params):
    return jax.tree.map(lambda _: True, params)


def trainable_mask_lora_spatial(params):
    """Freeze spatial attention base qkv/out, train their LoRA factors —
    matching add_lora_spatial (modeling_timesformer_siglip.py:1271-1282)."""

    def decide(path, p):
        keys = [str(getattr(k, "key", getattr(k, "idx", ""))) for k in path]
        if "attention" in keys and "temporal_attention" not in keys:
            leaf = keys[-1]
            if leaf in ("kernel", "bias") and ("qkv" in keys or "out" in keys):
                return False
        return True

    return jax.tree_util.tree_map_with_path(decide, params)


def trainable_mask_frozen_text(params):
    def decide(path, p):
        keys = [str(getattr(k, "key", getattr(k, "idx", ""))) for k in path]
        return "text" not in keys

    return jax.tree_util.tree_map_with_path(decide, params)
