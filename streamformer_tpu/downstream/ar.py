"""Downstream Action Recognition suite (reference downstream/AR, UMT fork).

Model: backbone + MAP pooling -> mean over frames -> fc_norm -> dropout ->
linear classifier (reference
downstream/AR/models/modeling_timesformer_video_classification.py:42-137).
Engine: mixup train step, validation top-1/5, multi-view final test with
softmax-averaged merge (downstream/AR/engines/engine_for_finetuning.py).
"""

from __future__ import annotations

from functools import partial
from typing import Any, Dict, List, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp
import optax

from streamformer_tpu.config import StreamformerConfig
from streamformer_tpu.models import encoder
from streamformer_tpu.data.mixup import mixup_batch, soft_target_cross_entropy
from streamformer_tpu.eval import metrics as M


def init_classifier_params(rng, cfg: StreamformerConfig, num_classes: int):
    k1, k2 = jax.random.split(rng)
    return {
        "fc_norm": {
            "scale": jnp.ones((cfg.hidden_size,), jnp.float32),
            "bias": jnp.zeros((cfg.hidden_size,), jnp.float32),
        },
        "classifier": {
            # reference head init: trunc-normal(0.02) scaled by init_scale
            "kernel": 0.02
            * jax.random.truncated_normal(
                k1, -2, 2, (cfg.hidden_size, num_classes), jnp.float32
            ),
            "bias": jnp.zeros((num_classes,), jnp.float32),
        },
    }


def classification_forward(
    params: Dict[str, Any],
    pixel_values: jnp.ndarray,
    cfg: StreamformerConfig,
    *,
    rng=None,
    deterministic: bool = True,
    dropout_rate: float = 0.0,
) -> jnp.ndarray:
    """params = {"backbone": ..., "head": init_classifier_params(...)}."""
    out = encoder.model_forward(
        params["backbone"], pixel_values, cfg, rng=rng, deterministic=deterministic
    )
    feat = out["pooler_output"].mean(axis=1)  # mean over frames (AR :132-134)
    h = params["head"]
    feat = encoder.layer_norm(feat, h["fc_norm"], cfg.layer_norm_eps)
    if not deterministic and dropout_rate > 0 and rng is not None:
        feat = encoder.dropout(feat, dropout_rate, jax.random.fold_in(rng, 7), False)
    return feat @ h["classifier"]["kernel"].astype(feat.dtype) + h["classifier"][
        "bias"
    ].astype(feat.dtype)


def ema_update(ema_params, params, decay: float):
    """One ModelEma step: ema <- decay*ema + (1-decay)*param (reference
    timm ModelEma, downstream/AR/main_finetuning.py:53-55 + utils.py copy).
    Runs in fp32 regardless of the training dtype."""
    return jax.tree.map(
        lambda e, p: decay * e + (1.0 - decay) * p.astype(e.dtype),
        ema_params,
        params,
    )


def init_ema(params):
    """EMA shadow initialized from fp32 copies of the live params (real
    copies: the shadow and the live tree are donated to the same jit)."""
    return jax.tree.map(
        lambda p: jnp.array(p, dtype=jnp.float32, copy=True), params
    )


def make_train_step(
    cfg: StreamformerConfig,
    tx: optax.GradientTransformation,
    num_classes: int,
    mixup_alpha: float = 0.8,
    cutmix_alpha: float = 1.0,
    label_smoothing: float = 0.1,
    use_mixup: bool = True,
    ema_decay: Optional[float] = None,
):
    def loss_fn(params, pixel_values, labels, rng):
        if use_mixup:
            k_mix, k_drop = jax.random.split(rng)
            # mixup operates on the (B, T, C, H, W) model input
            mixed, targets = mixup_batch(
                k_mix,
                pixel_values,
                labels,
                num_classes,
                mixup_alpha=mixup_alpha,
                cutmix_alpha=cutmix_alpha,
                label_smoothing=label_smoothing,
                channels_last=False,
            )
            logits = classification_forward(
                params, mixed, cfg, rng=k_drop, deterministic=False
            )
            loss = soft_target_cross_entropy(logits.astype(jnp.float32), targets)
        else:
            logits = classification_forward(
                params, pixel_values, cfg, rng=rng, deterministic=False
            )
            loss = optax.softmax_cross_entropy_with_integer_labels(
                logits.astype(jnp.float32), labels
            ).mean()
        return loss, logits

    @partial(jax.jit, donate_argnums=(0, 1))
    def step(params, opt_state, pixel_values, labels, rng):
        (loss, logits), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, pixel_values, labels, rng
        )
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    if ema_decay is None:
        return step

    @partial(jax.jit, donate_argnums=(0, 1, 2))
    def step_ema(params, ema_params, opt_state, pixel_values, labels, rng):
        (loss, logits), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, pixel_values, labels, rng
        )
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        ema_params = ema_update(ema_params, params, ema_decay)
        return params, ema_params, opt_state, loss

    return step_ema


def validate(
    params, cfg: StreamformerConfig, batches
) -> Dict[str, float]:
    """batches yields (pixel_values, labels). Returns top-1/5
    (reference validation_one_epoch, engine_for_finetuning.py:148)."""
    fwd = jax.jit(lambda p, x: classification_forward(p, x, cfg))
    all_logits, all_labels = [], []
    for px, labels in batches:
        all_logits.append(np.asarray(fwd(params, px), np.float32))
        all_labels.append(np.asarray(labels))
    return M.topk_accuracy(np.concatenate(all_logits), np.concatenate(all_labels))


def final_test(
    params, cfg: StreamformerConfig, batches
) -> Dict[str, float]:
    """Multi-view test: batches yields (pixel_values, labels, video_ids);
    merged by softmax-averaging views per video
    (reference final_test + merge, engine_for_finetuning.py:188-296)."""
    fwd = jax.jit(lambda p, x: classification_forward(p, x, cfg))
    rows: List[Tuple[int, np.ndarray, int]] = []
    num_classes = None
    for px, labels, vids in batches:
        logits = np.asarray(fwd(params, px), np.float32)
        num_classes = logits.shape[1]
        for i in range(len(vids)):
            rows.append((int(vids[i]), logits[i], int(labels[i])))
    return M.merge_multiview_logits(rows, num_classes)
