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
from functools import partial
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
# jittable splice plan (fixed-shape variant of splice_multimodal_inputs)
# ---------------------------------------------------------------------------


def build_splice_plan(
    input_ids: np.ndarray,  # (L,) with IMAGE_TOKEN_INDEX placeholders
    num_image_tokens: int,
    max_len: int,
    labels: Optional[np.ndarray] = None,
):
    """Host-side plan for the <image> expansion so the embedding gather runs
    inside jit (training needs the splice differentiable w.r.t. BOTH the
    text embeddings and the projected vision tokens; the reference builds
    the spliced tensor in python per step,
    llava_arch.py prepare_inputs_labels_for_multimodal).

    Returns dict of (max_len,) arrays: ``text_idx``/``img_idx`` gather
    indices, ``use_img`` selector, ``attention_mask``, ``labels``.
    """
    text_idx = np.zeros(max_len, np.int32)
    img_idx = np.zeros(max_len, np.int32)
    use_img = np.zeros(max_len, bool)
    mask = np.zeros(max_len, bool)
    lab = np.full(max_len, -100, np.int64)
    o = 0
    for i, tok in enumerate(input_ids):
        if tok == IMAGE_TOKEN_INDEX:
            for j in range(num_image_tokens):
                if o >= max_len:
                    break
                img_idx[o] = j
                use_img[o] = True
                mask[o] = True
                o += 1
        else:
            if o >= max_len:
                break
            text_idx[o] = i
            mask[o] = True
            if labels is not None:
                lab[o] = labels[i]
            o += 1
    return {
        "text_idx": text_idx,
        "img_idx": img_idx,
        "use_img": use_img,
        "attention_mask": mask,
        "labels": lab,
    }


def apply_splice_plan(plan, text_embeds: jnp.ndarray, image_feats: jnp.ndarray):
    """(B, L_text, D) text + (B, T_img, D) image -> (B, max_len, D) embeds.
    ``plan`` holds batched (B, max_len) index arrays from build_splice_plan.
    """
    t_sel = jnp.take_along_axis(
        text_embeds, plan["text_idx"][..., None].astype(jnp.int32), axis=1
    )
    i_sel = jnp.take_along_axis(
        image_feats, plan["img_idx"][..., None].astype(jnp.int32), axis=1
    )
    return jnp.where(plan["use_img"][..., None], i_sel, t_sel)


# ---------------------------------------------------------------------------
# concrete end-to-end model: streaming tower -> projector -> in-repo LM
# ---------------------------------------------------------------------------


@dataclasses.dataclass
class LlavaQwenModel:
    """Tower + projector + the in-repo decoder LM (models/language_model),
    mirroring the reference LlavaQwen (llava/model/language_model/
    llava_qwen.py + llava_arch.py)."""

    tower: Any  # TimesformerVisionTower (streaming or full-clip)
    lm_cfg: Any  # language_model.LMConfig
    params: Params  # {"projector": ..., "lm": ...}
    pool_vision: str = "frame_mean"

    def encode_video(self, pixel_values: jnp.ndarray) -> jnp.ndarray:
        feats = self.tower.forward(pixel_values)  # (B, t_ctx, N, D)
        b, t, n, d = feats.shape
        if self.pool_vision == "frame_mean":
            feats = feats.mean(axis=2)
        else:
            feats = feats.reshape(b, t * n, d)
        return mm_projector(self.params["projector"], feats)

    def forward(
        self,
        input_ids: np.ndarray,  # (L,) with IMAGE_TOKEN_INDEX
        pixel_values: jnp.ndarray,  # (1, T, C, H, W)
        labels: Optional[np.ndarray] = None,
        max_len: int = 128,
    ):
        from streamformer_tpu.models import language_model as LM

        img = self.encode_video(pixel_values)  # (1, T_img, lm_dim)
        t_img = int(img.shape[1])
        plan = build_splice_plan(input_ids, t_img, max_len, labels)
        plan = {k: jnp.asarray(v)[None] for k, v in plan.items()}
        safe_ids = np.where(input_ids == IMAGE_TOKEN_INDEX, 0, input_ids)
        text = LM.embed_tokens(self.params["lm"], jnp.asarray(safe_ids))[None]
        embeds = apply_splice_plan(plan, text, img)
        out, _ = LM.forward(
            self.params["lm"], embeds, self.lm_cfg,
            attention_mask=plan["attention_mask"].astype(jnp.int32),
        )
        loss = None
        if labels is not None:
            lab = jnp.where(plan["attention_mask"], plan["labels"], -100)
            loss = LM.lm_loss(out["logits"], lab)
        return out["logits"], loss

    def prompt_embeds(
        self,
        input_ids: np.ndarray,  # (L,) prompt with IMAGE_TOKEN_INDEX
        pixel_values: Optional[jnp.ndarray],  # (1,T,C,H,W); None = reuse
        # the streaming tower's held context (no new frames)
    ) -> jnp.ndarray:
        """Exact-length (L_spliced, D) prompt embeddings — vision features
        spliced at every IMAGE_TOKEN_INDEX. This is the request payload for
        ``lm_serving.DecodeEngine.open`` (continuous-batching serving) and
        the prompt for ``generate``."""
        from streamformer_tpu.models import language_model as LM

        img = self.encode_video(pixel_values)
        t_img = int(img.shape[1])
        # exact-length prompt: L_text - n_placeholders + n_ph * t_img
        n_ph = int((input_ids == IMAGE_TOKEN_INDEX).sum())
        plen = len(input_ids) - n_ph + n_ph * t_img
        plan = build_splice_plan(input_ids, t_img, plen)
        plan = {k: jnp.asarray(v)[None] for k, v in plan.items()}
        safe_ids = np.where(input_ids == IMAGE_TOKEN_INDEX, 0, input_ids)
        text = LM.embed_tokens(self.params["lm"], jnp.asarray(safe_ids))[None]
        return apply_splice_plan(plan, text, img)[0]

    def generate(
        self,
        input_ids: np.ndarray,  # (L,) prompt with IMAGE_TOKEN_INDEX
        pixel_values: Optional[jnp.ndarray],  # None = reuse tower cache only
        max_new_tokens: int = 16,
        eos_token_id: Optional[int] = None,
    ) -> np.ndarray:
        """Greedy answer generation (reference model.generate(images=...)
        path, test_kvcache.py:55-88). When ``pixel_values`` is given the
        tower consumes the new frames first (appending to its stream)."""
        from streamformer_tpu.models import language_model as LM

        embeds = self.prompt_embeds(input_ids, pixel_values)[None]
        return LM.greedy_generate(
            self.params["lm"], self.lm_cfg, embeds,
            max_new_tokens=max_new_tokens, eos_token_id=eos_token_id,
            capacity=embeds.shape[1] + max_new_tokens,
        )


# ---------------------------------------------------------------------------
# stage-wise trainer (reference llava/train/train.py + stage scripts)
# ---------------------------------------------------------------------------


def make_videoqa_train_step(tower_cfg, lm_cfg, stage: int,
                            clip_grad: float = 1.0):
    """Jittable stage-wise training step over params
    ``{"tower", "projector", "lm"}`` with the reference's per-part
    trainability and learning rates (stage_policy). Returns (tx, step_fn);
    batches carry ``pixel_values``, ``text_ids`` (image tokens replaced by
    0), splice-plan arrays, ``attention_mask`` and ``labels``."""
    import optax

    from streamformer_tpu.models import encoder as enc
    from streamformer_tpu.models import language_model as LM

    pol = stage_policy(stage)
    name_of = {"tower": "vision_tower", "projector": "projector", "lm": "lm"}

    def label_tree(params):
        return {
            part: jax.tree.map(
                lambda _: part if name_of[part] in pol["train"] else "freeze",
                sub,
            )
            for part, sub in params.items()
        }

    transforms = {
        part: optax.chain(
            optax.clip_by_global_norm(clip_grad),
            optax.adamw(pol["lr"][name_of[part]]),
        )
        for part in ("tower", "projector", "lm")
        if name_of[part] in pol["train"]
    }
    transforms["freeze"] = optax.set_to_zero()
    tx = optax.multi_transform(transforms, label_tree)

    def loss_fn(params, batch):
        feats = enc.model_forward(
            params["tower"], batch["pixel_values"], tower_cfg
        )["last_hidden_state"]
        feats = feats.mean(axis=2)  # (B, T, D) per-frame tokens
        img = mm_projector(params["projector"], feats)
        text = LM.embed_tokens(params["lm"], batch["text_ids"])
        embeds = apply_splice_plan(batch, text, img)
        out, _ = LM.forward(
            params["lm"], embeds, lm_cfg,
            attention_mask=batch["attention_mask"].astype(jnp.int32),
        )
        lab = jnp.where(batch["attention_mask"], batch["labels"], -100)
        return LM.lm_loss(out["logits"], lab)

    @jax.jit
    def step(params, opt_state, batch):
        loss, grads = jax.value_and_grad(loss_fn)(params, batch)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return tx, step


def sequence_logps(logits: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    """Per-sequence summed next-token log-probability over the label tokens
    (-100 = ignore) — reference trl DPOTrainer.get_batch_logps with
    ``average_log_prob=False`` (dpo_trainer.py:797-826)."""
    shift_logits = logits[:, :-1]
    shift_labels = labels[:, 1:]
    valid = shift_labels != -100
    safe = jnp.where(valid, shift_labels, 0)
    logp = jax.nn.log_softmax(shift_logits.astype(jnp.float32), axis=-1)
    tok = jnp.take_along_axis(logp, safe[..., None], axis=-1)[..., 0]
    return jnp.sum(tok * valid, axis=-1)


def dpo_loss(
    policy_chosen_lp: jnp.ndarray,
    policy_rejected_lp: jnp.ndarray,
    ref_chosen_lp: jnp.ndarray,
    ref_rejected_lp: jnp.ndarray,
    beta: float = 0.1,
    label_smoothing: float = 0.0,
):
    """Sigmoid DPO loss + rewards (reference trl dpo_trainer.py:730-793,
    loss_type='sigmoid', the variant the LLaVA train_dpo recipe uses)."""
    logits = (policy_chosen_lp - policy_rejected_lp) - (
        ref_chosen_lp - ref_rejected_lp
    )
    losses = (
        -jax.nn.log_sigmoid(beta * logits) * (1 - label_smoothing)
        - jax.nn.log_sigmoid(-beta * logits) * label_smoothing
    )
    chosen_rewards = beta * (policy_chosen_lp - ref_chosen_lp)
    rejected_rewards = beta * (policy_rejected_lp - ref_rejected_lp)
    return losses, chosen_rewards, rejected_rewards


def make_videoqa_dpo_step(tower_cfg, lm_cfg, stage: int = 3,
                          beta: float = 0.1, dpo_alpha: float = 1.0,
                          gamma: float = 1.0, clip_grad: float = 1.0):
    """DPO preference training step (reference
    downstream/VideoQA/llava/train/train_dpo.py + vendored trl
    DPOTrainer.concatenated_forward/get_batch_loss_metrics:928-983):
    ``loss = dpo_alpha * mean(-logsigmoid(beta * Δlogratio)) +
    gamma * SFT-CE(chosen)``, with a frozen reference-model copy supplying
    the baseline log-ratios. Trainability/LRs follow stage_policy(stage).

    Batches: ``{"pixel_values", "chosen": sub, "rejected": sub}`` where
    each sub carries the stage-3 SFT fields (``text_ids``, splice-plan
    arrays, ``attention_mask``, ``labels``) for its response. Returns
    (tx, step); ``step(params, ref_params, opt_state, batch) ->
    (params, opt_state, loss, metrics)`` with reward margins/accuracy.
    """
    import optax

    from streamformer_tpu.models import encoder as enc
    from streamformer_tpu.models import language_model as LM

    pol = stage_policy(stage)
    name_of = {"tower": "vision_tower", "projector": "projector", "lm": "lm"}

    def label_tree(params):
        return {
            part: jax.tree.map(
                lambda _: part if name_of[part] in pol["train"] else "freeze",
                sub,
            )
            for part, sub in params.items()
        }

    transforms = {
        part: optax.chain(
            optax.clip_by_global_norm(clip_grad),
            optax.adamw(pol["lr"][name_of[part]]),
        )
        for part in ("tower", "projector", "lm")
        if name_of[part] in pol["train"]
    }
    transforms["freeze"] = optax.set_to_zero()
    tx = optax.multi_transform(transforms, label_tree)

    def encode(params, px):
        feats = enc.model_forward(params["tower"], px, tower_cfg)[
            "last_hidden_state"
        ].mean(axis=2)
        return mm_projector(params["projector"], feats)

    def response_logps(params, img, sub):
        text = LM.embed_tokens(params["lm"], sub["text_ids"])
        embeds = apply_splice_plan(sub, text, img)
        out, _ = LM.forward(
            params["lm"], embeds, lm_cfg,
            attention_mask=sub["attention_mask"].astype(jnp.int32),
        )
        lab = jnp.where(sub["attention_mask"], sub["labels"], -100)
        return sequence_logps(out["logits"], lab), out["logits"], lab

    def loss_fn(params, ref_params, batch):
        img = encode(params, batch["pixel_values"])
        pc, logits_c, lab_c = response_logps(params, img, batch["chosen"])
        pr, _, _ = response_logps(params, img, batch["rejected"])
        ref_img = encode(ref_params, batch["pixel_values"])
        rc, _, _ = response_logps(ref_params, ref_img, batch["chosen"])
        rr, _, _ = response_logps(ref_params, ref_img, batch["rejected"])
        rc = jax.lax.stop_gradient(rc)
        rr = jax.lax.stop_gradient(rr)
        losses, cr, rj = dpo_loss(pc, pr, rc, rr, beta)
        sft = LM.lm_loss(logits_c, lab_c)
        loss = dpo_alpha * losses.mean() + gamma * sft
        metrics = {
            "rewards_chosen": cr.mean(),
            "rewards_rejected": rj.mean(),
            "reward_margin": (cr - rj).mean(),
            "reward_accuracy": (cr > rj).mean(),
            "sft_loss": sft,
        }
        return loss, metrics

    # donate policy params + opt state (updated in place, like every other
    # train step here); ref_params are NOT donated — the frozen reference
    # policy is reused every step
    @partial(jax.jit, donate_argnums=(0, 2))
    def step(params, ref_params, opt_state, batch):
        (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, ref_params, batch
        )
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss, metrics

    return tx, step


def score_option_loglik(
    model: "LlavaQwenModel",
    prompt_ids: np.ndarray,  # (Lp,) with IMAGE_TOKEN_INDEX
    option_ids: np.ndarray,  # (Lo,) candidate continuation
    pixel_values,
) -> float:
    """Mean log-likelihood of ``option_ids`` continuing the prompt —
    the standard multiple-choice scoring used for VideoMME-style evals
    (reference llava/eval; README.md:102 reports VideoMME w/o subs)."""
    from streamformer_tpu.models import language_model as LM

    ids = np.concatenate([prompt_ids, option_ids])
    labels = np.concatenate(
        [np.full(len(prompt_ids), -100, np.int64), option_ids]
    )
    img = model.encode_video(pixel_values)
    t_img = int(img.shape[1])
    n_ph = int((ids == IMAGE_TOKEN_INDEX).sum())
    total = len(ids) - n_ph + n_ph * t_img
    plan = build_splice_plan(ids, t_img, total, labels)
    plan = {k: jnp.asarray(v)[None] for k, v in plan.items()}
    safe = np.where(ids == IMAGE_TOKEN_INDEX, 0, ids)
    text = LM.embed_tokens(model.params["lm"], jnp.asarray(safe))[None]
    embeds = apply_splice_plan(plan, text, img)
    out, _ = LM.forward(
        model.params["lm"], embeds, model.lm_cfg,
        attention_mask=plan["attention_mask"].astype(jnp.int32),
    )
    lab = jnp.where(plan["attention_mask"], plan["labels"], -100)
    return -float(LM.lm_loss(out["logits"], lab))


def evaluate_multiple_choice(
    model: "LlavaQwenModel",
    rows,  # [{"pixel_values", "prompt_ids", "options": [ids...], "answer"}]
) -> Dict[str, float]:
    """Multiple-choice accuracy by option log-likelihood (VideoMME-style).
    The tower cache is cleared per video."""
    correct = 0
    for row in rows:
        if hasattr(model.tower, "clear_cache"):
            model.tower.clear_cache()
        scores = []
        for i, opt in enumerate(row["options"]):
            if i > 0 and hasattr(model.tower, "clear_cache"):
                model.tower.clear_cache()
            scores.append(
                score_option_loglik(
                    model, row["prompt_ids"], np.asarray(opt),
                    row["pixel_values"],
                )
            )
        correct += int(int(np.argmax(scores)) == int(row["answer"]))
    return {"accuracy": correct / max(len(rows), 1), "n": len(rows)}


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
