"""Multitask model: backbone + frozen text tower + task heads.

Rebuild of ``StreamformerForMultiTaskingSigLIP``
(models/modeling_timesformer_siglip.py:1357-1621). Pure-functional split:

* ``MultitaskModel`` (host object) owns config, task registry, tokenizer and
  the *static* text-derived state (prompt-ensembled label embedding tables,
  built once by :meth:`prepare_for_multi_tasks` like the reference
  :1448-1456);
* ``loss_fn(params, batch)`` is the jittable training objective — one task
  per batch (the reference asserts this, tools/finetune_tools.py:412), task
  chosen *statically* per compiled program (task name is a Python string ->
  one XLA program per task, reused across steps).

Task-name -> head mapping mirrors the reference registry
(:1379-1437): Kinetics/SSV2 -> classification; *Grounding/TaskLocalization
-> universal localization; THUMOS14/ActivityNet/FineAction/HACS -> naive
(windowed) localization; MSRVTT/WebVid/TaskRetrieval -> retrieval;
CharadesSTA/QVHighlights/... -> grounding; YoutubeVIS/LVVIS/COCOPseudoVIS/
TaskVIS -> VIS; MEVIS/ReferYoutubeVOS/RefCOCOPseudo/TaskReferVOS ->
ReferVOS.
"""

from __future__ import annotations

import math
from typing import Any, Dict, List, Optional

import numpy as np
import jax
import jax.numpy as jnp

from streamformer_tpu.config import StreamformerConfig
from streamformer_tpu.models import encoder, heads, text_encoder

CLASSIFICATION_TASKS = {"SSV2", "Kinetics"}
UNIVERSAL_LOCALIZATION_TASKS = {
    "THUMOS14Grounding",
    "ActivityNetGrounding",
    "FineActionGrounding",
    "HACSGrounding",
    "TaskLocalization",
}
NAIVE_LOCALIZATION_TASKS = {"THUMOS14", "ActivityNet", "FineAction", "HACS"}
RETRIEVAL_TASKS = {"MSRVTT", "WebVid", "TaskRetrieval"}
GROUNDING_TASKS = {
    "CharadesSTA",
    "QVHighlights",
    "TaCoS",
    "TVSum",
    "ActivityNetCaptions",
    "DiDeMo",
    "QuerYD",
    "TaskGrounding",
}
VIS_TASKS = {"YoutubeVIS", "LVVIS", "COCOPseudoVIS", "TaskVIS"}
REFERVOS_TASKS = {"MEVIS", "ReferYoutubeVOS", "RefCOCOPseudo", "TaskReferVOS"}


def head_type_for_task(task: str) -> str:
    if task in CLASSIFICATION_TASKS:
        return "classification"
    if task in UNIVERSAL_LOCALIZATION_TASKS:
        return "universal_localization"
    if task in NAIVE_LOCALIZATION_TASKS:
        return "naive_localization"
    if task in RETRIEVAL_TASKS:
        return "retrieval"
    if task in GROUNDING_TASKS:
        return "grounding"
    if task in VIS_TASKS:
        return "vis"
    if task in REFERVOS_TASKS:
        return "refervos"
    raise NotImplementedError(f"Task type {task} not implemented")


class _HashTokenizer:
    """Deterministic offline stand-in: lower-cased word pieces hashed into the
    vocab. NOT the SigLIP sentencepiece — only for hub-less environments."""

    def __init__(self, vocab_size: int):
        self.vocab_size = vocab_size

    def __call__(self, texts, padding="max_length", truncation=True,
                 max_length=64, return_tensors="np"):
        from streamformer_tpu.utils.hash_tok import hash_word_id

        ids = np.ones((len(texts), max_length), np.int32)  # 1 = pad
        for r, t in enumerate(texts):
            words = t.lower().split()[: max_length - 1]
            for c, w in enumerate(words):
                ids[r, c] = hash_word_id(w, self.vocab_size, reserved=2)
        return {"input_ids": ids}


class MultitaskModel:
    """Host-side model facade. Device state lives in ``self.params``:

    ``{"backbone": ..., "logit_scale": (), "logit_bias": (),
       "text": <frozen text tower>}``
    """

    def __init__(
        self,
        cfg: StreamformerConfig,
        multi_task_config: Optional[Dict[str, Dict]] = None,
        text_cfg: Optional[text_encoder.SiglipTextConfig] = None,
        rng: Optional[jax.Array] = None,
        grounding_head: str = "default",  # "default" | "contrastive"
    ):
        # the reference keeps TimesformerTemporalGroundingContrastiveHead as
        # an alternative registry entry (:2400-2482); select it here
        assert grounding_head in ("default", "contrastive")
        self.grounding_head = grounding_head
        self.cfg = cfg
        self.text_cfg = text_cfg or text_encoder.SiglipTextConfig(
            hidden_size=cfg.hidden_size
        )
        self.multi_task_config = multi_task_config or {}
        self.task_types = list(self.multi_task_config.keys())
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        kb, kt = jax.random.split(rng)
        self.params = {
            "backbone": encoder.init_params(kb, cfg),
            # reference init: logit_scale = log(10), logit_bias = -2
            # (modeling_timesformer_siglip.py:1363-1364)
            "logit_scale": jnp.asarray(math.log(10.0), jnp.float32),
            "logit_bias": jnp.asarray(-2.0, jnp.float32),
            "text": text_encoder.init_params(kt, self.text_cfg),
        }
        self._tokenizer = None
        # static per-task state built by prepare_for_multi_tasks
        self.label_embeddings: Dict[str, Any] = {}

    # ------------------------------------------------------------------
    # text tower utilities (host-side tokenization, device encode)
    # ------------------------------------------------------------------

    @property
    def tokenizer(self):
        if self._tokenizer is None:
            import os

            # same tokenizer family the reference uses
            # (modeling_timesformer_siglip.py:1365-1367); allow offline override
            name = os.environ.get(
                "STREAMFORMER_TOKENIZER", "google/siglip-base-patch16-224"
            )
            try:
                from transformers import AutoTokenizer

                # local_files_only: fail fast instead of HF-hub retry loops
                # in hub-less environments
                self._tokenizer = AutoTokenizer.from_pretrained(
                    name, local_files_only=True
                )
            except Exception as e:
                # The word-hash stand-in produces scientifically meaningless
                # label/caption embeddings — training on it silently would be
                # a garbage run, so it must be opted into explicitly (tests
                # and shape-only dry runs set the env var).
                if os.environ.get("STREAMFORMER_ALLOW_HASH_TOKENIZER") != "1":
                    raise RuntimeError(
                        f"SigLIP tokenizer '{name}' is not available locally "
                        f"({type(e).__name__}: {e}). Point the env var "
                        "STREAMFORMER_TOKENIZER at a local tokenizer "
                        "directory, or set "
                        "STREAMFORMER_ALLOW_HASH_TOKENIZER=1 to use a "
                        "deterministic hash tokenizer (tests/dry-runs only — "
                        "NOT valid for real training)."
                    ) from e
                self._tokenizer = _HashTokenizer(self.text_cfg.vocab_size)
        return self._tokenizer

    def tokenize(self, texts: List[str], max_length: int = 64) -> np.ndarray:
        # the reference always pads to 64 (tokenizer calls with
        # max_length=64); clamp to the text tower's position table
        max_length = min(max_length, self.text_cfg.max_position_embeddings)
        out = self.tokenizer(
            texts,
            padding="max_length",
            truncation=True,
            max_length=max_length,
            return_tensors="np",
        )
        return out["input_ids"].astype(np.int32)

    def encode_texts(self, texts: List[str], params=None) -> jnp.ndarray:
        """(len(texts), D) pooled text embeddings (frozen tower).

        Mid-training evals must pass the CURRENT ``params`` (the trainer's
        state tree): ``self.params`` aliases the tree handed to
        TrainState.create, whose buffers the first donated step deletes on
        TPU — dereferencing them raises "Array has been deleted"."""
        ids = jnp.asarray(self.tokenize(texts))
        tree = self.params if params is None else params
        out = text_encoder.forward(tree["text"], ids, self.text_cfg)
        return jax.lax.stop_gradient(out["pooler_output"])

    def encode_label_prompts(
        self, labels: List[str], templates: List[str]
    ) -> jnp.ndarray:
        """Prompt-ensembled label embeddings: per label, mean of normalized
        template embeddings (reference _tokenize_labels + prepare loop,
        modeling_timesformer_siglip.py:1666-1684)."""
        embeds = []
        for label in labels:
            texts = [t.format(label) for t in templates]
            e = self.encode_texts(texts)
            e = e / jnp.linalg.norm(e, axis=-1, keepdims=True)
            embeds.append(e.mean(axis=0))
        return jnp.stack(embeds)

    def prepare_for_multi_tasks(self):
        """Precompute label embedding tables per task (reference :1448-1456)."""
        for task, tcfg in self.multi_task_config.items():
            kind = head_type_for_task(task)
            label2id = tcfg.get("label2id")
            if kind == "classification":
                labels = list(label2id.keys())
                self.label_embeddings[task] = self.encode_label_prompts(
                    labels, heads.VIDEO_TEMPLATES
                )
            elif kind == "universal_localization":
                # per-dataset tables, padded to a common L_max with a mask
                tables = {}
                for ds_name, ds_label2id in label2id.items():
                    tables[ds_name] = self.encode_label_prompts(
                        list(ds_label2id.keys()), heads.VIDEO_TEMPLATES
                    )
                self.label_embeddings[task] = tables
            elif kind == "naive_localization":
                labels = list(label2id.keys())
                prompts = [f"A photo of a {l} person." for l in labels]
                e = self.encode_texts(prompts)
                self.label_embeddings[task] = e
            elif kind == "vis":
                tables = {}
                for ds_name, ds_label2id in label2id.items():
                    tables[ds_name] = self.encode_label_prompts(
                        list(ds_label2id.keys()), heads.SCENE_TEMPLATES
                    )
                self.label_embeddings[task] = tables
            # retrieval / grounding / refervos encode captions per batch

    # ------------------------------------------------------------------
    # forward paths
    # ------------------------------------------------------------------

    def backbone_forward(self, params, pixel_values, rng=None, deterministic=True):
        return encoder.model_forward(
            params["backbone"],
            pixel_values,
            self.cfg,
            rng=rng,
            deterministic=deterministic,
        )

    def loss_fn(
        self,
        params: Dict[str, Any],
        task_name: str,
        pixel_values: jnp.ndarray,  # (B, T, C, H, W)
        task_input: Dict[str, jnp.ndarray],
        rng=None,
        deterministic: bool = True,
        axis_name: Optional[str] = None,
    ):
        """One-task training objective (reference forward dispatch,
        modeling_timesformer_siglip.py:1486-1523). ``task_input`` is the
        fixed-pytree schema produced by the collate layer; text embeddings
        for caption-conditioned heads are encoded inside (frozen tower,
        stop_gradient) so the whole step is one XLA program.
        """
        kind = head_type_for_task(task_name)
        out = self.backbone_forward(
            params, pixel_values, rng=rng, deterministic=deterministic
        )
        pooler, last = out["pooler_output"], out["last_hidden_state"]
        scale, bias = params["logit_scale"], params["logit_bias"]

        def text_embeds(ids):
            t = text_encoder.forward(params["text"], ids, self.text_cfg)
            return jax.lax.stop_gradient(t["pooler_output"])

        if kind == "classification":
            return heads.classification_head(
                pooler, task_input["label_embeddings"], task_input["label"],
                scale, bias,
            )
        if kind == "retrieval":
            return heads.retrieval_head(
                pooler, text_embeds(task_input["caption_ids"]), scale, bias,
                axis_name=axis_name,
            )
        if kind == "grounding":
            if self.grounding_head == "contrastive":
                return heads.grounding_contrastive_head(
                    pooler, text_embeds(task_input["caption_ids"]),
                    task_input["label"], scale, bias, axis_name=axis_name,
                )
            return heads.grounding_head(
                pooler, text_embeds(task_input["caption_ids"]),
                task_input["label"], scale, bias,
            )
        if kind == "universal_localization":
            return heads.universal_localization_head(
                pooler, task_input["label_embeddings"], task_input["class_mask"],
                task_input["label"], scale, bias,
            )
        if kind == "naive_localization":
            return heads.naive_localization_head(
                pooler, task_input["label_embeddings"],
                task_input["target_labels"], scale, bias,
            )
        if kind == "vis":
            proj = heads.dense_projection_params(params["backbone"]["map_head"])
            return heads.vis_segmentation_head(
                last, proj, task_input["label_embeddings"],
                task_input["class_mask"], task_input["mask_target"], scale, bias,
            )
        if kind == "refervos":
            proj = heads.dense_projection_params(params["backbone"]["map_head"])
            return heads.refervos_contrastive_head(
                last, proj, text_embeds(task_input["caption_ids"]),
                task_input["mask_target"], scale, bias, axis_name=axis_name,
            )
        raise NotImplementedError(kind)

    # ------------------------------------------------------------------
    # published inference APIs
    # ------------------------------------------------------------------

    def forward_features(
        self, params, pixel_values, pooling_method: str = "mean"
    ) -> jnp.ndarray:
        """(B, D) or (B, T, D) features (reference forward_features,
        modeling_timesformer_siglip.py:1525-1536)."""
        pooler = self.backbone_forward(params, pixel_values)["pooler_output"]
        if pooling_method == "mean":
            return pooler.mean(axis=1)
        if pooling_method == "no_pooling":
            return pooler
        return pooler[:, -1]  # "last": causal summary frame

    def extract_feature(
        self,
        params,
        pixel_values: jnp.ndarray,  # (B, total_T, C, H, W)
        window_size: int = 384,
    ) -> jnp.ndarray:
        """Chunked long-video encode: zero-pad to a window multiple, encode
        window-by-window in num_frames clips, concat per-frame features
        (reference extract_feature, modeling_timesformer_siglip.py:1538-1621).
        Returns (B, total_T, D).
        """
        b, total = pixel_values.shape[:2]
        tf = self.cfg.num_frames
        pad = (-total) % window_size
        if pad:
            pixel_values = jnp.concatenate(
                [
                    pixel_values,
                    jnp.zeros(
                        (b, pad) + pixel_values.shape[2:], pixel_values.dtype
                    ),
                ],
                axis=1,
            )
        feats = []
        for i in range(0, pixel_values.shape[1], window_size):
            win = pixel_values[:, i : i + window_size]
            clips = win.reshape((-1, tf) + win.shape[2:])
            pooled = self.backbone_forward(params, clips)["pooler_output"]
            feats.append(pooled.reshape(b, window_size, -1))
        out = jnp.concatenate(feats, axis=1)
        return out[:, :total]
