"""Per-task validation loops (reference tools/finetune_tools.py:642-947).

Each validator consumes an iterable of device batches from the eval loader
and produces the task's metrics:

* classification: top-1/5 on last-frame zero-shot logits (:730-739);
* retrieval: feature banking then Recall@K both directions (:741-747,
  :902-944);
* grounding: threshold proposals -> mIoU / R@{0.3,0.5,0.7} (:748-818) and a
  QVHighlights-style JSONL proposal dump (:819-844);
* localization: multi-segment proposals per class (ActionFormer-style result
  dict, :845-858).
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Iterable, List, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from streamformer_tpu.eval import metrics as M
from streamformer_tpu.models import encoder


def validate_classification(model, params, batches) -> Dict[str, float]:
    """batches: (pixel_values, labels); zero-shot logits vs label table."""
    fwd = jax.jit(
        lambda p, x: model.backbone_forward(p, x)["pooler_output"][:, -1]
    )
    table = None
    logits_all, labels_all = [], []
    for px, labels, task in batches:
        if table is None:
            table = np.asarray(model.label_embeddings[task])
        feat = np.asarray(fwd(params, px), np.float32)
        feat /= np.linalg.norm(feat, axis=-1, keepdims=True)
        logits_all.append(feat @ table.T)
        labels_all.append(np.asarray(labels))
    return M.topk_accuracy(np.concatenate(logits_all), np.concatenate(labels_all))


def validate_retrieval(model, params, batches) -> Dict[str, float]:
    """batches: (pixel_values, captions). Banks normalized video/text
    features then computes v2t and t2v recalls."""
    fwd = jax.jit(
        lambda p, x: model.backbone_forward(p, x)["pooler_output"][:, -1]
    )
    vids, txts = [], []
    for px, captions in batches:
        v = np.asarray(fwd(params, px), np.float32)
        t = np.asarray(
            model.encode_texts(list(captions), params=params), np.float32
        )
        vids.append(v / np.linalg.norm(v, axis=-1, keepdims=True))
        txts.append(t / np.linalg.norm(t, axis=-1, keepdims=True))
    v = np.concatenate(vids)
    t = np.concatenate(txts)
    sim = v @ t.T
    out = {f"v2t_{k}": val for k, val in M.retrieval_recall(sim).items()}
    out.update({f"t2v_{k}": val for k, val in M.retrieval_recall(sim.T).items()})
    return out


def validate_grounding(
    model,
    params,
    batches,
    factor: float = 0.7,
    jsonl_path: Optional[str] = None,
) -> Dict[str, float]:
    """batches: (pixel_values, caption_ids, metas) where each meta carries
    {"times": per-frame timestamps, "gt": (start, end), "qid"}.
    Threshold-proposal mIoU/R@tIoU; optional QVHighlights JSONL dump
    ("leave evaluation to official evaluation script", :820-844)."""
    from streamformer_tpu.models import text_encoder

    def score_fn(p, px, ids):
        pooler = model.backbone_forward(p, px)["pooler_output"]
        img = pooler / jnp.linalg.norm(pooler, axis=-1, keepdims=True)
        txt = text_encoder.forward(p["text"], ids, model.text_cfg)[
            "pooler_output"
        ]
        txt = txt / jnp.linalg.norm(txt, axis=-1, keepdims=True)
        sim = jnp.einsum("btd,bd->bt", img, txt)
        return jax.nn.sigmoid(
            sim * jnp.exp(p["logit_scale"]) + p["logit_bias"]
        )

    score_fn = jax.jit(score_fn)
    proposals, gts, rows = [], [], []
    for px, ids, metas in batches:
        probs = np.asarray(score_fn(params, px, ids), np.float32)
        for i, meta in enumerate(metas):
            times = np.asarray(meta["times"])
            s, e = M.threshold_prob_proposal(probs[i], times, factor=factor)
            proposals.append((s, e))
            gts.append(tuple(meta["gt"]))
            rows.append(
                {
                    "qid": meta.get("qid", len(rows)),
                    "pred_relevant_windows": [[float(s), float(e), 1.0]],
                }
            )
    if jsonl_path:
        os.makedirs(os.path.dirname(jsonl_path) or ".", exist_ok=True)
        with open(jsonl_path, "w") as f:
            for r in rows:
                f.write(json.dumps(r) + "\n")
    return M.grounding_metrics(proposals, gts)


def validate_localization(
    model, params, batches, factor: float = 0.5
) -> Dict[str, Any]:
    """batches: (pixel_values, label_embeddings, class_mask, metas).
    Multi-segment proposals per class -> ActionFormer-style result dict
    {video-id: [{label, segment, score}]} (:845-858)."""

    def score_fn(p, px, tables):
        pooler = model.backbone_forward(p, px)["pooler_output"]
        img = pooler / jnp.linalg.norm(pooler, axis=-1, keepdims=True)
        sim = jnp.einsum("btd,bld->btl", img, tables)
        return jax.nn.sigmoid(
            sim * jnp.exp(p["logit_scale"]) + p["logit_bias"]
        )

    score_fn = jax.jit(score_fn)
    results: Dict[Any, List[Dict]] = {}
    for px, tables, class_mask, metas in batches:
        probs = np.asarray(score_fn(params, px, tables), np.float32)
        cm = np.asarray(class_mask)
        for i, meta in enumerate(metas):
            times = np.asarray(meta["times"])
            vid = meta.get("video_id", len(results))
            out = results.setdefault(vid, [])
            for c in range(probs.shape[2]):
                if not cm[i, c]:
                    continue
                segs = M.multi_segment_proposal(
                    probs[i, :, c], times, factor=factor, at_least_one=False
                )
                if not segs:
                    continue
                for s, e, score in segs:
                    out.append(
                        {"label": int(c), "segment": [s, e], "score": float(score)}
                    )
    return results


def evaluate_multitask(
    model, params, eval_union, crop_size: int = 224, batch_size: int = 8,
    num_workers: int = 4,
) -> Dict[str, Dict[str, float]]:
    """Dispatch per-task validation over an eval MultiTaskDataset
    (reference validation branches, tools/finetune_tools.py:730-877).
    Currently covers classification, retrieval and grounding tasks."""
    from streamformer_tpu.data.collate import make_eval_augment
    from streamformer_tpu.models.multitask import head_type_for_task

    aug = make_eval_augment(crop_size)
    results: Dict[str, Dict[str, float]] = {}
    for ds in eval_union.datasets:
        task = getattr(ds, "task_name", type(ds).__name__)
        try:
            kind = head_type_for_task(task)
        except NotImplementedError:
            # unknown task (e.g. a dataset without task_name falling back
            # to its class name): skip it like the unsupported kinds below
            # instead of aborting the whole mid-training eval
            continue

        def batches():
            n = len(ds)
            for start in range(0, n, batch_size):
                items = [ds[i] for i in range(start, min(start + batch_size, n))]
                tis = [it["task_input"] for it in items]
                px = aug(jnp.asarray(np.stack([ti["frames"] for ti in tis])))
                yield px, tis

        if kind == "classification":
            gen = ((px, np.asarray([ti["label"] for ti in tis]), task)
                   for px, tis in batches())
            results[task] = validate_classification(model, params, gen)
        elif kind == "retrieval":
            gen = ((px, [ti["caption"] for ti in tis]) for px, tis in batches())
            results[task] = validate_retrieval(model, params, gen)
        elif kind == "grounding":
            def ggen():
                for px, tis in batches():
                    ids = jnp.asarray(
                        model.tokenize([ti["caption"] for ti in tis])
                    )
                    metas = [ti.get("meta", {"times": np.arange(px.shape[1]),
                                             "gt": (0, 1)}) for ti in tis]
                    yield px, ids, metas
            results[task] = validate_grounding(model, params, ggen())
        else:
            continue
    return results
