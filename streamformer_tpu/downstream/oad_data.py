"""OAD per-frame data layer + training/eval loops for LSTR/MAT.

Rebuild of downstream/OAD's data + engine stack
(src/rekognition_online_action_detection/datasets/perframe_data_layers.py:
18-626, engines/perframe_det_trainer.py, perframe_det_batch_inference.py):

* per-video feature files: visual (L, 768) .npy from
  streamformer_tpu.extract.oad (+ optional flow (L, 1024)) and target
  (L, C) one-hot per-frame labels;
* training samples: random work-memory windows with the preceding
  long-memory span (segment sampler);
* batch inference: slide over every frame, score with the LSTR forward;
* evaluation: per-frame mAP (THUMOS) / mcAP (TVSeries) from
  streamformer_tpu.eval.metrics.
"""

from __future__ import annotations

import os
import random
from typing import Any, Dict, Iterator, List, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp
import optax

from streamformer_tpu.downstream import oad_lstr as L
from streamformer_tpu.eval import metrics as M


class PerFrameDataset:
    """Work/long-memory window samples over per-video feature dumps."""

    def __init__(
        self,
        feature_root: str,
        target_root: str,
        video_names: List[str],
        cfg: L.LSTRConfig,
        long_sample_rate: int = 4,
        mode: str = "train",
        flow_root: Optional[str] = None,
    ):
        self.cfg = cfg
        self.mode = mode
        self.long_sample_rate = long_sample_rate
        self.videos = []
        for name in video_names:
            vis = np.load(os.path.join(feature_root, name + ".npy"))
            tgt = np.load(os.path.join(target_root, name + ".npy"))
            flow = (
                np.load(os.path.join(flow_root, name + ".npy"))
                if flow_root
                else None
            )
            self.videos.append((name, vis, flow, tgt))
        # index: (video_idx, end_frame) for every valid work window
        self.samples: List[Tuple[int, int]] = []
        for vi, (_, vis, _, tgt) in enumerate(self.videos):
            lw = cfg.work_memory_num_samples
            for end in range(lw, len(vis) + 1):
                self.samples.append((vi, end))

    def __len__(self):
        return len(self.samples)

    def __getitem__(self, idx):
        vi, end = self.samples[idx]
        name, vis, flow, tgt = self.videos[vi]
        cfg = self.cfg
        lw = cfg.work_memory_num_samples
        ln = cfg.long_memory_num_samples
        work = vis[end - lw : end]
        work_t = tgt[end - lw : end]
        # long memory: strided history before the work window, zero-padded
        long_idx = np.arange(
            end - lw - ln * self.long_sample_rate, end - lw, self.long_sample_rate
        )
        valid = long_idx >= 0
        long_feat = np.zeros((ln, vis.shape[1]), np.float32)
        long_feat[valid] = vis[long_idx[valid]]
        feats = np.concatenate([long_feat, work], axis=0)
        if flow is not None:
            # visual-first columns — LSTRStream.step and _fuse_features both
            # slice [..., :visual_size] as the visual stream, so the dataset
            # must put flow AFTER visual or streaming inference sees
            # transposed feature columns
            fw = flow[end - lw : end]
            fl = np.zeros((ln, flow.shape[1]), np.float32)
            fl[valid] = flow[long_idx[valid]]
            feats = np.concatenate(
                [feats, np.concatenate([fl, fw], 0)], axis=-1
            )
        return {
            "features": feats.astype(np.float32),  # (ln + lw, D)
            "memory_mask": valid,  # (ln,)
            "targets": work_t.astype(np.float32),  # (lw, C)
        }

    def batches(self, batch_size: int, rng: np.random.Generator) -> Iterator[Dict]:
        order = rng.permutation(len(self)) if self.mode == "train" else np.arange(len(self))
        # train drops the remainder (reference drop_last); eval must score
        # EVERY window — a dropped partial batch silently truncates mAP/mcAP
        stop = (
            len(order) - len(order) % batch_size
            if self.mode == "train" else len(order)
        )
        for i in range(0, stop, batch_size):
            items = [self[j] for j in order[i : i + batch_size]]
            yield {
                k: np.stack([it[k] for it in items]) for k in items[0]
            }


def make_train_step(cfg: L.LSTRConfig, tx: optax.GradientTransformation):
    """Per-frame multi-label BCE over work (+ future) tokens (reference
    perframe_det_trainer criterion)."""

    def loss_fn(params, feats, mask, targets):
        out = L.forward(params, cfg, feats, memory_mask=mask)
        lw = cfg.work_memory_num_samples
        logits = out["logits"][:, :lw]
        bce = optax.sigmoid_binary_cross_entropy(logits, targets).mean()
        if "future_logits" in out:
            bce = bce + 0.0 * jnp.sum(out["future_logits"])  # future loss needs
            # future targets; weighted in when the data layer provides them
        return bce

    @jax.jit
    def step(params, opt_state, feats, mask, targets):
        loss, grads = jax.value_and_grad(loss_fn)(params, feats, mask, targets)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return step


def batch_inference(
    params, cfg: L.LSTRConfig, dataset: PerFrameDataset, batch_size: int = 16
) -> Dict[str, float]:
    """Score every frame and compute per-frame mAP + mcAP (reference
    perframe_det_batch_inference + eval_perframe)."""
    fwd = jax.jit(lambda p, f, m: L.forward(p, cfg, f, memory_mask=m)["logits"])
    scores, targets = [], []
    rng = np.random.default_rng(0)
    for batch in dataset.batches(batch_size, rng):
        logits = np.asarray(
            fwd(params, jnp.asarray(batch["features"]),
                jnp.asarray(batch["memory_mask"]))
        )
        lw = cfg.work_memory_num_samples
        scores.append(1 / (1 + np.exp(-logits[:, lw - 1])))  # newest frame
        targets.append(batch["targets"][:, lw - 1])
    s = np.concatenate(scores)
    t = np.concatenate(targets)
    out = M.perframe_map(s, t)
    out.update(M.perframe_calibrated_map(s, t))
    return out
