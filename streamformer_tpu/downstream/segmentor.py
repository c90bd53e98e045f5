"""Mask2Former-style video instance segmentor on the ViT-Adapter FPN.

Rebuild of the reference OVIS model stack (downstream/OVIS/mask2former +
ctvis, 17.6k LoC fork of CTVIS/Mask2Former/detectron2):

* pixel decoder: MSDeformAttn transformer encoder over the res3..res5
  scales + lateral fusion up to res2 for the high-res mask features
  (mask2former/modeling/pixel_decoder/msdeformattn.py);
* masked transformer decoder: learned queries, L rounds of
  masked cross-attention -> self-attention -> FFN cycling through the three
  scales, per-layer class + mask heads
  (mask2former CLMultiScaleMaskedTransformerDecoder);
* Hungarian matcher + criterion: CE over classes, sigmoid-BCE + dice over
  sampled mask points (mask2former/modeling/matcher.py, criterion.py) —
  matching runs host-side (scipy linear_sum_assignment) on stop-gradient
  costs, loss is pure JAX;
* CTVIS-style online tracker: similarity-guided matching against a momentum
  memory bank of instance embeddings (ctvis SimpleTracker :368).

Everything is functional and static-shape: queries/instances padded to
fixed counts with validity masks.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Dict, List, Optional, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from streamformer_tpu.ops.msdeform_attn import init_msdeform_params, ms_deform_attn

Params = Dict[str, Any]


@dataclasses.dataclass(frozen=True)
class SegmentorConfig:
    hidden_dim: int = 256
    num_queries: int = 100
    num_classes: int = 40
    nheads: int = 8
    dim_feedforward: int = 1024
    enc_layers: int = 3  # pixel decoder encoder layers
    dec_layers: int = 9  # transformer decoder layers
    mask_dim: int = 256
    in_dim: int = 768  # adapter FPN channel dim
    no_object_weight: float = 0.1
    class_weight: float = 2.0
    mask_weight: float = 5.0
    dice_weight: float = 5.0


# ---------------------------------------------------------------------------
# shared primitives
# ---------------------------------------------------------------------------


def _dense_init(rng, din, dout):
    lim = math.sqrt(6 / (din + dout))
    return {
        "kernel": jax.random.uniform(rng, (din, dout), jnp.float32, -lim, lim),
        "bias": jnp.zeros((dout,), jnp.float32),
    }


def _ln_init(d):
    return {"scale": jnp.ones((d,)), "bias": jnp.zeros((d,))}


def _dense(x, p):
    return x @ p["kernel"] + p["bias"]


def _ln(x, p, eps=1e-5):
    m = jnp.mean(x, -1, keepdims=True)
    v = jnp.var(x, -1, keepdims=True)
    return (x - m) * jax.lax.rsqrt(v + eps) * p["scale"] + p["bias"]


def _mha_init(rng, d):
    ks = jax.random.split(rng, 4)
    return {
        "q": _dense_init(ks[0], d, d),
        "k": _dense_init(ks[1], d, d),
        "v": _dense_init(ks[2], d, d),
        "out": _dense_init(ks[3], d, d),
    }


def _mha(p, q_in, kv_in, heads, attn_mask=None):
    b, lq, d = q_in.shape
    lk = kv_in.shape[1]
    dh = d // heads
    q = _dense(q_in, p["q"]).reshape(b, lq, heads, dh)
    k = _dense(kv_in, p["k"]).reshape(b, lk, heads, dh)
    v = _dense(kv_in, p["v"]).reshape(b, lk, heads, dh)
    s = jnp.einsum("bqhd,bkhd->bhqk", q, k) * (dh**-0.5)
    if attn_mask is not None:  # (B, Lq, Lk) bool, True = allowed
        s = jnp.where(attn_mask[:, None], s, -1e30)
    a = jax.nn.softmax(s, -1)
    o = jnp.einsum("bhqk,bkhd->bqhd", a, v).reshape(b, lq, d)
    return _dense(o, p["out"])


# ---------------------------------------------------------------------------
# pixel decoder
# ---------------------------------------------------------------------------


def init_pixel_decoder(rng, cfg: SegmentorConfig) -> Params:
    ks = iter(jax.random.split(rng, 8 + 4 * cfg.enc_layers))
    d = cfg.hidden_dim
    layers = []
    for _ in range(cfg.enc_layers):
        layers.append(
            {
                "attn": init_msdeform_params(next(ks), d, 3, cfg.nheads, 4),
                "ln1": _ln_init(d),
                "fc1": _dense_init(next(ks), d, cfg.dim_feedforward),
                "fc2": _dense_init(next(ks), cfg.dim_feedforward, d),
                "ln2": _ln_init(d),
            }
        )
    return {
        "input_proj": [
            _dense_init(next(ks), cfg.in_dim, d) for _ in range(3)
        ],
        "level_embed": 0.02 * jax.random.normal(next(ks), (3, d)),
        "layers": layers,
        "lateral_res2": _dense_init(next(ks), cfg.in_dim, d),
        "mask_proj": _dense_init(next(ks), d, cfg.mask_dim),
    }


def _ref_points(shapes):
    pts = []
    for h, w in shapes:
        ys = (jnp.arange(h) + 0.5) / h
        xs = (jnp.arange(w) + 0.5) / w
        gy, gx = jnp.meshgrid(ys, xs, indexing="ij")
        pts.append(jnp.stack([gx.reshape(-1), gy.reshape(-1)], -1))
    return jnp.concatenate(pts, 0)


def pixel_decoder_forward(
    p: Params,
    fpn: Dict[str, jnp.ndarray],  # res2..res5, NHWC, channel=cfg.in_dim
    cfg: SegmentorConfig,
):
    """Returns (per-scale memory [res5, res4, res3] each (B, Hi*Wi, D),
    their shapes, and the high-res mask features (B, H2, W2, mask_dim))."""
    feats = [fpn["res5"], fpn["res4"], fpn["res3"]]  # low -> high res
    shapes = [(f.shape[1], f.shape[2]) for f in feats]
    b = feats[0].shape[0]
    toks = []
    for i, f in enumerate(feats):
        t = _dense(f.reshape(b, -1, f.shape[-1]), p["input_proj"][i])
        toks.append(t + p["level_embed"][i])
    src = jnp.concatenate(toks, axis=1)

    ref = jnp.tile(
        _ref_points(shapes)[None, :, None, :], (b, 1, 3, 1)
    )  # (B, S, L, 2)
    for lp in p["layers"]:
        attn = ms_deform_attn(
            lp["attn"], src, ref, src, shapes, n_heads=cfg.nheads, n_points=4
        )
        src = _ln(src + attn, lp["ln1"])
        y = _dense(jax.nn.relu(_dense(src, lp["fc1"])), lp["fc2"])
        src = _ln(src + y, lp["ln2"])

    # split back per scale
    sizes = [h * w for h, w in shapes]
    outs, start = [], 0
    for sz in sizes:
        outs.append(src[:, start : start + sz])
        start += sz

    # mask features: finest encoded scale (res3) upsampled + res2 lateral
    h3, w3 = shapes[2]
    f3 = outs[2].reshape(b, h3, w3, cfg.hidden_dim)
    res2 = fpn["res2"]
    h2, w2 = res2.shape[1], res2.shape[2]
    up = jax.image.resize(f3, (b, h2, w2, cfg.hidden_dim), "linear")
    lat = _dense(res2.reshape(b, -1, res2.shape[-1]), p["lateral_res2"])
    mask_feat = up + lat.reshape(b, h2, w2, cfg.hidden_dim)
    mask_feat = _dense(mask_feat, p["mask_proj"])  # (B, H2, W2, mask_dim)
    return outs, shapes, mask_feat


# ---------------------------------------------------------------------------
# masked transformer decoder
# ---------------------------------------------------------------------------


def init_mask_decoder(rng, cfg: SegmentorConfig) -> Params:
    ks = iter(jax.random.split(rng, 8 + 6 * cfg.dec_layers))
    d = cfg.hidden_dim
    layers = []
    for _ in range(cfg.dec_layers):
        layers.append(
            {
                "cross": _mha_init(next(ks), d),
                "ln1": _ln_init(d),
                "self": _mha_init(next(ks), d),
                "ln2": _ln_init(d),
                "fc1": _dense_init(next(ks), d, cfg.dim_feedforward),
                "fc2": _dense_init(next(ks), cfg.dim_feedforward, d),
                "ln3": _ln_init(d),
            }
        )
    return {
        "query_feat": 0.02 * jax.random.normal(next(ks), (cfg.num_queries, d)),
        "query_embed": 0.02 * jax.random.normal(next(ks), (cfg.num_queries, d)),
        "layers": layers,
        "decoder_norm": _ln_init(d),
        "class_head": _dense_init(next(ks), d, cfg.num_classes + 1),
        "mask_head": {
            "fc1": _dense_init(next(ks), d, d),
            "fc2": _dense_init(next(ks), d, d),
            "fc3": _dense_init(next(ks), d, cfg.mask_dim),
        },
    }


def _mask_embed(p, q):
    y = jax.nn.relu(_dense(q, p["fc1"]))
    y = jax.nn.relu(_dense(y, p["fc2"]))
    return _dense(y, p["fc3"])


def mask_decoder_forward(
    p: Params,
    memory: List[jnp.ndarray],  # per-scale (B, Si, D), coarse -> fine
    shapes: Sequence[Tuple[int, int]],
    mask_feat: jnp.ndarray,  # (B, H2, W2, mask_dim)
    cfg: SegmentorConfig,
):
    """Returns dict with final + auxiliary per-layer predictions:
    pred_logits (B, Q, C+1), pred_masks (B, Q, H2, W2), embeddings (B, Q, D).
    """
    b = memory[0].shape[0]
    q = jnp.tile(p["query_feat"][None], (b, 1, 1))
    qe = p["query_embed"][None]

    def predict(q):
        qn = _ln(q, p["decoder_norm"])
        logits = _dense(qn, p["class_head"])
        membed = _mask_embed(p["mask_head"], qn)
        masks = jnp.einsum("bqc,bhwc->bqhw", membed, mask_feat)
        return logits, masks, qn

    aux = []
    logits, masks, _ = predict(q)
    for li, lp in enumerate(p["layers"]):
        scale = li % len(memory)
        h, w = shapes[scale]
        # masked cross-attention: queries only attend where their current
        # mask prediction is positive (Mask2Former's key trick)
        am = jax.image.resize(masks, (b, masks.shape[1], h, w), "linear")
        attn_mask = (jax.nn.sigmoid(am) > 0.5).reshape(b, masks.shape[1], h * w)
        # degenerate all-False rows attend everywhere (reference guard)
        any_true = attn_mask.any(-1, keepdims=True)
        attn_mask = jnp.where(any_true, attn_mask, True)
        q = _ln(
            q + _mha(lp["cross"], q + qe, memory[scale], cfg.nheads,
                     attn_mask=attn_mask),
            lp["ln1"],
        )
        q = _ln(q + _mha(lp["self"], q + qe, q + qe, cfg.nheads), lp["ln2"])
        y = _dense(jax.nn.relu(_dense(q, lp["fc1"])), lp["fc2"])
        q = _ln(q + y, lp["ln3"])
        logits, masks, qn = predict(q)
        aux.append({"pred_logits": logits, "pred_masks": masks})

    return {
        "pred_logits": logits,
        "pred_masks": masks,
        "embeddings": qn,
        "aux": aux[:-1],
    }


def init_segmentor(rng, cfg: SegmentorConfig) -> Params:
    k1, k2 = jax.random.split(rng)
    return {
        "pixel_decoder": init_pixel_decoder(k1, cfg),
        "mask_decoder": init_mask_decoder(k2, cfg),
    }


def segmentor_forward(params, fpn, cfg: SegmentorConfig):
    memory, shapes, mask_feat = pixel_decoder_forward(
        params["pixel_decoder"], fpn, cfg
    )
    return mask_decoder_forward(
        params["mask_decoder"], memory, shapes, mask_feat, cfg
    )


# ---------------------------------------------------------------------------
# matcher + criterion
# ---------------------------------------------------------------------------


def dice_loss(pred: jnp.ndarray, target: jnp.ndarray, eps=1.0):
    """pred logits, target {0,1}; flattened over pixels."""
    p = jax.nn.sigmoid(pred).reshape(pred.shape[0], -1)
    t = target.reshape(target.shape[0], -1)
    num = 2 * jnp.sum(p * t, -1)
    den = jnp.sum(p, -1) + jnp.sum(t, -1)
    return 1 - (num + eps) / (den + eps)


def _bce_logits(pred, target):
    return jnp.maximum(pred, 0) - pred * target + jnp.log1p(jnp.exp(-jnp.abs(pred)))


def hungarian_match(
    pred_logits: np.ndarray,  # (Q, C+1)
    pred_masks: np.ndarray,  # (Q, H, W)
    gt_classes: np.ndarray,  # (G,)
    gt_masks: np.ndarray,  # (G, H, W)
    cfg: SegmentorConfig,
) -> Tuple[np.ndarray, np.ndarray]:
    """Host-side bipartite matching on class+mask costs
    (mask2former matcher semantics)."""
    from scipy.optimize import linear_sum_assignment

    if len(gt_classes) == 0:
        return np.zeros(0, np.int64), np.zeros(0, np.int64)
    if gt_masks.shape[1:] != pred_masks.shape[1:]:
        # align gt to the prediction resolution (criterion does the same
        # via jax.image.resize nearest)
        ph, pw = pred_masks.shape[1:]
        yi = (np.arange(ph) * gt_masks.shape[1] / ph).astype(int)
        xi = (np.arange(pw) * gt_masks.shape[2] / pw).astype(int)
        gt_masks = gt_masks[:, yi][:, :, xi]
    prob = np.exp(pred_logits - pred_logits.max(-1, keepdims=True))
    prob /= prob.sum(-1, keepdims=True)
    cost_class = -prob[:, gt_classes]  # (Q, G)
    pm = pred_masks.reshape(len(pred_masks), -1)
    gm = gt_masks.reshape(len(gt_masks), -1).astype(np.float32)
    ps = 1 / (1 + np.exp(-pm))
    num = 2 * ps @ gm.T
    den = ps.sum(-1, keepdims=True) + gm.sum(-1)[None]
    cost_dice = 1 - (num + 1) / (den + 1)
    bce_pos = np.logaddexp(0, -pm) @ gm.T / gm.shape[1]
    bce_neg = np.logaddexp(0, pm) @ (1 - gm).T / gm.shape[1]
    cost_mask = bce_pos + bce_neg
    cost = (
        cfg.class_weight * cost_class
        + cfg.mask_weight * cost_mask
        + cfg.dice_weight * cost_dice
    )
    qi, gi = linear_sum_assignment(cost)
    return qi.astype(np.int64), gi.astype(np.int64)


def criterion(
    outputs: Dict[str, jnp.ndarray],
    matches: List[Tuple[np.ndarray, np.ndarray]],  # per-sample (qi, gi)
    gt_classes: jnp.ndarray,  # (B, Gmax) padded with -1
    gt_masks: jnp.ndarray,  # (B, Gmax, H, W)
    cfg: SegmentorConfig,
) -> jnp.ndarray:
    """Set-prediction loss given host-side matches: CE over classes
    (no-object for unmatched), BCE + dice on matched masks."""
    b, qn = outputs["pred_logits"].shape[:2]
    total = 0.0
    for i in range(b):
        qi, gi = matches[i]
        # class targets: no-object by default
        tgt = jnp.full((qn,), cfg.num_classes, jnp.int32)
        if len(qi):
            tgt = tgt.at[jnp.asarray(qi)].set(gt_classes[i][jnp.asarray(gi)])
        logp = jax.nn.log_softmax(outputs["pred_logits"][i], -1)
        w = jnp.where(tgt == cfg.num_classes, cfg.no_object_weight, 1.0)
        ce = -jnp.take_along_axis(logp, tgt[:, None], 1)[:, 0] * w
        total = total + cfg.class_weight * ce.sum() / jnp.sum(w)
        if len(qi):
            pm = outputs["pred_masks"][i][jnp.asarray(qi)]
            gm = gt_masks[i][jnp.asarray(gi)].astype(jnp.float32)
            gm = jax.image.resize(gm, pm.shape, "nearest")
            total = total + cfg.mask_weight * _bce_logits(pm, gm).mean()
            total = total + cfg.dice_weight * dice_loss(pm, gm).mean()
    return total / b


# ---------------------------------------------------------------------------
# CTVIS-style online tracker
# ---------------------------------------------------------------------------


class SimpleTracker:
    """Similarity-guided online instance tracker with a momentum memory bank
    (reference ctvis SimpleTracker, ctvis_model.py:368)."""

    def __init__(self, sim_threshold: float = 0.5, momentum: float = 0.8):
        self.sim_threshold = sim_threshold
        self.momentum = momentum
        self.memory: Optional[np.ndarray] = None  # (K, D)
        self.ids: List[int] = []
        self._next = 0

    def reset(self):
        self.memory, self.ids, self._next = None, [], 0

    def update(self, embeddings: np.ndarray, scores=None,
               frame_id: Optional[int] = None) -> List[int]:
        """embeddings: (N, D) for this frame's kept instances; returns
        per-instance track ids. ``scores``/``frame_id`` are accepted (and
        ignored — this tracker is purely similarity-driven) so track_video
        can drive either tracker through one call signature."""
        emb = embeddings / np.maximum(
            np.linalg.norm(embeddings, axis=-1, keepdims=True), 1e-6
        )
        if self.memory is None or not len(self.ids):
            self.memory = emb.copy()
            self.ids = list(range(len(emb)))
            self._next = len(emb)
            return list(self.ids)
        mem = self.memory / np.maximum(
            np.linalg.norm(self.memory, axis=-1, keepdims=True), 1e-6
        )
        sim = emb @ mem.T  # (N, K)
        from scipy.optimize import linear_sum_assignment

        ni, ki = linear_sum_assignment(-sim)
        out_ids = [-1] * len(emb)
        used = set()
        for n, k in zip(ni, ki):
            if sim[n, k] >= self.sim_threshold:
                out_ids[n] = self.ids[k]
                self.memory[k] = (
                    self.momentum * self.memory[k] + (1 - self.momentum) * emb[n]
                )
                used.add(k)
        for n in range(len(emb)):
            if out_ids[n] == -1:  # new track
                out_ids[n] = self._next
                self._next += 1
                self.memory = np.concatenate([self.memory, emb[n : n + 1]])
                self.ids.append(out_ids[n])
        return out_ids


# ---------------------------------------------------------------------------
# CTVIS memory-bank tracker (reference
# downstream/OVIS/ctvis/modeling/tracker/hungarian_tracker.py:338 +
# memory_bank.py — the published CTVIS method's tracker)
# ---------------------------------------------------------------------------


class _Tracklet:
    """One track's bounded history + fused association embedding.

    Mirrors the reference Tracklet (memory_bank.py:5-58): keeps the last
    ``maximum_cache`` (score, embedding) pairs plus two fused views —
    a momentum EMA and the similarity-guided fusion of arXiv 2203.14208
    (new embeddings move the fused embedding in proportion to their mean
    cosine similarity with the history, so occlusion-corrupted outliers
    barely perturb it).
    """

    def __init__(self, track_id: int, maximum_cache: int = 10,
                 momentum: float = 0.75):
        self.track_id = track_id
        self.scores: List[float] = []
        self.embeds: List[np.ndarray] = []
        self.frame_ids: List[int] = []
        self.exist_frames = 0
        self.maximum_cache = maximum_cache
        self.momentum = momentum
        self.momentum_embed: Optional[np.ndarray] = None
        self.sim_guided_embed: Optional[np.ndarray] = None

    @property
    def last_frame(self) -> int:
        return self.frame_ids[-1]

    def update(self, score: float, embed: np.ndarray, frame_id: int):
        self.scores.append(float(score))
        self.embeds.append(np.asarray(embed, np.float32))
        self.frame_ids.append(int(frame_id))
        if self.exist_frames == 0:
            self.momentum_embed = self.embeds[-1].copy()
            self.sim_guided_embed = self.embeds[-1].copy()
        else:
            m = self.momentum
            # NOTE: the weighting is deliberately (1-m)*old + m*new with
            # m=0.75 — the NEW embedding dominates. That is exactly the
            # reference's update (memory_bank.py:40, momentum=0.75 with the
            # comment that it measured best); the smoothed-history behavior
            # lives in sim_guided_embed below, not here.
            self.momentum_embed = (1 - m) * self.momentum_embed + m * embed
            hist = np.stack(self.embeds[:-1])
            hn = hist / np.maximum(
                np.linalg.norm(hist, axis=-1, keepdims=True), 1e-6
            )
            en = embed / max(np.linalg.norm(embed), 1e-6)
            beta = max(0.0, float(np.mean(hn @ en)))
            self.sim_guided_embed = (
                (1 - beta) * self.sim_guided_embed + beta * embed
            )
        self.exist_frames += 1
        if len(self.scores) > self.maximum_cache:
            self.scores.pop(0)
            self.embeds.pop(0)
            # the reference leaks frame_ids here (memory_bank.py:56-58 pops
            # only scores/embeds); cap it too — only frame_ids[-1]
            # (last_frame) is ever read
            self.frame_ids.pop(0)

    def fused_embed(self, embed_type: str) -> np.ndarray:
        if embed_type == "last":
            return self.embeds[-1]
        if embed_type == "momentum":
            return self.momentum_embed
        if embed_type == "similarity_guided":
            return self.sim_guided_embed
        if embed_type == "temporally_weighted_softmax":
            s = np.asarray(self.scores, np.float32)
            w = s + np.linspace(1 / len(s), 1.0, len(s), dtype=np.float32)
            return (np.stack(self.embeds) * w[:, None]).sum(0) / w.sum()
        raise ValueError(f"unknown embed_type {embed_type!r}")


class HungarianTracker:
    """Memory-bank online tracker with global (Hungarian) assignment.

    Rebuild of the reference HungarianTracker + MemoryBank
    (ctvis/modeling/tracker/hungarian_tracker.py:254-338, memory_bank.py):
    detections are matched to live tracklets on a bisoftmax or cosine
    similarity against each tracklet's fused association embedding; tracks
    unseen for ``num_dead_frames`` are retired; long-lived tracklets are
    preferred via ``frame_weight``. The reference resolves matches greedily
    in detection order (its own comment flags Hungarian as the intended
    upgrade, hungarian_tracker.py:286-288); ``match_type='hungarian'``
    (default) does the globally optimal assignment, ``'greedy'`` reproduces
    the reference's order-dependent resolution (config MATCH_TYPE).
    """

    def __init__(
        self,
        match_metric: str = "bisoftmax",
        match_type: str = "hungarian",
        match_score_thr: float = 0.2,
        init_score_thr: float = 0.01,
        frame_weight: bool = True,
        num_dead_frames: int = 20,
        embed_type: str = "similarity_guided",
        maximum_cache: int = 10,
    ):
        assert match_metric in ("bisoftmax", "cosine")
        assert match_type in ("hungarian", "greedy")
        assert embed_type in (
            "last", "momentum", "similarity_guided",
            "temporally_weighted_softmax",
        )
        self.match_metric = match_metric
        self.match_type = match_type
        self.match_score_thr = match_score_thr
        self.init_score_thr = init_score_thr
        self.frame_weight = frame_weight
        self.num_dead_frames = num_dead_frames
        self.embed_type = embed_type
        self.maximum_cache = maximum_cache
        self.reset()

    def reset(self):
        self.tracklets: Dict[int, _Tracklet] = {}
        self._next = 0
        self._frame = 0

    def _bank(self) -> Tuple[List[int], np.ndarray, np.ndarray]:
        ids = list(self.tracklets.keys())
        embeds = np.stack(
            [self.tracklets[i].fused_embed(self.embed_type) for i in ids]
        )
        exist = np.asarray(
            [self.tracklets[i].exist_frames for i in ids], np.float32
        )
        return ids, embeds, exist

    def _match_scores(self, embeds: np.ndarray, bank: np.ndarray):
        if self.match_metric == "bisoftmax":
            sim = embeds @ bank.T  # (N, K)
            sm = lambda x, ax: np.exp(x - x.max(ax, keepdims=True)) / np.sum(
                np.exp(x - x.max(ax, keepdims=True)), ax, keepdims=True
            )
            return (sm(sim, 1) + sm(sim, 0)) / 2
        en = embeds / np.maximum(
            np.linalg.norm(embeds, axis=-1, keepdims=True), 1e-6
        )
        bn = bank / np.maximum(
            np.linalg.norm(bank, axis=-1, keepdims=True), 1e-6
        )
        return en @ bn.T

    def update(
        self,
        embeddings: np.ndarray,
        scores: Optional[np.ndarray] = None,
        frame_id: Optional[int] = None,
    ) -> List[int]:
        """Assign this frame's detections (ordered by descending score) to
        track ids; -1 = dropped (below init threshold and unmatched)."""
        embeddings = np.asarray(embeddings, np.float32)
        n = len(embeddings)
        scores = (
            np.ones(n, np.float32) if scores is None
            else np.asarray(scores, np.float32)
        )
        frame_id = self._frame if frame_id is None else int(frame_id)
        self._frame = frame_id + 1

        # retire dead tracklets BEFORE matching. The reference cleans AFTER
        # updating frame f (clean_dead_tracklets(f), hungarian_tracker.py:336)
        # so its frame-(f+1) match sees exactly the tracks with
        # f - last_frame <= num_dead_frames; cleaning here with cur = the
        # PREVIOUS frame reproduces that bank identically (a plain
        # frame_id - last > ndf pre-clean would retire one frame early)
        for tid in [
            t for t, tr in self.tracklets.items()
            if (frame_id - 1) - tr.last_frame > self.num_dead_frames
        ]:
            del self.tracklets[tid]

        out = np.full(n, -1, np.int64)
        if self.tracklets and n:
            ids, bank, exist = self._bank()
            ms = self._match_scores(embeddings, bank)
            if self.match_type == "hungarian":
                if self.frame_weight:
                    # global-assignment variant of the reference's per-row
                    # rule (hungarian_tracker.py:290-299, +1.6 AP): among
                    # >1 above-threshold candidates prefer long-lived
                    # tracklets; below-threshold entries are scaled by the
                    # mean exist of the VALID candidates only (so a
                    # long-lived but low-score tracklet can never outbid
                    # the valid set), and rows with <=1 valid candidate
                    # stay unweighted
                    weighted = ms.copy()
                    for i in range(n):
                        valid = ms[i] > self.match_score_thr
                        if valid.sum() > 1:
                            weighted[i] = np.where(
                                valid, ms[i] * exist,
                                ms[i] * exist[valid].mean(),
                            )
                else:
                    weighted = ms
                from scipy.optimize import linear_sum_assignment

                ni, ki = linear_sum_assignment(-weighted)
                for i, k in zip(ni, ki):
                    if ms[i, k] > self.match_score_thr:
                        out[i] = ids[k]
            else:
                # greedy in detection order — the reference's exact
                # resolution (hungarian_tracker.py:289-311): per row, the
                # exist-frames weighting applies only when >1 candidates
                # clear the threshold, the threshold then compares against
                # the WEIGHTED max, and a match zeroes its tracklet's
                # column of the raw scores for every later row
                ms_work = ms.copy()
                for i in range(n):
                    row = ms_work[i]
                    valid = row > self.match_score_thr
                    if self.frame_weight and valid.sum() > 1:
                        # invalid entries scale by the mean exist of the
                        # VALID candidates (exist_frames[valid_indices]
                        # .mean(), hungarian_tracker.py:296-299) — the
                        # all-tracklet mean would let a long-lived
                        # below-threshold tracklet outbid the valid set
                        row = np.where(
                            valid, row * exist, row * exist[valid].mean()
                        )
                    k = int(np.argmax(row))
                    if row[k] > self.match_score_thr:
                        out[i] = ids[k]
                        ms_work[:, k] = 0.0
        for i in range(n):
            if out[i] == -1 and scores[i] > self.init_score_thr:
                out[i] = self._next
                self._next += 1
                self.tracklets[int(out[i])] = _Tracklet(
                    int(out[i]), self.maximum_cache
                )
        for i in range(n):
            if out[i] >= 0:
                tr = self.tracklets.get(int(out[i]))
                if tr is None:  # matched id always exists; defensive
                    continue
                tr.update(scores[i], embeddings[i], frame_id)
        return out.tolist()


def make_tracker(name: str, **kwargs):
    """TRACKER_NAME dispatch (reference TRACKER_REGISTRY,
    simple_tracker.py / hungarian_tracker.py registrations)."""
    if name == "SimpleTracker":
        allowed = {"sim_threshold", "momentum"}
        return SimpleTracker(
            **{k: v for k, v in kwargs.items() if k in allowed}
        )
    if name == "HungarianTracker":
        return HungarianTracker(**kwargs)
    raise ValueError(f"unknown tracker {name!r}")


def mask_nms(masks: np.ndarray, nms_thr: float = 0.6) -> np.ndarray:
    """Keep-mask over score-ordered binary masks: drop a mask whose IoU with
    any kept earlier (higher-scoring) mask exceeds ``nms_thr`` (reference
    ctvis/utils/utils.py:154-174)."""
    n = len(masks)
    keep = np.ones(n, bool)
    flat = masks.reshape(n, -1).astype(bool)
    area = flat.sum(-1)
    for i in range(n - 1):
        if not keep[i]:
            continue
        for j in range(i + 1, n):
            if not keep[j]:
                continue
            inter = np.count_nonzero(flat[i] & flat[j])
            union = area[i] + area[j] - inter
            if union > 0 and inter / union > nms_thr:
                keep[j] = False
    return keep


def track_video(
    frame_logits: np.ndarray,  # (T, Q, C+1)
    frame_masks: np.ndarray,  # (T, Q, H, W) logits
    frame_embeds: np.ndarray,  # (T, Q, D)
    tracker,
    inference_select_thr: float = 0.01,
    mask_nms_thr: float = 0.6,
) -> List[Dict]:
    """Run per-frame selection -> NMS -> tracking over a video's detections
    (the reference HungarianTracker.inference loop, hungarian_tracker.py:
    119-204). Returns per-frame dicts in the eval/ytvis
    ``collect_video_result`` format."""
    tracker.reset()
    outs: List[Dict] = []
    for t in range(len(frame_logits)):
        logits = frame_logits[t]
        probs = np.exp(logits - logits.max(-1, keepdims=True))
        probs /= probs.sum(-1, keepdims=True)
        cls_scores = probs[:, :-1]
        score = cls_scores.max(-1)
        cat = cls_scores.argmax(-1)
        order = np.argsort(-score)
        keep = order[score[order] > inference_select_thr]
        if len(keep) == 0:  # always keep the best (reference :146-147)
            keep = order[:1]
        bm = jax.nn.sigmoid(frame_masks[t][keep]) > 0.5
        bm = np.asarray(bm)
        keep = keep[mask_nms(bm, mask_nms_thr)]
        ids = tracker.update(
            frame_embeds[t][keep], score[keep], frame_id=t
        )
        sel = [i for i, tid in enumerate(ids) if tid >= 0]
        outs.append(
            {
                "track_ids": [ids[i] for i in sel],
                "category_ids": cat[keep][sel].tolist(),
                "scores": score[keep][sel].tolist(),
                "masks": np.asarray(
                    jax.nn.sigmoid(frame_masks[t][keep][sel]) > 0.5
                ),
            }
        )
    return outs


# ---------------------------------------------------------------------------
# detectron2-config compatibility (reference
# downstream/OVIS/configs/_base_/M2F.yaml + ytvis_2019/CTVIS_Streamformer.yaml)
# ---------------------------------------------------------------------------


def _deep_update(base: dict, new: dict) -> dict:
    for k, v in new.items():
        if isinstance(v, dict) and isinstance(base.get(k), dict):
            _deep_update(base[k], v)
        else:
            base[k] = v
    return base


def load_detectron2_yaml(path: str) -> dict:
    """Resolve a detectron2-style YAML with ``_BASE_`` inheritance chains."""
    import os

    import yaml

    with open(path) as f:
        cfg = yaml.safe_load(f) or {}
    bases = cfg.pop("_BASE_", [])
    if isinstance(bases, str):
        bases = [bases]
    merged: dict = {}
    for b in bases:
        _deep_update(merged, load_detectron2_yaml(
            os.path.join(os.path.dirname(path), b)
        ))
    return _deep_update(merged, cfg)


def config_from_detectron2_yaml(path: str):
    """Map the reference's detectron2 CTVIS/Mask2Former YAML keys onto
    (SegmentorConfig, extras) — extras carries tracker / CL-plugin /
    backbone fields outside the segmentor itself."""
    cfg = load_detectron2_yaml(path)
    model = cfg.get("MODEL", {})
    mf = model.get("MASK_FORMER", {})
    ssh = model.get("SEM_SEG_HEAD", {})
    seg = SegmentorConfig(
        hidden_dim=int(mf.get("HIDDEN_DIM", 256)),
        num_queries=int(mf.get("NUM_OBJECT_QUERIES", 100)),
        num_classes=int(ssh.get("NUM_CLASSES", 40)),
        nheads=int(mf.get("NHEADS", 8)),
        dim_feedforward=int(mf.get("DIM_FEEDFORWARD", 1024)),
        enc_layers=int(ssh.get("TRANSFORMER_ENC_LAYERS", 3)),
        dec_layers=int(mf.get("DEC_LAYERS", 9)),
        mask_dim=int(ssh.get("MASK_DIM", 256)),
        in_dim=int(model.get("BACKBONE", {}).get("HIDDEN_SIZE", 768)),
        no_object_weight=float(mf.get("NO_OBJECT_WEIGHT", 0.1)),
        class_weight=float(mf.get("CLASS_WEIGHT", 2.0)),
        mask_weight=float(mf.get("MASK_WEIGHT", 5.0)),
        dice_weight=float(mf.get("DICE_WEIGHT", 5.0)),
    )
    tracker = model.get("TRACKER", {})
    bank = tracker.get("MEMORY_BANK", {})
    clp = model.get("CL_PLUGIN", {})
    solver = cfg.get("SOLVER", {})
    inp = cfg.get("INPUT", {})
    extras = {
        "backbone_pretrained": model.get("BACKBONE", {}).get("PRETRAINED"),
        "backbone_checkpoint": model.get("BACKBONE", {}).get("CHECKPOINT"),
        # full TRACKER block (reference ctvis/config.py:18-39 defaults)
        "tracker_name": tracker.get("TRACKER_NAME", "SimpleTracker"),
        "match_score_thr": float(tracker.get("MATCH_SCORE_THR", 0.3)),
        "match_metric": tracker.get("MATCH_METRIC", "bisoftmax"),
        "match_type": tracker.get("MATCH_TYPE", "hungarian"),
        "frame_weight": bool(tracker.get("FRAME_WEIGHT", True)),
        "temporal_score_type": tracker.get("TEMPORAL_SCORE_TYPE", "mean"),
        "inference_select_thr": float(
            tracker.get("INFERENCE_SELECT_THR", 0.01)
        ),
        "init_score_thr": float(tracker.get("INIT_SCORE_THR", 0.01)),
        "mask_nms_thr": float(tracker.get("MASK_NMS_THR", 0.6)),
        "num_dead_frames": int(bank.get("NUM_DEAD_FRAMES", 20)),
        "embed_type": bank.get("EMBED_TYPE", "similarity_guided"),
        "maximum_cache": int(bank.get("maximum_cache", 10)),
        "cl_plugin_name": clp.get("CL_PLUGIN_NAME", "CTCLPlugin"),
        "one_direction": bool(clp.get("ONE_DIRECTION", True)),
        "reid_weight": float(clp.get("REID_WEIGHT", 2.0)),
        "aux_reid_weight": float(clp.get("AUX_REID_WEIGHT", 3.0)),
        "num_negatives": int(clp.get("NUM_NEGATIVES", 99)),
        # SOLVER / INPUT blocks (reference configs/_base_/YTVIS2019.yaml etc.)
        "base_lr": float(solver.get("BASE_LR", 1e-4)),
        "weight_decay": float(solver.get("WEIGHT_DECAY", 0.05)),
        "max_iter": int(solver.get("MAX_ITER", 0)),
        "ims_per_batch": int(solver.get("IMS_PER_BATCH", 1)),
        "backbone_multiplier": float(solver.get("BACKBONE_MULTIPLIER", 0.1)),
        "sampling_frame_num": int(inp.get("SAMPLING_FRAME_NUM", 2)),
        "datasets_train": cfg.get("DATASETS", {}).get("TRAIN"),
    }
    return seg, extras


def tracker_from_extras(extras: dict, name: Optional[str] = None):
    """Build the tracker a d2-config names (honors TRACKER_NAME +
    the MODEL.TRACKER / MEMORY_BANK hyperparameters)."""
    name = name or extras.get("tracker_name", "SimpleTracker")
    if name == "SimpleTracker":
        return SimpleTracker(
            sim_threshold=extras.get("match_score_thr", 0.3)
        )
    return make_tracker(
        name,
        match_metric=extras.get("match_metric", "bisoftmax"),
        match_type=extras.get("match_type", "hungarian"),
        match_score_thr=extras.get("match_score_thr", 0.2),
        init_score_thr=extras.get("init_score_thr", 0.01),
        frame_weight=extras.get("frame_weight", True),
        num_dead_frames=extras.get("num_dead_frames", 20),
        embed_type=extras.get("embed_type", "similarity_guided"),
        maximum_cache=extras.get("maximum_cache", 10),
    )
