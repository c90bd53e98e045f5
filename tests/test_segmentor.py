"""Mask2Former-style segmentor: shapes, matching, loss decrease, tracking."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from streamformer_tpu.downstream import segmentor as SEG

CFG = SEG.SegmentorConfig(
    hidden_dim=32,
    num_queries=8,
    num_classes=5,
    nheads=4,
    dim_feedforward=64,
    enc_layers=1,
    dec_layers=3,
    mask_dim=32,
    in_dim=32,
)


def _fpn(rng, b=2, base=16):
    return {
        "res2": jnp.asarray(rng.standard_normal((b, base, base, 32)).astype(np.float32)),
        "res3": jnp.asarray(rng.standard_normal((b, base // 2, base // 2, 32)).astype(np.float32)),
        "res4": jnp.asarray(rng.standard_normal((b, base // 4, base // 4, 32)).astype(np.float32)),
        "res5": jnp.asarray(rng.standard_normal((b, base // 8, base // 8, 32)).astype(np.float32)),
    }


def test_segmentor_output_contract(rng):
    params = SEG.init_segmentor(jax.random.PRNGKey(0), CFG)
    out = SEG.segmentor_forward(params, _fpn(rng), CFG)
    assert out["pred_logits"].shape == (2, 8, 6)
    assert out["pred_masks"].shape == (2, 8, 16, 16)
    assert out["embeddings"].shape == (2, 8, 32)
    assert len(out["aux"]) == CFG.dec_layers - 1
    assert np.isfinite(np.asarray(out["pred_masks"])).all()


def test_hungarian_match_sensible(rng):
    q, g, h, w = 6, 2, 8, 8
    logits = np.full((q, CFG.num_classes + 1), -5.0, np.float32)
    masks = np.full((q, h, w), -8.0, np.float32)
    # query 3 predicts class 1 and the left half; query 0 class 2, right half
    logits[3, 1] = 5.0
    masks[3, :, : w // 2] = 8.0
    logits[0, 2] = 5.0
    masks[0, :, w // 2 :] = 8.0
    gt_cls = np.array([1, 2])
    gt_masks = np.zeros((g, h, w), np.float32)
    gt_masks[0, :, : w // 2] = 1
    gt_masks[1, :, w // 2 :] = 1
    qi, gi = SEG.hungarian_match(logits, masks, gt_cls, gt_masks, CFG)
    m = dict(zip(gi.tolist(), qi.tolist()))
    assert m[0] == 3 and m[1] == 0


def test_criterion_trains(rng):
    params = SEG.init_segmentor(jax.random.PRNGKey(0), CFG)
    fpn = _fpn(rng)
    gt_cls = jnp.asarray([[1, 3], [2, -1]])
    gt_masks = np.zeros((2, 2, 16, 16), np.float32)
    gt_masks[0, 0, :8] = 1
    gt_masks[0, 1, 8:] = 1
    gt_masks[1, 0, :, :8] = 1
    gt_masks = jnp.asarray(gt_masks)

    tx = optax.adam(1e-3)
    opt = tx.init(params)

    fwd = jax.jit(lambda p: SEG.segmentor_forward(p, fpn, CFG))

    def match_phase(params):
        # phase 1 (host): matching on an eager stop-gradient forward
        out = fwd(params)
        matches = []
        for i in range(2):
            valid = np.asarray(gt_cls[i]) >= 0
            qi, gi = SEG.hungarian_match(
                np.asarray(out["pred_logits"][i]),
                np.asarray(out["pred_masks"][i]),
                np.asarray(gt_cls[i])[valid],
                np.asarray(gt_masks[i])[valid],
                CFG,
            )
            matches.append((qi, gi))
        return matches

    def loss_fn(params, matches):
        # phase 2 (traced): loss with fixed matches
        out = SEG.segmentor_forward(params, fpn, CFG)
        return SEG.criterion(out, matches, gt_cls, gt_masks, CFG)

    losses = []
    for step in range(6):
        matches = match_phase(params)
        loss, grads = jax.value_and_grad(loss_fn)(params, matches)
        updates, opt = tx.update(grads, opt, params)
        params = optax.apply_updates(params, updates)
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]


def test_tracker_identity_consistency():
    tr = SEG.SimpleTracker(sim_threshold=0.3)
    e1 = np.array([[1.0, 0, 0], [0, 1.0, 0]], np.float32)
    ids1 = tr.update(e1)
    assert ids1 == [0, 1]
    # same instances, swapped order + slight noise -> same ids swapped
    e2 = np.array([[0, 0.9, 0.1], [0.95, 0.05, 0]], np.float32)
    ids2 = tr.update(e2)
    assert ids2 == [1, 0]
    # a new instance gets a new id
    e3 = np.array([[0, 0, 1.0]], np.float32)
    ids3 = tr.update(e3)
    assert ids3 == [2]


def test_hungarian_tracker_beats_greedy_on_steal():
    """Crossing fixture where detection order makes greedy matching steal
    the wrong track (the reference's own resolution,
    hungarian_tracker.py:289-311) while the globally optimal assignment
    recovers both identities."""

    def run(match_type):
        tr = SEG.HungarianTracker(
            match_metric="cosine", match_type=match_type,
            match_score_thr=0.2, embed_type="last",
        )
        ids0 = tr.update(
            np.array([[1.0, 0.0], [0.7071, 0.7071]], np.float32),
            scores=np.array([0.9, 0.9]),
        )
        assert ids0 == [0, 1]
        # det order = score order: x (truly track 1) is ambiguous toward
        # track 0 (cos 0.971 vs 0.856); y (truly track 0) matches it at 1.0
        return tr.update(
            np.array([[0.97, 0.24], [1.0, 0.0]], np.float32),
            scores=np.array([0.9, 0.8]),
        )

    assert run("greedy") == [0, 1]  # greedy steals: both ids wrong
    assert run("hungarian") == [1, 0]  # global assignment recovers


def test_hungarian_tracker_occlusion_and_dead_frames():
    """Identity survives occlusion within num_dead_frames and is retired
    (new id on reappearance) beyond it — the memory-bank behavior the
    greedy SimpleTracker lacks (memory_bank.py:95-103)."""
    tr = SEG.HungarianTracker(
        match_metric="cosine", num_dead_frames=3, embed_type="similarity_guided"
    )
    a = np.array([[1.0, 0.0]], np.float32)
    b = np.array([[0.0, 1.0]], np.float32)
    assert tr.update(a, frame_id=0) == [0]
    assert tr.update(b, frame_id=1) == [1]
    assert tr.update(b, frame_id=2) == [1]
    # A reappears at frame 3: gap 3 <= num_dead_frames -> same id
    assert tr.update(a, frame_id=3) == [0]
    # A absent until frame 9: gap 6 > 3 -> tracklet retired, new id
    assert tr.update(b, frame_id=4) == [1]
    assert tr.update(a, frame_id=9) == [2]


def test_hungarian_tracker_similarity_guided_resists_outlier():
    """An occlusion-corrupted embedding barely moves the similarity-guided
    fused embedding but drags the plain momentum EMA (arXiv 2203.14208
    fusion, memory_bank.py:42-49)."""
    t = SEG._Tracklet(0, maximum_cache=10)
    clean = np.array([1.0, 0.0], np.float32)
    corrupt = np.array([-0.2, 0.98], np.float32)  # dissimilar outlier
    for f in range(3):
        t.update(1.0, clean, f)
    t.update(0.4, corrupt, 3)
    cos = lambda u, v: float(
        np.dot(u, v) / (np.linalg.norm(u) * np.linalg.norm(v) + 1e-9)
    )
    assert cos(t.sim_guided_embed, clean) > 0.99  # beta ~ 0: unmoved
    assert cos(t.momentum_embed, clean) < 0.9  # EMA dragged toward outlier
    # all four fused views are well-formed
    for et in ("last", "momentum", "similarity_guided",
               "temporally_weighted_softmax"):
        assert t.fused_embed(et).shape == (2,)


def test_track_video_and_dispatch():
    """track_video drives selection -> mask NMS -> tracking and its output
    feeds the YTVIS exporter; make_tracker honors TRACKER_NAME."""
    from streamformer_tpu.eval.ytvis import collect_video_result

    rng = np.random.default_rng(0)
    T, Q, C, H, W, D = 3, 4, 2, 8, 8, 8
    logits = np.full((T, Q, C + 1), -4.0, np.float32)
    logits[..., -1] = 6.0  # noise queries predict no-object dominantly
    masks = np.full((T, Q, H, W), -8.0, np.float32)
    embeds = rng.standard_normal((T, Q, D)).astype(np.float32) * 0.01
    # two stable instances in queries 0/1 across all frames
    for t in range(T):
        logits[t, 0, 0] = 4.0
        masks[t, 0, :, : W // 2] = 8.0
        embeds[t, 0] += np.eye(D, dtype=np.float32)[0] * 5
        logits[t, 1, 1] = 4.0
        masks[t, 1, :, W // 2 :] = 8.0
        embeds[t, 1] += np.eye(D, dtype=np.float32)[1] * 5
    tracker = SEG.make_tracker("HungarianTracker", match_metric="cosine")
    outs = SEG.track_video(logits, masks, embeds, tracker)
    assert len(outs) == T
    for fo in outs:
        assert sorted(fo["track_ids"]) == [0, 1]
    rows = collect_video_result(7, outs)
    assert len(rows) == 2
    assert all(len(r["segmentations"]) == T for r in rows)
    assert {r["category_id"] for r in rows} == {0, 1}
    # dispatch also builds the greedy baseline
    assert isinstance(SEG.make_tracker("SimpleTracker"), SEG.SimpleTracker)


def test_tracker_from_extras_honors_tracker_name(tmp_path):
    y = tmp_path / "cfg.yaml"
    y.write_text(
        "MODEL:\n  TRACKER:\n    TRACKER_NAME: HungarianTracker\n"
        "    MATCH_METRIC: cosine\n    MATCH_SCORE_THR: 0.25\n"
        "    MEMORY_BANK:\n      EMBED_TYPE: momentum\n"
        "      NUM_DEAD_FRAMES: 7\n"
    )
    _, extras = SEG.config_from_detectron2_yaml(str(y))
    tr = SEG.tracker_from_extras(extras)
    assert isinstance(tr, SEG.HungarianTracker)
    assert tr.match_metric == "cosine"
    assert tr.match_score_thr == 0.25
    assert tr.embed_type == "momentum" and tr.num_dead_frames == 7


def test_detectron2_config_compat(tmp_path):
    """Reference CTVIS YAML (with _BASE_ chain) -> SegmentorConfig."""
    base = tmp_path / "M2F.yaml"
    base.write_text(
        "MODEL:\n  SEM_SEG_HEAD:\n    NUM_CLASSES: 40\n    MASK_DIM: 256\n"
        "    TRANSFORMER_ENC_LAYERS: 6\n"
        "  MASK_FORMER:\n    HIDDEN_DIM: 256\n    NUM_OBJECT_QUERIES: 64\n"
        "    NHEADS: 8\n    DEC_LAYERS: 9\n    DICE_WEIGHT: 5.0\n"
    )
    child = tmp_path / "CTVIS.yaml"
    child.write_text(
        '_BASE_: ["M2F.yaml"]\n'
        "MODEL:\n  BACKBONE:\n    HIDDEN_SIZE: 768\n"
        "  MASK_FORMER:\n    NUM_OBJECT_QUERIES: 100\n"
        "  TRACKER:\n    MATCH_SCORE_THR: 0.3\n"
        "  CL_PLUGIN:\n    REID_WEIGHT: 2.\n    NUM_NEGATIVES: 99\n"
    )
    seg, extras = SEG.config_from_detectron2_yaml(str(child))
    assert seg.num_queries == 100  # child overrides base
    assert seg.num_classes == 40 and seg.enc_layers == 6
    assert seg.in_dim == 768
    assert extras["match_score_thr"] == 0.3 and extras["num_negatives"] == 99


def test_detectron2_config_reference_yaml():
    """Drive the ACTUAL reference config chain
    (downstream/OVIS/configs/ytvis_2019/CTVIS_Streamformer.yaml with its
    _BASE_ [M2F.yaml, YTVIS2019.yaml])."""
    import os

    path = (
        "/root/reference/downstream/OVIS/configs/ytvis_2019/"
        "CTVIS_Streamformer.yaml"
    )
    if not os.path.exists(path):
        pytest.skip("reference tree not available")
    seg, extras = SEG.config_from_detectron2_yaml(path)
    # M2F.yaml values
    assert seg.hidden_dim == 256 and seg.nheads == 8
    assert seg.dim_feedforward == 2048 and seg.mask_dim == 256
    assert seg.no_object_weight == 0.1 and seg.dice_weight == 5.0
    # YTVIS2019.yaml values
    assert seg.num_classes == 40
    assert extras["base_lr"] == 1e-4 and extras["weight_decay"] == 0.05
    assert extras["max_iter"] == 32000 and extras["ims_per_batch"] == 8
    assert extras["sampling_frame_num"] == 16
    # leaf overrides
    assert seg.num_queries == 100 and seg.in_dim == 768
    assert extras["tracker_name"] == "SimpleTracker"
    assert extras["reid_weight"] == 2.0 and extras["aux_reid_weight"] == 3.0
