"""Evaluation metric correctness (host-side numpy logic)."""

import pytest

pytestmark = pytest.mark.fast


import numpy as np

from streamformer_tpu.eval import metrics as M


def test_topk_accuracy():
    logits = np.array([[0.1, 0.9, 0.0], [0.8, 0.1, 0.1], [0.2, 0.3, 0.5]])
    labels = np.array([1, 0, 0])
    out = M.topk_accuracy(logits, labels, ks=(1, 2))
    np.testing.assert_allclose(out["top1"], 200 / 3)
    np.testing.assert_allclose(out["top2"], 200 / 3)  # row 3 misses top-2 too


def test_retrieval_recall_diagonal():
    sim = np.eye(4) + 0.01 * np.random.default_rng(0).standard_normal((4, 4))
    out = M.retrieval_recall(sim, ks=(1,))
    assert out["R@1"] == 100.0


def test_temporal_iou():
    assert M.temporal_iou((0, 2), (1, 3)) == 1 / 3
    assert M.temporal_iou((0, 1), (2, 3)) == 0.0
    assert M.temporal_iou((0, 2), (0, 2)) == 1.0


def test_threshold_prob_proposal_expands_around_max():
    prob = np.array([0.1, 0.2, 0.9, 0.8, 0.1])
    ts = np.arange(5.0)
    s, e = M.threshold_prob_proposal(prob, ts, factor=0.7)
    # expands while prob > 0.63: covers idx 2..3, stops at boundary indices
    assert s <= 2 and e >= 3


def test_multi_segment_proposal_runs():
    prob = np.array([0.9, 0.8, 0.1, 0.7, 0.9, 0.1])
    segs = M.multi_segment_proposal(prob, np.arange(6.0), factor=0.5)
    assert len(segs) == 2
    assert segs[0][:2] == [0.0, 1.0]
    assert segs[1][:2] == [3.0, 4.0]


def test_multi_segment_fallback():
    prob = np.array([0.1, 0.2, 0.3])
    segs = M.multi_segment_proposal(prob, np.arange(3.0), factor=0.5)
    assert len(segs) == 1  # at_least_one fallback
    assert M.multi_segment_proposal(prob, np.arange(3.0), factor=0.5,
                                    at_least_one=False) is None


def test_grounding_metrics():
    out = M.grounding_metrics([(0, 2), (0, 1)], [(0, 2), (5, 6)])
    assert out["mIoU"] == 50.0
    assert out["R@0.5"] == 50.0


def test_perframe_map_perfect():
    scores = np.array([[0.0, 0.9], [0.0, 0.8], [0.0, 0.1]])
    labels = np.array([[0, 1], [0, 1], [0, 0]])
    assert M.perframe_map(scores, labels)["mAP"] == 100.0


def test_perframe_mcap_range():
    rng = np.random.default_rng(0)
    scores = rng.random((100, 3))
    labels = (rng.random((100, 3)) > 0.8).astype(int)
    out = M.perframe_calibrated_map(scores, labels)
    assert 0 <= out["mcAP"] <= 100


def test_merge_multiview():
    rows = [
        (0, np.array([0.0, 5.0]), 1),
        (0, np.array([0.0, 4.0]), 1),
        (1, np.array([3.0, 0.0]), 0),
    ]
    out = M.merge_multiview_logits(rows, 2)
    assert out["top1"] == 100.0


def test_ytvis_rle_and_results(tmp_path):
    from streamformer_tpu.eval import ytvis
    from streamformer_tpu.data.seg_datasets import rle_to_mask

    m = np.zeros((6, 5), bool)
    m[2:4, 1:4] = True
    rle = ytvis.mask_to_rle(m)
    back = rle_to_mask(rle, 6, 5)
    np.testing.assert_array_equal(back, m)

    frames = [
        {"track_ids": [0, 1], "category_ids": [3, 4], "scores": [0.9, 0.8],
         "masks": np.stack([m, ~m])},
        {"track_ids": [1], "category_ids": [4], "scores": [0.7],
         "masks": np.stack([~m])},
    ]
    rows = ytvis.collect_video_result(7, frames)
    assert len(rows) == 2
    t1 = next(r for r in rows if r["category_id"] == 4)
    assert t1["segmentations"][0] is not None and t1["segmentations"][1] is not None
    t0 = next(r for r in rows if r["category_id"] == 3)
    assert t0["segmentations"][1] is None  # absent in frame 2
    import json, os
    p = str(tmp_path / "results.json")
    ytvis.write_results(rows, p)
    assert len(json.load(open(p))) == 2


# ---------------------------------------------------------------------------
# YTVIS AP (eval/ytvis.py evaluate_ytvis vs hand-computed values)
# ---------------------------------------------------------------------------


def _track(video, cat, masks, score=None, tid=0):
    from streamformer_tpu.eval import ytvis

    row = {
        "video_id": video,
        "category_id": cat,
        "segmentations": [
            ytvis.mask_to_rle(m) if m is not None else None for m in masks
        ],
    }
    if score is not None:
        row["score"] = score
    else:
        row["id"] = tid
    return row


def _box_mask(h, w, x0, x1):
    m = np.zeros((h, w), bool)
    m[:, x0:x1] = True
    return m


def test_ytvis_rle_roundtrip():
    from streamformer_tpu.eval import ytvis

    rng = np.random.default_rng(0)
    m = rng.random((13, 17)) > 0.6
    np.testing.assert_array_equal(ytvis.rle_to_mask(ytvis.mask_to_rle(m)), m)


def test_ytvis_track_iou_temporal():
    from streamformer_tpu.eval import ytvis

    a = [_box_mask(4, 10, 0, 5), _box_mask(4, 10, 0, 5)]
    b = [_box_mask(4, 10, 0, 5), None]  # absent frame counts as empty
    iou = ytvis.track_iou(a, b)
    np.testing.assert_allclose(iou, 20 / 40)


def test_ytvis_ap_perfect_and_partial():
    from streamformer_tpu.eval import ytvis

    g = _box_mask(10, 10, 0, 5)
    gts = [
        _track(1, 1, [g, g], tid=1),
        _track(2, 1, [g, g], tid=2),
    ]
    # perfect predictions -> AP 1.0
    preds = [
        _track(1, 1, [g, g], score=0.9),
        _track(2, 1, [g, g], score=0.8),
    ]
    r = ytvis.evaluate_ytvis(preds, gts)
    assert r["AP"] == 1.0 and r["AP50"] == 1.0 and r["AR@1"] == 1.0

    # one det at IoU exactly 0.6 (overlap 3 of 5 cols in both frames ->
    # IoU = 3/7 ≈ 0.43? no: det covers cols 2..7 (5 wide), gt 0..5:
    # inter cols 2..5 = 3, union = 7 -> 3/7) — craft IoU 0.6: det cols 0..6
    # inter 5, union 7? 5/7=0.714 -> matches at thr .5,.55,.6,.65,.7 (5/10)
    d = _box_mask(10, 10, 0, 7)
    preds = [
        _track(1, 1, [d, d], score=0.9),
        _track(2, 1, [g, g], score=0.8),
    ]
    r = ytvis.evaluate_ytvis(preds, gts)
    # video 1 det matches at 5 of 10 thresholds; video 2 always.
    # per-threshold AP: thr<=0.7: both matched -> 1.0;
    # thr>0.7: det1 is a higher-scored FP -> precision at recall 0.5 is 1/2
    # -> AP = mean_rec(prec) with recall max 0.5: 51 points at 0.5 of 101
    exp_hi = (51 * 0.5) / 101
    exp = (5 * 1.0 + 5 * exp_hi) / 10
    np.testing.assert_allclose(r["AP"], exp, atol=1e-6)
    assert r["AP50"] == 1.0


def test_ytvis_ap_end_to_end_from_tracker_output():
    """Close the loop: per-frame tracker-style outputs -> collect_video_result
    -> evaluate_ytvis on a synthetic mini-YTVIS fixture."""
    from streamformer_tpu.eval import ytvis

    g1 = _box_mask(8, 12, 0, 6)
    g2 = _box_mask(8, 12, 6, 12)
    frame_outputs = [
        {
            "track_ids": [0, 1],
            "category_ids": [1, 2],
            "scores": [0.9, 0.8],
            "masks": np.stack([g1, g2]),
        }
        for _ in range(3)
    ]
    rows = ytvis.collect_video_result(7, frame_outputs)
    assert len(rows) == 2
    gts = [
        _track(7, 1, [g1] * 3, tid=1),
        _track(7, 2, [g2] * 3, tid=2),
    ]
    r = ytvis.evaluate_ytvis(rows, gts)
    assert r["AP"] == 1.0
    assert set(r["per_class"]) == {1, 2}


# ---------------------------------------------------------------------------
# Track visualizer (eval/visualize.py vs reference demo/visualizer.py contract)
# ---------------------------------------------------------------------------


def test_overlay_masks_blends_and_is_stable():
    from streamformer_tpu.eval import visualize

    frame = np.full((16, 20, 3), 100, np.uint8)
    m = _box_mask(16, 20, 4, 12)
    out = visualize.overlay_masks(frame, m[None], [3], scores=[0.9])
    assert out.dtype == np.uint8 and out.shape == frame.shape
    # untouched outside the mask columns + label strip
    assert (out[6:, 13:, :] == 100).all()
    # blended inside: alpha=0.45 of the track color over gray-100
    color = visualize.track_color(3).astype(np.float32)
    interior = np.asarray(m, bool).copy()
    interior &= ~visualize._contour(m)
    exp = np.clip(0.55 * 100 + 0.45 * color, 0, 255).astype(np.uint8)
    ys, xs = np.nonzero(interior)
    # sample a pixel far from the label strip
    assert (out[ys.max(), xs.max()] == exp).all()
    # contour is the solid color
    cy, cx = np.nonzero(visualize._contour(m))
    assert (out[cy[-1], cx[-1]] == color.astype(np.uint8)).all()
    # per-track color is deterministic and id-distinct
    assert (visualize.track_color(3) == visualize.track_color(3)).all()
    assert (visualize.track_color(3) != visualize.track_color(4)).any()
    # input frame untouched
    assert (frame == 100).all()


def test_render_video_tracks_threshold_and_save(tmp_path):
    from streamformer_tpu.eval import visualize

    frames = [np.zeros((12, 12, 3), np.uint8) for _ in range(2)]
    m = _box_mask(12, 12, 2, 8)
    frame_outputs = [
        {"track_ids": [0, 1], "category_ids": [1, 2],
         "scores": [0.9, 0.01], "masks": np.stack([m, m])}
        for _ in range(2)
    ]
    rendered = visualize.render_video_tracks(
        frames, frame_outputs, class_names={1: "person"},
        score_threshold=0.5)
    assert len(rendered) == 2
    # only the 0.9-score track painted: its color present, track 1's absent
    c0 = visualize.track_color(0)
    assert (rendered[0] == c0).all(axis=-1).any()
    out = visualize.save_rendered(rendered, str(tmp_path / "viz"))
    import os
    assert sorted(os.listdir(out)) == ["00000.png", "00001.png"]


def test_ytvis_crowd_gt_ignores_overlapping_det():
    """COCO ignore semantics (reference ytvoseval: gt['ignore']=iscrowd): a
    detection whose only overlap is a crowd region counts as NEITHER tp nor
    fp, and crowd gts are excluded from n_gt — AP stays 1.0 (regression r4:
    the det was counted as a false positive, depressing precision)."""
    from streamformer_tpu.eval import ytvis

    g_real = _box_mask(8, 12, 0, 6)
    g_crowd = _box_mask(8, 12, 6, 12)
    gts = [
        _track(1, 1, [g_real] * 2, tid=1),
        {**_track(1, 1, [g_crowd] * 2, tid=2), "iscrowd": 1},
    ]
    # the crowd-overlapping det outranks the true positive, so if it were
    # counted as a false positive it would depress precision at recall 1
    results = [
        {"video_id": 1, "category_id": 1, "score": 0.95,
         "segmentations": [ytvis.mask_to_rle(g_crowd)] * 2},
        {"video_id": 1, "category_id": 1, "score": 0.9,
         "segmentations": [ytvis.mask_to_rle(g_real)] * 2},
    ]
    r = ytvis.evaluate_ytvis(results, gts)
    assert r["AP"] == 1.0, r

    # control: drop the crowd gt — the same top-ranked det is now a plain
    # false positive and AP must fall
    r2 = ytvis.evaluate_ytvis(results, [gts[0]])
    assert r2["AP"] < 1.0, r2
