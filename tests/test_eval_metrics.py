"""Evaluation metric correctness (host-side numpy logic)."""

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
