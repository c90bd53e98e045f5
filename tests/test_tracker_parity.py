"""Behavioral parity of the CTVIS tracker vs the REFERENCE implementation.

The reference HungarianTracker + MemoryBank
(downstream/OVIS/ctvis/modeling/tracker/hungarian_tracker.py:254-338,
memory_bank.py) are loaded from file and driven directly on CPU — no
detectron2 (its ``configurable`` decorator and registry are stubbed; they
are pure glue), no ``mask_nms`` (unused by ``track()``), with the hardcoded
cuda placements patched to CPU. Only framework glue is stubbed; every line
of tracking/memory-bank math that runs is the reference's own.

Two reference quirks the harness has to absorb:

* ``hungarian_tracker.py:268`` reads ``memory_bank.exist_reid_embeds`` as a
  property while ``memory_bank.py:105`` defines it as a method taking
  ``frame_id`` (which its body never uses — the use sites are commented
  out). A subclass exposes the method as a property.
* ``Tracklet.__init__`` allocates placeholder embeds with device='cuda'
  (memory_bank.py:17-19); ``torch.zeros`` is wrapped to drop the kwarg.

Per VERDICT r3 item 4: identical track assignments on a synthetic multi-
frame sequence plus identical memory-bank fused embeddings across the
momentum and similarity-guided fusion modes (greedy match resolution — the
reference's; our Hungarian mode is a documented deviation).
"""

import importlib.util
import sys
import types

import numpy as np
import pytest

REF_TRACKER_DIR = "/root/reference/downstream/OVIS/ctvis/modeling/tracker"


@pytest.fixture(scope="module")
def ref_tracker():
    torch = pytest.importorskip("torch")
    import os

    if not os.path.isdir(REF_TRACKER_DIR):
        pytest.skip("reference tree not available")

    added = []

    def stub(name, **attrs):
        m = types.ModuleType(name)
        for k, v in attrs.items():
            setattr(m, k, v)
        if name not in sys.modules:
            sys.modules[name] = m
            added.append(name)
        return m

    class _Registry:
        def register(self):
            return lambda cls: cls

    stub("detectron2")
    stub("detectron2.config", configurable=lambda init: init)
    stub("online_vis")
    stub("online_vis.utils", mask_nms=lambda *a, **k: None)

    pkg = stub("refovis_tracker")
    pkg.__path__ = [REF_TRACKER_DIR]
    stub("refovis_tracker.simple_tracker", TRACKER_REGISTRY=_Registry())

    def load(modname, filename):
        spec = importlib.util.spec_from_file_location(
            modname, f"{REF_TRACKER_DIR}/{filename}"
        )
        m = importlib.util.module_from_spec(spec)
        sys.modules[modname] = m
        added.append(modname)
        spec.loader.exec_module(m)
        return m

    mb_mod = load("refovis_tracker.memory_bank", "memory_bank.py")
    ht_mod = load("refovis_tracker.hungarian_tracker", "hungarian_tracker.py")

    # cuda -> cpu: placeholder zeros in Tracklet.__init__ and the tracker's
    # device property (hungarian_tracker.py:83-85)
    real_zeros = torch.zeros

    def cpu_zeros(*a, **k):
        k.pop("device", None)
        return real_zeros(*a, **k)

    mb_mod.torch = types.SimpleNamespace(**{
        **{n: getattr(torch, n) for n in dir(torch) if not n.startswith("_")},
        "zeros": cpu_zeros,
    })
    ht_mod.HungarianTracker.device = property(
        lambda self: torch.device("cpu")
    )

    class MemoryBankShim(mb_mod.MemoryBank):
        @property
        def exist_reid_embeds(self):  # the property/method mismatch shim
            return mb_mod.MemoryBank.exist_reid_embeds(self, 0)

    ht_mod.MemoryBank = MemoryBankShim

    yield ht_mod

    for name in added:
        sys.modules.pop(name, None)


def _synthetic_sequence(rng, d=8, n_frames=5):
    """Detections per frame: noisy views of 4 prototypes, appearing and
    disappearing, scores descending within each frame (the order
    ``inference`` feeds ``track``), one sub-init-threshold detection."""
    protos = rng.standard_normal((4, d)).astype(np.float32) * 2.0
    frames = []
    plan = [  # (prototype index, score) per detection, score-sorted
        [(0, 0.9), (1, 0.7), (2, 0.4)],
        [(1, 0.85), (0, 0.6), (3, 0.3), (2, 0.005)],  # proto 2 below init
        [(0, 0.8), (3, 0.75), (1, 0.5)],
        [(3, 0.95), (0, 0.55), (2, 0.35)],
        [(2, 0.65), (1, 0.6), (0, 0.45)],
    ][:n_frames]
    for spec in plan:
        emb = np.stack([
            protos[p] + 0.05 * rng.standard_normal(d).astype(np.float32)
            for p, _ in spec
        ])
        scores = np.asarray([s for _, s in spec], np.float32)
        frames.append((emb, scores))
    return frames


@pytest.mark.parametrize("embed_type", ["momentum", "similarity_guided"])
@pytest.mark.parametrize("match_metric", ["bisoftmax", "cosine"])
def test_hungarian_tracker_matches_reference(ref_tracker, embed_type,
                                             match_metric):
    import torch

    from streamformer_tpu.downstream.segmentor import HungarianTracker

    kw = dict(
        match_metric=match_metric,
        match_score_thr=0.2,
        init_score_thr=0.01,
        frame_weight=True,
        num_dead_frames=10,
        embed_type=embed_type,
        maximum_cache=10,
    )
    ref = ref_tracker.HungarianTracker(
        num_classes=4, temporal_score_type="mean", inference_select_thr=0.01,
        mask_nms_thr=0.6, **kw,
    )
    ref.reset()
    mine = HungarianTracker(match_type="greedy", **kw)

    rng = np.random.default_rng(3)
    frames = _synthetic_sequence(rng)
    h = w = 4  # tiny dummy masks/logits: track() carries them, unused math
    for frame_id, (emb, scores) in enumerate(frames):
        n = len(emb)
        t_scores = torch.from_numpy(scores)
        t_logits = torch.from_numpy(
            np.tile(scores[:, None], (1, 5)).astype(np.float32)
        )
        t_masks = torch.zeros((n, h, w))
        t_embeds = torch.from_numpy(emb)
        t_queries = torch.zeros((n, 4))
        ref_ids, _, _, _ = ref.track(
            t_scores, t_logits, t_masks, t_embeds, t_queries, frame_id
        )
        # reference drops sub-init unmatched detections from its return
        # (ids > -1 filter, hungarian_tracker.py:321-327); ours returns -1
        # in place — compare the kept mapping
        my_ids = mine.update(emb, scores, frame_id)
        kept = [i for i in my_ids if i >= 0]
        assert kept == ref_ids.tolist(), (
            f"frame {frame_id}: {my_ids} vs {ref_ids.tolist()}"
        )

    # memory banks fused identically, track by track
    assert set(mine.tracklets) == set(
        int(k) for k in ref.memory_bank.tracklets
    )
    for tid, tr in mine.tracklets.items():
        ref_tr = ref.memory_bank.tracklets[tid]
        assert tr.exist_frames == ref_tr.exist_frames
        np.testing.assert_allclose(
            tr.momentum_embed, ref_tr.last_reid_embed.numpy(),
            rtol=1e-5, atol=1e-6,
        )
        np.testing.assert_allclose(
            tr.sim_guided_embed,
            ref_tr.similarity_guided_reid_embed.numpy(),
            rtol=1e-5, atol=1e-6,
        )
        # the association embedding the bank would serve next frame
        ref_ids_t, ref_embeds, ref_exist = ref.memory_bank.exist_reid_embeds
        bank_ids, bank_embeds, bank_exist = mine._bank()
        order = {int(i): k for k, i in enumerate(ref_ids_t.tolist())}
        for bid, be, bx in zip(bank_ids, bank_embeds, bank_exist):
            k = order[int(bid)]
            np.testing.assert_allclose(
                be, ref_embeds[k].numpy(), rtol=1e-5, atol=1e-6
            )
            assert int(bx) == int(ref_exist[k])


def test_retirement_timeline_matches_reference(ref_tracker):
    """A track last seen at frame f must stay matchable exactly as long as
    the reference keeps it (clean AFTER update with cur=f, memory_bank
    clean_dead_tracklets) — the pre-clean in our update() shifts by one
    frame to compensate."""
    import torch

    from streamformer_tpu.downstream.segmentor import HungarianTracker

    kw = dict(match_metric="cosine", match_score_thr=0.2,
              init_score_thr=0.01, frame_weight=False, num_dead_frames=2,
              embed_type="last", maximum_cache=10)
    ref = ref_tracker.HungarianTracker(
        num_classes=4, temporal_score_type="mean", inference_select_thr=0.01,
        mask_nms_thr=0.6, **kw)
    ref.reset()
    mine = HungarianTracker(match_type="greedy", **kw)

    rng = np.random.default_rng(0)
    e0 = rng.standard_normal((1, 8)).astype(np.float32)
    e1 = rng.standard_normal((1, 8)).astype(np.float32)

    def step(tracker_ref, emb, fid):
        n = len(emb)
        return tracker_ref.track(
            torch.full((n,), 0.9), torch.zeros((n, 5)),
            torch.zeros((n, 2, 2)), torch.from_numpy(emb),
            torch.zeros((n, 4)), fid,
        )[0].tolist()

    # frame 0: track 0 appears; frames 1..3: only a distinct object; at
    # frame 3 the reference has already retired track 0 (3 - 0 > 2 after
    # frame-3's clean ran at frame 2... exercised via re-appearance below)
    for fid, emb in [(0, e0), (1, e1), (2, e1), (3, e1)]:
        r = step(ref, emb, fid)
        m = [i for i in mine.update(emb, np.asarray([0.9], np.float32), fid)
             if i >= 0]
        assert m == r, (fid, m, r)
    # frame 4: e0 again — both must agree on whether track 0 survived
    r = step(ref, e0, 4)
    m = [i for i in mine.update(e0, np.asarray([0.9], np.float32), 4)
         if i >= 0]
    assert m == r, (m, r)
    assert set(mine.tracklets) == set(
        int(k) for k in ref.memory_bank.tracklets
    )


def test_frame_weight_valid_mean_regime(ref_tracker):
    """The reference scales BELOW-threshold candidates by the mean exist of
    the VALID candidates only (exist_frames[valid_indices].mean(),
    hungarian_tracker.py:296-299). A long-lived tracklet whose raw score is
    below the match threshold must not outbid two short-lived valid ones —
    an all-tracklet mean would hand it the match (regression r4)."""
    import torch

    from streamformer_tpu.downstream.segmentor import HungarianTracker

    kw = dict(match_metric="cosine", match_score_thr=0.2,
              init_score_thr=0.01, frame_weight=True, num_dead_frames=10,
              embed_type="last", maximum_cache=10)
    ref = ref_tracker.HungarianTracker(
        num_classes=4, temporal_score_type="mean", inference_select_thr=0.01,
        mask_nms_thr=0.6, **kw)
    ref.reset()
    mine = HungarianTracker(match_type="greedy", **kw)

    eA = np.array([1, 0, 0, 0], np.float32)
    eB = np.array([0, 1, 0, 0], np.float32)
    eC = np.array([0, 0, 1, 0], np.float32)
    # cosine vs the unit bank vectors = exactly (0.3, 0.25, 0.19):
    # A and B valid (>0.2, exist 1 each), C below threshold but exist 5
    probe = np.array([0.3, 0.25, 0.19,
                      np.sqrt(1 - 0.3**2 - 0.25**2 - 0.19**2)], np.float32)

    def step(emb, fid):
        n = len(emb)
        r = ref.track(
            torch.full((n,), 0.9), torch.zeros((n, 5)),
            torch.zeros((n, 2, 2)), torch.from_numpy(emb),
            torch.zeros((n, 4)), fid,
        )[0].tolist()
        m = [i for i in mine.update(emb, np.full(n, 0.9, np.float32), fid)
             if i >= 0]
        assert m == r, (fid, m, r)
        return m

    step(np.stack([eA, eB, eC]), 0)          # tracks 0, 1, 2 born
    for fid in range(1, 5):                   # only C seen: exist 5 vs 1,1
        step(eC[None], fid)
    ids = step(probe[None], 5)
    assert ids == [0], ids  # highest VALID raw score wins, never C
