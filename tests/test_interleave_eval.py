"""Interleave scorer parity vs the IMPORTED reference evaluator
(downstream/VideoQA/llava/eval/evaluate_interleave.py) — the same
oracle pattern as test_tracker_parity.py: the reference module (and the
py-rouge package it calls) is loaded directly and our original
implementation must reproduce its numbers exactly."""

import importlib.util
import json
import os
import subprocess
import sys

import numpy as np
import pytest

from streamformer_tpu.eval import interleave as il

REF = "/root/reference/downstream/VideoQA/llava/eval/evaluate_interleave.py"


@pytest.fixture(scope="module")
def ref_eval():
    if not os.path.exists(REF):
        pytest.skip("reference tree unavailable")
    spec = importlib.util.spec_from_file_location("ref_interleave", REF)
    mod = importlib.util.module_from_spec(spec)
    try:
        spec.loader.exec_module(mod)
    except Exception as e:  # rouge/sklearn missing in some envs
        pytest.skip(f"reference evaluator unimportable: {e}")
    return mod.Eval()


OPEN_ENDED = [
    # (pred, gt) covering: multi-sentence union-LCS, repeated words
    # (unique-word counting), punctuation stripping, numerals with commas,
    # empty-pred zero, truncation-irrelevant shorts
    ("The cat sat on the mat.", "A cat sat on a mat."),
    ("the bird flies. the bird lands on a tree.",
     "a bird flies over the tree. then it lands."),
    ("left image shows 1,234 apples; right shows none",
     "the left image has 1,234 apples and the right has zero"),
    ("the the the repeated repeated words", "the repeated words words"),
    ("Two dogs are running through SNOW!",
     "two dogs run through the snow."),
    ("", "a non-empty reference."),
    ("an answer with (parens) and [brackets] and a trailing period.",
     "answer with parens and brackets."),
    ("word", "word"),
]

MULTICHOICE = [
    ("b", "b"),
    ("B: the left scene", "b"),
    ("the answer is: b", "b"),
    ("(a)", "a"),
    ("c", "b"),
    ("e: because the object moved", "e"),
    ("not a letter", "a"),
]


def test_rouge_l_matches_reference_package(ref_eval):
    rows = [
        {"sample_id": i, "gt_response": gt, "pred_response": pr}
        for i, (pr, gt) in enumerate(OPEN_ENDED)
    ]
    ref_res, ref_list = ref_eval.evaluate_rouge([dict(r) for r in rows])
    our_res, our_list = il.score_open_ended(rows)
    assert len(our_list) == len(ref_list)
    for a, b in zip(our_list, ref_list):
        assert a["id"] == b["id"]
        np.testing.assert_allclose(
            float(a["score"]), float(b["score"]), atol=1e-3
        )
    np.testing.assert_allclose(
        our_res["Rouge-L f"], ref_res["Rouge-L f"], atol=1e-6
    )


def test_multichoice_matches_reference(ref_eval):
    rows = [
        {"sample_id": i, "gt_response": gt, "pred_response": pr}
        for i, (pr, gt) in enumerate(MULTICHOICE)
    ]
    # the reference mutates samples in place: give it copies
    ref_res, ref_list = ref_eval.evaluate_multichoice(
        [dict(r) for r in rows]
    )
    our_res, our_list = il.score_multichoice(rows)
    assert [e["score"] for e in our_list] == [e["score"] for e in ref_list]
    np.testing.assert_allclose(our_res["Accuracy"], ref_res["Accuracy"])


def test_normalize_matches_reference(ref_eval):
    texts = [pr for pr, _ in OPEN_ENDED] + [gt for _, gt in OPEN_ENDED] + [
        "A,B;C/D[E]F\"G{H}I(J)K=L+M\\N_O-P>Q<R@S`T,U?V!W",
        "  spaced   out\twith\ttabs\n and newlines ",
        "'single quoted' and \"double quoted\"",
        "1,000,000 dollars.",
    ]
    for t in texts:
        assert il.normalize_answer(t) == ref_eval.process(t), t


def test_cli_writes_reference_schema(tmp_path):
    rows = [
        {"sample_id": f"s{i}", "dataset": "Spot-the-Diff",
         "question_type": "open-ended",
         "gt_response": gt, "pred_response": pr}
        for i, (pr, gt) in enumerate(OPEN_ENDED[:4])
    ] + [
        {"sample_id": f"m{i}", "dataset": "RAVEN",
         "question_type": "multi-choice",
         "gt_response": gt, "pred_response": pr}
        for i, (pr, gt) in enumerate(MULTICHOICE)
    ]
    rd = tmp_path / "res"
    rd.mkdir()
    with open(rd / "result.jsonl", "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    assert il.main(["--result-dir", str(rd)]) == 0
    with open(rd / "eval_dataset.json") as f:
        per_ds = json.load(f)
    assert set(per_ds) == {"Spot-the-Diff", "RAVEN"}
    assert "Rouge-L f" in per_ds["Spot-the-Diff"]
    assert "Accuracy" in per_ds["RAVEN"]
    with open(rd / "eval_dataset_details.json") as f:
        detail = json.load(f)
    assert len(detail["RAVEN"]) == len(MULTICHOICE)
    with open(rd / "eval_category.json") as f:
        cats = json.load(f)
    # category means over member datasets (reference tail aggregation)
    np.testing.assert_allclose(
        cats["spot_the_diff"], per_ds["Spot-the-Diff"]["Rouge-L f"]
    )
    np.testing.assert_allclose(cats["puzzle"], per_ds["RAVEN"]["Accuracy"])
