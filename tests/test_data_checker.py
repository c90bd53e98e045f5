"""Data-validation CLI (data/checker.py — the reference's
playground/data_checker.py check/stat/filter operations)."""

import json
import os

import numpy as np
import pytest


def _write_video(path, n=10, h=48, w=64):
    import cv2

    vw = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"MJPG"), 10, (w, h))
    rng = np.random.default_rng(0)
    for _ in range(n):
        vw.write(rng.integers(0, 256, (h, w, 3), dtype=np.uint8))
    vw.release()


@pytest.fixture(scope="module")
def root(tmp_path_factory):
    return tmp_path_factory.mktemp("checker")


def test_metadata_check_finds_missing_and_probes(root):
    from streamformer_tpu.data import checker

    good = str(root / "ok.avi")
    _write_video(good)
    cls_anno = str(root / "cls.csv")
    with open(cls_anno, "w") as f:
        f.write(f"{good} 0\n")
        f.write(f"{root / 'missing.avi'} 1\n")
    meta = str(root / "meta.yaml")
    with open(meta, "w") as f:
        json.dump(
            {"datasets": {"Kinetics": {"train": {
                "data_path": cls_anno, "split": " ",
                "num_frames": 4, "short_side_size": 48}}}},
            f,
        )
    n = checker.check_metadata(meta)
    assert n == 1  # exactly the missing video
    # a probe of the existing sample decodes fine; CLI exit code is nonzero
    rc = checker.main(["--metadata", meta, "--probe", "0"])
    assert rc == 1


def test_metadata_check_clean(root):
    from streamformer_tpu.data import checker

    good = str(root / "ok2.avi")
    _write_video(good)
    cls_anno = str(root / "clean.csv")
    with open(cls_anno, "w") as f:
        f.write(f"{good} 0\n")
    meta = str(root / "clean.yaml")
    with open(meta, "w") as f:
        json.dump(
            {"datasets": {"Kinetics": {"train": {
                "data_path": cls_anno, "split": " ",
                "num_frames": 4, "short_side_size": 48}}}},
            f,
        )
    assert checker.check_metadata(meta, probe=2) == 0
    assert checker.main(["--metadata", meta]) == 0


def test_llava_list_check_stat_filter(root):
    from streamformer_tpu.data import checker

    vid = str(root / "qa.avi")
    _write_video(vid)
    rows = [
        {  # clean row
            "video": os.path.basename(vid),
            "data_source": "demo",
            "conversations": [
                {"from": "human", "value": "<video>\nwhat happens?"},
                {"from": "gpt", "value": "a test pattern"},
            ],
        },
        {  # missing media -> dropped by filter
            "video": "nope.mp4",
            "data_source": "demo",
            "conversations": [
                {"from": "human", "value": "<video>\nand this?"},
                {"from": "gpt", "value": "nothing"},
            ],
        },
        {  # structure problems: wrong turn order + placeholder in turn 2
            "video": os.path.basename(vid),
            "conversations": [
                {"from": "gpt", "value": "i speak first"},
                {"from": "human", "value": "<video> late placeholder"},
            ],
        },
    ]
    data = str(root / "list.json")
    with open(data, "w") as f:
        json.dump(rows, f)

    n, kept = checker.check_data_list(
        rows, video_root=str(root), op="check"
    )
    assert n >= 3  # 1 missing + >=2 structure problems
    assert len(kept) == 2  # only the missing-media row excluded

    out = str(root / "cleaned.json")
    rc = checker.main([
        "--data", data, "--video_root", str(root),
        "--op", "filter", "--out", out,
    ])
    assert rc == 1
    with open(out) as f:
        cleaned = json.load(f)
    assert len(cleaned) == 2

    # jsonl + stat path
    datal = str(root / "list.jsonl")
    with open(datal, "w") as f:
        for r in rows[:2]:
            f.write(json.dumps(r) + "\n")
    rows2 = checker._load_list(datal)
    assert len(rows2) == 2
    n2, _ = checker.check_data_list(rows2, video_root=str(root), op="stat")
    assert n2 == 1  # stat still counts missing media, skips structure
