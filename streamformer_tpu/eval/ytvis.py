"""YTVIS submission export (reference vendored ytvis eval API,
downstream/OVIS/ctvis/data/vis/ytvis_eval.py; AP is computed by CodaLab —
downstream/OVIS/README.md:115-119 — so the deliverable is the results JSON).

Converts per-video tracker outputs into the YTVIS format:
[{video_id, category_id, score, segmentations: [RLE|null per frame]}].
"""

from __future__ import annotations

import json
from typing import Dict, List, Optional

import numpy as np


def mask_to_rle(mask: np.ndarray) -> Dict:
    """Binary (H, W) mask -> uncompressed COCO RLE (column-major counts)."""
    h, w = mask.shape
    flat = np.asarray(mask, bool).T.reshape(-1)  # F-order
    # run lengths starting with the count of 0s
    change = np.flatnonzero(flat[1:] != flat[:-1]) + 1
    bounds = np.concatenate([[0], change, [len(flat)]])
    counts = np.diff(bounds).tolist()
    if flat[0]:  # RLE must start with a zero-run
        counts = [0] + counts
    return {"size": [int(h), int(w)], "counts": counts}


def collect_video_result(
    video_id: int,
    frame_outputs: List[Dict],
    score_threshold: float = 0.05,
) -> List[Dict]:
    """frame_outputs: per frame {"track_ids": [..], "category_ids": [..],
    "scores": [..], "masks": (N, H, W) bool}. Returns YTVIS rows, one per
    track, with per-frame segmentations (null where absent)."""
    num_frames = len(frame_outputs)
    tracks: Dict[int, Dict] = {}
    for t, fo in enumerate(frame_outputs):
        for i, tid in enumerate(fo["track_ids"]):
            tr = tracks.setdefault(
                tid,
                {
                    "video_id": int(video_id),
                    "segmentations": [None] * num_frames,
                    "_scores": [],
                    "_cats": [],
                },
            )
            tr["segmentations"][t] = mask_to_rle(np.asarray(fo["masks"][i]))
            tr["_scores"].append(float(fo["scores"][i]))
            tr["_cats"].append(int(fo["category_ids"][i]))
    rows = []
    for tr in tracks.values():
        score = float(np.mean(tr.pop("_scores")))
        cats = tr.pop("_cats")
        if score < score_threshold:
            continue
        tr["score"] = score
        tr["category_id"] = int(np.bincount(cats).argmax())
        rows.append(tr)
    return rows


def write_results(rows: List[Dict], path: str) -> None:
    with open(path, "w") as f:
        json.dump(rows, f)
