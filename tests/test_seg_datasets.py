"""VIS / ReferVOS dataset plumbing: rasterization, negative sampling,
pseudo-video, mask/frames synchronization."""

import json
import os

import numpy as np
import pytest

from streamformer_tpu.data import seg_datasets as S


def test_polygons_to_mask_square():
    mask = S.polygons_to_mask([[2, 2, 8, 2, 8, 8, 2, 8]], 10, 12)
    assert mask.shape == (10, 12)
    assert mask[5, 5] and not mask[0, 0]
    assert 30 <= mask.sum() <= 60


def test_rle_roundtrip():
    m = np.zeros((4, 5), bool)
    m[1:3, 2:4] = True
    # build F-order uncompressed RLE
    flat = m.T.reshape(-1)
    counts, run, val = [], 0, False
    for x in flat:
        if x == val:
            run += 1
        else:
            counts.append(run)
            run = 1
            val = x
    counts.append(run)
    got = S.rle_to_mask({"counts": counts, "size": [4, 5]}, 4, 5)
    np.testing.assert_array_equal(got, m)


def test_negative_sampling_small_vocab():
    mask = np.zeros((2, 4, 4), np.int64)
    mask[0, 0, 0] = 3
    sel, remapped = S.sample_negatives_and_remap(mask, num_classes=10,
                                                 max_classes=100)
    assert (sel[:10] == np.arange(10)).all()
    assert remapped[0, 0, 0] == 3
    assert remapped[1, 0, 0] == -1  # background ignored


def test_negative_sampling_large_vocab():
    mask = np.zeros((1, 4, 4), np.int64)
    mask[0, 0, 0] = 500
    mask[0, 1, 1] = 700
    sel, remapped = S.sample_negatives_and_remap(mask, num_classes=1000,
                                                 max_classes=100)
    assert len(sel) == 100
    assert sel[0] == 500 and sel[1] == 700
    assert remapped[0, 0, 0] == 0 and remapped[0, 1, 1] == 1
    assert remapped[0, 2, 2] == -1


def test_pseudo_video_rotation(rng):
    img = rng.integers(0, 255, (32, 40, 3), dtype=np.uint8)
    frames, mats = S.random_rotation_clip(img, 4)
    assert frames.shape == (4, 32, 40, 3)
    assert len(mats) == 4
    assert not (frames[0] == frames[1]).all()


@pytest.fixture()
def ytvis_root(tmp_path, rng):
    import cv2

    frames_dir = tmp_path / "frames"
    frames_dir.mkdir()
    file_names = []
    for i in range(6):
        p = f"v0/{i:05d}.jpg"
        (frames_dir / "v0").mkdir(exist_ok=True)
        cv2.imwrite(str(frames_dir / p),
                    rng.integers(0, 255, (48, 64, 3), dtype=np.uint8))
        file_names.append(p)
    anno = {
        "videos": [{"id": 1, "file_names": file_names, "height": 48, "width": 64}],
        "annotations": [
            {
                "video_id": 1,
                "category_id": 2,
                "segmentations": [[[10, 10, 30, 10, 30, 30, 10, 30]]] * 6,
            }
        ],
        "categories": [{"id": 1, "name": "cat"}, {"id": 2, "name": "dog"}],
    }
    ap = tmp_path / "ytvis.json"
    with open(ap, "w") as f:
        json.dump(anno, f)
    return str(ap), str(frames_dir)


def test_vis_dataset(ytvis_root):
    anno, prefix = ytvis_root
    ds = S.VISDataset(anno, prefix=prefix, num_frames=4, crop_size=32,
                      mask_size=(32, 32))
    assert len(ds) == 1
    s = ds[0]
    ti = s["task_input"]
    assert ti["frames"].shape == (4, 32, 32, 3)
    assert ti["mask_target"].shape == (4, 32, 32)
    # instance of class 2 remapped (vocab <= 100: identity mapping)
    assert (ti["mask_target"] == 2).any()
    assert (ti["mask_target"] == -1).any()  # background ignored
