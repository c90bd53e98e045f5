"""End-to-end data pipeline: synthetic videos -> datasets -> sampler ->
loader -> multitask train steps (the run_finetuning_multi_task path)."""

import json
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from streamformer_tpu.config import StreamformerConfig
from streamformer_tpu.models.multitask import MultitaskModel
from streamformer_tpu.models.text_encoder import SiglipTextConfig

CFG = StreamformerConfig(
    image_size=32,
    patch_size=16,
    num_frames=4,
    hidden_size=32,
    num_hidden_layers=1,
    num_attention_heads=4,
    intermediate_size=64,
    dtype="float32",
    use_pallas=False,
)
TEXT_CFG = SiglipTextConfig(
    vocab_size=64,
    hidden_size=32,
    num_hidden_layers=1,
    num_attention_heads=4,
    intermediate_size=64,
    max_position_embeddings=8,
)


def _write_video(path, n=12, h=48, w=64):
    import cv2

    vw = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"MJPG"), 10, (w, h))
    rng = np.random.default_rng(abs(hash(path)) % 2**32)
    for _ in range(n):
        vw.write(rng.integers(0, 256, (h, w, 3), dtype=np.uint8))
    vw.release()


@pytest.fixture(scope="module")
def data_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("videos")
    vids = []
    for i in range(6):
        p = str(root / f"v{i}.avi")
        _write_video(p)
        vids.append(p)

    # classification anno: "path label"
    cls_anno = str(root / "cls.csv")
    with open(cls_anno, "w") as f:
        for i, v in enumerate(vids[:4]):
            f.write(f"{v} {i % 2}\n")

    # grounding anno: json rows
    grd_anno = str(root / "grd.json")
    rows = [
        {"video": v, "start": 0.2, "end": 0.8, "duration": 1.2,
         "sentence": f"clip {i}"}
        for i, v in enumerate(vids[4:])
    ]
    with open(grd_anno, "w") as f:
        json.dump(rows, f)
    return {"cls": cls_anno, "grd": grd_anno}


def test_build_and_train(data_root):
    from streamformer_tpu.data.build import build_multi_task_dataset
    from streamformer_tpu.data.samplers import DistributedBatchTaskUniqueSampler
    from streamformer_tpu.data.collate import MultitaskLoader
    from streamformer_tpu.train.trainer import MultitaskTrainer, TrainState
    import optax

    metadata = {
        "datasets": {
            "Kinetics": {
                "train": {
                    "mode": "train",
                    "data_path": data_root["cls"],
                    "split": " ",
                    "num_frames": 4,
                    "short_side_size": 48,
                }
            },
            "TaskGrounding": {
                "train": {
                    "mode": "train",
                    "data_path": data_root["grd"],
                    "num_frames": 4,
                    "short_side_size": 48,
                }
            },
        }
    }
    train_ds, eval_ds, mtc = build_multi_task_dataset(metadata)
    assert len(train_ds) == 6
    assert set(mtc) == {"Kinetics", "TaskGrounding"}

    model = MultitaskModel(CFG, {"Kinetics": {"label2id": {"a": 0, "b": 1}}},
                           text_cfg=TEXT_CFG)
    # tiny text cfg has no real tokenizer vocab: stub tokenize
    model.tokenize = lambda texts, max_length=8: np.ones(
        (len(texts), 8), np.int32
    )
    model.prepare_for_multi_tasks()
    assert model.label_embeddings["Kinetics"].shape == (2, 32)

    sampler = DistributedBatchTaskUniqueSampler(
        train_ds.task_specs(), batch_size=2
    )
    loader = MultitaskLoader(
        train_ds, sampler, model, crop_size=32, num_workers=2
    )

    tx = optax.adamw(1e-4)
    trainer = MultitaskTrainer(model, tx, donate_state=False)
    state = TrainState.create(jax.tree.map(jnp.copy, model.params), tx)

    seen = set()
    steps = 0
    for task, batch in loader:
        assert batch["pixel_values"].shape[1:] == (4, 3, 32, 32)
        fn = trainer.step_fn(task, apply_update=True)
        state, out = fn(state, batch["pixel_values"], batch["task_input"],
                        jax.random.PRNGKey(steps))
        assert np.isfinite(float(out["loss"]))
        seen.add(task)
        steps += 1
    assert steps >= 2
    assert seen == {"Kinetics", "TaskGrounding"}


def test_video_reader_and_samplers(data_root):
    from streamformer_tpu.data import video_io

    # reuse one of the cls videos
    with open(data_root["cls"]) as f:
        path = f.readline().split(" ")[0]
    vr = video_io.VideoReader(path)
    assert len(vr) == 12
    batch = vr.get_batch([0, 5, 11])
    assert batch.shape == (3, 48, 64, 3)
    vr.close()

    # failed read (index past EOF) salvages the last decoded frame — even
    # when the request list is unsorted, so "last" is in SORTED order
    vr = video_io.VideoReader(path)
    b = vr.get_batch([50, 3])
    assert (b[0] == b[1]).all() and b[1].any()
    vr.close()

    idx = video_io.sparse_sample_indices(100, 8, "validation")
    assert len(idx) == 8 and (np.diff(idx) > 0).all()
    idx_t0 = video_io.sparse_sample_indices(
        100, 8, "test", test_chunk=0, test_num_segment=4
    )
    idx_t3 = video_io.sparse_sample_indices(
        100, 8, "test", test_chunk=3, test_num_segment=4
    )
    assert (idx_t3 >= idx_t0).all() and (idx_t3 > idx_t0).any()

    r = video_io.resample_to_fps(300, native_fps=30.0, target_fps=24.0)
    assert len(r) == 240


def test_run_cli_end_to_end_on_mesh(data_root, tmp_path, monkeypatch):
    """Drive the real training entry point (train/run.py main) over a
    (data=4, model=2) mesh on the virtual CPU devices — the reference's
    torchrun path (run_finetuning_multi_task.py:229-584) as one CLI."""
    import sys
    import yaml

    from streamformer_tpu.train import run as run_mod

    meta = {
        "datasets": {
            "Kinetics": {
                "train": {
                    "mode": "train",
                    "data_path": data_root["cls"],
                    "split": " ",
                    "num_frames": 4,
                    "short_side_size": 48,
                }
            },
        }
    }
    meta_path = str(tmp_path / "meta.yaml")
    with open(meta_path, "w") as f:
        yaml.safe_dump(meta, f)
    out_dir = str(tmp_path / "out")

    argv = [
        "run",
        "--metadata", meta_path,
        "--output_dir", out_dir,
        "--batch_size", "1",
        "--epochs", "1",
        "--num_frames", "4",
        "--input_size", "32",
        "--hidden_size", "32",
        "--num_layers", "1",
        "--num_heads", "4",
        "--intermediate_size", "64",
        "--text_layers", "1",
        "--lr", "1e-4",
        "--warmup_epochs", "0",
        "--num_workers", "2",
        "--dp", "4",
        "--mp", "2",
    ]
    monkeypatch.setattr(sys, "argv", argv)
    run_mod.main()

    # checkpoint written + log line emitted
    assert any(p.startswith("checkpoint") for p in os.listdir(out_dir))
    with open(os.path.join(out_dir, "log.txt")) as f:
        line = json.loads(f.readline())
    assert np.isfinite(line.get("loss", np.nan))


def test_windowed_tal_end_to_end(data_root, tmp_path):
    """Full-video windowed TAL (VERDICT r1 gap #4): TALWindowedDataset ->
    fake-batch sampler -> rasterized ±1/0 targets -> naive-localization
    head through the real trainer."""
    import optax

    from streamformer_tpu.data.build import build_multi_task_dataset
    from streamformer_tpu.data.collate import MultitaskLoader
    from streamformer_tpu.data.samplers import DistributedBatchTaskUniqueSampler
    from streamformer_tpu.train.trainer import MultitaskTrainer, TrainState

    # synthetic TAL annotation over the existing videos (12 frames @10fps)
    with open(data_root["cls"]) as f:
        vids = [l.split(" ")[0] for l in f.readlines()][:2]
    anno = str(tmp_path / "tal.json")
    rows = [
        {"video": v, "segments": [[0.2, 0.6]], "labels": ["run"]}
        for v in vids
    ]
    with open(anno, "w") as f:
        json.dump(rows, f)
    l2i = str(tmp_path / "l2i.json")
    with open(l2i, "w") as f:
        json.dump({"run": 0, "jump": 1}, f)

    metadata = {
        "datasets": {
            "THUMOS14": {
                "train": {
                    "mode": "train",
                    "data_path": anno,
                    "label2id_path": l2i,
                    "window_size": 8,
                    "num_frames": 4,
                    "short_side_size": 48,
                }
            }
        }
    }
    train_ds, _, mtc = build_multi_task_dataset(metadata)
    assert len(train_ds) == 2

    model = MultitaskModel(CFG, mtc, text_cfg=TEXT_CFG)
    model.tokenize = lambda texts, max_length=8: np.ones(
        (len(texts), 8), np.int32
    )
    model.prepare_for_multi_tasks()
    assert model.label_embeddings["THUMOS14"].shape == (2, CFG.hidden_size)

    sample = train_ds[0]
    ti = sample["task_input"]
    assert ti["frames"].shape[0] == 8  # window_size frames
    assert ti["gt_segments"].shape[1] == 2 and len(ti["gt_labels"]) == 1

    sampler = DistributedBatchTaskUniqueSampler(
        train_ds.task_specs(), batch_size=2
    )
    loader = MultitaskLoader(train_ds, sampler, model, crop_size=32,
                             num_workers=1)
    tx = optax.adamw(1e-4)
    trainer = MultitaskTrainer(model, tx, donate_state=False)
    state = TrainState.create(jax.tree.map(jnp.copy, model.params), tx)
    steps = 0
    for task, batch in loader:
        assert task == "THUMOS14"
        # fake batch: one real video reshaped into W/T clips
        assert batch["pixel_values"].shape == (2, 4, 3, 32, 32)
        assert batch["task_input"]["target_labels"].shape == (1, 8, 2)
        tgt = np.asarray(batch["task_input"]["target_labels"])
        assert set(np.unique(tgt)) <= {-1.0, 0.0, 1.0}
        assert (tgt == 1).any(), "segment must rasterize to positives"
        fn = trainer.step_fn(task, apply_update=True)
        state, out = fn(state, batch["pixel_values"],
                        batch["task_input"], jax.random.PRNGKey(steps))
        assert np.isfinite(float(out["loss"]))
        steps += 1
    assert steps == 2  # one fake batch per video


def test_dense_sampling_dataset(data_root):
    """Dense-sampling class (VERDICT r1 gap #5): reference kinetics.py:36 /
    ssv2.py:417 stride-based sampling."""
    from streamformer_tpu.data import video_io
    from streamformer_tpu.data.datasets import VideoClsDenseDataset

    ds = VideoClsDenseDataset(
        anno_path=data_root["cls"], task_name="Kinetics", split=" ",
        mode="validation", clip_len=4, sampling_rate=2, short_side_size=48,
    )
    s = ds[0]
    assert s["task_input"]["frames"].shape == (4, 48, 64, 3)

    # index parity with the reference scheme: centered window, stride r
    idx = video_io.dense_sample_indices(100, 8, 4, mode="validation")
    span = 8 * 4
    start = (100 - span) // 2
    np.testing.assert_array_equal(idx, start + np.arange(0, span, 4))
    # short video: clamp into range
    idx = video_io.dense_sample_indices(5, 8, 4, mode="train")
    assert idx.max() <= 4 and len(idx) == 8


def test_loader_start_step_skips_without_decoding(data_root):
    """Mid-epoch resume: set_epoch(e, start_step=k) must skip the first k
    sampler batches WITHOUT fetching them (no wasted decode) while keeping
    absolute step numbering, so the fold_in(aug_seed, step) augmentation
    stream matches an uninterrupted epoch."""
    from streamformer_tpu.data.build import build_multi_task_dataset
    from streamformer_tpu.data.samplers import DistributedBatchTaskUniqueSampler
    from streamformer_tpu.data.collate import MultitaskLoader

    metadata = {
        "datasets": {
            "Kinetics": {
                "train": {
                    # validation-mode frame sampling: decode-time frame
                    # choice is deterministic, so full-vs-resumed batches
                    # are comparable pixel-for-pixel (train-mode TSN picks
                    # random in-segment frames per call, in the reference
                    # too — that part is not resume-reproducible there
                    # either); the device-side train augs ARE deterministic
                    # per absolute step and are what this test pins
                    "mode": "validation",
                    "data_path": data_root["cls"],
                    "split": " ",
                    "num_frames": 4,
                    "short_side_size": 48,
                }
            },
        }
    }
    inner_ds, _, _ = build_multi_task_dataset(metadata)
    fetched = []

    class _Recording:
        def __getitem__(self, i):
            fetched.append(i)
            return inner_ds[i]

        def __getattr__(self, a):
            return getattr(inner_ds, a)

        def __len__(self):
            return len(inner_ds)

    train_ds = _Recording()

    model = MultitaskModel(CFG, {"Kinetics": {"label2id": {"a": 0, "b": 1}}},
                           text_cfg=TEXT_CFG)
    model.tokenize = lambda texts, max_length=8: np.ones(
        (len(texts), 8), np.int32
    )
    model.prepare_for_multi_tasks()
    sampler = DistributedBatchTaskUniqueSampler(
        train_ds.task_specs(), batch_size=2
    )

    def batches(start_step):
        loader = MultitaskLoader(train_ds, sampler, model, crop_size=32,
                                 num_workers=1, prefetch=0)
        loader.set_epoch(0, start_step=start_step)
        return [(t, np.asarray(b["pixel_values"])) for t, b in loader]

    full = batches(0)
    n_fetch_full = len(fetched)
    fetched.clear()
    tail = batches(1)
    assert len(tail) == len(full) - 1
    assert len(fetched) == n_fetch_full - 2  # skipped batch never decoded
    for (t_f, px_f), (t_t, px_t) in zip(full[1:], tail):
        assert t_f == t_t
        np.testing.assert_array_equal(px_f, px_t)  # same augs: absolute step

    # all-PAD sampler batches are dropped before the trainer ever sees
    # them, so they must not consume the resume offset either: the trainer
    # checkpoints its count of CONSUMED batches, and start_step=k must skip
    # exactly the first k batches the trainer consumed last time
    from streamformer_tpu.data.samplers import PAD_INDEX
    from streamformer_tpu.data.collate import MultitaskLoader

    class _PadInjecting:
        """Yields one all-PAD batch, then the real sampler's batches."""

        def __iter__(self):
            yield [PAD_INDEX, PAD_INDEX]
            yield from sampler

        def __getattr__(self, a):
            return getattr(sampler, a)

    def batches_padded(start_step):
        loader = MultitaskLoader(train_ds, _PadInjecting(), model,
                                 crop_size=32, num_workers=1, prefetch=0)
        loader.set_epoch(0, start_step=start_step)
        return [(t, np.asarray(b["pixel_values"])) for t, b in loader]

    full_p = batches_padded(0)
    assert len(full_p) == len(full)  # pad batch dropped, none consumed
    tail_p = batches_padded(1)  # must skip the first REAL batch
    assert len(tail_p) == len(full_p) - 1
    for (t_f, px_f), (t_t, px_t) in zip(full_p[1:], tail_p):
        assert t_f == t_t
        np.testing.assert_array_equal(px_f, px_t)


def test_label2id_remaps_noncontiguous_labels(tmp_path):
    """Classification labels pass through label2id like the reference
    (kinetics_sparse.py:194-195) — raw labels {3, 42} must come out as the
    mapped contiguous ids, not index past the head's class table
    (regression r4: raw labels were returned unmapped, and XLA silently
    drops the out-of-bounds one-hot scatter)."""
    from streamformer_tpu.data.datasets import VideoClsSparseDataset

    v = str(tmp_path / "v.avi")
    _write_video(v, n=8)
    anno = str(tmp_path / "a.csv")
    with open(anno, "w") as f:
        f.write(f"{v} 42\n{v} 3\n")
    ds = VideoClsSparseDataset(anno, clip_len=4, short_side_size=48,
                               label2id={"3": 0, "42": 1})
    assert int(ds[0]["task_input"]["label"]) == 1
    assert int(ds[1]["task_input"]["label"]) == 0
    # without a mapping the raw label passes through (small local runs)
    ds2 = VideoClsSparseDataset(anno, clip_len=4, short_side_size=48)
    assert int(ds2[0]["task_input"]["label"]) == 42


def test_multiview_test_crops_differ(data_root):
    """test_num_crop views must be DIFFERENT square crops along the longer
    axis (reference multi-crop protocol) — split_nb used to be emitted but
    never consumed, so all 'crop views' were byte-identical."""
    from streamformer_tpu.data import datasets as D

    ds = D.VideoClsSparseDataset(
        anno_path=data_root["cls"], mode="test", clip_len=2,
        short_side_size=48, test_num_segment=1, test_num_crop=3,
    )
    views = [ds[i]["task_input"] for i in range(3)]  # 3 views of video 0
    assert [v["split_nb"] for v in views] == [0, 1, 2]
    assert all(v["sample_idx"] == 0 for v in views)
    for v in views:
        t, h, w, c = v["frames"].shape
        assert h == w == 48  # square: mixed aspect ratios stack cleanly
    assert not np.array_equal(views[0]["frames"], views[1]["frames"])
    assert not np.array_equal(views[1]["frames"], views[2]["frames"])
    # view 0 starts at the left edge, view 2 ends at the right edge of the
    # 48x64 source
    assert not np.array_equal(views[0]["frames"], views[2]["frames"])


def test_tal_short_segment_snaps_to_nearest_frame(tmp_path):
    """An action shorter than the window sampling stride must still yield
    a gt segment (snapped to the nearest sampled frame) — dropping it
    rasterized its frames as background."""
    from streamformer_tpu.data import datasets as D

    p = str(tmp_path / "tal.avi")
    _write_video(p, n=12)  # 10 fps -> 1.2 s
    anno = str(tmp_path / "tal.json")
    with open(anno, "w") as f:
        json.dump([{"video": p, "segments": [[0.45, 0.55]],
                    "labels": [0]}], f)
    ds = D.TALWindowedDataset(anno_path=anno, mode="validation",
                              window_size=4, clip_len=4,
                              short_side_size=48, label2id={"0": 0})
    ti = ds[0]["task_input"]
    # sampled times [0, 0.3, 0.7, 1.1]: nothing inside [0.45, 0.55] — the
    # segment snaps to the frame nearest the midpoint 0.5 (frame 2: in
    # binary 0.7 sits a hair closer than 0.3)
    assert ti["gt_segments"].shape == (1, 2)
    np.testing.assert_array_equal(ti["gt_segments"][0], [2.0, 2.0])
    assert list(ti["gt_labels"]) == [0]


def test_val_label2id_reuses_train_mapping(tmp_path):
    """When label2id is derived (no label2id_path), the validation split
    must REUSE the train mapping — deriving it from the val anno remaps
    every class when the val split misses a label."""
    from streamformer_tpu.data.build import build_multi_task_dataset

    root = tmp_path
    vids = []
    for i in range(3):
        p = str(root / f"t{i}.avi")
        _write_video(p, n=4)
        vids.append(p)
    train_anno = str(root / "train.csv")
    with open(train_anno, "w") as f:
        f.write(f"{vids[0]} 3\n{vids[1]} 7\n{vids[2]} 42\n")
    val_anno = str(root / "val.csv")
    with open(val_anno, "w") as f:
        f.write(f"{vids[1]} 7\n{vids[2]} 42\n")  # class 3 missing

    meta = {"datasets": {"Kinetics": {
        "train": {"anno_path": train_anno, "num_frames": 2},
        "validation": {"anno_path": val_anno, "num_frames": 2},
    }}}
    train_union, eval_union, mtc = build_multi_task_dataset(meta)
    l2i = mtc["Kinetics"]["label2id"]
    assert l2i == {"3": 0, "7": 1, "42": 2}
    val_ds = eval_union.datasets[0]
    assert val_ds.label2id == l2i
    # label 7 maps to head row 1 in BOTH splits
    assert int(val_ds[0]["task_input"]["label"]) == 1


def test_prefetch_worker_exits_on_abandoned_iterator():
    """Breaking out of the loader mid-epoch (the trainer's preemption path)
    must release the prefetch worker — a plain blocking q.put parked it
    forever holding prefetch+1 decoded batches of host memory."""
    import threading
    import time

    import jax.numpy as jnp

    from streamformer_tpu.data.collate import MultitaskLoader
    from streamformer_tpu.data.samplers import (
        DistributedBatchTaskUniqueSampler, task_specs_from_lengths)

    class Tiny:
        task_name = "Kinetics"

        def __len__(self):
            return 32

        def __getitem__(self, i):
            return {
                "task_name": "Kinetics",
                "task_input": {
                    "frames": np.zeros((2, 32, 32, 3), np.uint8),
                    "label": 0,
                },
            }

    class Union:
        datasets = [Tiny()]

        def __len__(self):
            return 32

        def __getitem__(self, i):
            return self.datasets[0][i]

        @property
        def unified_dataset_lengths(self):
            return [32]

    class ModelStub:
        label_embeddings = {"Kinetics": jnp.zeros((2, 16), jnp.float32)}

    sampler = DistributedBatchTaskUniqueSampler(
        task_specs_from_lengths(["Kinetics"], [32]), batch_size=2)
    loader = MultitaskLoader(Union(), sampler, ModelStub(), crop_size=32,
                             num_workers=1, prefetch=2)
    loader.set_epoch(0)
    it = iter(loader)
    next(it)
    n_live = threading.active_count()  # includes the blocked worker
    it.close()  # GeneratorExit -> finally -> stop event
    deadline = time.time() + 10
    while time.time() < deadline and threading.active_count() >= n_live:
        time.sleep(0.05)
    assert threading.active_count() < n_live, "prefetch worker never exited"


def test_prefetch_propagates_loader_errors(tmp_path):
    """A loader error on the prefetch thread must fail the epoch, not
    silently truncate it (regression r4: the worker swallowed the
    exception, the consumer saw a clean end-of-epoch, and a checkpoint
    landed on partial data)."""
    from streamformer_tpu.data.collate import MultitaskLoader
    from streamformer_tpu.data.samplers import (
        DistributedBatchTaskUniqueSampler, task_specs_from_lengths)

    class Broken:
        task_name = "Kinetics"

        def __len__(self):
            return 4

        def __getitem__(self, i):
            raise RuntimeError("retries exhausted: decode failed")

    class Union:
        datasets = [Broken()]

        def __len__(self):
            return 4

        def __getitem__(self, i):
            return self.datasets[0][i]

        @property
        def unified_dataset_lengths(self):
            return [4]

    sampler = DistributedBatchTaskUniqueSampler(
        task_specs_from_lengths(["Kinetics"], [4]), batch_size=2)
    # model=None: the batch raises before collate ever touches it
    loader = MultitaskLoader(Union(), sampler, None, crop_size=32,
                             num_workers=1, prefetch=2)
    loader.set_epoch(0)
    with pytest.raises(RuntimeError, match="retries exhausted"):
        for _ in loader:
            pass
