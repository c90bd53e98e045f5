"""Spatial tasks end-to-end: VIS + ReferVOS datasets -> loader collate ->
MultitaskModel.loss_fn -> trainer step. Also covers forward_features and
windowed extract_feature (the remaining published-API surfaces)."""

import json

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

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
    vocab_size=64, hidden_size=32, num_hidden_layers=1, num_attention_heads=4,
    intermediate_size=64, max_position_embeddings=8,
)


@pytest.fixture(scope="module")
def seg_roots(tmp_path_factory):
    import cv2

    rng = np.random.default_rng(0)
    root = tmp_path_factory.mktemp("seg")
    # ytvis-style VIS annotation with 3 videos
    (root / "frames" / "v").mkdir(parents=True)
    names = []
    for i in range(4):
        p = f"v/{i:05d}.jpg"
        cv2.imwrite(str(root / "frames" / p),
                    rng.integers(0, 255, (40, 48, 3), dtype=np.uint8))
        names.append(p)
    anno = {
        "videos": [
            {"id": k, "file_names": names, "height": 40, "width": 48}
            for k in (1, 2, 3)
        ],
        "annotations": [
            {"video_id": k, "category_id": 1 + (k % 2),
             "segmentations": [[[5, 5, 25, 5, 25, 25, 5, 25]]] * 4}
            for k in (1, 2, 3)
        ],
        "categories": [{"id": 1, "name": "cat"}, {"id": 2, "name": "dog"}],
    }
    with open(root / "vis.json", "w") as f:
        json.dump(anno, f)

    # refervos annotation
    (root / "masks").mkdir()
    for i in range(4):
        m = np.zeros((40, 48), np.uint8)
        m[10:30, 10:30] = 255
        cv2.imwrite(str(root / "masks" / f"{i:05d}.png"), m)
    rows = [
        {
            "video": "v",
            "frames": [f"frames/{n}" for n in names],
            "masks": [f"masks/{i:05d}.png" for i in range(4)],
            "expression": f"the square thing {j}",
        }
        for j in range(3)
    ]
    with open(root / "rvos.json", "w") as f:
        json.dump(rows, f)
    return root


def _train_tasks(model, loader, n_steps=4):
    tx = optax.adamw(1e-4)
    from streamformer_tpu.train.trainer import MultitaskTrainer, TrainState

    trainer = MultitaskTrainer(model, tx, donate_state=False)
    state = TrainState.create(jax.tree.map(jnp.copy, model.params), tx)
    losses = []
    for i, (task, batch) in enumerate(loader):
        fn = trainer.step_fn(task, apply_update=True)
        state, out = fn(state, batch["pixel_values"], batch["task_input"],
                        jax.random.PRNGKey(i))
        losses.append((task, float(out["loss"])))
        if i + 1 >= n_steps:
            break
    return losses


def test_vis_and_refervos_training_through_loader(seg_roots):
    from streamformer_tpu.data.seg_datasets import VISDataset, ReferVOSDataset
    from streamformer_tpu.data.datasets import MultiTaskDataset
    from streamformer_tpu.data.samplers import DistributedBatchTaskUniqueSampler
    from streamformer_tpu.data.collate import MultitaskLoader

    vis = VISDataset(str(seg_roots / "vis.json"), prefix=str(seg_roots / "frames"),
                     task_name="TaskVIS", dataset_name="YoutubeVIS",
                     num_frames=4, crop_size=32, mask_size=(32, 32),
                     max_classes=8)
    rvos = ReferVOSDataset(str(seg_roots / "rvos.json"), prefix=str(seg_roots),
                           num_frames=4, crop_size=32, mask_size=(32, 32))
    union = MultiTaskDataset([vis, rvos])
    model = MultitaskModel(
        CFG,
        {"TaskVIS": {"label2id": {"YoutubeVIS": {"bg": 0, "cat": 1, "dog": 2}}},
         "TaskReferVOS": {"label2id": None}},
        text_cfg=TEXT_CFG,
    )
    model.prepare_for_multi_tasks()
    assert model.label_embeddings["TaskVIS"]["YoutubeVIS"].shape == (3, 32)

    sampler = DistributedBatchTaskUniqueSampler(union.task_specs(), batch_size=2)
    loader = MultitaskLoader(union, sampler, model, crop_size=32, num_workers=1)
    losses = _train_tasks(model, loader, n_steps=3)
    tasks = {t for t, _ in losses}
    assert tasks <= {"TaskVIS", "TaskReferVOS"} and len(tasks) >= 1
    assert all(np.isfinite(l) for _, l in losses)


def test_forward_features_and_extract_feature(rng):
    model = MultitaskModel(CFG, {}, text_cfg=TEXT_CFG)
    px = jnp.asarray(rng.standard_normal((2, 4, 3, 32, 32)).astype(np.float32))
    mean = model.forward_features(model.params, px, "mean")
    nop = model.forward_features(model.params, px, "no_pooling")
    last = model.forward_features(model.params, px, "last")
    assert mean.shape == (2, 32) and nop.shape == (2, 4, 32)
    np.testing.assert_allclose(np.asarray(nop.mean(1)), np.asarray(mean),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(nop[:, -1]), np.asarray(last),
                               atol=1e-6)

    # windowed long-video encode (reference extract_feature, window padded)
    long_px = jnp.asarray(
        rng.standard_normal((1, 10, 3, 32, 32)).astype(np.float32)
    )
    feats = model.extract_feature(model.params, long_px, window_size=8)
    assert feats.shape == (1, 10, 32)
    assert np.isfinite(np.asarray(feats)).all()
