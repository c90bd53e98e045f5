"""On-device transform parity vs PIL (the reference's CPU ground truth) and
sampler behavior tests."""

import numpy as np
import pytest

pytestmark = pytest.mark.fast

import jax
import jax.numpy as jnp

from streamformer_tpu.data import transforms as T
from streamformer_tpu.data import samplers
from streamformer_tpu.data.samplers import (
    DistributedBatchTaskUniqueSampler,
    TaskSpec,
    task_specs_from_lengths,
    PAD_INDEX,
)


@pytest.fixture()
def img(rng):
    return rng.integers(0, 256, size=(2, 24, 32, 3), dtype=np.uint8)  # (T,H,W,C)


def _pil_enhance(img_np, enhancer_cls, factor):
    from PIL import Image

    outs = []
    for fr in img_np:
        im = Image.fromarray(fr)
        outs.append(np.asarray(enhancer_cls(im).enhance(factor)))
    return np.stack(outs)


def test_brightness_matches_pil(img):
    from PIL import ImageEnhance

    ref = _pil_enhance(img, ImageEnhance.Brightness, 1.3)
    got = np.asarray(T.adjust_brightness(jnp.asarray(img, jnp.float32), 1.3))
    assert np.abs(got - ref).max() <= 1.0  # PIL rounds; we stay float


def test_saturation_matches_pil(img):
    from PIL import ImageEnhance

    ref = _pil_enhance(img, ImageEnhance.Color, 0.6)
    got = np.asarray(T.adjust_saturation(jnp.asarray(img, jnp.float32), 0.6))
    assert np.abs(got - ref).max() <= 1.5


def test_contrast_matches_pil(img):
    from PIL import ImageEnhance

    ref = _pil_enhance(img, ImageEnhance.Contrast, 1.4)
    got = np.asarray(T.adjust_contrast(jnp.asarray(img, jnp.float32), 1.4))
    assert np.abs(got - ref).max() <= 1.5


def test_sharpness_matches_pil(img):
    from PIL import ImageEnhance

    ref = _pil_enhance(img, ImageEnhance.Sharpness, 1.6)
    got = np.asarray(T.adjust_sharpness(jnp.asarray(img, jnp.float32), 1.6))
    assert np.abs(got - ref).max() <= 1.5


def test_posterize_exact(img):
    from PIL import Image, ImageOps

    ref = np.stack(
        [np.asarray(ImageOps.posterize(Image.fromarray(f), 3)) for f in img]
    )
    got = np.asarray(T.posterize(jnp.asarray(img, jnp.float32), 3))
    np.testing.assert_array_equal(got.astype(np.uint8), ref)


def test_solarize_exact(img):
    from PIL import Image, ImageOps

    ref = np.stack(
        [np.asarray(ImageOps.solarize(Image.fromarray(f), 128)) for f in img]
    )
    got = np.asarray(T.solarize(jnp.asarray(img, jnp.float32), 128))
    np.testing.assert_array_equal(got.astype(np.uint8), ref)


def test_invert_exact(img):
    got = np.asarray(T.invert(jnp.asarray(img, jnp.float32)))
    np.testing.assert_array_equal(got.astype(np.uint8), 255 - img)


def test_equalize_matches_pil(img):
    from PIL import Image, ImageOps

    ref = np.stack(
        [np.asarray(ImageOps.equalize(Image.fromarray(f))) for f in img]
    )
    got = np.asarray(T.equalize(jnp.asarray(img, jnp.float32)))
    assert np.abs(got.astype(np.int32) - ref.astype(np.int32)).max() <= 1


def test_autocontrast_matches_pil(img):
    from PIL import Image, ImageOps

    ref = np.stack(
        [np.asarray(ImageOps.autocontrast(Image.fromarray(f))) for f in img]
    )
    got = np.asarray(T.autocontrast(jnp.asarray(img, jnp.float32)))
    assert np.abs(got.astype(np.int32) - ref.astype(np.int32)).max() <= 1


def test_rotate_close_to_pil(img):
    from PIL import Image

    ref = np.stack(
        [
            np.asarray(
                Image.fromarray(f).rotate(
                    15, resample=Image.BILINEAR, fillcolor=(128, 128, 128)
                )
            )
            for f in img
        ]
    )
    got = np.asarray(T.rotate(jnp.asarray(img, jnp.float32), 15.0))
    # interior pixels should agree; borders differ at fill transitions
    diff = np.abs(got.astype(np.float32) - ref.astype(np.float32))
    assert np.median(diff) <= 2.0


@pytest.mark.parametrize("mag", [-0.37, -0.08, 0.19, 0.42])
def test_shear_matches_affine_warp_oracle(img, mag):
    """The one-hot MXU-matmul resamplers (shear/translate rewrite) must
    equal the gather-based `_affine_warp` (still used by rotate, itself
    PIL-parity-tested) under the equivalent PIL inverse matrices —
    including out-of-bounds fill regions at |mag| large enough to push
    pixels off the edge."""
    x = jnp.asarray(img, jnp.float32)
    got_x = np.asarray(T.shear_x(x, mag))
    ref_x = np.asarray(T._affine_warp(x, (1.0, mag, 0.0, 0.0, 1.0, 0.0)))
    np.testing.assert_allclose(got_x, ref_x, atol=1e-3)
    got_y = np.asarray(T.shear_y(x, mag))
    ref_y = np.asarray(T._affine_warp(x, (1.0, 0.0, 0.0, mag, 1.0, 0.0)))
    np.testing.assert_allclose(got_y, ref_y, atol=1e-3)


@pytest.mark.parametrize("pixels", [-13.0, -4.5, 3.25, 11.0])
def test_translate_matches_affine_warp_oracle(img, pixels):
    x = jnp.asarray(img, jnp.float32)
    got_x = np.asarray(T.translate_x(x, pixels))
    ref_x = np.asarray(T._affine_warp(x, (1.0, 0.0, pixels, 0.0, 1.0, 0.0)))
    np.testing.assert_allclose(got_x, ref_x, atol=1e-3)
    got_y = np.asarray(T.translate_y(x, pixels))
    ref_y = np.asarray(T._affine_warp(x, (1.0, 0.0, 0.0, 0.0, 1.0, pixels)))
    np.testing.assert_allclose(got_y, ref_y, atol=1e-3)


def test_random_resized_crop_shape_and_range(img):
    out = T.random_resized_crop(jax.random.PRNGKey(0), jnp.asarray(img), (16, 16))
    assert out.shape == (2, 16, 16, 3)
    assert float(out.min()) >= 0.0 and float(out.max()) <= 1.0


def test_normalize_to_model_input(img):
    out = T.to_model_input(T.normalize(jnp.asarray(img)))
    assert out.shape == (2, 3, 24, 32)
    assert abs(float(out.mean())) < 1.0


def test_rand_augment_runs(img):
    from streamformer_tpu.data.rand_augment import rand_augment

    out = rand_augment(
        jax.random.PRNGKey(0), jnp.asarray(img), "rand-m7-n4-mstd0.5-inc1"
    )
    assert out.shape == img.shape
    assert float(out.min()) >= 0.0 and float(out.max()) <= 255.0


def test_random_erasing_region(img):
    from streamformer_tpu.data.random_erasing import random_erasing

    x = T.normalize(jnp.asarray(img))
    out = random_erasing(jax.random.PRNGKey(3), x, probability=1.0)
    changed = np.asarray(out != x).any(axis=(0, 3))
    assert changed.any() and not changed.all()


def test_mixup_targets_sum_to_one(rng):
    from streamformer_tpu.data.mixup import mixup_batch

    clips = jnp.asarray(rng.standard_normal((4, 2, 8, 8, 3)).astype(np.float32))
    labels = jnp.asarray([0, 1, 2, 3])
    mixed, targets = mixup_batch(
        jax.random.PRNGKey(0), clips, labels, num_classes=5, label_smoothing=0.1
    )
    assert mixed.shape == clips.shape
    np.testing.assert_allclose(np.asarray(targets).sum(-1), 1.0, atol=1e-5)


# ---------------------------------------------------------------------------
# samplers
# ---------------------------------------------------------------------------


def _specs():
    return task_specs_from_lengths(
        ["Kinetics", "TaskRetrieval", "THUMOS14"], [40, 24, 10]
    )


def test_sampler_task_unique_batches():
    s = DistributedBatchTaskUniqueSampler(_specs(), batch_size=4)
    specs = {sp.name: sp for sp in _specs()}

    def task_of(idx):
        for name, sp in specs.items():
            if sp.offset <= idx < sp.offset + sp.length:
                return name
        raise AssertionError(idx)

    for batch in s:
        real = [i for i in batch if i != PAD_INDEX]
        tasks = {task_of(i) for i in real}
        assert len(tasks) == 1
        if PAD_INDEX in batch:  # fake-batch TAL: 1 real + pads
            assert tasks == {"THUMOS14"} and len(real) == 1


def test_sampler_rank_disjoint_and_epoch_deterministic():
    def flat(rank, epoch):
        s = DistributedBatchTaskUniqueSampler(
            _specs(), batch_size=2, num_replicas=4, rank=rank
        )
        s.set_epoch(epoch)
        return [i for b in s for i in b if i != PAD_INDEX]

    r0, r1 = flat(0, 3), flat(1, 3)
    assert set(r0).isdisjoint(set(r1))
    assert flat(0, 3) == flat(0, 3)  # deterministic
    assert flat(0, 3) != flat(0, 4)  # epoch changes schedule


def test_sampler_same_task_sequence_across_ranks():
    def task_seq(rank):
        specs = {sp.name: sp for sp in _specs()}

        def task_of(idx):
            for name, sp in specs.items():
                if sp.offset <= idx < sp.offset + sp.length:
                    return name

        s = DistributedBatchTaskUniqueSampler(
            _specs(), batch_size=2, num_replicas=4, rank=rank
        )
        s.set_epoch(1)
        return [task_of(next(i for i in b if i != PAD_INDEX)) for b in s]

    assert task_seq(0) == task_seq(3)  # all ranks agree on the task per step


def test_sequential_and_balanced_samplers():
    from streamformer_tpu.data.samplers import (
        DistributedBatchTaskSequentialSampler,
        DistributedBatchTaskBalancedSampler,
    )

    specs = _specs()
    seq = DistributedBatchTaskSequentialSampler(specs, batch_size=4)
    batches = list(seq)
    # fixed declaration order: all Kinetics batches, then retrieval, then TAL
    def task_of(idx):
        for sp in specs:
            if sp.offset <= idx < sp.offset + sp.length:
                return sp.name

    order = [task_of(next(i for i in b if i != PAD_INDEX)) for b in batches]
    first_k = order.index("Kinetics")
    first_r = order.index("TaskRetrieval")
    first_t = order.index("THUMOS14")
    assert first_k < first_r < first_t
    assert order == sorted(order, key=["Kinetics", "TaskRetrieval",
                                       "THUMOS14"].index)

    bal = DistributedBatchTaskBalancedSampler(specs, batch_size=4)
    bal_order = [
        task_of(next(i for i in b if i != PAD_INDEX)) for b in bal
    ]
    # balanced: the schedule is size-scaled round-robin — every round of
    # accum_steps batches sees EVERY task (the reference's accumulation
    # window, sampler.py:179-347)
    w = bal.accum_steps
    assert w == 5  # K 10/6->2, Retrieval 6/6->1, THUMOS 10/6->2
    full_rounds = len(bal_order) // w
    assert full_rounds >= 1
    for r in range(full_rounds):
        assert set(bal_order[r * w : (r + 1) * w]) == {
            "Kinetics", "TaskRetrieval", "THUMOS14"
        }


def test_train_augment_world_size_invariant(rng):
    """Per-sample (step, dataset-index) aug keys: the SAME sample gets the
    SAME augmentation whether its batch reaches one process whole or
    rank-strided across two — the property the 2-process == 1-process
    training gate (test_multiprocess.py) rests on."""
    import jax

    from streamformer_tpu.data.collate import make_train_augment

    aug = make_train_augment(crop_size=24)
    clips = jnp.asarray(
        (rng.random((4, 2, 32, 32, 3)) * 255).astype(np.uint8)
    )
    ids = jnp.asarray([10, 11, 12, 13], jnp.uint32)
    key = jax.random.fold_in(jax.random.PRNGKey(0), 5)  # step 5

    whole = np.asarray(aug(key, clips, ids))
    # rank-strided halves (ranks 0/1 of world 2), same step key
    r0 = np.asarray(aug(key, clips[0::2], ids[0::2]))
    r1 = np.asarray(aug(key, clips[1::2], ids[1::2]))
    np.testing.assert_array_equal(whole[0::2], r0)
    np.testing.assert_array_equal(whole[1::2], r1)

    # and WITHOUT ids the legacy per-position stream still applies
    legacy = np.asarray(aug(key, clips))
    assert legacy.shape == whole.shape
