"""Per-task collate -> fixed pytree schemas + the multitask loader glue.

The reference probes one sample per task to build a unified key template and
pads heterogeneous task_inputs to it (construct_task_input_template /
multiple_tasks_samples_collate, utils.py:1115-1197) because its trainer
moves a single dict to GPU. Here each task has an explicit schema matching
``MultitaskModel.loss_fn`` (one XLA program per task), and the loader:

  sampler batch -> host fetch (thread pool) -> stack -> tokenize captions ->
  attach label tables -> on-device augmentation -> (task_name, batch)

with a 2-deep device prefetch queue so host decode overlaps TPU compute.
"""

from __future__ import annotations

import queue
import threading
from typing import Any, Callable, Dict, Iterable, List, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from streamformer_tpu.data import transforms as T
from streamformer_tpu.data.rand_augment import rand_augment
from streamformer_tpu.data.random_erasing import random_erasing
from streamformer_tpu.data.samplers import PAD_INDEX
from streamformer_tpu.models.multitask import head_type_for_task


def make_train_augment(
    crop_size: int = 224,
    use_rand_augment: bool = True,
    ra_config: str = "rand-m7-n4-mstd0.5-inc1",
    reprob: float = 0.25,
    mean=T.SIGLIP_MEAN,
    std=T.SIGLIP_STD,
):
    """Jitted per-clip train augmentation on device (the reference Kinetics
    recipe, kinetics_sparse.py:317-377)."""

    from streamformer_tpu.data.rand_augment import RAND_TRANSFORMS, parse_config

    n_layers = parse_config(ra_config)["num_layers"]

    def aug_one(rng, clip_u8, op_indices):
        k1, k2, k3, k4 = jax.random.split(rng, 4)
        x = clip_u8.astype(jnp.float32)
        if use_rand_augment:
            x = rand_augment(k1, x, ra_config, op_indices=op_indices)
        x = x / 255.0
        x = T.random_resized_crop(k2, x, (crop_size, crop_size))
        x = T.random_horizontal_flip(k3, x)
        x = (x - jnp.asarray(mean)) / jnp.asarray(std)
        if reprob > 0:
            x = random_erasing(k4, x, probability=reprob)
        return T.to_model_input(x)

    @jax.jit
    def aug_batch(rng, clips_u8, sample_ids=None):  # (B, T, H, W, C) uint8
        k_ops, rng = jax.random.split(rng)
        # op choice drawn ONCE per batch, OUTSIDE the vmap: a batched switch
        # index would make XLA run every augment branch for every sample
        # (~30x the work — see rand_augment TPU note); per-sample magnitude
        # jitter, apply-probability, crops and erasing keep their diversity
        op_indices = jax.random.randint(
            k_ops, (n_layers,), 0, len(RAND_TRANSFORMS)
        )
        if sample_ids is None:
            keys = jax.random.split(rng, clips_u8.shape[0])
        else:
            # per-sample keys from the DATASET index, not the batch
            # position: sample i then draws the same augmentation whether
            # the global batch reaches this process whole or rank-strided,
            # so one run is reproducible across world sizes (the reference's
            # per-worker torch RNG has no such invariance)
            keys = jax.vmap(lambda i: jax.random.fold_in(rng, i))(sample_ids)
        return jax.vmap(aug_one, in_axes=(0, 0, None))(
            keys, clips_u8, op_indices
        )

    return aug_batch


def make_eval_augment(crop_size: int = 224, mean=T.SIGLIP_MEAN, std=T.SIGLIP_STD):
    def one(clip_u8):
        x = T.center_crop(clip_u8, (crop_size, crop_size))
        x = (x.astype(jnp.float32) / 255.0 - jnp.asarray(mean)) / jnp.asarray(std)
        return T.to_model_input(x)

    @jax.jit
    def batch(clips_u8):
        return jax.vmap(one)(clips_u8)

    return batch


class MultitaskLoader:
    """Iterates (task_name, device_batch) pairs for MultitaskTrainer."""

    def __init__(
        self,
        dataset,  # MultiTaskDataset
        sampler,  # DistributedBatchTask*Sampler
        model,  # MultitaskModel (tokenizer + label tables)
        crop_size: int = 224,
        train: bool = True,
        num_workers: int = 8,
        prefetch: int = 2,
        aug_seed: int = 0,
    ):
        self.dataset = dataset
        self.sampler = sampler
        self.model = model
        self.train = train
        self.aug = (
            make_train_augment(crop_size) if train else make_eval_augment(crop_size)
        )
        self.num_workers = num_workers
        self.prefetch = prefetch
        self.aug_seed = aug_seed
        self._epoch = 0
        self._start_step = 0
        self._pool = None  # lazy persistent decode pool (threads: cv2
        # releases the GIL, and worker PROCESSES would re-open every
        # VideoCapture per batch)

    def set_epoch(self, epoch: int, start_step: int = 0):
        """``start_step`` skips that many leading sampler batches WITHOUT
        fetching/decoding them — mid-epoch resume after preemption. Batch
        ``step`` numbering stays absolute, so the per-step augmentation
        stream (fold_in(aug_seed, step)) is identical to an uninterrupted
        epoch."""
        self._epoch = epoch
        self._start_step = start_step
        self.sampler.set_epoch(epoch)
        # datasets with per-sample stochastic state (e.g. VIS negative
        # sampling) re-seed per (epoch, index) so draws vary across epochs
        # yet stay resume-reproducible
        for ds in getattr(self.dataset, "datasets", []):
            if hasattr(ds, "set_epoch"):
                ds.set_epoch(epoch)

    def __len__(self):
        return len(self.sampler)

    # ------------------------------------------------------------------

    def _fetch(self, indices: List[int]) -> List[Dict]:
        real = [i for i in indices if i != PAD_INDEX]
        if self.num_workers > 1 and len(real) > 1:
            if self._pool is None:
                from concurrent.futures import ThreadPoolExecutor

                self._pool = ThreadPoolExecutor(self.num_workers)
            return list(self._pool.map(self.dataset.__getitem__, real))
        return [self.dataset[i] for i in real]

    def close(self):
        """Release the decode pool (also runs at GC so the per-epoch
        loaders train/run.py builds don't each park num_workers threads)."""
        if self._pool is not None:
            self._pool.shutdown(wait=False)
            self._pool = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass

    def _collate_host(
        self, samples: List[Dict], indices: List[int]
    ) -> Tuple[str, np.ndarray, List[Dict], List[int]]:
        """numpy-only collation — safe inside the prefetch thread (device
        dispatch from a second thread deadlocks some PJRT transports)."""
        task = samples[0]["task_name"]
        tis = [s["task_input"] for s in samples]
        frames = np.stack([ti["frames"] for ti in tis])  # (B,T,H,W,C) u8
        return task, frames, tis, indices

    def _finalize(
        self,
        task: str,
        frames: np.ndarray,
        tis: List[Dict],
        step: int,
        ids: Optional[List[int]] = None,
    ):
        """device-touching half — main thread only."""
        kind = head_type_for_task(task)
        rng = jax.random.fold_in(jax.random.PRNGKey(self.aug_seed), step)
        if self.train:
            # keyed per (step, dataset index): world-size-invariant draws
            sample_ids = (
                jnp.asarray(np.asarray(ids, np.uint32))
                if ids is not None
                else None
            )
            pixel_values = self.aug(rng, jnp.asarray(frames), sample_ids)
        else:
            pixel_values = self.aug(jnp.asarray(frames))

        task_input: Dict[str, Any] = {}
        if kind == "classification":
            task_input["label"] = jnp.asarray([ti["label"] for ti in tis])
            task_input["label_embeddings"] = self.model.label_embeddings[task]
        elif kind == "retrieval":
            task_input["caption_ids"] = jnp.asarray(
                self.model.tokenize([ti["caption"] for ti in tis])
            )
        elif kind == "grounding":
            task_input["caption_ids"] = jnp.asarray(
                self.model.tokenize([ti["caption"] for ti in tis])
            )
            task_input["label"] = jnp.asarray(
                np.stack([ti["label"] for ti in tis]).astype(np.float32)
            )
        elif kind == "naive_localization" and "gt_segments" in tis[0]:
            # full-video windowed TAL (fake-batch: exactly one real video,
            # reference sampler.py:393-443 + utils.py:1180-1186): rasterize
            # the gt segments to per-frame ±1/0 targets host-side
            # (TimesformerNaiveLocalizationHead:2155-2177) and reshape the
            # W-frame video into W/T encoder clips
            ti = tis[0]
            w = int(ti["frames"].shape[0])
            tclip = self.model.cfg.num_frames
            table = self.model.label_embeddings[task]  # (L, D)
            l = int(table.shape[0])
            target = -np.ones((w, l), np.float32)
            target[~np.asarray(ti["frame_mask"], bool)] = 0.0
            for (s, e), lab in zip(
                np.asarray(ti["gt_segments"]).reshape(-1, 2),
                np.asarray(ti["gt_labels"]).reshape(-1),
            ):
                s_idx = int(s) if float(s) == int(s) else int(s) + 1
                target[s_idx : int(e) + 1, int(lab)] = 1.0
            task_input["label_embeddings"] = table
            task_input["target_labels"] = jnp.asarray(target[None])
            # (1, W, C, h, w) -> (W/T, T, C, h, w): the encoder sees a fake
            # batch of clips; the head reassembles [B*W, T, D] -> [B, WT, D]
            pixel_values = pixel_values.reshape(
                -1, tclip, *pixel_values.shape[2:]
            )
        elif kind in ("universal_localization", "naive_localization"):
            tables = self.model.label_embeddings[task]
            if isinstance(tables, dict):  # per-dataset tables, pad to L_max
                lmax = max(int(t.shape[0]) for t in tables.values())
                d = next(iter(tables.values())).shape[1]
                emb = np.zeros((len(tis), lmax, d), np.float32)
                mask = np.zeros((len(tis), lmax), bool)
                for i, ti in enumerate(tis):
                    t = np.asarray(tables[ti["dataset"]])
                    emb[i, : len(t)] = t
                    mask[i, : len(t)] = True
                task_input["label_embeddings"] = jnp.asarray(emb)
                task_input["class_mask"] = jnp.asarray(mask)
            else:
                task_input["label_embeddings"] = tables
            task_input["label"] = jnp.asarray(
                np.stack([ti["label"] for ti in tis]).astype(np.int64)
            )
            if kind == "universal_localization" and "class_mask" not in task_input:
                b = len(tis)
                l = int(task_input["label_embeddings"].shape[0])
                task_input["label_embeddings"] = jnp.tile(
                    task_input["label_embeddings"][None], (b, 1, 1)
                )
                task_input["class_mask"] = jnp.ones((b, l), bool)
        elif kind == "vis":
            # gather the pre-sampled class subsets from the per-dataset
            # label tables (negative sampling ran in the dataset)
            tables = self.model.label_embeddings[task]
            lsel = len(tis[0]["selected_classes"])
            d = next(iter(tables.values())).shape[1]
            emb = np.zeros((len(tis), lsel, d), np.float32)
            mask = np.zeros((len(tis), lsel), bool)
            for i, ti in enumerate(tis):
                table = np.asarray(tables[ti["dataset"]])
                sel = np.asarray(ti["selected_classes"])
                valid = sel >= 0
                emb[i, valid] = table[sel[valid]]
                mask[i] = valid
            task_input["label_embeddings"] = jnp.asarray(emb)
            task_input["class_mask"] = jnp.asarray(mask)
            task_input["mask_target"] = jnp.asarray(
                np.stack([ti["mask_target"] for ti in tis])
            )
        elif kind == "refervos":
            task_input["caption_ids"] = jnp.asarray(
                self.model.tokenize([ti["caption"] for ti in tis])
            )
            task_input["mask_target"] = jnp.asarray(
                np.stack([ti["mask_target"] for ti in tis])
            )
        else:
            raise NotImplementedError(kind)
        return task, {"pixel_values": pixel_values, "task_input": task_input}

    def __iter__(self):
        start = getattr(self, "_start_step", 0)

        def host_gen():
            yielded = 0
            for step, indices in enumerate(self.sampler):
                # an all-PAD batch is dropped without reaching the trainer,
                # so it must not count toward the resume offset either —
                # skip by YIELDED batches (= the trainer's micro counter),
                # decidable from the indices alone (no fetch, no decode)
                if not any(i != PAD_INDEX for i in indices):
                    continue
                if yielded < start:  # resume skip: no fetch, no decode
                    yielded += 1
                    continue
                yielded += 1
                samples = self._fetch(indices)
                if not samples:
                    continue
                real = [i for i in indices if i != PAD_INDEX]
                yield step, self._collate_host(samples, real)

        if self.prefetch <= 0:
            for step, (task, frames, tis, ids) in host_gen():
                yield self._finalize(task, frames, tis, step, ids)
            return

        # prefetch thread does host work only (decode + numpy collate);
        # all jit/device dispatch stays on the consumer thread
        q: queue.Queue = queue.Queue(maxsize=self.prefetch)
        sentinel = object()
        err: list = []
        stop = threading.Event()  # set when the consumer abandons mid-epoch

        def _put(item) -> bool:
            # bounded put that watches for consumer abandonment: a plain
            # q.put would block FOREVER holding decoded batches when the
            # trainer breaks out early (preemption), pinning host memory
            # and leaking one thread per abandoned epoch
            while not stop.is_set():
                try:
                    q.put(item, timeout=0.2)
                    return True
                except queue.Full:
                    continue
            return False

        def worker():
            try:
                for item in host_gen():
                    if not _put(item):
                        return  # consumer gone: drop and exit
            except BaseException as e:  # noqa: BLE001 — re-raised below
                # propagate to the consumer: a swallowed loader error would
                # silently TRUNCATE the epoch (clean sentinel, normal
                # end-of-epoch, checkpoint saved on partial data) — the
                # prefetch<=0 path raises, so this path must too
                err.append(e)
            finally:
                _put(sentinel)

        t = threading.Thread(target=worker, daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if item is sentinel:
                    if err:
                        raise err[0]
                    break
                step, (task, frames, tis, ids) = item
                yield self._finalize(task, frames, tis, step, ids)
        finally:
            stop.set()
            # drain so a worker blocked mid-put releases its batch now
            try:
                while True:
                    q.get_nowait()
            except queue.Empty:
                pass
