"""Action Recognition finetune CLI (reference downstream/AR/main_finetuning.py
+ exp/k400/*.sh hyperparameters).

Usage:
    python -m streamformer_tpu.downstream.ar_run \
        --anno_train k400/train.csv --anno_val k400/val.csv \
        --num_classes 400 --model_path /ckpt/streamformer --bf16 \
        --add_lora_spatial --epochs 30 --lr 2e-4
"""

from __future__ import annotations

import argparse
import json
import os
import time


def get_args():
    p = argparse.ArgumentParser("StreamFormer-TPU AR finetune")
    p.add_argument("--anno_train", required=True, help='"path label" CSV')
    p.add_argument("--anno_val", default=None)
    p.add_argument("--anno_test", default=None)
    p.add_argument("--prefix", default="")
    p.add_argument("--split", default=" ")
    p.add_argument("--output_dir", default="output/ar")
    p.add_argument("--model_path", default=None, help="HF backbone dir")
    p.add_argument("--num_classes", type=int, required=True)
    p.add_argument("--batch_size", type=int, default=16)
    p.add_argument("--epochs", type=int, default=30)
    p.add_argument("--lr", type=float, default=2e-4)
    p.add_argument("--weight_decay", type=float, default=0.05)
    p.add_argument("--layer_decay", type=float, default=None)
    p.add_argument("--warmup_epochs", type=float, default=2)
    p.add_argument("--num_frames", type=int, default=16)
    p.add_argument("--input_size", type=int, default=224)
    p.add_argument("--sampling", default="sparse", choices=["sparse", "dense"])
    p.add_argument("--sampling_rate", type=int, default=4)
    p.add_argument("--mixup", type=float, default=0.8)
    p.add_argument("--cutmix", type=float, default=1.0)
    p.add_argument("--smoothing", type=float, default=0.1)
    p.add_argument("--add_lora_spatial", action="store_true")
    p.add_argument("--model_ema", action="store_true",
                   help="keep an EMA shadow of the weights and also "
                   "evaluate it (reference AR ModelEma, "
                   "main_finetuning.py:53-55)")
    p.add_argument("--model_ema_decay", type=float, default=0.9999)
    p.add_argument("--bf16", action="store_true")
    p.add_argument("--num_workers", type=int, default=8)
    p.add_argument("--test_num_segment", type=int, default=4)
    p.add_argument("--test_num_crop", type=int, default=3)
    p.add_argument("--seed", type=int, default=0)
    # tiny-model overrides for smoke tests
    p.add_argument("--hidden_size", type=int, default=768)
    p.add_argument("--num_layers", type=int, default=12)
    p.add_argument("--num_heads", type=int, default=12)
    p.add_argument("--intermediate_size", type=int, default=3072)
    p.add_argument("--patch_size", type=int, default=16)
    return p.parse_args()


def _loader(ds, batch_size, aug, rng_seed, train, num_workers):
    """Simple epoch loader: thread-pool fetch -> stack -> device augment."""
    import numpy as np
    import jax
    import jax.numpy as jnp

    idx = np.arange(len(ds))
    if train:
        np.random.default_rng(rng_seed).shuffle(idx)
    from concurrent.futures import ThreadPoolExecutor

    stop = len(idx) - (batch_size - 1 if train else 0)
    starts = list(range(0, stop, batch_size))
    # one pool for the whole epoch (per-batch pools churn OS threads) and
    # one-batch-ahead prefetch: batch N+1 decodes while the caller runs the
    # device step for batch N
    with ThreadPoolExecutor(max(num_workers, 1)) as ex:
        def submit(b0):
            return [ex.submit(ds.__getitem__, j)
                    for j in idx[b0 : b0 + batch_size]]

        futs = submit(starts[0]) if starts else []
        for i, b0 in enumerate(starts):
            samples = [f.result() for f in futs]
            if i + 1 < len(starts):
                futs = submit(starts[i + 1])
            frames = np.stack([s["task_input"]["frames"] for s in samples])
            labels = np.asarray(
                [int(s["task_input"]["label"]) for s in samples], np.int32
            )
            if train:
                px = aug(jax.random.fold_in(jax.random.PRNGKey(rng_seed), b0),
                         jnp.asarray(frames))
            else:
                px = aug(jnp.asarray(frames))
            extras = None
            if "sample_idx" in samples[0]["task_input"]:
                extras = np.asarray(
                    [s["task_input"]["sample_idx"] for s in samples]
                )
            yield px, jnp.asarray(labels), extras


def main():
    args = get_args()
    import numpy as np
    import jax
    import jax.numpy as jnp
    import optax

    from streamformer_tpu.config import StreamformerConfig
    from streamformer_tpu.checkpoint import hf_import
    from streamformer_tpu.data import datasets as D
    from streamformer_tpu.data.collate import make_eval_augment, make_train_augment
    from streamformer_tpu.downstream import ar
    from streamformer_tpu.train import checkpoint as ckpt_lib
    from streamformer_tpu.train import metrics as metrics_lib
    from streamformer_tpu.train import optim

    os.makedirs(args.output_dir, exist_ok=True)
    cfg = StreamformerConfig(
        num_frames=args.num_frames,
        image_size=args.input_size,
        patch_size=args.patch_size,
        hidden_size=args.hidden_size,
        num_hidden_layers=args.num_layers,
        num_attention_heads=args.num_heads,
        intermediate_size=args.intermediate_size,
        add_lora_spatial=args.add_lora_spatial,
        dtype="bfloat16" if args.bf16 else "float32",
    )
    cls = D.VideoClsSparseDataset if args.sampling == "sparse" else D.VideoClsDenseDataset
    kw = {} if args.sampling == "sparse" else {"sampling_rate": args.sampling_rate}
    train_ds = cls(args.anno_train, prefix=args.prefix, split=args.split,
                   mode="train", clip_len=args.num_frames,
                   short_side_size=max(args.input_size, 224) + 32, **kw)

    if args.model_path:
        cfg, backbone = hf_import.from_pretrained(args.model_path, cfg)
    else:
        from streamformer_tpu.models import encoder as enc

        backbone = enc.init_params(jax.random.PRNGKey(args.seed), cfg)
    params = {
        "backbone": backbone,
        "head": ar.init_classifier_params(
            jax.random.PRNGKey(args.seed + 1), cfg, args.num_classes
        ),
    }

    steps_per_epoch = max(len(train_ds) // args.batch_size, 1)
    lr = optim.cosine_lr_schedule(
        args.lr, 1e-6, args.epochs, steps_per_epoch,
        warmup_epochs=args.warmup_epochs,
    )
    trainable = None
    if args.add_lora_spatial:
        trainable = {
            "backbone": optim.trainable_mask_lora_spatial(params["backbone"]),
            "head": jax.tree.map(lambda _: True, params["head"]),
        }
    tx = optim.create_optimizer(
        params, lr, weight_decay=args.weight_decay, clip_grad=5.0,
        layer_decay=args.layer_decay, num_layers=cfg.num_hidden_layers,
        trainable_mask=trainable,
    )
    opt_state = tx.init(params)
    step = ar.make_train_step(
        cfg, tx, args.num_classes, mixup_alpha=args.mixup,
        cutmix_alpha=args.cutmix, label_smoothing=args.smoothing,
        use_mixup=args.mixup > 0,
        ema_decay=args.model_ema_decay if args.model_ema else None,
    )
    ema_params = ar.init_ema(params) if args.model_ema else None

    aug_t = make_train_augment(args.input_size)
    aug_e = make_eval_augment(args.input_size)
    for epoch in range(args.epochs):
        t0 = time.time()
        losses = []
        rng_epoch = jax.random.fold_in(jax.random.PRNGKey(args.seed), epoch)
        for it, (px, labels, _) in enumerate(_loader(
                train_ds, args.batch_size, aug_t, args.seed + epoch, True,
                args.num_workers)):
            # per-STEP key: fold the batch index in too, else every step of
            # an epoch reuses one mixup lambda/permutation + dropout mask
            rng_s = jax.random.fold_in(rng_epoch, it)
            if args.model_ema:
                params, ema_params, opt_state, loss = step(
                    params, ema_params, opt_state, px, labels, rng_s
                )
            else:
                params, opt_state, loss = step(
                    params, opt_state, px, labels, rng_s
                )
            losses.append(loss)
        stats = {"epoch": epoch, "loss": float(jnp.mean(jnp.stack(losses))),
                 "epoch_time": time.time() - t0}
        if args.anno_val:
            val_ds = cls(args.anno_val, prefix=args.prefix, split=args.split,
                         mode="validation", clip_len=args.num_frames,
                         short_side_size=max(args.input_size, 224) + 32, **kw)
            stats.update(ar.validate(
                params, cfg,
                ((px, y) for px, y, _ in _loader(
                    val_ds, args.batch_size, aug_e, 0, False, args.num_workers
                )),
            ))
            if args.model_ema:
                stats.update({
                    f"{k}_ema": v for k, v in ar.validate(
                        ema_params, cfg,
                        ((px, y) for px, y, _ in _loader(
                            val_ds, args.batch_size, aug_e, 0, False,
                            args.num_workers
                        )),
                    ).items()
                })
        print(json.dumps(stats))
        metrics_lib.write_log_line(args.output_dir, stats)
        ckpt_lib.save_checkpoint(args.output_dir, epoch, params, opt_state)

    if args.anno_test:
        test_ds = cls(args.anno_test, prefix=args.prefix, split=args.split,
                      mode="test", clip_len=args.num_frames,
                      short_side_size=max(args.input_size, 224) + 32,
                      test_num_segment=args.test_num_segment,
                      test_num_crop=args.test_num_crop, **kw)
        res = ar.final_test(
            ema_params if args.model_ema else params, cfg,
            ((px, y, v) for px, y, v in _loader(
                test_ds, args.batch_size, aug_e, 0, False, args.num_workers
            )),
        )
        print("multi-view test:", json.dumps(res))
        metrics_lib.write_log_line(args.output_dir, {"final_test": res})


if __name__ == "__main__":
    main()
