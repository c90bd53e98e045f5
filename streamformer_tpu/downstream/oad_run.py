"""Online Action Detection CLI: LSTR/MAT on extracted per-frame features
(reference downstream/OAD trainer + configs/THUMOS/MAT/*.yaml; features
come from extract/oad.py dumps at 24 fps stride 4).

Usage:
    python -m streamformer_tpu.downstream.oad_run \
        --feature_root feats/rgb --target_root feats/target \
        --train_list train_names.txt --val_list val_names.txt \
        --num_classes 22 --epochs 25
"""

from __future__ import annotations

import argparse
import json
import os
import time


def get_args():
    p = argparse.ArgumentParser("StreamFormer-TPU OAD (LSTR/MAT)")
    p.add_argument("--feature_root", required=True)
    p.add_argument("--target_root", required=True)
    p.add_argument("--train_list", required=True, help="one video name/line")
    p.add_argument("--val_list", default=None)
    p.add_argument("--flow_root", default=None)
    p.add_argument("--output_dir", default="output/oad")
    p.add_argument("--num_classes", type=int, required=True)
    p.add_argument("--feature_dim", type=int, default=768)
    p.add_argument("--batch_size", type=int, default=16)
    p.add_argument("--epochs", type=int, default=25)
    p.add_argument("--lr", type=float, default=7e-5)
    p.add_argument("--weight_decay", type=float, default=5e-5)
    p.add_argument("--long_memory_num_samples", type=int, default=128)
    p.add_argument("--work_memory_num_samples", type=int, default=32)
    p.add_argument("--long_sample_rate", type=int, default=4)
    p.add_argument("--hidden", type=int, default=1024)
    p.add_argument("--steps_per_epoch", type=int, default=0, help="0 = all")
    p.add_argument("--seed", type=int, default=0)
    return p.parse_args()


def _names(path):
    with open(path) as f:
        return [l.strip() for l in f if l.strip()]


def main():
    args = get_args()
    import numpy as np
    import jax
    import jax.numpy as jnp
    import optax

    from streamformer_tpu.downstream import oad_data as D
    from streamformer_tpu.downstream import oad_lstr as L
    from streamformer_tpu.train import checkpoint as ckpt_lib
    from streamformer_tpu.train import metrics as metrics_lib

    os.makedirs(args.output_dir, exist_ok=True)
    cfg = L.LSTRConfig(
        num_classes=args.num_classes,
        visual_size=args.feature_dim,
        d_model=args.hidden,
        long_memory_num_samples=args.long_memory_num_samples,
        work_memory_num_samples=args.work_memory_num_samples,
    )
    train_ds = D.PerFrameDataset(
        args.feature_root, args.target_root, _names(args.train_list), cfg,
        long_sample_rate=args.long_sample_rate, flow_root=args.flow_root,
    )
    val_ds = None
    if args.val_list:
        val_ds = D.PerFrameDataset(
            args.feature_root, args.target_root, _names(args.val_list), cfg,
            long_sample_rate=args.long_sample_rate, mode="val",
            flow_root=args.flow_root,
        )

    params = L.init_params(jax.random.PRNGKey(args.seed), cfg)
    tx = optax.adamw(args.lr, weight_decay=args.weight_decay)
    opt_state = tx.init(params)
    step = D.make_train_step(cfg, tx)

    rng = np.random.default_rng(args.seed)
    for epoch in range(args.epochs):
        t0 = time.time()
        losses = []
        for i, batch in enumerate(train_ds.batches(args.batch_size, rng)):
            params, opt_state, loss = step(
                params, opt_state, jnp.asarray(batch["features"]),
                jnp.asarray(batch["memory_mask"]),
                jnp.asarray(batch["targets"]),
            )
            losses.append(float(loss))
            if args.steps_per_epoch and i + 1 >= args.steps_per_epoch:
                break
        stats = {"epoch": epoch, "loss": float(np.mean(losses)),
                 "epoch_time": time.time() - t0}
        if val_ds is not None:
            stats.update(D.batch_inference(params, cfg, val_ds,
                                           batch_size=args.batch_size))
        print(json.dumps(stats))
        metrics_lib.write_log_line(args.output_dir, stats)
        ckpt_lib.save_checkpoint(args.output_dir, epoch, params, opt_state)


if __name__ == "__main__":
    main()
