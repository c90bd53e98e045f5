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
    p.add_argument(
        "--tracker",
        default=None,
        choices=["SimpleTracker", "HungarianTracker"],
        help="inference tracker; default = the d2-config TRACKER_NAME "
        "(reference ctvis TRACKER_REGISTRY dispatch) or HungarianTracker",
    )
    p.add_argument(
        "--eval_only", action="store_true",
        help="skip training; run tracker inference + YTVIS AP on --val_anno "
        "(or --anno)",
    )
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


def run_inference(args, fwd, params, extras, seg_cfg):
    """Per-video tracker inference -> YTVIS results JSON + in-repo AP.

    Mirrors the reference inference loop (ctvis HungarianTracker.inference,
    hungarian_tracker.py:119-252): per frame, select -> mask-NMS -> track;
    per track, per-frame segmentations. Frames are sampled like the train
    loader (linspace over the video); masks are evaluated at the original
    video resolution (predictions resized back with nearest). The tracker is
    chosen by --tracker, falling back to the d2-config TRACKER_NAME.
    """
    import numpy as np
    import jax.numpy as jnp
    import cv2

    from streamformer_tpu.data.seg_datasets import (
        VISDataset, polygons_to_mask, rle_to_mask,
    )
    from streamformer_tpu.downstream import segmentor as SEG
    from streamformer_tpu.eval import ytvis as YT

    anno = args.val_anno or args.anno
    ds = VISDataset(anno, prefix=args.video_root,
                    dataset_name="YoutubeVIS", num_frames=args.num_frames,
                    crop_size=args.input_size,
                    mask_size=(args.input_size, args.input_size))
    name = args.tracker or extras.get("tracker_name") or "HungarianTracker"
    tracker = SEG.tracker_from_extras(extras, name=name)

    results, gt_rows = [], []
    gt_id = 0
    for index in range(len(ds)):
        vid = ds.ids[index]
        video = ds.videos[vid]
        names = video["file_names"]
        h, w = video["height"], video["width"]
        idx = np.linspace(0, len(names) - 1, args.num_frames).astype(int)
        logits_t, masks_t, embeds_t = [], [], []
        for i in idx:
            img = cv2.imread(os.path.join(args.video_root, names[int(i)]))
            if img is None:
                raise IOError(names[int(i)])
            img = cv2.cvtColor(img, cv2.COLOR_BGR2RGB)
            img = cv2.resize(img, (args.input_size, args.input_size))
            px = jnp.asarray(
                img.astype(np.float32).transpose(2, 0, 1)[None, None]
                / 127.5 - 1.0
            )
            out = fwd(params, px)
            logits_t.append(np.asarray(out["pred_logits"][0]))
            masks_t.append(np.asarray(out["pred_masks"][0], np.float32))
            embeds_t.append(np.asarray(out["embeddings"][0]))
        frame_outs = SEG.track_video(
            np.stack(logits_t), np.stack(masks_t), np.stack(embeds_t),
            tracker,
            inference_select_thr=extras.get("inference_select_thr", 0.01),
            mask_nms_thr=extras.get("mask_nms_thr", 0.6),
        )
        # resize predicted masks back to the video resolution
        for fo in frame_outs:
            if len(fo["masks"]):
                fo["masks"] = np.stack([
                    cv2.resize(m.astype(np.uint8), (w, h),
                               interpolation=cv2.INTER_NEAREST).astype(bool)
                    for m in fo["masks"]
                ])
        results.extend(YT.collect_video_result(vid, frame_outs))
        for a in ds.annos.get(vid, []):
            segs = []
            for i in idx:
                seg = a["segmentations"][int(i)]
                if seg is None:
                    segs.append(None)
                elif isinstance(seg, dict):
                    segs.append(YT.mask_to_rle(rle_to_mask(seg, h, w)))
                else:
                    segs.append(YT.mask_to_rle(polygons_to_mask(seg, h, w)))
            gt_rows.append({
                "id": gt_id, "video_id": vid,
                "category_id": a["category_id"], "segmentations": segs,
            })
            gt_id += 1

    os.makedirs(args.output_dir, exist_ok=True)
    YT.write_results(results, os.path.join(args.output_dir, "results.json"))
    metrics = YT.evaluate_ytvis(results, gt_rows) if gt_rows else {}
    metrics = {k: v for k, v in metrics.items() if k != "per_class"}
    line = {"tracker": name, "num_videos": len(ds), **metrics}
    print(json.dumps(line))
    with open(os.path.join(args.output_dir, "eval.json"), "w") as f:
        json.dump(line, f)
    return line


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
    inter_idx = ADP.default_interaction_indexes(cfg.num_hidden_layers)
    adapter = ADP.init_adapter_params(k1, cfg,
                                      deform_num_heads=cfg.num_attention_heads,
                                      interaction_indexes=inter_idx)
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
            interaction_indexes=inter_idx,
        )

    fwd = jax.jit(
        lambda p, px: SEG.segmentor_forward(p["segmentor"], fpn_of(p, px),
                                            seg_cfg)
    )

    if args.eval_only:
        run_inference(args, fwd, params, d2_extras, seg_cfg)
        return

    from streamformer_tpu.downstream import ctvis_plugin as CL

    def loss_fn(p, px, matches, gt_cls, gt_masks, ids):
        # per-frame set loss (the adapter FPN and segmentor treat each of
        # the clip's T frames as one "image", leading dim B*T) + the CTVIS
        # contrastive plugin on the matched association embeddings
        # (CL_PLUGIN_NAME-dispatched: pairwise CTCLPlugin or MultiRef)
        out = SEG.segmentor_forward(p["segmentor"], fpn_of(p, px), seg_cfg)
        loss = SEG.criterion(out, matches, gt_cls, gt_masks, seg_cfg)
        if ids is not None and int(ids.shape[0]) >= 2:
            loss = loss + CL.cl_loss_from_config(
                out["embeddings"], ids, d2_extras
            )
        return loss

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
            # frames; host-side Hungarian keeps this per-sample); each frame
            # is matched independently, identities linked by the mask label
            px = jnp.asarray(
                s["frames"].astype(np.float32).transpose(0, 3, 1, 2)[None]
                / 127.5 - 1.0
            )
            sel = np.asarray(s["selected_classes"])
            mt = np.asarray(s["mask_target"])  # (T, H', W') int class idx
            inst = [c for c in np.unique(mt) if c >= 0]
            if not inst:
                continue
            nf, g = mt.shape[0], len(inst)
            h, w = mt.shape[1:]
            gt_cls = np.full((nf, g), -1, np.int64)
            gms = np.zeros((nf, g, h, w), np.float32)
            for t in range(nf):
                for gi, c in enumerate(inst):
                    m = mt[t] == c
                    if m.any():
                        gt_cls[t, gi] = int(sel[c]) if c < len(sel) else int(c)
                        gms[t, gi] = m
            gt_cls = jnp.asarray(gt_cls)
            gms = jnp.asarray(gms)

            out = fwd(params, px)
            matches = []
            ids = np.full((nf, seg_cfg.num_queries), -1, np.int64)
            for t in range(nf):
                valid = np.asarray(gt_cls[t]) >= 0
                qi, gi = SEG.hungarian_match(
                    np.asarray(out["pred_logits"][t]),
                    np.asarray(out["pred_masks"][t]),
                    np.asarray(gt_cls[t])[valid],
                    np.asarray(gms[t])[valid],
                    seg_cfg,
                )
                # remap gi back into the padded gt row
                vidx = np.flatnonzero(valid)
                matches.append((qi, vidx[gi]))
                ids[t, qi] = np.asarray(inst)[vidx[gi]]
            loss, grads = grad_step(
                params, px, matches, gt_cls, gms, jnp.asarray(ids)
            )
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

    if args.val_anno:
        run_inference(args, fwd, params, d2_extras, seg_cfg)


if __name__ == "__main__":
    main()
