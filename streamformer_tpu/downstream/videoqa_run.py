"""VideoQA stage-wise training + batch generation-eval CLI (reference
downstream/VideoQA llava/train/train.py + scripts/train/stage{1,2,3}*.sh;
eval mode mirrors llava/eval/model_vqa.py I/O).

Data: LLaVA-format JSON — [{"video": path, "conversations":
[{"from": "human", "value": "<image>\\nQ..."}, {"from": "gpt", "value":
"A..."}]}]. Each sample becomes (prompt tokens with the <image>
placeholder, answer tokens as labels); the splice plan expands the
placeholder into per-frame vision tokens inside the jitted step.

Usage:
    python -m streamformer_tpu.downstream.videoqa_run \
        --data llava_video.json --video_root videos/ --stage 1 \
        --model_path /ckpt/streamformer --lm_path /ckpt/qwen2

Batch generation-eval (reference llava/eval/model_vqa.py: question file ->
answers JSONL consumable by the official scorers; generation runs through
the continuous-batching DecodeEngine rather than lockstep generate):
    python -m streamformer_tpu.downstream.videoqa_run \
        --eval --data questions.json --answers_file answers.jsonl \
        --ckpt output/videoqa --num_chunks 8 --chunk_idx 0
"""

from __future__ import annotations

import argparse
import json
import math
import os
import time
import uuid

IMAGE_PLACEHOLDER = "<image>"


def get_args():
    p = argparse.ArgumentParser("StreamFormer-TPU VideoQA")
    p.add_argument("--data", required=True, help="LLaVA-format JSON")
    p.add_argument("--video_root", default="")
    p.add_argument("--output_dir", default="output/videoqa")
    p.add_argument("--stage", type=int, default=1, choices=[1, 2, 3])
    p.add_argument("--dpo", action="store_true",
                   help="DPO preference training (reference train_dpo.py): "
                   "--data rows are {video, prompt, chosen, rejected}; the "
                   "stage policy still controls trainability/LRs")
    p.add_argument("--dpo_beta", type=float, default=0.1)
    p.add_argument("--dpo_alpha", type=float, default=1.0)
    p.add_argument("--dpo_gamma", type=float, default=1.0,
                   help="weight of the auxiliary SFT-CE term on chosen")
    p.add_argument("--eval", action="store_true",
                   help="batch generation-eval: --data is a question "
                   "JSON/JSONL, answers written as JSONL "
                   "(reference llava/eval/model_vqa.py I/O)")
    p.add_argument("--answers_file", default=None,
                   help="eval output JSONL (default output_dir/answers.jsonl)")
    p.add_argument("--ckpt", default=None,
                   help="restore {tower, projector, lm} from a training "
                   "checkpoint dir before eval")
    p.add_argument("--max_new_tokens", type=int, default=64)
    p.add_argument("--temperature", type=float, default=0.0)
    p.add_argument("--top_p", type=float, default=None)
    p.add_argument("--extra_prompt", default="")
    p.add_argument("--num_chunks", type=int, default=1,
                   help="shard the question list across jobs "
                   "(reference get_chunk)")
    p.add_argument("--chunk_idx", type=int, default=0)
    p.add_argument("--engine_slots", type=int, default=8)
    p.add_argument("--model_path", default=None, help="HF backbone dir")
    p.add_argument("--lm_path", default=None,
                   help="HF Qwen2/Llama dir (safetensors) for the LM")
    p.add_argument("--tokenizer", default=None,
                   help="HF tokenizer dir; default = word-hash (smoke only)")
    p.add_argument("--epochs", type=int, default=1)
    p.add_argument("--num_frames", type=int, default=16)
    p.add_argument("--input_size", type=int, default=224)
    p.add_argument("--max_len", type=int, default=256)
    p.add_argument("--steps_per_epoch", type=int, default=0)
    p.add_argument("--eval_samples", type=int, default=2,
                   help="greedy-decode this many samples after each epoch")
    p.add_argument("--seed", type=int, default=0)
    # tiny-model overrides (smoke tests)
    p.add_argument("--hidden_size", type=int, default=768)
    p.add_argument("--num_layers", type=int, default=12)
    p.add_argument("--num_heads", type=int, default=12)
    p.add_argument("--intermediate_size", type=int, default=3072)
    p.add_argument("--lm_hidden", type=int, default=896)
    p.add_argument("--lm_layers", type=int, default=24)
    p.add_argument("--lm_heads", type=int, default=14)
    p.add_argument("--lm_kv_heads", type=int, default=2)
    p.add_argument("--lm_intermediate", type=int, default=4864)
    p.add_argument("--lm_vocab", type=int, default=151936)
    return p.parse_args()


class _HashTok:
    """Deterministic word-hash tokenizer (smoke runs without a local HF
    tokenizer; real runs pass --tokenizer)."""

    def __init__(self, vocab):
        self.vocab = vocab
        self.eos_token_id = 2

    def encode(self, text):
        from streamformer_tpu.utils.hash_tok import hash_word_id

        return [hash_word_id(w, self.vocab, reserved=3) for w in text.split()]


def split_chunks(lst, n, k):
    """Ceil-sized chunk k of n (reference llava/eval/model_vqa.py:23-31
    split_list/get_chunk) — shards the question list across jobs."""
    size = math.ceil(len(lst) / n) if lst else 1
    return lst[k * size:(k + 1) * size]


def run_eval(args, cfg, lm_cfg, params, tok, rows, load_video):
    """Batch generation-eval (reference llava/eval/model_vqa.py
    eval_model, :86-221): question rows -> answers JSONL in the reference
    schema (dataset/sample_id/prompt/pred_response/gt_response/shortuuid/
    model_id/question_type) so official scorers consume the output
    unchanged. The reference decodes one question at a time with lockstep
    model.generate; here up to --engine_slots questions share each decode
    step through the continuous-batching DecodeEngine."""
    import numpy as np
    from streamformer_tpu import lm_serving
    from streamformer_tpu.downstream import videoqa as VQ
    from streamformer_tpu.downstream.vision_tower import TimesformerVisionTower

    rows = split_chunks(rows, args.num_chunks, args.chunk_idx)
    answers_file = args.answers_file or os.path.join(
        args.output_dir, "answers.jsonl"
    )
    os.makedirs(os.path.dirname(answers_file) or ".", exist_ok=True)

    tower = TimesformerVisionTower(cfg, params["tower"])
    model = VQ.LlavaQwenModel(
        tower=tower, lm_cfg=lm_cfg,
        params={"projector": params["projector"], "lm": params["lm"]},
    )

    def question_of(row, turn):
        """Prompt text + token ids for the human turn at conversation
        index 2*turn. Only the first turn carries the <image> placeholder
        (reference rows put the image in turn 0; later turns ride the
        accumulated context)."""
        qs = row["conversations"][2 * turn]["value"]
        if args.extra_prompt:
            qs = args.extra_prompt + qs
        if turn == 0 and IMAGE_PLACEHOLDER not in qs:
            qs = IMAGE_PLACEHOLDER + "\n" + qs  # reference DEFAULT_IMAGE_TOKEN
        if turn > 0:
            qs = qs.replace(IMAGE_PLACEHOLDER, "").strip()
        ids, _ = build_sample(
            {"conversations": [{"from": "human", "value": qs}]},
            tok, VQ.IMAGE_TOKEN_INDEX,
        )
        return qs, ids

    def n_turns(row):
        return max(1, (len(row.get("conversations", [])) + 1) // 2)

    staged = []
    max_prompt = 1
    for i, row in enumerate(rows):
        qs, ids = question_of(row, 0)
        n_ph = int((ids == VQ.IMAGE_TOKEN_INDEX).sum())
        # spliced prompt length: each placeholder expands to T frame tokens;
        # multi-turn rows accumulate every turn's prompt + generated answer
        total = len(ids) - n_ph + n_ph * args.num_frames
        for t in range(1, n_turns(row)):
            total += args.max_new_tokens + len(question_of(row, t)[1])
        max_prompt = max(max_prompt, total)
        staged.append((i, row, qs, ids))

    cap = max(64, -(-(max_prompt + args.max_new_tokens) // 64) * 64)
    eng = lm_serving.DecodeEngine(
        params["lm"], lm_cfg, slots=args.engine_slots, capacity=cap,
        max_new_tokens=args.max_new_tokens,
        eos_token_id=getattr(tok, "eos_token_id", None),
        temperature=args.temperature, top_p=args.top_p, seed=args.seed,
    )
    model_id = os.path.basename(
        (args.ckpt or args.model_path or "streamformer-tpu").rstrip("/")
    )

    from streamformer_tpu.models import language_model as LM

    def text_embeds(ids):
        import jax.numpy as jnp

        safe = np.where(np.asarray(ids) == VQ.IMAGE_TOKEN_INDEX, 0,
                        np.asarray(ids))
        return np.asarray(
            LM.embed_tokens(params["lm"], jnp.asarray(safe)), np.float32
        )

    written = 0
    qpos = 0
    live = {}  # sid -> [row_idx, row, turn, prompt_text, tokens, prompt_emb]
    with open(answers_file, "w") as out_f:
        while qpos < len(staged) or live:
            while qpos < len(staged) and len(live) < args.engine_slots:
                i, row, qs, ids = staged[qpos]
                qpos += 1
                tower.clear_cache()  # fresh stream per question
                emb = np.asarray(
                    model.prompt_embeds(ids, load_video(row["video"],
                                                        mode="validation")),
                    np.float32,
                )
                live[eng.open(emb)] = [i, row, 0, qs, [], emb]
            eng.tick()
            for sid in list(live):
                toks, done = eng.poll(sid)
                st = live[sid]
                st[4].extend(int(t) for t in toks)
                if not done:
                    continue
                del live[sid]
                i, row, turn, qs, acc, emb = st
                text = (
                    tok.decode(acc, skip_special_tokens=True).strip()
                    if hasattr(tok, "decode") else ""
                )
                meta = row.get("metadata") or {}
                conv = row.get("conversations", [])
                gt_idx = 2 * turn + 1
                out_f.write(json.dumps({
                    "dataset": meta.get("dataset"),
                    "sample_id": row.get("sample_id", i),
                    "prompt": qs,
                    "pred_response": text,
                    "pred_token_ids": acc,  # smoke tokenizer has no decode
                    "gt_response": (conv[gt_idx]["value"]
                                    if len(conv) > gt_idx else None),
                    "shortuuid": uuid.uuid4().hex[:22],
                    "model_id": model_id,
                    "question_type": meta.get("question_type"),
                }) + "\n")
                out_f.flush()
                written += 1
                # multi-turn (reference model_vqa.py:165-218): each later
                # human turn re-generates on [prior prompt + generated
                # answer + new turn]; the video is encoded once (its
                # features live in the turn-0 prompt embeddings)
                if turn + 1 < n_turns(row):
                    nqs, nids = question_of(row, turn + 1)
                    new_emb = np.concatenate(
                        [emb, text_embeds(acc), text_embeds(nids)], axis=0
                    )
                    live[eng.open(new_emb)] = [i, row, turn + 1, nqs, [],
                                               new_emb]
    print(json.dumps({"eval": True, "answers_file": answers_file,
                      "num_questions": len(staged),
                      "num_answers": written}))


def build_sample(row, tok, image_token_index):
    """conversations -> (input_ids with placeholder, labels on gpt turns)."""
    ids, labels = [], []
    for turn in row["conversations"]:
        text = turn["value"]
        if turn["from"] == "human":
            parts = text.split(IMAGE_PLACEHOLDER)
            for pi, part in enumerate(parts):
                t = tok.encode(part.strip()) if part.strip() else []
                ids += t
                labels += [-100] * len(t)
                if pi < len(parts) - 1:
                    ids.append(image_token_index)
                    labels.append(-100)
        else:
            t = tok.encode(text.strip()) + [tok.eos_token_id]
            ids += t
            labels += t
    import numpy as np

    return np.asarray(ids, np.int64), np.asarray(labels, np.int64)


def main():
    args = get_args()
    import numpy as np
    import jax
    import jax.numpy as jnp

    from streamformer_tpu.config import StreamformerConfig
    from streamformer_tpu.checkpoint import hf_import
    from streamformer_tpu.data import video_io
    from streamformer_tpu.data.transforms import resize, to_model_input
    from streamformer_tpu.downstream import videoqa as VQ
    from streamformer_tpu.downstream.vision_tower import TimesformerVisionTower
    from streamformer_tpu.models import encoder as enc
    from streamformer_tpu.models import language_model as LM
    from streamformer_tpu.train import checkpoint as ckpt_lib
    from streamformer_tpu.train import metrics as metrics_lib

    os.makedirs(args.output_dir, exist_ok=True)
    cfg = StreamformerConfig(
        num_frames=args.num_frames,
        image_size=args.input_size,
        hidden_size=args.hidden_size,
        num_hidden_layers=args.num_layers,
        num_attention_heads=args.num_heads,
        intermediate_size=args.intermediate_size,
        dtype="float32",
        streaming_mode=True,
        context_length=args.num_frames,
    )
    if args.model_path:
        cfg, tower_params = hf_import.from_pretrained(args.model_path, cfg)
    else:
        tower_params = enc.init_params(jax.random.PRNGKey(args.seed), cfg)

    lm_cfg = LM.LMConfig(
        vocab_size=args.lm_vocab,
        hidden_size=args.lm_hidden,
        intermediate_size=args.lm_intermediate,
        num_hidden_layers=args.lm_layers,
        num_attention_heads=args.lm_heads,
        num_key_value_heads=args.lm_kv_heads,
        tie_word_embeddings=True,
    )
    if args.lm_path:
        import safetensors.numpy as stn

        sd = {}
        for fn in sorted(os.listdir(args.lm_path)):
            if fn.endswith(".safetensors"):
                sd.update(stn.load_file(os.path.join(args.lm_path, fn)))
        if "lm_head.weight" not in sd:
            sd["lm_head.weight"] = sd["model.embed_tokens.weight"]
        lm_params = LM.convert_hf_state_dict(sd, lm_cfg)
    else:
        lm_params = LM.init_params(jax.random.PRNGKey(args.seed + 1), lm_cfg)

    if args.tokenizer:
        from transformers import AutoTokenizer

        tok = AutoTokenizer.from_pretrained(args.tokenizer,
                                            local_files_only=True)
    else:
        tok = _HashTok(lm_cfg.vocab_size)

    proj = VQ.init_mm_projector(
        jax.random.PRNGKey(args.seed + 2), cfg.hidden_size, lm_cfg.hidden_size
    )
    params = {"tower": tower_params, "projector": proj, "lm": lm_params}
    if args.dpo:
        tx, step = VQ.make_videoqa_dpo_step(
            cfg, lm_cfg, stage=args.stage, beta=args.dpo_beta,
            dpo_alpha=args.dpo_alpha, gamma=args.dpo_gamma,
        )
        if not args.eval:  # the frozen DPO reference doubles param memory
            ref_params = jax.tree.map(jnp.copy, params)
    else:
        tx, step = VQ.make_videoqa_train_step(cfg, lm_cfg, args.stage)
    # optimizer state (2x param memory) is allocated on the training path
    # only — eval with --ckpt builds it lazily as a restore template
    opt_state = None if args.eval else tx.init(params)

    with open(args.data) as f:
        head = f.read(64)
        f.seek(0)
        # sniff past leading whitespace: pretty-printed JSON arrays open
        # with "\n[" / indentation, which is still JSON, not JSONL
        if head.lstrip()[:1] == "[":
            rows = json.load(f)
        else:  # JSONL question files (reference eval inputs ship both)
            rows = [json.loads(ln) for ln in f if ln.strip()]

    def load_video(path, mode="train"):
        vr = video_io.VideoReader(os.path.join(args.video_root, path))
        idx = video_io.sparse_sample_indices(len(vr), args.num_frames, mode)
        frames = vr.get_batch(idx)
        vr.close()
        x = resize(jnp.asarray(frames), (args.input_size, args.input_size))
        x = (x / 255.0 - 0.5) / 0.5
        return to_model_input(x)[None]  # (1, T, C, H, W)

    if args.eval:
        if args.ckpt:
            state = ckpt_lib.auto_resume(args.ckpt, {
                "params": params, "opt_state": tx.init(params),
                "meta": {"epoch": np.asarray(0, np.int64),
                         "step": np.asarray(0, np.int64)},
            })
            if state is None:
                raise SystemExit(f"no checkpoint-* under {args.ckpt}")
            params = state["params"]
        run_eval(args, cfg, lm_cfg, params, tok, rows, load_video)
        return

    for epoch in range(args.epochs):
        t0 = time.time()
        losses = []
        order = np.random.default_rng(args.seed + epoch).permutation(len(rows))
        reward_accs = []
        for si, ri in enumerate(order):
            row = rows[int(ri)]
            if args.dpo:
                def sub_of(resp):
                    conv = {"conversations": [
                        {"from": "human", "value": row["prompt"]},
                        {"from": "gpt", "value": resp},
                    ]}
                    ids, labels = build_sample(conv, tok,
                                               VQ.IMAGE_TOKEN_INDEX)
                    plan = VQ.build_splice_plan(ids, args.num_frames,
                                                args.max_len, labels)
                    sub = {k: jnp.asarray(v)[None] for k, v in plan.items()}
                    sub["text_ids"] = jnp.asarray(
                        np.where(ids == VQ.IMAGE_TOKEN_INDEX, 0, ids)
                    )[None]
                    return sub
                batch = {
                    "pixel_values": load_video(row["video"]),
                    "chosen": sub_of(row["chosen"]),
                    "rejected": sub_of(row["rejected"]),
                }
                params, opt_state, loss, m = step(params, ref_params,
                                                  opt_state, batch)
                reward_accs.append(float(m["reward_accuracy"]))
            else:
                ids, labels = build_sample(row, tok, VQ.IMAGE_TOKEN_INDEX)
                plan = VQ.build_splice_plan(ids, args.num_frames,
                                            args.max_len, labels)
                batch = {k: jnp.asarray(v)[None] for k, v in plan.items()}
                batch["text_ids"] = jnp.asarray(
                    np.where(ids == VQ.IMAGE_TOKEN_INDEX, 0, ids)
                )[None]
                batch["pixel_values"] = load_video(row["video"])
                params, opt_state, loss = step(params, opt_state, batch)
            losses.append(float(loss))
            if args.steps_per_epoch and si + 1 >= args.steps_per_epoch:
                break
        stats = {"epoch": epoch, "stage": args.stage,
                 "loss": float(np.mean(losses)),
                 "epoch_time": time.time() - t0}
        if args.dpo and reward_accs:
            stats["dpo"] = True
            stats["reward_accuracy"] = float(np.mean(reward_accs))
        print(json.dumps(stats))
        metrics_lib.write_log_line(args.output_dir, stats)
        ckpt_lib.save_checkpoint(args.output_dir, epoch, params, opt_state)

    # greedy-decode eval on a few samples (reference llava/eval video path)
    if args.eval_samples:
        tower = TimesformerVisionTower(cfg, params["tower"])
        model = VQ.LlavaQwenModel(
            tower=tower, lm_cfg=lm_cfg,
            params={"projector": params["projector"], "lm": params["lm"]},
        )
        for row in rows[: args.eval_samples]:
            ids, _ = build_sample(row, tok, VQ.IMAGE_TOKEN_INDEX)
            tower.clear_cache()
            ans = model.generate(ids, load_video(row["video"]),
                                 max_new_tokens=16,
                                 eos_token_id=tok.eos_token_id)
            print(json.dumps({"video": row["video"],
                              "answer_token_ids": ans[0].tolist()}))


if __name__ == "__main__":
    main()
