"""VideoQA serving end-to-end: tower -> splice -> continuous batching.

Small-config walkthrough of the production path (runs on CPU or TPU):

1. build a toy tower + projector + LM (swap in real checkpoints via
   checkpoint.hf_import / models.language_model.convert_hf_state_dict),
2. three questions about three different videos become spliced prompt
   embeddings (LlavaQwenModel.prompt_embeds),
3. the DecodeEngine serves them concurrently over 2 slots — answers are
   identical to lone model.generate calls,
4. the same engine goes behind HTTP (server.DecodeServer) and request #4
   arrives over a real socket.

python examples/videoqa_serving_demo.py
"""

import base64
import json
import sys
import urllib.request

sys.path.insert(0, ".")  # run from the repo root without installing

import numpy as np
import jax
import jax.numpy as jnp

from streamformer_tpu.config import StreamformerConfig
from streamformer_tpu.models import encoder
from streamformer_tpu.models import language_model as LM
from streamformer_tpu.downstream import videoqa as VQ
from streamformer_tpu.downstream.vision_tower import TimesformerVisionTower
from streamformer_tpu.lm_serving import DecodeEngine
from streamformer_tpu.server import DecodeServer


def main():
    cfg = StreamformerConfig(
        image_size=32, patch_size=16, num_frames=4, hidden_size=64,
        num_hidden_layers=2, num_attention_heads=4, intermediate_size=128,
        dtype="float32", use_pallas=False,
    )
    lm_cfg = LM.LMConfig(
        vocab_size=64, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=64, tie_word_embeddings=True,
    )
    tower_params = encoder.init_params(jax.random.PRNGKey(0), cfg)
    lm_params = LM.init_params(jax.random.PRNGKey(1), lm_cfg)
    proj = VQ.init_mm_projector(jax.random.PRNGKey(2), cfg.hidden_size, 32)
    model = VQ.LlavaQwenModel(
        tower=TimesformerVisionTower(cfg, tower_params,
                                     streaming_mode=False),
        lm_cfg=lm_cfg, params={"projector": proj, "lm": lm_params},
    )

    rng = np.random.default_rng(0)
    videos = [jnp.asarray(rng.standard_normal((1, 4, 3, 32, 32)),
                          jnp.float32) for _ in range(3)]
    prompts = [np.array([3, VQ.IMAGE_TOKEN_INDEX, 9 + i, 12])
               for i in range(3)]

    # lone answers (the reference-style one-at-a-time path)
    lone = [model.generate(p, v, max_new_tokens=4)[0]
            for p, v in zip(prompts, videos)]

    # continuous batching: all three concurrently over 2 slots
    eng = DecodeEngine(lm_params, lm_cfg, slots=2, capacity=32,
                       max_new_tokens=4, prefill_buckets=(8, 16))
    rids = [eng.open(model.prompt_embeds(p, v))
            for p, v in zip(prompts, videos)]
    eng.run_until_idle()
    for i, rid in enumerate(rids):
        toks, done = eng.poll(rid)
        match = "==" if list(lone[i]) == toks else "!="
        print(f"request {rid}: engine {toks} {match} lone {list(lone[i])}")
        assert done and list(lone[i]) == toks

    # the same engine behind HTTP
    srv = DecodeServer(lm_params, lm_cfg, port=0, slots=2, capacity=32,
                       max_new_tokens=4, prefill_buckets=(8, 16)).start()
    try:
        emb = np.asarray(model.prompt_embeds(prompts[0], videos[0]),
                         np.float32)
        body = json.dumps({
            "embeds_b64": base64.b64encode(
                np.ascontiguousarray(emb).tobytes()).decode(),
            "shape": list(emb.shape),
        }).encode()
        req = urllib.request.Request(
            f"http://127.0.0.1:{srv.port}/requests", data=body,
            method="POST", headers={"Content-Type": "application/json"},
        )
        with urllib.request.urlopen(req, timeout=30) as r:
            rid = json.loads(r.read())["rid"]
        import time
        toks, deadline = [], time.time() + 60
        while time.time() < deadline:
            with urllib.request.urlopen(
                f"http://127.0.0.1:{srv.port}/requests/{rid}/tokens",
                timeout=30,
            ) as r:
                out = json.loads(r.read())
            toks += out["tokens"]
            if out["done"]:
                break
            time.sleep(0.05)
        print(f"HTTP request {rid}: {toks} (expected {list(lone[0])})")
        assert toks == list(lone[0])
    finally:
        srv.stop()
    print("videoqa serving demo OK")


if __name__ == "__main__":
    main()
