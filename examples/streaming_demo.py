"""Streaming-encode demo (the reference's test_kvcache.py usage pattern).

Encodes a video three ways and checks the KV-cache contract:
  #1 first half, fresh cache
  #2 full clip, fresh cache
  #3 second half, with the cache of #1 -> must equal the tail of #2

Run: python examples/streaming_demo.py [video.mp4]
(without an argument, uses random frames)
STREAMFORMER_DEMO_SMOKE=1 shrinks to a toy config so the demo finishes in
seconds on a CPU (the default flagship 768x12 config wants a TPU).
"""

import os
import sys

import numpy as np
import jax
import jax.numpy as jnp
from functools import partial

sys.path.insert(0, ".")
from streamformer_tpu.config import StreamformerConfig
from streamformer_tpu.models import encoder
from streamformer_tpu.extract.oad import preprocess_frames


def main():
    if os.environ.get("STREAMFORMER_DEMO_SMOKE") == "1":
        cfg = StreamformerConfig(
            image_size=48, num_frames=8, hidden_size=96,
            num_hidden_layers=3, num_attention_heads=4,
            intermediate_size=192, dtype="float32", use_pallas=False,
            cache_capacity=32,
        )
    else:
        cfg = StreamformerConfig(dtype="float32", use_pallas=False,
                                 cache_capacity=32)
    params = encoder.init_params(jax.random.PRNGKey(0), cfg)
    for lp in params["layers"]:
        lp["temporal_attention_gating"] = jnp.asarray(0.5)

    if len(sys.argv) > 1:
        from streamformer_tpu.data.video_io import read_video_full

        frames, _ = read_video_full(sys.argv[1])
        frames = frames[:16]
        px = preprocess_frames(frames, cfg.image_size)[None]
    else:
        px = jnp.asarray(
            np.random.default_rng(0).standard_normal(
                (1, 16, 3, cfg.image_size, cfg.image_size)
            ),
            jnp.float32,
        )

    step = jax.jit(partial(encoder.streaming_forward, cfg=cfg),
                   donate_argnums=(2,))

    # 1: first 8 frames
    cache = encoder.init_cache(cfg, batch=1)
    out1, cache = step(params, px[:, :8], cache)
    print("#1 first-half pooled[0, -1, :4] =",
          np.asarray(out1["pooler_output"][0, -1, :4]))

    # 2: full 16 frames, fresh
    full = encoder.model_forward(params, px, cfg)
    print("#2 full-clip  pooled[0, -1, :4] =",
          np.asarray(full["pooler_output"][0, -1, :4]))

    # 3: second 8 frames continuing #1's cache
    out3, cache = step(params, px[:, 8:], cache)
    print("#3 cached-2nd pooled[0, -1, :4] =",
          np.asarray(out3["pooler_output"][0, -1, :4]))

    err = np.abs(
        np.asarray(out3["pooler_output"]) -
        np.asarray(full["pooler_output"][:, 8:])
    ).max()
    print(f"#3 vs #2 tail max abs err: {err:.2e}  "
          f"({'OK' if err < 1e-4 else 'MISMATCH'})")

    # 4: unbounded stream — ring mode keeps a sliding cache_capacity-frame
    # window in fixed HBM, so the stream can run forever (the reference's
    # DynamicCache grows without bound)
    cfg_ring = cfg.replace(cache_mode="ring", cache_capacity=8)
    ring_step = jax.jit(partial(encoder.streaming_forward, cfg=cfg_ring),
                        donate_argnums=(2,))
    rcache = encoder.init_cache(cfg_ring, batch=1)
    for t in range(px.shape[1] * 3):  # 3x longer than capacity: wraps twice
        out4, rcache = ring_step(params, px[:, t % px.shape[1]][:, None],
                                 rcache)
    print("#4 ring stream (48 frames through an 8-frame window) pooled[0,-1,:4] =",
          np.asarray(out4["pooler_output"][0, -1, :4]),
          "| finite:", bool(np.isfinite(
              np.asarray(out4["pooler_output"], np.float32)).all()))

    # 5: int8 serving — quantized dense (MXU s8s8s32) + int8 KV cache
    from streamformer_tpu.ops import quant

    qparams = quant.quantize_encoder_params(params)
    cfg_q = cfg.replace(cache_dtype="int8")
    qstep = jax.jit(partial(encoder.streaming_forward, cfg=cfg_q),
                    donate_argnums=(2,))
    qcache = encoder.init_cache(cfg_q, batch=1)
    o5a, qcache = qstep(qparams, px[:, :8], qcache)
    o5b, qcache = qstep(qparams, px[:, 8:], qcache)
    got = np.concatenate([np.asarray(o5a["pooler_output"], np.float32),
                          np.asarray(o5b["pooler_output"], np.float32)], 1)
    ref = np.asarray(full["pooler_output"], np.float32)
    cos = (got.ravel() @ ref.ravel()) / (
        np.linalg.norm(got) * np.linalg.norm(ref))
    print(f"#5 int8 weights + int8 KV vs float full-clip cosine: {cos:.5f}")


if __name__ == "__main__":
    main()
