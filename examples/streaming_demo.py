"""Streaming-encode demo (the reference's test_kvcache.py usage pattern).

Encodes a video three ways and checks the KV-cache contract:
  #1 first half, fresh cache
  #2 full clip, fresh cache
  #3 second half, with the cache of #1 -> must equal the tail of #2

Run: python examples/streaming_demo.py [video.mp4]
(without an argument, uses random frames)
"""

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


if __name__ == "__main__":
    main()
