"""AOT export: serialize compiled StreamFormer programs for deployment.

Deployment story the torch reference does not have (its serving path IS
the training model code, modeling_timesformer_siglip.py imported at
inference time): trace + lower ONCE on the build machine, write a
versioned artifact, and serve it from any process with only
``load_exported`` — no model code, no retrace, no Python-side config.
This is the TPU-native equivalent of a TorchScript/ONNX export: the
artifact embeds StableHLO plus the calling convention (pytree structure
of params/cache), so a server needs just the weight pytree (orbax /
``checkpoint.hf_import``) and this loader.

Platform semantics: the program is lowered for the platform(s) requested
at export time. Lowering on a TPU host (or passing ``platforms=("tpu",)``)
embeds the fused Pallas kernels (encoder dispatch is by backend at trace
time, encoder.py ``_use_pallas``); lowering on CPU embeds the portable
einsum path. Export production TPU artifacts on (or for) TPU.

The serialized form is ``jax.export``'s versioned StableHLO bytes —
stable across jax releases per its compatibility guarantees.
"""

from __future__ import annotations

from functools import partial
from typing import Callable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from jax import export as jexport

from streamformer_tpu.config import StreamformerConfig
from streamformer_tpu.models import encoder

__all__ = [
    "export_streaming_step",
    "export_full_clip",
    "export_lm_decode",
    "export_sharded_forward",
    "load_exported",
]


def _abstract(tree):
    return jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), tree
    )


def _params_abstract(cfg: StreamformerConfig):
    """Abstract param pytree without materializing weights."""
    return jax.eval_shape(
        lambda: encoder.init_params(jax.random.PRNGKey(0), cfg)
    )


def export_streaming_step(
    cfg: StreamformerConfig,
    batch: int,
    t_new: int = 1,
    *,
    per_stream_len: bool = False,
    quantized_weights: bool = False,
    platforms: Optional[Sequence[str]] = None,
    path: Optional[str] = None,
) -> bytes:
    """Serialize the compiled streaming step.

    The exported callable has signature
    ``(params, frames (B, t_new, 3, H, W), cache) -> (outputs, new_cache)``
    with ``outputs = {"pooler_output": (B, t_new, D),
    "last_hidden_state": (B, t_new, N, D)}`` — the
    ``streaming_forward`` contract (reference test_kvcache.py:55-88).
    The cache argument is donated (in-place update on TPU, exactly like
    the live serving path). ``per_stream_len`` exports the ragged
    continuous-batching variant (cache["len"] is (B,)).
    ``quantized_weights`` exports the int8-dense serving program — the
    artifact then expects the pytree produced by
    ``ops.quant.quantize_encoder_params`` instead of raw params.

    No weights are needed at export time: shapes come from ``cfg`` via
    ``jax.eval_shape``. Returns the serialized bytes; also written to
    ``path`` when given.
    """
    step = jax.jit(
        partial(encoder.streaming_forward, cfg=cfg), donate_argnums=(2,)
    )
    params_s = _params_abstract(cfg)
    if quantized_weights:
        from streamformer_tpu.ops import quant

        params_s = jax.eval_shape(quant.quantize_encoder_params, params_s)
    frames_s = jax.ShapeDtypeStruct(
        (batch, t_new, 3, cfg.image_size, cfg.image_size),
        jnp.dtype(cfg.dtype),
    )
    cache_s = jax.eval_shape(
        lambda: encoder.init_cache(
            cfg, batch=batch, per_stream_len=per_stream_len
        )
    )
    kw = {} if platforms is None else {"platforms": list(platforms)}
    exp = jexport.export(step, **kw)(params_s, frames_s, cache_s)
    blob = exp.serialize()
    if path:
        with open(path, "wb") as f:
            f.write(blob)
    return blob


def export_full_clip(
    cfg: StreamformerConfig,
    batch: int,
    num_frames: Optional[int] = None,
    *,
    platforms: Optional[Sequence[str]] = None,
    path: Optional[str] = None,
) -> bytes:
    """Serialize the compiled full-clip forward.

    Exported signature: ``(params, pixel_values (B, T, 3, H, W)) ->
    {"pooler_output": (B, T, D), "last_hidden_state": (B, T, N, D)}`` —
    the published-checkpoint contract
    (modeling_timesformer_siglip.py:1332-1354).
    """
    t = num_frames if num_frames is not None else cfg.num_frames
    fwd = jax.jit(partial(encoder.model_forward, cfg=cfg))
    params_s = _params_abstract(cfg)
    px_s = jax.ShapeDtypeStruct(
        (batch, t, 3, cfg.image_size, cfg.image_size), jnp.dtype(cfg.dtype)
    )
    kw = {} if platforms is None else {"platforms": list(platforms)}
    exp = jexport.export(fwd, **kw)(params_s, px_s)
    blob = exp.serialize()
    if path:
        with open(path, "wb") as f:
            f.write(blob)
    return blob


def export_lm_decode(
    lm_cfg,
    slots: int,
    capacity: int,
    *,
    quantized_weights: bool = False,
    cache_dtype: Optional[str] = None,
    platforms: Optional[Sequence[str]] = None,
    path: Optional[str] = None,
) -> bytes:
    """Serialize the continuous-batching LM decode step.

    Exported signature: ``(params, toks (S,), cache, active (S,) bool) ->
    (next_tokens (S,) int32, new_cache)`` over the ragged per-stream cache
    (``language_model.init_cache(per_stream_len=True)``) — the greedy form
    of lm_serving.DecodeEngine's hot program, INCLUDING the idle-slot
    hold: rows where ``active`` is False have their frontier rolled back
    so a free/finished slot is not advanced (their returned token is
    meaningless). Temperature sampling is engine-side state and is not
    embedded; a sampling deployment exports its own step or re-ranks the
    logits host-side. ``quantized_weights`` expects the ops.quant int8
    tree; ``cache_dtype`` exports the int8-KV cache layout.

    Compatibility: the cache plane shape is part of the serialized
    signature. r5 flattened LM cache planes from 4-D (B, C, hkv, dh) to
    3-D (B, C, hkv*dh) (language_model.init_cache — kills per-iteration
    relayout copies in scanned decode ticks), so artifacts exported
    before that change reject caches built by current ``init_cache``:
    re-export them. Artifacts pin their OWN shapes, so a re-export is a
    call to this function — no weights change.
    """
    from streamformer_tpu.models import language_model as LM

    def step(params, toks, cache, active):
        emb = LM.embed_tokens(params, toks)[:, None]
        out, cache = LM.forward(params, emb, lm_cfg, cache=cache)
        cache = {
            **cache,
            "len": jnp.where(active, cache["len"], cache["len"] - 1),
        }
        ntok = jnp.argmax(out["logits"][:, -1], axis=-1).astype(jnp.int32)
        return ntok, cache

    fn = jax.jit(step, donate_argnums=(2,))
    params_s = jax.eval_shape(
        lambda: LM.init_params(jax.random.PRNGKey(0), lm_cfg)
    )
    if quantized_weights:
        from streamformer_tpu.ops import quant

        params_s = jax.eval_shape(quant.quantize_encoder_params, params_s)
    toks_s = jax.ShapeDtypeStruct((slots,), jnp.int32)
    active_s = jax.ShapeDtypeStruct((slots,), jnp.bool_)
    cache_s = jax.eval_shape(
        lambda: LM.init_cache(lm_cfg, slots, capacity, per_stream_len=True,
                              cache_dtype=cache_dtype)
    )
    kw = {} if platforms is None else {"platforms": list(platforms)}
    exp = jexport.export(fn, **kw)(params_s, toks_s, cache_s, active_s)
    blob = exp.serialize()
    if path:
        with open(path, "wb") as f:
            f.write(blob)
    return blob


def export_sharded_forward(
    cfg: StreamformerConfig,
    batch: int,
    mesh,
    num_frames: Optional[int] = None,
    *,
    path: Optional[str] = None,
) -> bytes:
    """Serialize the GSPMD-partitioned full-clip forward.

    Partitioning: DP over the mesh "data" axis (batch rows), Megatron TP
    over "model" (parallel/sharding.py column/row specs), outputs
    replicated. The artifact records the mesh size and the per-argument
    shardings; at load time, call it under an equally-sized device set
    with params placed by ``parallel.sharding.shard_params`` — XLA re-runs
    the same partitioned program, collectives included. This is the
    multi-chip deployment artifact (a 7B VideoQA tower on 16 GB v5e chips
    serves TP-sharded; SURVEY §2.11).
    """
    from streamformer_tpu.parallel import sharding as S

    t = num_frames if num_frames is not None else cfg.num_frames
    params_s = _params_abstract(cfg)
    fwd = jax.jit(
        partial(encoder.model_forward, cfg=cfg),
        in_shardings=(
            S.param_shardings(params_s, mesh),
            S.batch_sharding(mesh),
        ),
        out_shardings=S.replicated(mesh),
    )
    px_s = jax.ShapeDtypeStruct(
        (batch, t, 3, cfg.image_size, cfg.image_size), jnp.dtype(cfg.dtype)
    )
    exp = jexport.export(fwd)(params_s, px_s)
    blob = exp.serialize()
    if path:
        with open(path, "wb") as f:
            f.write(blob)
    return blob


def load_exported(blob_or_path) -> Callable:
    """Deserialize an exported artifact into a callable.

    Accepts the bytes returned by the exporters or a filesystem path.
    The returned callable takes/returns the original pytrees (params,
    arrays, cache dicts) — structure is embedded in the artifact.
    """
    if isinstance(blob_or_path, str):
        with open(blob_or_path, "rb") as f:
            blob = f.read()
    else:
        blob = blob_or_path
    exp = jexport.deserialize(blob)
    return exp.call


def main(argv: Optional[Sequence[str]] = None) -> None:
    """CLI: write deployment artifacts for a config.

    python -m streamformer_tpu.export --out model.bin [--streaming]
        [--batch 8] [--t_new 1] [--capacity 16] [--ragged]
    """
    import argparse

    p = argparse.ArgumentParser(description=main.__doc__)
    p.add_argument("--out", required=True)
    p.add_argument("--streaming", action="store_true",
                   help="export the streaming step (default: full clip)")
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--t_new", type=int, default=1)
    p.add_argument("--num_frames", type=int, default=16)
    p.add_argument("--capacity", type=int, default=16)
    p.add_argument("--ragged", action="store_true",
                   help="per-stream lengths (continuous batching)")
    p.add_argument("--int8_weights", action="store_true",
                   help="int8-dense serving program (expects the "
                        "quantize_encoder_params pytree)")
    p.add_argument("--dtype", default="bfloat16")
    args = p.parse_args(argv)

    if (args.ragged or args.int8_weights) and not args.streaming:
        p.error("--ragged/--int8_weights are streaming-step options; "
                "pass --streaming")
    cfg = StreamformerConfig(
        dtype=args.dtype, cache_capacity=args.capacity,
        num_frames=args.num_frames,
    )
    if args.streaming:
        blob = export_streaming_step(
            cfg, args.batch, args.t_new, per_stream_len=args.ragged,
            quantized_weights=args.int8_weights, path=args.out,
        )
    else:
        blob = export_full_clip(
            cfg, args.batch, args.num_frames, path=args.out
        )
    print(f"wrote {len(blob)} bytes -> {args.out}")


if __name__ == "__main__":
    main()
