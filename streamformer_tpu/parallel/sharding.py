"""Sharding rules for the StreamFormer param tree and activations.

The reference's only parallelism is DP/ZeRO over NCCL (SURVEY §2.11). The
TPU rebuild adds first-class tensor sharding on a 2-D ``(data, model)``
mesh:

* batch axis -> ``data`` (DP; gradient psum emitted by pjit);
* Megatron-style TP over ``model``: column-parallel qkv / mlp.fc1 (output
  dim sharded), row-parallel out-proj / mlp.fc2 (input dim sharded) — one
  all-reduce per block boundary, inserted by GSPMD;
* optimizer state inherits the param shardings (ZeRO-3 analog: fully
  sharded over ``model``, replicated over ``data``; flip
  ``zero_over_data=True`` to also shard large kernels over ``data``).

Patch-axis (sequence) sharding for the temporal attention — which has no
cross-patch interaction (SURVEY §5.7) — comes free with activation
constraints on N when scaling further.
"""

from __future__ import annotations

from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

# encoder tree (models/encoder.py): fused qkv + MLP fc1/fc2 + projections.
# LM tree (models/language_model.py): split q/k/v + SwiGLU gate/up/down —
# the Qwen2.5/Llama vision-tower deployment story (a 7B LM is ~14 GB bf16,
# above a single 16 GB v5e chip once the KV cache lands; TP=2 over ICI
# halves both weights and cache).
COLUMN_PARALLEL = ("qkv", "fc1", "q", "k", "v", "gate", "up")  # output dim
ROW_PARALLEL = ("out", "fc2", "temporal_dense", "o", "down")  # input dim


def _path_names(path):
    return [str(getattr(k, "key", getattr(k, "idx", ""))) for k in path]


def param_spec(path, leaf) -> P:
    names = _path_names(path)
    if leaf.ndim < 2:
        return P()
    parent = names[-2] if len(names) >= 2 else ""
    if names[-1] == "kernel":
        if parent in COLUMN_PARALLEL:
            return P(None, "model")
        if parent in ROW_PARALLEL:
            return P("model", None)
    # LM embedding / head matrices are plain leaves (no {"kernel": ...}):
    # vocab-shard both (embed_tokens (V, D) dim 0, lm_head (D, V) dim 1) —
    # GSPMD turns sharded-vocab logits + gather into the usual
    # all-gather/psum pair
    if names[-1] == "embed_tokens":
        return P("model", None)
    if names[-1] == "lm_head":
        return P(None, "model")
    return P()


def shard_params(params, mesh: Mesh):
    """Apply TP shardings; leaves whose sharded dim is not divisible by the
    mesh axis stay replicated."""

    def place(path, x):
        spec = param_spec(path, x)
        # divisibility guard
        for dim, axis in enumerate(spec):
            if axis is not None and x.shape[dim] % mesh.shape[axis] != 0:
                spec = P()
                break
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map_with_path(place, params)


def param_shardings(params, mesh: Mesh):
    """The NamedSharding tree (for jit out_shardings / opt-state init)."""

    def spec_of(path, x):
        spec = param_spec(path, x)
        for dim, axis in enumerate(spec):
            if axis is not None and x.shape[dim] % mesh.shape[axis] != 0:
                spec = P()
                break
        return NamedSharding(mesh, spec)

    return jax.tree_util.tree_map_with_path(spec_of, params)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
