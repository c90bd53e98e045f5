"""GPipe-style pipeline parallelism for the encoder trunk.

The reference scales exclusively by DDP replication (SURVEY §2.11 — NCCL
DistributedDataParallel, ``utils.py:372-447``); it has no pipeline axis.
This module adds one the TPU-native way:

* the trunk's layers are **stacked** into per-stage pytrees — every
  encoder layer has identical shapes (``init_layer_params``), so stage
  ``s`` holds a ``(layers_per_stage, ...)`` tree and applies them with a
  single ``lax.scan`` (one traced layer body per stage instead of
  ``num_layers`` unrolled bodies → small programs, fast compiles);
* the stage stack has a leading ``(num_stages, ...)`` axis sharded over a
  ``pipe`` mesh axis; inside ``shard_map`` each device materialises only
  its own stage's weights (the point of pipelining: model memory is cut
  ``1/num_stages`` per chip);
* microbatches stream through the classic GPipe schedule —
  ``num_microbatches + num_stages - 1`` ticks; each tick every stage runs
  its resident microbatch, then activations hop one stage to the right via
  ``lax.ppermute`` (a single ICI neighbour-exchange; this is the transfer
  pattern TPU torii are built for);
* the whole schedule is a ``lax.scan``, so it is differentiable —
  ``jax.grad`` through the pipeline yields exactly the per-layer grads of
  the unpipelined trunk (``ppermute`` transposes to the reverse hop, the
  fill/drain masks transpose to the bubble of the backward schedule).

Composes with DP on a 2-D ``(data, pipe)`` mesh: the batch axis is sharded
over ``data`` (each data-slice runs its own pipeline), and gradient psums
over ``data`` are emitted by pjit as usual. Bubble fraction is the GPipe
``(S-1)/(M+S-1)``; choose ``num_microbatches >= 4*num_stages`` to keep it
under ~20%.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Optional, Sequence

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
try:  # jax >= 0.8 top-level; older releases under experimental
    from jax import shard_map
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map

from ..config import StreamformerConfig
from ..models import encoder


def make_pipeline_mesh(
    data: Optional[int] = None,
    pipe: int = 1,
    devices: Optional[Sequence] = None,
) -> Mesh:
    """A ``(data, pipe)`` mesh. ``pipe`` should map to an ICI-contiguous
    run of devices so the ppermute hop is a physical neighbour exchange."""
    devices = list(devices if devices is not None else jax.devices())
    if data is None:
        data = len(devices) // pipe
    assert data * pipe <= len(devices), (data, pipe, len(devices))
    arr = np.array(devices[: data * pipe]).reshape(data, pipe)
    return Mesh(arr, ("data", "pipe"))


def stack_pipeline_params(params: Dict[str, Any], num_stages: int):
    """Stack the per-layer param list into a ``(num_stages,
    layers_per_stage, ...)`` tree (plus the stage-stacked drop-path rate
    table). The non-layer leaves (embeddings, post-LN, MAP head) are left
    untouched — they run replicated outside the pipeline body.

    Do this once at setup (it is a host-side restack); the stacked tree is
    what gets placed with ``P('pipe', ...)`` leading-axis sharding.
    """
    layers = params["layers"]
    L = len(layers)
    assert L % num_stages == 0, (
        f"num_hidden_layers={L} not divisible by num_stages={num_stages}"
    )
    per = L // num_stages
    stacked = jax.tree_util.tree_map(
        lambda *xs: jnp.stack(xs).reshape((num_stages, per) + xs[0].shape),
        *layers,
    )
    return stacked, per


def _stage_rates(cfg: StreamformerConfig, num_stages: int) -> jnp.ndarray:
    """(num_stages, layers_per_stage) stochastic-depth rates — the same
    linear ramp as the sequential trunk (encoder._drop_path_rates)."""
    rates = jnp.asarray(encoder._drop_path_rates(cfg), jnp.float32)
    return rates.reshape(num_stages, -1)


def pipelined_trunk(
    stacked_layers,
    x: jnp.ndarray,
    cfg: StreamformerConfig,
    *,
    mesh: Mesh,
    num_microbatches: int,
    rng=None,
    deterministic: bool = True,
) -> jnp.ndarray:
    """Run the encoder trunk (all transformer layers) as a GPipe pipeline.

    ``stacked_layers``: output of :func:`stack_pipeline_params` (leading
    axis = stage, sharded over ``pipe``). ``x``: embedded activations
    (B, T, N, D), batch sharded over ``data``. Returns (B, T, N, D).
    """
    S = mesh.shape["pipe"]
    M = num_microbatches
    B = x.shape[0]
    dp = mesh.shape.get("data", 1)
    assert B % (dp * M) == 0, (
        f"per-data-shard batch {B}/{dp} not divisible by "
        f"num_microbatches {M}"
    )
    assert not cfg.shard_patches, (
        "shard_patches (GSPMD sequence sharding) cannot be combined with "
        "the manual shard_map pipeline; shard the patch axis outside"
    )
    per = jax.tree_util.tree_leaves(stacked_layers)[0].shape[1]
    rates = _stage_rates(cfg, S) if per * S == cfg.num_hidden_layers else (
        jnp.zeros((S, per), jnp.float32)
    )
    # global layer indices, for rng fold-in parity with model_forward
    layer_idx = jnp.arange(S * per, dtype=jnp.int32).reshape(S, per)
    use_rng = rng is not None and not deterministic
    key = rng if use_rng else jax.random.PRNGKey(0)

    def stage_apply(stage_tree, stage_rates, stage_idx, xmb, mb_idx):
        """Apply this device's layers_per_stage layers with one scan.

        ``mb_idx`` (traced scalar) folds the microbatch into the RNG —
        without it every microbatch draws the SAME dropout/drop-path mask
        per layer (same key, same (B/M, ...) shape), correlating stochastic
        regularization across the batch in a way the unpipelined
        model_forward (one draw over the full B) never does."""

        def body(h, inp):
            lp, rate, idx = inp
            lrng = (
                jax.random.fold_in(
                    jax.random.fold_in(key, 1000 + idx), mb_idx
                )
                if use_rng else None
            )
            h = encoder.layer_forward(
                lp,
                h,
                cfg,
                drop_path_rate=rate if use_rng else 0.0,
                rng=lrng,
                deterministic=deterministic,
            )
            return h, None

        scan_body = jax.checkpoint(body) if cfg.remat == "layer" else body
        h, _ = lax.scan(scan_body, xmb, (stage_tree, stage_rates, stage_idx))
        return h

    def pipe_fn(stage_tree, stage_rates, stage_idx, xb):
        # per-device view: stage_tree leaves (1, per, ...); xb is the local
        # data-shard of activations (B_local, T, N, D)
        stage_tree = jax.tree_util.tree_map(lambda a: a[0], stage_tree)
        stage_rates, stage_idx = stage_rates[0], stage_idx[0]
        s = lax.axis_index("pipe")
        mb = xb.reshape((M, xb.shape[0] // M) + xb.shape[1:])

        state = jnp.zeros_like(mb[0])
        out = jnp.zeros_like(mb)
        fwd = [(i, (i + 1) % S) for i in range(S)]

        def tick(carry, t):
            state, out = carry
            # stage 0 ingests microbatch t during the fill/steady phase;
            # other stages consume what arrived over ICI last tick
            x_in = lax.dynamic_index_in_dim(
                mb, jnp.clip(t, 0, M - 1), 0, keepdims=False
            )
            h = jnp.where(s == 0, x_in, state)
            # stage s processes microbatch t - s at tick t (fill/drain ticks
            # compute discarded work, so the clamp only affects dead lanes)
            m = jnp.clip(t - s, 0, M - 1)
            y = stage_apply(stage_tree, stage_rates, stage_idx, h, m)
            # last stage retires microbatch t-(S-1) once the pipe is full
            w = jnp.clip(t - (S - 1), 0, M - 1)
            out_upd = lax.dynamic_update_index_in_dim(out, y, w, 0)
            write = jnp.logical_and(s == S - 1, t >= S - 1)
            out = jnp.where(write, out_upd, out)
            state = lax.ppermute(y, "pipe", fwd)
            return (state, out), None

        (state, out), _ = lax.scan(
            tick, (state, out), jnp.arange(M + S - 1, dtype=jnp.int32)
        )
        # only the last stage holds real outputs; broadcast over the pipe
        out = jnp.where(s == S - 1, out, jnp.zeros_like(out))
        out = lax.psum(out, "pipe")
        return out.reshape(xb.shape)

    fn = shard_map(
        pipe_fn,
        mesh=mesh,
        in_specs=(
            jax.tree_util.tree_map(lambda _: P("pipe"), stacked_layers),
            P("pipe"),
            P("pipe"),
            P("data"),
        ),
        out_specs=P("data"),
        check_vma=False,
    )
    return fn(stacked_layers, rates, layer_idx, x)


def model_forward_pp(
    params: Dict[str, Any],
    pixel_values: jnp.ndarray,
    cfg: StreamformerConfig,
    *,
    mesh: Mesh,
    num_microbatches: int,
    stacked_layers=None,
    rng=None,
    deterministic: bool = True,
) -> Dict[str, jnp.ndarray]:
    """Pipelined full-clip forward with the published-checkpoint contract
    (``last_hidden_state``/``pooler_output`` —
    modeling_timesformer_siglip.py:1332-1354), numerically identical to
    ``encoder.model_forward`` when deterministic.

    Embedding and the post-LN/MAP head run replicated over ``pipe`` (they
    are <2% of trunk FLOPs at 12 layers); in a memory-bound deployment
    place them with the first/last stage via ``stacked_layers`` +
    explicit device_put of the small non-layer leaves.
    """
    if stacked_layers is None:
        stacked_layers, _ = stack_pipeline_params(params, mesh.shape["pipe"])
    x = encoder.embed(
        params, pixel_values, cfg, rng=rng, deterministic=deterministic
    )
    x = pipelined_trunk(
        stacked_layers,
        x,
        cfg,
        mesh=mesh,
        num_microbatches=num_microbatches,
        rng=rng,
        deterministic=deterministic,
    )
    x = encoder.layer_norm(x, params["post_layernorm"], cfg.layer_norm_eps)
    pooled = encoder.map_pool(x, params["map_head"], cfg)
    return {"last_hidden_state": x, "pooler_output": pooled}


def place_pipeline_params(params: Dict[str, Any], mesh: Mesh):
    """Device-place a param tree for pipelined training: layer stack
    sharded over ``pipe`` (leading stage axis), everything else
    replicated. Returns ``(non_layer_params, stacked_layers)``."""
    S = mesh.shape["pipe"]
    stacked, _ = stack_pipeline_params(params, S)
    stacked = jax.tree_util.tree_map(
        lambda a: jax.device_put(a, NamedSharding(mesh, P("pipe"))), stacked
    )
    rest = {k: v for k, v in params.items() if k != "layers"}
    rest = jax.tree_util.tree_map(
        lambda a: jax.device_put(a, NamedSharding(mesh, P())), rest
    )
    return rest, stacked
