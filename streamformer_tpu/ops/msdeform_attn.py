"""Multi-Scale Deformable Attention (MSDeformAttn) — TPU-native.

The reference's only native component is a CUDA im2col implementation
(downstream/OVIS/mask2former/modeling/pixel_decoder/ops/src/, ~1.6k LoC)
with a pure-torch grid_sample fallback used as its correctness oracle
(ops/functions/ms_deform_attn_func.py ms_deform_attn_core_pytorch).

On TPU the gather-heavy bilinear sampling is expressed as vectorized
4-corner gathers (jnp.take over the flattened value tensor) — XLA lowers
these to efficient dynamic-gathers and the whole op stays differentiable,
replacing both the CUDA kernel and its custom autograd Function. Semantics
match torch grid_sample(mode='bilinear', padding_mode='zeros',
align_corners=False).

Also provides the full MSDeformAttn module (value/output projections,
learned sampling offsets + attention weights) used by the ViT-Adapter and
the Mask2Former pixel decoder (ops/modules/ms_deform_attn.py).
"""

from __future__ import annotations

import math
from typing import Any, Dict, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp


def ms_deform_attn_core(
    value: jnp.ndarray,  # (B, S, M, D) — S = sum of H_l*W_l over levels
    spatial_shapes: Sequence[Tuple[int, int]],  # static [(H_l, W_l)]
    sampling_locations: jnp.ndarray,  # (B, Lq, M, L, P, 2) in [0, 1]
    attention_weights: jnp.ndarray,  # (B, Lq, M, L, P), softmaxed over L*P
) -> jnp.ndarray:
    """Returns (B, Lq, M*D)."""
    b, s, m, d = value.shape
    _, lq, _, l, p, _ = sampling_locations.shape
    level_starts = np.cumsum([0] + [h * w for h, w in spatial_shapes])[:-1]

    outputs = []
    for lid, (h, w) in enumerate(spatial_shapes):
        val = jax.lax.dynamic_slice_in_dim(
            value, int(level_starts[lid]), h * w, axis=1
        )  # (B, HW, M, D)
        loc = sampling_locations[:, :, :, lid]  # (B, Lq, M, P, 2)
        # grid_sample align_corners=False: x_pix = loc * W - 0.5
        x = loc[..., 0] * w - 0.5
        y = loc[..., 1] * h - 0.5
        x0 = jnp.floor(x)
        y0 = jnp.floor(y)
        wx = x - x0
        wy = y - y0

        vmh = val.transpose(0, 2, 1, 3)  # (B, M, HW, D)

        def gather(xi, yi):
            inb = (xi >= 0) & (xi < w) & (yi >= 0) & (yi < h)
            xi_c = jnp.clip(xi, 0, w - 1).astype(jnp.int32)
            yi_c = jnp.clip(yi, 0, h - 1).astype(jnp.int32)
            flat = yi_c * w + xi_c  # (B, Lq, M, P)
            idx = flat.transpose(0, 2, 1, 3).reshape(b, m, lq * p)
            got = jnp.take_along_axis(vmh, idx[..., None], axis=2)  # (B,M,LqP,D)
            got = got.reshape(b, m, lq, p, d).transpose(0, 2, 1, 3, 4)
            return got * inb[..., None]  # (B, Lq, M, P, D)

        v00 = gather(x0, y0)
        v01 = gather(x0 + 1, y0)
        v10 = gather(x0, y0 + 1)
        v11 = gather(x0 + 1, y0 + 1)
        wxb = wx[..., None]
        wyb = wy[..., None]
        sampled = (
            v00 * (1 - wxb) * (1 - wyb)
            + v01 * wxb * (1 - wyb)
            + v10 * (1 - wxb) * wyb
            + v11 * wxb * wyb
        )  # (B, Lq, M, P, D)
        outputs.append(sampled)

    stacked = jnp.stack(outputs, axis=3)  # (B, Lq, M, L, P, D)
    out = jnp.sum(stacked * attention_weights[..., None], axis=(3, 4))
    return out.reshape(b, lq, m * d)


# ---------------------------------------------------------------------------
# full module (reference ops/modules/ms_deform_attn.py)
# ---------------------------------------------------------------------------


def init_msdeform_params(
    rng, d_model: int = 256, n_levels: int = 4, n_heads: int = 8, n_points: int = 4
) -> Dict[str, Any]:
    """Reference init: sampling_offsets zero-weight with the rotated-grid
    bias; attention_weights zeros; value/output proj xavier."""
    ks = jax.random.split(rng, 4)

    def xavier(key, din, dout):
        lim = math.sqrt(6 / (din + dout))
        return jax.random.uniform(key, (din, dout), jnp.float32, -lim, lim)

    thetas = np.arange(n_heads) * (2.0 * math.pi / n_heads)
    grid = np.stack([np.cos(thetas), np.sin(thetas)], -1)  # (M, 2)
    grid = grid / np.abs(grid).max(-1, keepdims=True)
    grid = np.tile(grid[:, None, None, :], (1, n_levels, n_points, 1))
    for i in range(n_points):
        grid[:, :, i, :] *= i + 1
    return {
        "sampling_offsets": {
            "kernel": jnp.zeros((d_model, n_heads * n_levels * n_points * 2)),
            "bias": jnp.asarray(grid.reshape(-1), jnp.float32),
        },
        "attention_weights": {
            "kernel": jnp.zeros((d_model, n_heads * n_levels * n_points)),
            "bias": jnp.zeros((n_heads * n_levels * n_points,)),
        },
        "value_proj": {
            "kernel": xavier(ks[0], d_model, d_model),
            "bias": jnp.zeros((d_model,)),
        },
        "output_proj": {
            "kernel": xavier(ks[1], d_model, d_model),
            "bias": jnp.zeros((d_model,)),
        },
    }


def ms_deform_attn(
    params: Dict[str, Any],
    query: jnp.ndarray,  # (B, Lq, C)
    reference_points: jnp.ndarray,  # (B, Lq, L, 2) normalized or (B, Lq, L, 4)
    value: jnp.ndarray,  # (B, S, C)
    spatial_shapes: Sequence[Tuple[int, int]],
    n_heads: int = 8,
    n_points: int = 4,
    value_mask: jnp.ndarray | None = None,
) -> jnp.ndarray:
    b, lq, c = query.shape
    l = len(spatial_shapes)
    m = n_heads
    d = c // m

    def dense(x, p):
        return x @ p["kernel"] + p["bias"]

    v = dense(value, params["value_proj"])
    if value_mask is not None:
        v = jnp.where(value_mask[..., None], v, 0.0)
    v = v.reshape(b, -1, m, d)

    offsets = dense(query, params["sampling_offsets"]).reshape(
        b, lq, m, l, n_points, 2
    )
    attn = dense(query, params["attention_weights"]).reshape(
        b, lq, m, l * n_points
    )
    attn = jax.nn.softmax(attn, axis=-1).reshape(b, lq, m, l, n_points)

    shapes_wh = jnp.asarray(
        [[w_, h_] for h_, w_ in spatial_shapes], jnp.float32
    )  # (L, 2) as (W, H)
    if reference_points.shape[-1] == 2:
        loc = (
            reference_points[:, :, None, :, None, :]
            + offsets / shapes_wh[None, None, None, :, None, :]
        )
    else:  # box form: offsets scaled by half box size
        loc = (
            reference_points[:, :, None, :, None, :2]
            + offsets / n_points * reference_points[:, :, None, :, None, 2:] * 0.5
        )
    out = ms_deform_attn_core(v, spatial_shapes, loc, attn)
    return dense(out, params["output_proj"])
