"""Fused Pallas TPU attention kernels for the divided space-time block.

The two hot attention flattenings (SURVEY §7 stage 4):

* spatial: softmax(QK^T)V over N patches, batched over (B*T) rows — the XLA
  path materializes (B,T,H,N,N) fp32 score tensors in HBM (~240MB/layer at
  B=8); the fused kernel keeps scores in VMEM.
* temporal-causal streaming: new-frame queries against the KV cache with the
  streaming mask — fused mask+softmax+PV per (B, N-block).

Both are wrapped in ``jax.custom_vjp``: forward runs the Pallas kernel,
backward recomputes with the einsum formulation (XLA autodiff), so training
works with fused-forward speed. Correctness oracle: the einsum reference
(tests run both, interpret mode on CPU — the pattern the reference uses for
its only native op, downstream/OVIS/.../ops/test.py).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30  # avoid nan from (-inf) - (-inf) in padded rows


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


# ---------------------------------------------------------------------------
# reference (einsum) formulations — the correctness oracle and the VJP bwd
# ---------------------------------------------------------------------------


def spatial_attention_reference(q, k, v):
    """q,k,v: (R, H, N, dh) -> (R, H, N, dh); softmax over keys in fp32."""
    dh = q.shape[-1]
    scores = jnp.einsum(
        "rhqd,rhkd->rhqk", q, k, preferred_element_type=jnp.float32
    ) * (dh**-0.5)
    probs = jax.nn.softmax(scores, axis=-1).astype(q.dtype)
    return jnp.einsum("rhqk,rhkd->rhqd", probs, v)


def temporal_streaming_reference(q, ck, cv, cache_len, causal=True):
    """q: (B, N, H, T, dh) new-frame queries; ck/cv: (B, N, H, C, dh) cache
    (already updated with the new keys); returns (B, N, H, T, dh)."""
    dh = q.shape[-1]
    t, c = q.shape[3], ck.shape[3]
    scores = jnp.einsum(
        "bnhqd,bnhkd->bnhqk", q, ck, preferred_element_type=jnp.float32
    ) * (dh**-0.5)
    qpos = cache_len + jax.lax.broadcasted_iota(jnp.int32, (t, c), 0)
    kpos = jax.lax.broadcasted_iota(jnp.int32, (t, c), 1)
    mask = kpos <= qpos if causal else kpos < (cache_len + t)
    scores = jnp.where(mask[None, None, None], scores, NEG_INF)
    probs = jax.nn.softmax(scores, axis=-1).astype(q.dtype)
    return jnp.einsum("bnhqk,bnhkd->bnhqd", probs, cv)


# ---------------------------------------------------------------------------
# fused spatial attention
# ---------------------------------------------------------------------------


def _spatial_kernel(q_ref, k_ref, v_ref, o_ref, *, n_valid: int):
    # blocks: (1, 1, Np, dh) for one (r, h) pair — pure 2D matmuls, the shape
    # Mosaic tiles natively (unaligned lane slicing of packed-head layouts
    # fails to compile)
    npad, dh = q_ref.shape[2], q_ref.shape[3]
    q = q_ref[0, 0].astype(jnp.float32)
    k = k_ref[0, 0].astype(jnp.float32)
    scores = jax.lax.dot_general(
        q, k,
        dimension_numbers=(((1,), (1,)), ((), ())),  # (Np, Np) = q @ k^T
        preferred_element_type=jnp.float32,
    ) * (dh**-0.5)
    if n_valid < npad:
        col = jax.lax.broadcasted_iota(jnp.int32, (npad, npad), 1)
        scores = jnp.where(col < n_valid, scores, NEG_INF)
    scores = scores - jnp.max(scores, axis=-1, keepdims=True)
    probs = jnp.exp(scores)
    probs = probs / jnp.sum(probs, axis=-1, keepdims=True)
    out = jax.lax.dot_general(
        probs.astype(v_ref.dtype), v_ref[0, 0],
        dimension_numbers=(((1,), (0,)), ((), ())),  # (Np, dh)
        preferred_element_type=jnp.float32,
    )
    o_ref[0, 0] = out.astype(o_ref.dtype)


def _spatial_pallas(q, k, v):
    r, h, n, dh = q.shape
    npad = _round_up(n, 128)
    if npad != n:
        pad = [(0, 0), (0, 0), (0, npad - n), (0, 0)]
        q = jnp.pad(q, pad)
        k = jnp.pad(k, pad)
        v = jnp.pad(v, pad)
    spec = pl.BlockSpec(
        (1, 1, npad, dh), lambda i, j: (i, j, 0, 0), memory_space=pltpu.VMEM
    )
    out = pl.pallas_call(
        functools.partial(_spatial_kernel, n_valid=n),
        grid=(r, h),
        in_specs=[spec] * 3,
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((r, h, npad, dh), q.dtype),
    )(q, k, v)
    return out[:, :, :n, :]


@functools.partial(jax.custom_vjp)
def fused_spatial_attention(q, k, v):
    """(R, H, N, dh) fused attention; Pallas forward, einsum backward."""
    return _spatial_pallas(q, k, v)


def _fsa_fwd(q, k, v):
    return _spatial_pallas(q, k, v), (q, k, v)


def _fsa_bwd(res, g):
    q, k, v = res
    _, vjp = jax.vjp(spatial_attention_reference, q, k, v)
    return vjp(g)


fused_spatial_attention.defvjp(_fsa_fwd, _fsa_bwd)


# ---------------------------------------------------------------------------
# fused temporal-causal streaming attention (masked full-capacity)
# ---------------------------------------------------------------------------


def _temporal_decode_kernel(
    len_ref,  # scalar prefetch: (1,) int32 cache_len
    q_ref,  # (1, rows=nblk*H*T, dh)  VMEM, constant over the j grid dim
    k_ref,  # (1, CB, nblk*H, dh)     VMEM cache block j
    v_ref,  # (1, CB, nblk*H, dh)
    o_ref,  # (1, rows, dh)
    m_ref,  # scratch (rows, 1) fp32 — running max
    s_ref,  # scratch (rows, 1) fp32 — running sum
    a_ref,  # scratch (rows, dh) fp32 — running weighted V
    *,
    heads: int,
    t_new: int,
    cache_block: int,
    causal: bool,
):
    """Flash-decoding over the temporal KV cache: online softmax across cache
    blocks; per-patch-row keys make the QK product an elementwise
    multiply+lane-reduce (VPU) — the kernel is bandwidth-bound by design.
    Grid: (B*NB, CNB) with the cache-block dim innermost."""
    j = pl.program_id(1)
    cache_len = len_ref[0]
    total = cache_len + t_new
    last_block = (total - 1) // cache_block

    @pl.when(j == 0)
    def _():
        m_ref[...] = jnp.full_like(m_ref, NEG_INF)  # (rows, 1)
        s_ref[...] = jnp.zeros_like(s_ref)  # (rows, 1)
        a_ref[...] = jnp.zeros_like(a_ref)  # (rows, dh)

    @pl.when(j <= last_block)
    def _():
        # everything stays 2D (rows, dh) — refs are pre-flattened outside the
        # kernel so no in-kernel relayouts; the cache-block dim is a static
        # python loop of VPU FMAs (HBM-bandwidth-bound op, MXU irrelevant).
        rows, dh = q_ref.shape[1], q_ref.shape[2]
        nh = rows // t_new  # rows are t-major: row = t*nh + n*H + h
        q = q_ref[0].astype(jnp.float32)
        scale = dh**-0.5

        # per-t accumulators as values (no in-kernel scatters)
        scores = {}  # (c, t) -> (nh, 1)
        m_t = [m_ref[t * nh : (t + 1) * nh] for t in range(t_new)]
        for c in range(cache_block):
            pos = j * cache_block + c
            k_c = k_ref[0, c].astype(jnp.float32)  # (nh, dh)
            for t in range(t_new):
                q_t = q[t * nh : (t + 1) * nh]
                s_c = jnp.sum(q_t * k_c, axis=-1, keepdims=True) * scale
                valid = (pos <= cache_len + t) if causal else (pos < total)
                s_c = jnp.where(valid, s_c, NEG_INF)
                scores[(c, t)] = s_c
                m_t[t] = jnp.maximum(m_t[t], s_c)

        for t in range(t_new):
            sl = slice(t * nh, (t + 1) * nh)
            corr = jnp.exp(m_ref[sl] - m_t[t])
            s_sum = s_ref[sl] * corr
            acc = a_ref[sl] * corr
            for c in range(cache_block):
                p_c = jnp.exp(scores[(c, t)] - m_t[t])  # (nh, 1)
                s_sum = s_sum + p_c
                acc = acc + p_c * v_ref[0, c].astype(jnp.float32)
            s_ref[sl] = s_sum
            a_ref[sl] = acc
            m_ref[sl] = m_t[t]

    @pl.when(j == last_block)
    def _():
        o_ref[0] = (a_ref[...] / s_ref[...]).astype(o_ref.dtype)


def fused_temporal_streaming_attention(
    q: jnp.ndarray,  # (B, N, H, T, dh)
    ck: jnp.ndarray,  # (B, C, N, H, dh)  — cache layout from encoder
    cv: jnp.ndarray,
    cache_len: jnp.ndarray,  # () int32
    *,
    causal: bool = True,
    n_block: int = 28,
    cache_block: int = 16,
) -> jnp.ndarray:
    """Flash-decoding streaming attention. Returns (B, N, H, T, dh).

    HBM traffic scales with the *valid* cache length, not the capacity: the
    cache-block index_map clamps to the last valid block (Pallas skips the
    DMA when the block index repeats) and compute is @pl.when-guarded. This
    is the TPU answer to the reference's ever-growing DynamicCache
    (timesformer_encoder.py:517-546) — O(len) per step in fixed HBM.

    Inference-only (no vjp): the reference disables the cache during
    training (timesformer_encoder.py:501-503).
    """
    b, n, h, t, dh = q.shape
    c = ck.shape[1]
    while n % n_block:
        n_block -= 1
    nb = n // n_block
    cache_block = min(cache_block, c)
    while c % cache_block:
        cache_block -= 1
    cnb = c // cache_block

    nh = n_block * h
    rows = t * nh
    # q: (B, N, H, T, dh) -> (B*NB, T*nblk*H, dh), rows t-major
    q_r = (
        q.reshape(b, nb, n_block, h, t, dh)
        .transpose(0, 1, 4, 2, 3, 5)
        .reshape(b * nb, rows, dh)
    )
    # cache: (B, C, N, H, dh) -> (B*NB, C, nblk*H, dh)
    k_r = (
        ck.reshape(b, c, nb, n_block, h, dh)
        .transpose(0, 2, 1, 3, 4, 5)
        .reshape(b * nb, c, nh, dh)
    )
    v_r = (
        cv.reshape(b, c, nb, n_block, h, dh)
        .transpose(0, 2, 1, 3, 4, 5)
        .reshape(b * nb, c, nh, dh)
    )

    def q_map(i, j, len_ref):
        return (i, 0, 0)

    def kv_map(i, j, len_ref):
        last = (len_ref[0] + t - 1) // cache_block
        return (i, jnp.minimum(j, last), 0, 0)

    out = pl.pallas_call(
        functools.partial(
            _temporal_decode_kernel,
            heads=h,
            t_new=t,
            cache_block=cache_block,
            causal=causal,
        ),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(b * nb, cnb),
            in_specs=[
                pl.BlockSpec((1, rows, dh), q_map, memory_space=pltpu.VMEM),
                pl.BlockSpec((1, cache_block, nh, dh), kv_map,
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, cache_block, nh, dh), kv_map,
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (1, rows, dh), q_map, memory_space=pltpu.VMEM
            ),
            scratch_shapes=[
                pltpu.VMEM((rows, 1), jnp.float32),
                pltpu.VMEM((rows, 1), jnp.float32),
                pltpu.VMEM((rows, dh), jnp.float32),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((b * nb, rows, dh), q.dtype),
    )(jnp.asarray([cache_len], jnp.int32).reshape(1), q_r, k_r, v_r)
    out = (
        out.reshape(b, nb, t, n_block, h, dh)
        .transpose(0, 1, 3, 4, 2, 5)
        .reshape(b, n, h, t, dh)
    )
    return out
