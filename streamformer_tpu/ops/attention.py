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
_WRITE_W = 8  # cache-append write-back window (min lowerable sublane width)
# max frames per fused_temporal_append_pm_ragged call: t=16 at flagship
# row blocks measured 19.5 MB scoped VMEM vs the 16 MB limit (t-scaled
# q/kn/vn/acc buffers). Consumed by BOTH the encoder dispatch gate and
# the engine's tick chunking — keep them in lockstep through this name.
APPEND_T_MAX = 8


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _pick_row_block(r: int, target: int, multiple: int = 8) -> int:
    """Largest divisor of ``r`` that is <= target and a multiple of
    ``multiple`` (the sublane tile granularity); falls back to ``r`` itself
    — a block equal to the full array dim is always legal — when no such
    divisor exists (e.g. R = 196 at batch 1: 196 = 2^2 * 7^2 has no
    8-multiple divisor)."""
    best = r
    for cand in range(multiple, min(target, r) + 1, multiple):
        if r % cand == 0:
            best = cand
    return best


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
# fused temporal streaming decode (single new frame vs the KV cache)
# ---------------------------------------------------------------------------
#
# Design (round 2 — replaces the scalar-row VPU kernel VERDICT r1 flagged):
# the per-patch-row temporal attention is bandwidth-bound (the KV cache is
# ~100x larger than everything else touched per step), so the kernel is
# organized around full-width DMAs and matmul-shaped compute:
#
# * D-packed layout: rows are (b, n) pairs, the 12 heads live as 12x64
#   segments of the D=768 lane dim. Cache tiles (RB, CB, D) stream through
#   VMEM with the head dim contiguous — no sub-128-lane accesses.
# * segmented-matmul scores: scores[(r,c), h] = sum_d (k*q)[(r,c), d] SEG[d,h]
#   with SEG the (D, H) head-segment indicator — one elementwise multiply
#   (VPU, same element count as the DMA) plus one MXU matmul per tile, in
#   place of per-position lane reductions.
# * optional int8 cache: K/V stored quantized with per-(row, pos, head)
#   scales; dequantization (one (rows, H) @ (H, D) expand + multiply) is
#   fused into the same pass — HALF the HBM traffic of bf16, which no
#   XLA-level formulation can reach without materializing the dequantized
#   cache.
# * online softmax across cache blocks; the kv index_map clamps the block
#   index to the last valid block so HBM traffic scales with the *valid*
#   length, not capacity (the TPU answer to the reference's ever-growing
#   DynamicCache, timesformer_encoder.py:517-546).


def _decode_kernel(
    len_ref,  # scalar prefetch: (1,) int32 cache_len (query position)
    q_ref,  # (RB, 1, D) — middle singleton keeps RB free of tile constraints
    k_ref,  # (RB, CB, D) bf16/int8
    v_ref,  # (RB, CB, D)
    ks_ref,  # (RB, CB, H) fp32 scales or None
    vs_ref,
    o_ref,  # (RB, 1, D)
    m_ref,  # scratch (RB, H) fp32 — running max
    l_ref,  # scratch (RB, H) fp32 — running sum
    acc_ref,  # scratch (RB, D) fp32 — running weighted V
    *,
    num_heads: int,
    cache_block: int,
):
    j = pl.program_id(1)
    cnb = pl.num_programs(1)
    cache_len = len_ref[0]
    last = cache_len // cache_block
    rb, _, d = q_ref.shape
    h = num_heads
    dh = d // h
    rows = rb * cache_block

    # head-segment indicator matrices (built from iota each step — cheap)
    d_idx = jax.lax.broadcasted_iota(jnp.int32, (d, h), 0)
    h_idx = jax.lax.broadcasted_iota(jnp.int32, (d, h), 1)
    seg = (d_idx // dh == h_idx).astype(jnp.float32)  # (D, H)
    seg_t = seg.T  # (H, D)

    # HIGHEST for fp32 caches (parity tests): the MXU's default f32 mode
    # rounds operands to bf16 passes, costing ~5e-3 on the segment
    # reductions. bf16/int8 caches carry bf16-level data anyway — default
    # single-pass matmuls lose nothing and skip the 6-pass overhead.
    mm_prec = (
        jax.lax.Precision.HIGHEST
        if k_ref.dtype == jnp.float32
        else jax.lax.Precision.DEFAULT
    )

    def mm(a, b):
        return jax.lax.dot_general(
            a, b, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=mm_prec,
        )

    @pl.when(j == 0)
    def _():
        m_ref[...] = jnp.full_like(m_ref, NEG_INF)
        l_ref[...] = jnp.zeros_like(l_ref)
        acc_ref[...] = jnp.zeros_like(acc_ref)

    @pl.when(j <= last)
    def _():
        # f32 compute throughout: Mosaic's f32 (8,128) layout beats bf16
        # packing for the big elementwise ops (measured: bf16 compute
        # regressed cap-16 from 0.078 to 0.400 ms)
        cdt = jnp.float32
        k_t = k_ref[...].astype(cdt).reshape(rows, d)
        q_f = q_ref[...].astype(cdt).reshape(rb, 1, d)
        x = k_t.reshape(rb, cache_block, d) * q_f
        scores = mm(x.reshape(rows, d), seg) * (dh**-0.5)  # (rows, H)
        scores = scores.reshape(rb, cache_block, h)
        if ks_ref is not None:
            # int8 dequant folded POST-reduction: score = s_k * (q . k_i8)
            # — an (RB, CB, H) multiply instead of a (rows, D) expand
            scores = scores * ks_ref[...]
        pos = j * cache_block + jax.lax.broadcasted_iota(
            jnp.int32, (rb, cache_block, h), 1
        )
        scores = jnp.where(pos <= cache_len, scores, NEG_INF)

        m_new = jnp.maximum(m_ref[...], jnp.max(scores, axis=1))  # (RB, H)
        corr = jnp.exp(m_ref[...] - m_new)
        p = jnp.exp(scores - m_new[:, None, :])  # (RB, CB, H)
        l_ref[...] = l_ref[...] * corr + jnp.sum(p, axis=1)

        if vs_ref is not None:
            # fold v scales into the probabilities pre-expand (same trick)
            p = p * vs_ref[...]
        v_t = v_ref[...].astype(cdt).reshape(rows, d)
        p_d = mm(p.reshape(rows, h), seg_t)  # (rows, D) head-broadcast probs
        pv = jnp.sum((p_d * v_t).reshape(rb, cache_block, d), axis=1)
        acc_ref[...] = acc_ref[...] * mm(corr, seg_t) + pv
        m_ref[...] = m_new

    @pl.when(j == cnb - 1)
    def _():
        out = (acc_ref[...] / mm(l_ref[...], seg_t)).astype(o_ref.dtype)
        o_ref[...] = out.reshape(rb, 1, d)


def _decode_write_kernel(
    len_ref,  # scalar prefetch: (1,) int32 — position of the NEW frame
    q_ref,  # (RB, 1, D)
    kn_ref,  # (RB, 1, D) new-frame keys (not yet in the cache)
    vn_ref,  # (RB, 1, D)
    k_ref,  # (RB, CB, D) cache block (holds positions < cache_len)
    v_ref,
    o_ref,  # (RB, 1, D)
    ok_ref,  # (RB, CB, D) hot cache block written back with the new column
    ov_ref,
    m_ref,  # scratch (RB, H) fp32
    l_ref,  # scratch (RB, H) fp32
    acc_ref,  # scratch (RB, D) fp32
    *,
    num_heads: int,
    cache_block: int,
):
    """Fused append+attend decode step: the new frame's K/V never go through
    a host-graph dynamic_update_slice (whose scattered dim-2 writes made XLA
    copy the whole cache around the custom call, ~2x step time); the kernel
    inserts them into the hot block and writes only that block back."""
    j = pl.program_id(1)
    cnb = pl.num_programs(1)
    cache_len = len_ref[0]
    hot = jnp.minimum(cache_len // cache_block, cnb - 1)
    rb, _, d = q_ref.shape
    h = num_heads
    dh = d // h
    rows = rb * cache_block

    d_idx = jax.lax.broadcasted_iota(jnp.int32, (d, h), 0)
    h_idx = jax.lax.broadcasted_iota(jnp.int32, (d, h), 1)
    seg = (d_idx // dh == h_idx).astype(jnp.float32)  # (D, H)
    seg_t = seg.T
    mm_prec = (
        jax.lax.Precision.HIGHEST
        if k_ref.dtype == jnp.float32
        else jax.lax.Precision.DEFAULT
    )

    def mm(a, b):
        return jax.lax.dot_general(
            a, b, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=mm_prec,
        )

    q_f = q_ref[...].astype(jnp.float32).reshape(rb, 1, d)

    @pl.when(j == 0)
    def _():
        # seed the online softmax with the NEW position (always valid,
        # always the max so far): m = s_new, l = 1, acc = v_new
        kn = kn_ref[...].astype(jnp.float32).reshape(rb, d)
        s_new = mm(kn * q_f.reshape(rb, d), seg) * (dh**-0.5)  # (RB, H)
        m_ref[...] = s_new
        l_ref[...] = jnp.ones_like(l_ref)
        acc_ref[...] = vn_ref[...].astype(jnp.float32).reshape(rb, d)

    @pl.when(j <= hot)
    def _():
        k_t = k_ref[...].astype(jnp.float32).reshape(rows, d)
        x = k_t.reshape(rb, cache_block, d) * q_f
        scores = mm(x.reshape(rows, d), seg) * (dh**-0.5)
        scores = scores.reshape(rb, cache_block, h)
        pos = j * cache_block + jax.lax.broadcasted_iota(
            jnp.int32, (rb, cache_block, h), 1
        )
        scores = jnp.where(pos < cache_len, scores, NEG_INF)

        m_new = jnp.maximum(m_ref[...], jnp.max(scores, axis=1))
        corr = jnp.exp(m_ref[...] - m_new)
        p = jnp.exp(scores - m_new[:, None, :])
        l_ref[...] = l_ref[...] * corr + jnp.sum(p, axis=1)
        v_t = v_ref[...].astype(jnp.float32).reshape(rows, d)
        p_d = mm(p.reshape(rows, h), seg_t)
        pv = jnp.sum((p_d * v_t).reshape(rb, cache_block, d), axis=1)
        acc_ref[...] = acc_ref[...] * mm(corr, seg_t) + pv
        m_ref[...] = m_new

    @pl.when(j == cnb - 1)
    def _():
        out = (acc_ref[...] / mm(l_ref[...], seg_t)).astype(o_ref.dtype)
        o_ref[...] = out.reshape(rb, 1, d)
        # write back only the 8-column window holding position cache_len
        # (blocks narrower than 8 sublanes are not lowerable); the window's
        # old columns come from the hot read block (index-mapped here), the
        # new column is inserted from kn/vn. The rest of the aliased cache
        # buffer is untouched.
        off = cache_len % cache_block
        base = (off // _WRITE_W) * _WRITE_W
        col = jax.lax.broadcasted_iota(jnp.int32, (rb, _WRITE_W, d), 1)
        sel = col == (off - base)
        ok_ref[...] = jnp.where(
            sel,
            kn_ref[...].astype(ok_ref.dtype),
            k_ref[:, pl.ds(base, _WRITE_W), :],
        )
        ov_ref[...] = jnp.where(
            sel,
            vn_ref[...].astype(ov_ref.dtype),
            v_ref[:, pl.ds(base, _WRITE_W), :],
        )


def fused_temporal_decode_inplace(
    q: jnp.ndarray,  # (R, D)
    k_new: jnp.ndarray,  # (R, D) new-frame keys
    v_new: jnp.ndarray,
    k_cache: jnp.ndarray,  # (R, C, D) — positions < cache_len valid
    v_cache: jnp.ndarray,
    cache_len: jnp.ndarray,  # () int32 — position the new frame takes
    *,
    num_heads: int,
    out_dtype=None,
    row_block: int = 28,
    cache_block: int = 32,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Append-and-attend streaming decode. Returns (out (R, D), k_cache,
    v_cache) with the caches threaded through the custom call
    (input_output_aliases) and the new column written in-kernel — the
    production streaming path (encoder.temporal_attention)."""
    r, c, d = k_cache.shape
    assert c % _WRITE_W == 0, (
        f"cache capacity {c} must be a multiple of {_WRITE_W} for the "
        "in-kernel append (write-back window width)"
    )
    while r % row_block:
        row_block -= 1
    cache_block = min(cache_block, c)
    while c % cache_block or cache_block % _WRITE_W:
        cache_block -= 1
    cnb = c // cache_block
    out_dtype = out_dtype or q.dtype

    def row_map(i, j, len_ref):
        return (i, 0, 0)

    def kv_map(i, j, len_ref):
        hot = jnp.minimum(len_ref[0] // cache_block, cnb - 1)
        return (i, jnp.minimum(j, hot), 0)

    def col_map(i, j, len_ref):
        # the out block is the 8-column window holding position cache_len
        return (i, jnp.minimum(len_ref[0] // _WRITE_W, c // _WRITE_W - 1), 0)

    row_spec = pl.BlockSpec((row_block, 1, d), row_map,
                            memory_space=pltpu.VMEM)
    kv_spec = pl.BlockSpec((row_block, cache_block, d), kv_map,
                           memory_space=pltpu.VMEM)
    hot_spec = pl.BlockSpec((row_block, _WRITE_W, d), col_map,
                            memory_space=pltpu.VMEM)
    out, k_out, v_out = pl.pallas_call(
        functools.partial(_decode_write_kernel, num_heads=num_heads,
                          cache_block=cache_block),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(r // row_block, cnb),
            in_specs=[row_spec, row_spec, row_spec, kv_spec, kv_spec],
            out_specs=(row_spec, hot_spec, hot_spec),
            scratch_shapes=[
                pltpu.VMEM((row_block, num_heads), jnp.float32),
                pltpu.VMEM((row_block, num_heads), jnp.float32),
                pltpu.VMEM((row_block, d), jnp.float32),
            ],
        ),
        out_shape=(
            jax.ShapeDtypeStruct((r, 1, d), out_dtype),
            jax.ShapeDtypeStruct(k_cache.shape, k_cache.dtype),
            jax.ShapeDtypeStruct(v_cache.shape, v_cache.dtype),
        ),
        # operand indices count the scalar-prefetch arg:
        # (len, q, k_new, v_new, k_cache, v_cache)
        input_output_aliases={4: 1, 5: 2},
        interpret=interpret,
    )(
        jnp.asarray([cache_len], jnp.int32).reshape(1),
        q.reshape(r, 1, d),
        k_new.reshape(r, 1, d),
        v_new.reshape(r, 1, d),
        k_cache,
        v_cache,
    )
    return out.reshape(r, d), k_out, v_out


def fused_temporal_decode(
    q: jnp.ndarray,  # (R, D) — rows are (b, n) pairs, heads packed in D
    k: jnp.ndarray,  # (R, C, D) bf16/fp32 or int8
    v: jnp.ndarray,
    k_scale: Optional[jnp.ndarray],  # (R, C, H) fp32 when k is int8
    v_scale: Optional[jnp.ndarray],
    cache_len: jnp.ndarray,  # () int32 — query position
    *,
    num_heads: int,
    out_dtype=None,
    row_block: int = 28,
    cache_block: int = 32,  # k+v tiles + f32 temporaries fit 16MB VMEM
    interpret: bool = False,
) -> jnp.ndarray:
    """Streaming decode attention for one new frame. Returns (R, D).

    Read-only variant — used for the int8 cache (fused dequant) and as the
    test oracle target; the bf16/fp32 production path is
    :func:`fused_temporal_decode_inplace`, which also appends the new
    frame's K/V in-kernel with the caches aliased in/out.

    The cache must already contain the new frame's K/V at position
    ``cache_len``. Inference-only (no vjp): the reference disables the cache
    during training (timesformer_encoder.py:501-503).
    """
    r, c, d = k.shape
    quantized = k_scale is not None
    while r % row_block:
        row_block -= 1
    cache_block = min(cache_block, c)
    while c % cache_block:
        cache_block -= 1
    cnb = c // cache_block
    out_dtype = out_dtype or q.dtype

    def row_map(i, j, len_ref):
        return (i, 0, 0)

    def kv_map(i, j, len_ref):
        return (i, jnp.minimum(j, len_ref[0] // cache_block), 0)

    in_specs = [
        pl.BlockSpec((row_block, 1, d), row_map, memory_space=pltpu.VMEM),
        pl.BlockSpec((row_block, cache_block, d), kv_map,
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((row_block, cache_block, d), kv_map,
                     memory_space=pltpu.VMEM),
    ]
    args = [
        jnp.asarray([cache_len], jnp.int32).reshape(1),
        q.reshape(r, 1, d),
        k,
        v,
    ]
    if quantized:
        h = num_heads
        sc_spec = pl.BlockSpec((row_block, cache_block, h), kv_map,
                               memory_space=pltpu.VMEM)
        in_specs += [sc_spec, sc_spec]
        args += [k_scale, v_scale]
        kernel = functools.partial(
            _decode_kernel, num_heads=num_heads, cache_block=cache_block
        )
    else:
        kernel = functools.partial(
            _decode_kernel_noscale, num_heads=num_heads,
            cache_block=cache_block,
        )

    res = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(r // row_block, cnb),
            in_specs=in_specs,
            out_specs=pl.BlockSpec((row_block, 1, d), row_map,
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((row_block, num_heads), jnp.float32),
                pltpu.VMEM((row_block, num_heads), jnp.float32),
                pltpu.VMEM((row_block, d), jnp.float32),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((r, 1, d), out_dtype),
        interpret=interpret,
    )(*args)
    return res.reshape(r, d)


def _decode_kernel_noscale(len_ref, q_ref, k_ref, v_ref, o_ref,
                           m_ref, l_ref, acc_ref, *, num_heads, cache_block):
    _decode_kernel(len_ref, q_ref, k_ref, v_ref, None, None, o_ref,
                   m_ref, l_ref, acc_ref,
                   num_heads=num_heads, cache_block=cache_block)


# ---------------------------------------------------------------------------
# fused temporal streaming decode, POSITION-MAJOR cache layout
# ---------------------------------------------------------------------------
#
# Cache layout (C, R, D) — position-major — instead of (R, C, D):
#
# * Appending a frame is ONE contiguous (1, R, D) plane
#   ``dynamic_update_slice`` in the host graph, which XLA performs in place
#   on a donated buffer. The row-major layout needed the in-kernel
#   append+write-back of an 8-column window (38.5 MB/step of hot-block
#   writes at B=8) because a dim-2 dus scatters across every tile.
# * The int8 tiling constraint (32-sublane granularity) moves off the
#   position axis: blocks are (CB, RB, D) whose last two dims are
#   (RB mult-of-32, D) — so an int8 KV cache works at ANY capacity,
#   including the 16-frame serving config, halving attention HBM traffic.
# * Per-(pos, row) f32 dequant scales live in a row-major (R, C) array so
#   the lane dim equals the full array dim (the only legal sub-128 lane
#   block shape); the int8 kernel transposes the small (RB, C) tile in VMEM.
# * The append happens IN-KERNEL (caches aliased in/out, the new frame's
#   plane written as a (1, RB, D) out block — legal at any dtype since the
#   tiled dims are (RB, D)). A host-graph dynamic_update_slice instead makes
#   XLA relayout the cache around the custom call: measured THREE full-cache
#   copies per layer ({3,0,2,1} entry copy, dus copy, {2,1,0} kernel-operand
#   copy), 2.9x the whole step time.


def _pm_decode_kernel(len_ref, q_ref, kn_ref, vn_ref, k_ref, v_ref,
                      o_ref, ok_ref, ov_ref, m_ref, l_ref, acc_ref,
                      *, num_heads, cache_block):
    """bf16/fp32 pos-major decode with in-kernel append: grid (rows,
    position-blocks), online softmax in VMEM scratch seeded by the new
    frame; kv index_map clamps to the valid prefix so HBM reads scale with
    cache_len; the new K/V plane is written once per row block.

    len_ref is (1,) (one shared length — the lockstep path) or
    (num_row_blocks,) (per-ROW-BLOCK lengths — the ragged/continuous-
    batching path via fused_temporal_decode_pm_ragged, which pads each
    stream's rows to an 8-multiple so row blocks never span streams)."""
    j = pl.program_id(1)
    # position the NEW frame takes (per row block when ragged)
    cache_len = (len_ref[0] if len_ref.shape[0] == 1
                 else len_ref[pl.program_id(0)])
    rb, d = q_ref.shape
    cb = cache_block
    h = num_heads
    dh = d // h
    d_idx = jax.lax.broadcasted_iota(jnp.int32, (d, h), 0)
    h_idx = jax.lax.broadcasted_iota(jnp.int32, (d, h), 1)
    seg = (d_idx // dh == h_idx).astype(jnp.float32)
    seg_t = seg.T
    mm_prec = (
        jax.lax.Precision.HIGHEST
        if k_ref.dtype == jnp.float32
        else jax.lax.Precision.DEFAULT
    )

    def mm(a, b):
        return jax.lax.dot_general(
            a, b, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=mm_prec,
        )

    q_f = q_ref[...].astype(jnp.float32)  # (RB, D)

    @pl.when(j == 0)
    def _():
        # seed with the NEW position (always valid, the max so far):
        kn = kn_ref[...].astype(jnp.float32)
        s_new = mm(kn * q_f, seg) * (dh**-0.5)  # (RB, H)
        m_ref[...] = s_new
        l_ref[...] = jnp.ones_like(l_ref)
        acc_ref[...] = vn_ref[...].astype(jnp.float32)

    @pl.when(j * cb < cache_len)
    def _():
        k_t = k_ref[...].astype(jnp.float32)  # (CB, RB, D)
        x = k_t * q_f[None]
        scores = mm(x.reshape(cb * rb, d), seg).reshape(cb, rb, h) * (dh**-0.5)
        pos = j * cb + jax.lax.broadcasted_iota(jnp.int32, (cb, rb, h), 0)
        # slot valid iff it holds a real position (< cache_len) and is not
        # the slot the NEW frame overwrites (seeded at j == 0). With the
        # linear cache (cache_len < C) the mod term is a no-op; with the
        # ring it makes the same kernel a sliding window over the last C
        # frames (slot s holds the newest position ≡ s mod C).
        c_total = pl.num_programs(1) * cb
        ok = (pos < cache_len) & (pos != cache_len % c_total)
        scores = jnp.where(ok, scores, NEG_INF)
        m_new = jnp.maximum(m_ref[...], jnp.max(scores, axis=0))  # (RB, H)
        corr = jnp.exp(m_ref[...] - m_new)
        p = jnp.exp(scores - m_new[None])
        l_ref[...] = l_ref[...] * corr + jnp.sum(p, axis=0)
        v_t = v_ref[...].astype(jnp.float32)
        p_d = mm(p.reshape(cb * rb, h), seg_t).reshape(cb, rb, d)
        acc_ref[...] = acc_ref[...] * mm(corr, seg_t) + jnp.sum(p_d * v_t, axis=0)
        m_ref[...] = m_new

    @pl.when(j == pl.num_programs(1) - 1)
    def _():
        o_ref[...] = (acc_ref[...] / mm(l_ref[...], seg_t)).astype(o_ref.dtype)
        ok_ref[...] = kn_ref[...].astype(ok_ref.dtype).reshape(1, rb, d)
        ov_ref[...] = vn_ref[...].astype(ov_ref.dtype).reshape(1, rb, d)


def fused_temporal_decode_pm(
    q: jnp.ndarray,  # (R, D) — rows are (b, n) pairs, heads packed in D
    k_new: jnp.ndarray,  # (R, D) new-frame keys (not yet in the cache)
    v_new: jnp.ndarray,
    k_cache: jnp.ndarray,  # (C, R, D) pos-major, positions < cache_len valid
    v_cache: jnp.ndarray,
    cache_len: jnp.ndarray,  # () int32 — position the new frame takes
    *,
    num_heads: int,
    out_dtype=None,
    row_block: int = 56,
    cache_block: int = 16,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Pos-major bf16/fp32 append-and-attend decode. Returns (out (R, D),
    k_cache, v_cache) with the caches threaded through the custom call
    (input_output_aliases) and the new plane written in-kernel.

    Per-stream (ragged) lengths: see fused_temporal_decode_pm_ragged."""
    c, r, d = k_cache.shape
    cb = min(cache_block, c)
    while c % cb:
        cb -= 1
    row_block = _pick_row_block(r, row_block)
    if row_block == r and r > 64:
        # full-dim row block (no 8-multiple divisor, e.g. B=1 -> R=196):
        # shrink the position block to keep the (CB, R, D) KV tiles in VMEM
        cb = min(cb, 8 if k_cache.dtype.itemsize >= 4 else 16)
        while c % cb:
            cb -= 1
    out_dtype = out_dtype or q.dtype
    lens = jnp.asarray([cache_len], jnp.int32).reshape(1)
    q_spec = pl.BlockSpec((row_block, d), lambda i, j, l: (i, 0),
                          memory_space=pltpu.VMEM)
    kv_spec = pl.BlockSpec(
        (cb, row_block, d),
        # clamp to the last block holding positions < cache_len; compute is
        # gated in-kernel, and Pallas skips the re-DMA when the clamped
        # block index repeats, so reads are O(cache_len)
        lambda i, j, l: (jnp.minimum(j, jnp.maximum(l[0] - 1, 0) // cb), i, 0),
        memory_space=pltpu.VMEM)
    # plane index mod C: identity for the linear cache, wrap-around slot
    # for the ring (sliding-window) mode — same kernel serves both
    plane_spec = pl.BlockSpec((1, row_block, d),
                              lambda i, j, l: (l[0] % c, i, 0),
                              memory_space=pltpu.VMEM)
    out, k_out, v_out = pl.pallas_call(
        functools.partial(_pm_decode_kernel, num_heads=num_heads,
                          cache_block=cb),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1, grid=(r // row_block, c // cb),
            in_specs=[q_spec, q_spec, q_spec, kv_spec, kv_spec],
            out_specs=(q_spec, plane_spec, plane_spec),
            scratch_shapes=[
                pltpu.VMEM((row_block, num_heads), jnp.float32),
                pltpu.VMEM((row_block, num_heads), jnp.float32),
                pltpu.VMEM((row_block, d), jnp.float32),
            ]),
        out_shape=(
            jax.ShapeDtypeStruct((r, d), out_dtype),
            jax.ShapeDtypeStruct(k_cache.shape, k_cache.dtype),
            jax.ShapeDtypeStruct(v_cache.shape, v_cache.dtype),
        ),
        # operand indices count the scalar-prefetch arg:
        # (len, q, k_new, v_new, k_cache, v_cache)
        input_output_aliases={4: 1, 5: 2},
        interpret=interpret,
    )(lens, q, k_new, v_new, k_cache, v_cache)
    return out, k_out, v_out


def ragged_row_pad(n: int, multiple: int = 8) -> int:
    """Per-stream rows padded to the sublane tile (ragged caches): 8 for
    bf16/fp32, 32 for int8 (the int8 tile granularity — row blocks must be
    32-sublane AND must not span two streams)."""
    return -(-n // multiple) * multiple


def _ragged_row_block(n_pad: int, preferred: int = 56,
                      multiple: int = 8) -> int:
    """Largest ``multiple``-multiple divisor of n_pad <= preferred: ragged
    row blocks must stay within one stream (shared length) AND satisfy
    Mosaic's sublane block granularity — which is why the rows are padded."""
    rb = max(min(preferred, n_pad) // multiple * multiple, multiple)
    while n_pad % rb:
        rb -= multiple
    return rb


def fused_temporal_decode_pm_ragged(
    q: jnp.ndarray,  # (R', D) — R' = B * n_pad, per-stream rows padded
    k_new: jnp.ndarray,  # (R', D)
    v_new: jnp.ndarray,
    k_cache: jnp.ndarray,  # (C, R', D) pos-major, same flat layout as lockstep
    v_cache: jnp.ndarray,
    lens: jnp.ndarray,  # (B,) int32 — per-stream position of the new frame
    n_pad: int,  # rows per stream (8-multiple; ragged_row_pad(N))
    *,
    num_heads: int,
    out_dtype=None,
    row_block: int = 56,
    cache_block: int = 16,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Ragged (per-stream length) append-and-attend decode — continuous
    batching: every stream in the batch sits at its own position
    (init_cache(per_stream_len=True)). Same kernel body and flat (C, R, D)
    cache layout as the lockstep decode (XLA keeps that shape in the
    standard layout — a stream-major (B·C, N, D) variant measured 2x step
    time from {2,0,1} relayout copies around the custom call, N=196 being
    sublane-unaligned); the only deltas are per-ROW-BLOCK lengths in the
    scalar-prefetch array and per-stream clamp/slot index maps. Rows are
    padded per stream to n_pad (8-multiple) so a row block never spans two
    streams; padded rows compute garbage that is sliced off by the caller.
    Returns (out (R', D), k_cache, v_cache), caches aliased in/out."""
    c, r, d = k_cache.shape
    b = r // n_pad
    assert n_pad % 8 == 0 and b * n_pad == r
    cb = min(cache_block, c)
    while c % cb:
        cb -= 1
    row_block = _ragged_row_block(n_pad, row_block)
    out_dtype = out_dtype or q.dtype
    bps = n_pad // row_block  # row blocks per stream
    lens = jnp.repeat(jnp.asarray(lens, jnp.int32), bps)  # (num_row_blocks,)
    q_spec = pl.BlockSpec((row_block, d), lambda i, j, l: (i, 0),
                          memory_space=pltpu.VMEM)
    kv_spec = pl.BlockSpec(
        (cb, row_block, d),
        # clamp to row block i's own stream's valid prefix: reads are
        # O(len[stream(i)]) per stream
        lambda i, j, l: (jnp.minimum(j, jnp.maximum(l[i] - 1, 0) // cb), i, 0),
        memory_space=pltpu.VMEM)
    plane_spec = pl.BlockSpec((1, row_block, d),
                              lambda i, j, l: (l[i] % c, i, 0),
                              memory_space=pltpu.VMEM)
    out, k_out, v_out = pl.pallas_call(
        functools.partial(_pm_decode_kernel, num_heads=num_heads,
                          cache_block=cb),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1, grid=(r // row_block, c // cb),
            in_specs=[q_spec, q_spec, q_spec, kv_spec, kv_spec],
            out_specs=(q_spec, plane_spec, plane_spec),
            scratch_shapes=[
                pltpu.VMEM((row_block, num_heads), jnp.float32),
                pltpu.VMEM((row_block, num_heads), jnp.float32),
                pltpu.VMEM((row_block, d), jnp.float32),
            ]),
        out_shape=(
            jax.ShapeDtypeStruct((r, d), out_dtype),
            jax.ShapeDtypeStruct(k_cache.shape, k_cache.dtype),
            jax.ShapeDtypeStruct(v_cache.shape, v_cache.dtype),
        ),
        # operands: (lens, q, k_new, v_new, k_cache, v_cache)
        input_output_aliases={4: 1, 5: 2},
        interpret=interpret,
    )(lens, q, k_new, v_new, k_cache, v_cache)
    return out, k_out, v_out


def _pm_append_multi_kernel(len_ref, val_ref, q_ref, kn_ref, vn_ref,
                            k_ref, v_ref, o_ref, ok_ref, ov_ref,
                            m_ref, l_ref, acc_ref,
                            *, num_heads, cache_block, t):
    """Multi-frame ragged append-and-attend (StreamingEngine throughput
    mode): T new frames per stream in ONE kernel pass. The t=1 decode
    re-reads the full temporal KV cache per appended frame — at the
    flagship serving config that read is ~half the step, so a scan of k
    t=1 steps pays it k times. Here each (CB, RB, D) cache block is read
    from HBM ONCE and all T queries consume it from VMEM (T-fold
    arithmetic on the same traffic); the T new K/V rows land in their
    [len, len+valid) slots during the aliased write-back.

    Per row block (grid (rows, position-blocks), same flat (C, R', D)
    layout and per-ROW-BLOCK scalar-prefetch lengths as
    fused_temporal_decode_pm_ragged):
      * j == 0 seeds the online softmax with the intra-block causal
        attention among the new frames (query ti attends new frames
        tj <= ti; queries ti >= valid[stream] are garbage the caller
        discards — their rows never write the cache);
      * every cache block updates all T accumulators (old positions
        < len only);
      * write-back merges the new rows into slots [len, len+valid) —
        blocks are copied through, so append traffic is one extra
        cache write (linear mode only: slots >= len+valid are dead by
        the ``len`` masking contract everywhere else).
    """
    j = pl.program_id(1)
    i = pl.program_id(0)
    cache_len = len_ref[i]
    valid = val_ref[i]
    cb = cache_block
    rb, d = q_ref.shape[1:]
    h = num_heads
    dh = d // h
    d_idx = jax.lax.broadcasted_iota(jnp.int32, (d, h), 0)
    h_idx = jax.lax.broadcasted_iota(jnp.int32, (d, h), 1)
    seg = (d_idx // dh == h_idx).astype(jnp.float32)
    seg_t = seg.T
    mm_prec = (
        jax.lax.Precision.HIGHEST
        if k_ref.dtype == jnp.float32
        else jax.lax.Precision.DEFAULT
    )

    def mm(a, b):
        return jax.lax.dot_general(
            a, b, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=mm_prec,
        )

    qs = q_ref[...].astype(jnp.float32)  # (T, RB, D)
    kns = kn_ref[...].astype(jnp.float32)
    vns = vn_ref[...].astype(jnp.float32)
    scale = dh**-0.5

    @pl.when(j == 0)
    def _():
        # seed: causal attention among the new frames (query ti vs
        # tj <= ti). For valid queries every attended tj is itself valid
        # (tj <= ti < valid); garbage queries stay garbage row-locally.
        for ti in range(t):
            m = mm(kns[0] * qs[ti], seg) * scale  # (RB, H)
            l = jnp.ones_like(m)
            acc = vns[0]
            for tj in range(1, ti + 1):
                s = mm(kns[tj] * qs[ti], seg) * scale
                m_new = jnp.maximum(m, s)
                corr = jnp.exp(m - m_new)
                p = jnp.exp(s - m_new)
                l = l * corr + p
                acc = acc * mm(corr, seg_t) + mm(p, seg_t) * vns[tj]
                m = m_new
            m_ref[ti] = m
            l_ref[ti] = l
            acc_ref[ti] = acc

    @pl.when(j * cb < cache_len)
    def _():
        k_t = k_ref[...].astype(jnp.float32)  # (CB, RB, D)
        v_t = v_ref[...].astype(jnp.float32)
        pos = j * cb + jax.lax.broadcasted_iota(jnp.int32, (cb, rb, h), 0)
        ok = pos < cache_len  # old positions only; new frames seeded j==0
        for ti in range(t):
            x = k_t * qs[ti][None]
            scores = mm(x.reshape(cb * rb, d), seg).reshape(cb, rb, h) * scale
            scores = jnp.where(ok, scores, NEG_INF)
            m_new = jnp.maximum(m_ref[ti], jnp.max(scores, axis=0))
            corr = jnp.exp(m_ref[ti] - m_new)
            p = jnp.exp(scores - m_new[None])
            l_ref[ti] = l_ref[ti] * corr + jnp.sum(p, axis=0)
            p_d = mm(p.reshape(cb * rb, h), seg_t).reshape(cb, rb, d)
            acc_ref[ti] = acc_ref[ti] * mm(corr, seg_t) + jnp.sum(
                p_d * v_t, axis=0
            )
            m_ref[ti] = m_new

    # merge-write the appended rows: slot j*cb + ci takes new frame
    # (slot - len) when that offset is a valid new frame. k_ref may be a
    # CLAMPED lower block when j*cb >= len — every slot it then copies
    # through is >= len (dead by the len-masking contract), so the wrong
    # source content is unobservable; live slots (< len) always come from
    # the true block j.
    for ci in range(cb):
        ti_off = j * cb + ci - cache_len
        in_w = (ti_off >= 0) & (ti_off < valid)
        src = jnp.clip(ti_off, 0, t - 1)
        kn_row = kn_ref[pl.ds(src, 1), :, :]
        vn_row = vn_ref[pl.ds(src, 1), :, :]
        ok_ref[ci : ci + 1] = jnp.where(
            in_w, kn_row.astype(ok_ref.dtype), k_ref[ci : ci + 1]
        )
        ov_ref[ci : ci + 1] = jnp.where(
            in_w, vn_row.astype(ov_ref.dtype), v_ref[ci : ci + 1]
        )

    @pl.when(j == pl.num_programs(1) - 1)
    def _():
        for ti in range(t):
            o_ref[ti] = (
                acc_ref[ti] / mm(l_ref[ti], seg_t)
            ).astype(o_ref.dtype)


def fused_temporal_append_pm_ragged(
    q: jnp.ndarray,  # (T, R', D) — R' = B * n_pad, per-stream rows padded
    k_new: jnp.ndarray,  # (T, R', D)
    v_new: jnp.ndarray,
    k_cache: jnp.ndarray,  # (C, R', D) pos-major flat, bf16/fp32
    v_cache: jnp.ndarray,
    lens: jnp.ndarray,  # (B,) int32 — per-stream append start
    valid: jnp.ndarray,  # (B,) int32 in [0, T] — frames appended per stream
    n_pad: int,
    *,
    num_heads: int,
    out_dtype=None,
    row_block: int = 40,
    cache_block: int = 8,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """T-frame ragged append-and-attend — the StreamingEngine throughput
    mode's kernel (see _pm_append_multi_kernel). Linear cache mode only
    (ring holds are illegal); caller contract lens + valid <= C per
    stream. Returns (out (T, R', D), k_cache, v_cache), caches aliased
    in/out. The einsum formulation (_ragged_attend_einsum with new_valid)
    is the correctness oracle and the VJP/backward story is inherited
    from serving being inference-only."""
    t, r, d = q.shape
    c = k_cache.shape[0]
    b = r // n_pad
    assert n_pad % 8 == 0 and b * n_pad == r
    cb = min(cache_block, c)
    while c % cb:
        cb -= 1
    row_block = _ragged_row_block(n_pad, row_block)
    out_dtype = out_dtype or q.dtype
    bps = n_pad // row_block  # row blocks per stream
    lens = jnp.repeat(jnp.asarray(lens, jnp.int32), bps)
    valid = jnp.repeat(jnp.asarray(valid, jnp.int32), bps)
    tq_spec = pl.BlockSpec((t, row_block, d), lambda i, j, l, w: (0, i, 0),
                           memory_space=pltpu.VMEM)
    kv_spec = pl.BlockSpec(
        (cb, row_block, d),
        # clamped to the stream's valid prefix for the ATTENTION reads;
        # merge-write correctness under the clamp is argued in the kernel
        lambda i, j, l, w: (jnp.minimum(j, jnp.maximum(l[i] - 1, 0) // cb),
                            i, 0),
        memory_space=pltpu.VMEM)
    kv_out_spec = pl.BlockSpec((cb, row_block, d),
                               lambda i, j, l, w: (j, i, 0),
                               memory_space=pltpu.VMEM)
    out, k_out, v_out = pl.pallas_call(
        functools.partial(_pm_append_multi_kernel, num_heads=num_heads,
                          cache_block=cb, t=t),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2, grid=(r // row_block, c // cb),
            in_specs=[tq_spec, tq_spec, tq_spec, kv_spec, kv_spec],
            out_specs=(tq_spec, kv_out_spec, kv_out_spec),
            scratch_shapes=[
                pltpu.VMEM((t, row_block, num_heads), jnp.float32),
                pltpu.VMEM((t, row_block, num_heads), jnp.float32),
                pltpu.VMEM((t, row_block, d), jnp.float32),
            ]),
        out_shape=(
            jax.ShapeDtypeStruct((t, r, d), out_dtype),
            jax.ShapeDtypeStruct(k_cache.shape, k_cache.dtype),
            jax.ShapeDtypeStruct(v_cache.shape, v_cache.dtype),
        ),
        # operands: (lens, valid, q, k_new, v_new, k_cache, v_cache)
        input_output_aliases={5: 1, 6: 2},
        interpret=interpret,
    )(lens, valid, q, k_new, v_new, k_cache, v_cache)
    return out, k_out, v_out


def _pm8_decode_kernel(len_ref, q_ref, knq_ref, vnq_ref, kns_ref, vns_ref,
                       k_ref, v_ref, ks_ref, vs_ref, o_ref, ok_ref, ov_ref,
                       m_ref, l_ref, acc_ref, kst_ref, vst_ref,
                       *, num_heads, cache_block):
    """int8 pos-major decode with in-kernel append: blocked online softmax
    like the bf16 kernel (grid (rows, position-blocks)), dequant folded
    post-reduction: score = ks * (q . k_i8), pv uses p * vs before the head
    expand. The (RB, C) scale tiles are transposed ONCE per row block into
    (C, RB) VMEM scratch so each position block takes a dynamic SUBLANE
    slice (dynamic lane slicing is not lowerable). The new frame arrives
    pre-quantized; its plane is written aliased, its scale column is dus'd
    by the host (the (R, C) scale arrays are ~100 KB — the relayout copies
    that killed the big-plane dus don't matter there).

    len_ref is (1,) (lockstep) or (num_row_blocks,) (per-ROW-BLOCK lengths
    — the ragged path via fused_temporal_decode_pm_int8_ragged, whose
    32-sublane per-stream row padding keeps blocks within one stream)."""
    j = pl.program_id(1)
    cache_len = (len_ref[0] if len_ref.shape[0] == 1
                 else len_ref[pl.program_id(0)])
    rb, d = q_ref.shape
    cb = cache_block
    h = num_heads
    dh = d // h
    d_idx = jax.lax.broadcasted_iota(jnp.int32, (d, h), 0)
    h_idx = jax.lax.broadcasted_iota(jnp.int32, (d, h), 1)
    seg = (d_idx // dh == h_idx).astype(jnp.float32)
    seg_t = seg.T

    def mm(a, b):
        return jax.lax.dot_general(a, b, (((1,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32)

    q_f = q_ref[...].astype(jnp.float32)

    @pl.when(j == 0)
    def _():
        kst_ref[...] = jnp.swapaxes(ks_ref[...], 0, 1)  # (C, RB)
        vst_ref[...] = jnp.swapaxes(vs_ref[...], 0, 1)
        # seed with the new (dequantized) frame — always valid, max so far
        kn_f = knq_ref[...].astype(jnp.float32) * kns_ref[...]
        m_ref[...] = mm(kn_f * q_f, seg) * (dh**-0.5)  # (RB, H)
        l_ref[...] = jnp.ones_like(l_ref)
        acc_ref[...] = vnq_ref[...].astype(jnp.float32) * vns_ref[...]

    @pl.when(j * cb < cache_len)
    def _():
        k_t = k_ref[...].astype(jnp.float32)  # (CB, RB, D)
        x = k_t * q_f[None]
        s = mm(x.reshape(cb * rb, d), seg).reshape(cb, rb, h)
        s = s * (dh**-0.5) * kst_ref[pl.ds(j * cb, cb)][:, :, None]
        pos = j * cb + jax.lax.broadcasted_iota(jnp.int32, (cb, rb, h), 0)
        # linear + ring mask (see _pm_decode_kernel note)
        c_total = pl.num_programs(1) * cb
        ok = (pos < cache_len) & (pos != cache_len % c_total)
        s = jnp.where(ok, s, NEG_INF)
        m_new = jnp.maximum(m_ref[...], jnp.max(s, axis=0))
        corr = jnp.exp(m_ref[...] - m_new)
        e = jnp.exp(s - m_new[None])
        l_ref[...] = l_ref[...] * corr + jnp.sum(e, axis=0)
        v_t = v_ref[...].astype(jnp.float32)
        p_d = mm((e * vst_ref[pl.ds(j * cb, cb)][:, :, None]).reshape(
            cb * rb, h), seg_t).reshape(cb, rb, d)
        acc_ref[...] = acc_ref[...] * mm(corr, seg_t) + jnp.sum(p_d * v_t, axis=0)
        m_ref[...] = m_new

    @pl.when(j == pl.num_programs(1) - 1)
    def _():
        o_ref[...] = (acc_ref[...] / mm(l_ref[...], seg_t)).astype(o_ref.dtype)
        ok_ref[...] = knq_ref[...].reshape(1, rb, d)
        ov_ref[...] = vnq_ref[...].reshape(1, rb, d)


def fused_temporal_decode_pm_int8(
    q: jnp.ndarray,  # (R, D)
    kn_q: jnp.ndarray,  # (R, D) int8 — pre-quantized new-frame keys
    vn_q: jnp.ndarray,
    kn_s: jnp.ndarray,  # (R, 1) f32 new-frame scales
    vn_s: jnp.ndarray,
    k_cache: jnp.ndarray,  # (C, R, D) int8 pos-major, positions < len valid
    v_cache: jnp.ndarray,
    k_scale: jnp.ndarray,  # (R, C) f32 — row-major so lane dim = full C
    v_scale: jnp.ndarray,
    cache_len: jnp.ndarray,
    *,
    num_heads: int,
    out_dtype=None,
    row_block: int = 32,
    cache_block: int = 64,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Pos-major int8 append-and-attend decode (fused dequant): HALF the
    attention HBM traffic of bf16 at any capacity. Returns (out, k_cache,
    v_cache); the caller dus's the small scale arrays. Row blocks must be
    32-sublane (int8 tile granularity — init_cache pads rows). Per-stream
    (ragged) int8 caches take the einsum fallback path instead."""
    c, r, d = k_cache.shape
    row_block = _pick_row_block(r, row_block, multiple=32)
    assert row_block % 32 == 0, (
        f"rows {r} must have a 32-multiple divisor (init_cache pads int8 "
        f"cache rows to the 32-sublane tile)"
    )
    # position blocks are 8-sublane granular; require an 8-aligned capacity
    # up front (a -1 search from a non-multiple start never reaches the old
    # assert — it decrements to a zero-divide first), then step by 8 so the
    # loop provably terminates at cb=8
    assert c % 8 == 0, (
        f"int8 cache capacity must be a multiple of 8, got {c}"
    )
    cb = max(min(cache_block, c) // 8 * 8, 8)
    while c % cb:
        cb -= 8
    out_dtype = out_dtype or q.dtype
    lens = jnp.asarray([cache_len], jnp.int32).reshape(1)
    q_spec = pl.BlockSpec((row_block, d), lambda i, j, l: (i, 0),
                          memory_space=pltpu.VMEM)
    n_spec = pl.BlockSpec((row_block, 1), lambda i, j, l: (i, 0),
                          memory_space=pltpu.VMEM)
    kv_spec = pl.BlockSpec(
        (cb, row_block, d),
        lambda i, j, l: (jnp.minimum(j, jnp.maximum(l[0] - 1, 0) // cb), i, 0),
        memory_space=pltpu.VMEM)
    sc_spec = pl.BlockSpec((row_block, c), lambda i, j, l: (i, 0),
                           memory_space=pltpu.VMEM)
    plane_spec = pl.BlockSpec((1, row_block, d),
                              lambda i, j, l: (l[0] % c, i, 0),
                              memory_space=pltpu.VMEM)
    out, k_out, v_out = pl.pallas_call(
        functools.partial(_pm8_decode_kernel, num_heads=num_heads,
                          cache_block=cb),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1, grid=(r // row_block, c // cb),
            in_specs=[q_spec, q_spec, q_spec, n_spec, n_spec,
                      kv_spec, kv_spec, sc_spec, sc_spec],
            out_specs=(q_spec, plane_spec, plane_spec),
            scratch_shapes=[
                pltpu.VMEM((row_block, num_heads), jnp.float32),
                pltpu.VMEM((row_block, num_heads), jnp.float32),
                pltpu.VMEM((row_block, d), jnp.float32),
                pltpu.VMEM((c, row_block), jnp.float32),
                pltpu.VMEM((c, row_block), jnp.float32),
            ]),
        out_shape=(
            jax.ShapeDtypeStruct((r, d), out_dtype),
            jax.ShapeDtypeStruct(k_cache.shape, jnp.int8),
            jax.ShapeDtypeStruct(v_cache.shape, jnp.int8),
        ),
        # operands: (len, q, kn_q, vn_q, kn_s, vn_s, k, v, ks, vs)
        input_output_aliases={6: 1, 7: 2},
        interpret=interpret,
    )(lens, q, kn_q, vn_q, kn_s, vn_s, k_cache, v_cache, k_scale, v_scale)
    return out, k_out, v_out


def fused_temporal_decode_pm_int8_ragged(
    q: jnp.ndarray,  # (R', D) — R' = B * n_pad, per-stream 32-padded rows
    kn_q: jnp.ndarray,  # (R', D) int8 — pre-quantized new-frame keys
    vn_q: jnp.ndarray,
    kn_s: jnp.ndarray,  # (R', 1) f32 new-frame scales
    vn_s: jnp.ndarray,
    k_cache: jnp.ndarray,  # (C, R', D) int8 pos-major flat, as lockstep
    v_cache: jnp.ndarray,
    k_scale: jnp.ndarray,  # (R', C) f32 row-major
    v_scale: jnp.ndarray,
    lens: jnp.ndarray,  # (B,) int32 — per-stream position of the new frame
    n_pad: int,  # rows per stream (32-multiple; ragged_row_pad(N, 32))
    *,
    num_heads: int,
    out_dtype=None,
    row_block: int = 32,
    cache_block: int = 64,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Ragged (per-stream length) int8 append-and-attend decode —
    continuous batching with a HALF-traffic KV cache. Same kernel body as
    the lockstep int8 decode; the deltas are per-ROW-BLOCK lengths in the
    scalar-prefetch array and per-stream clamp/slot index maps (the bf16
    ragged recipe, fused_temporal_decode_pm_ragged). Rows are padded per
    stream to a 32-multiple (the int8 sublane tile) so a row block never
    spans two streams. The caller dus's each stream's scale column at its
    own slot. Serves both cache modes: slot (len mod C) + exclusion mask =
    sliding window when ring."""
    c, r, d = k_cache.shape
    b = r // n_pad
    assert n_pad % 32 == 0 and b * n_pad == r, (n_pad, b, r)
    assert c % 8 == 0, (
        f"int8 cache capacity must be a multiple of 8, got {c}"
    )
    cb = max(min(cache_block, c) // 8 * 8, 8)
    while c % cb:
        cb -= 8
    row_block = _ragged_row_block(n_pad, row_block, multiple=32)
    out_dtype = out_dtype or q.dtype
    bps = n_pad // row_block  # row blocks per stream
    lens = jnp.repeat(jnp.asarray(lens, jnp.int32), bps)
    q_spec = pl.BlockSpec((row_block, d), lambda i, j, l: (i, 0),
                          memory_space=pltpu.VMEM)
    n_spec = pl.BlockSpec((row_block, 1), lambda i, j, l: (i, 0),
                          memory_space=pltpu.VMEM)
    kv_spec = pl.BlockSpec(
        (cb, row_block, d),
        # clamp to row block i's own stream's valid prefix
        lambda i, j, l: (jnp.minimum(j, jnp.maximum(l[i] - 1, 0) // cb), i, 0),
        memory_space=pltpu.VMEM)
    sc_spec = pl.BlockSpec((row_block, c), lambda i, j, l: (i, 0),
                           memory_space=pltpu.VMEM)
    plane_spec = pl.BlockSpec((1, row_block, d),
                              lambda i, j, l: (l[i] % c, i, 0),
                              memory_space=pltpu.VMEM)
    out, k_out, v_out = pl.pallas_call(
        functools.partial(_pm8_decode_kernel, num_heads=num_heads,
                          cache_block=cb),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1, grid=(r // row_block, c // cb),
            in_specs=[q_spec, q_spec, q_spec, n_spec, n_spec,
                      kv_spec, kv_spec, sc_spec, sc_spec],
            out_specs=(q_spec, plane_spec, plane_spec),
            scratch_shapes=[
                pltpu.VMEM((row_block, num_heads), jnp.float32),
                pltpu.VMEM((row_block, num_heads), jnp.float32),
                pltpu.VMEM((row_block, d), jnp.float32),
                pltpu.VMEM((c, row_block), jnp.float32),
                pltpu.VMEM((c, row_block), jnp.float32),
            ]),
        out_shape=(
            jax.ShapeDtypeStruct((r, d), out_dtype),
            jax.ShapeDtypeStruct(k_cache.shape, jnp.int8),
            jax.ShapeDtypeStruct(v_cache.shape, jnp.int8),
        ),
        # operands: (lens, q, kn_q, vn_q, kn_s, vn_s, k, v, ks, vs)
        input_output_aliases={6: 1, 7: 2},
        interpret=interpret,
    )(lens, q, kn_q, vn_q, kn_s, vn_s, k_cache, v_cache, k_scale, v_scale)
    return out, k_out, v_out


# ---------------------------------------------------------------------------
# fused full-clip temporal-causal attention (training/full-forward hot loop)
# ---------------------------------------------------------------------------
#
# The divided temporal attention at T=16 is tiny-matmul-bound for the MXU
# ((16,64)@(64,16) per (b,n,h) — ~6% utilization; XLA's fused attention
# measures ~3 TFLOP/s here). This kernel uses the same D-packed segmented
# formulation as the decode kernel: rows are (b, n) pairs, heads live as
# 12x64 lane segments, scores come from one elementwise multiply plus a
# (rows, D) @ (D, H) segment reduction per query position, with the causal
# structure expressed as STATIC key slices (query t attends keys [0..t]).
# Forward-only; the backward recomputes through the einsum formulation
# (jax.custom_vjp) like fused_spatial_attention.


def _fullclip_temporal_kernel(q_ref, k_ref, v_ref, o_ref, *,
                              num_heads: int, t_len: int):
    rb, t, d = q_ref.shape
    h = num_heads
    dh = d // h
    d_idx = jax.lax.broadcasted_iota(jnp.int32, (d, h), 0)
    h_idx = jax.lax.broadcasted_iota(jnp.int32, (d, h), 1)
    seg = (d_idx // dh == h_idx).astype(jnp.float32)
    seg_t = seg.T

    def mm(a, b):
        return jax.lax.dot_general(
            a, b, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    k_f = k_ref[...].astype(jnp.float32)  # (RB, T, D)
    v_f = v_ref[...].astype(jnp.float32)
    scale = dh**-0.5
    # full-T masked per-query loop: growing causal slices would make the
    # sublane dim unaligned (kv not a multiple of 8) and cost relayouts;
    # masking the full T keeps every op tile-aligned (measured ~2x faster)
    for qt in range(t_len):
        q_t = q_ref[:, qt, :].astype(jnp.float32)  # (RB, D)
        x = k_f * q_t[:, None, :]  # (RB, T, D)
        s = mm(x.reshape(rb * t, d), seg).reshape(rb, t, h) * scale
        k_idx = jax.lax.broadcasted_iota(jnp.int32, (rb, t, h), 1)
        s = jnp.where(k_idx <= qt, s, NEG_INF)
        m = jnp.max(s, axis=1, keepdims=True)
        p = jnp.exp(s - m)
        p = p / jnp.sum(p, axis=1, keepdims=True)
        p_d = mm(p.reshape(rb * t, h), seg_t).reshape(rb, t, d)
        o_ref[:, qt, :] = jnp.sum(p_d * v_f, axis=1).astype(o_ref.dtype)


def _fullclip_temporal_pallas(q, k, v, num_heads, row_block=28):
    r, t, d = q.shape
    while r % row_block:
        row_block -= 1
    spec = pl.BlockSpec((row_block, t, d), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_fullclip_temporal_kernel, num_heads=num_heads,
                          t_len=t),
        grid=(r // row_block,),
        in_specs=[spec] * 3,
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((r, t, d), q.dtype),
    )(q, k, v)


def fullclip_temporal_reference(q, k, v, num_heads):
    """(R, T, D) einsum oracle (and the custom_vjp backward)."""
    r, t, d = q.shape
    dh = d // num_heads
    qh = q.reshape(r, t, num_heads, dh)
    kh = k.reshape(r, t, num_heads, dh)
    vh = v.reshape(r, t, num_heads, dh)
    s = jnp.einsum("rqhd,rkhd->rhqk", qh, kh,
                   preferred_element_type=jnp.float32) * dh**-0.5
    mask = jnp.tril(jnp.ones((t, t), bool))
    s = jnp.where(mask[None, None], s, NEG_INF)
    p = jax.nn.softmax(s, axis=-1).astype(q.dtype)
    return jnp.einsum("rhqk,rkhd->rqhd", p, vh).reshape(r, t, d)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def fused_temporal_fullclip(q, k, v, num_heads):
    """Causal temporal attention over (R, T, D) flat-D rows; Pallas forward,
    einsum backward."""
    return _fullclip_temporal_pallas(q, k, v, num_heads)


def _ftf_fwd(q, k, v, num_heads):
    return _fullclip_temporal_pallas(q, k, v, num_heads), (q, k, v)


def _fullclip_temporal_bwd_kernel(q_ref, k_ref, v_ref, g_ref,
                                  dq_ref, dk_ref, dv_ref,
                                  dk_acc, dv_acc, *,
                                  num_heads: int, t_len: int):
    """Fused backward for the D-packed causal temporal attention: the same
    segmented-matmul formulation as the forward (scores via a (rows, D) @
    (D, H) segment reduction), with the query position as the INNER GRID
    dimension instead of an unrolled Python loop (an unrolled body makes
    Mosaic's compile time explode ~30x here). For a fixed row block the k/v
    blocks stay VMEM-resident across the qt sweep; dk/dv accumulate in fp32
    scratch and flush on the last qt. Avoids the tiny (16, 64) @ (64, 16)
    matmuls that cap XLA's attention backward at a few TFLOP/s."""
    j = pl.program_id(1)
    rb, t, d = k_ref.shape
    qb = q_ref.shape[1]  # query-block width (8: the sublane tile)
    h = num_heads
    dh = d // h
    scale = dh**-0.5
    d_idx = jax.lax.broadcasted_iota(jnp.int32, (d, h), 0)
    h_idx = jax.lax.broadcasted_iota(jnp.int32, (d, h), 1)
    seg = (d_idx // dh == h_idx).astype(jnp.float32)
    seg_t = seg.T

    def mm(a, b):
        return jax.lax.dot_general(
            a, b, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    @pl.when(j == 0)
    def _():
        dk_acc[...] = jnp.zeros_like(dk_acc)
        dv_acc[...] = jnp.zeros_like(dv_acc)

    k_f = k_ref[...].astype(jnp.float32)  # (RB, T, D)
    v_f = v_ref[...].astype(jnp.float32)
    k_idx = jax.lax.broadcasted_iota(jnp.int32, (rb, t, h), 1)
    dk_sum = jnp.zeros((rb, t, d), jnp.float32)
    dv_sum = jnp.zeros((rb, t, d), jnp.float32)
    for p_i in range(qb):  # static sublane index within the query block
        qt = j * qb + p_i  # dynamic absolute position (mask only)
        q_t = q_ref[:, p_i, :].astype(jnp.float32)  # (RB, D)
        g_t = g_ref[:, p_i, :].astype(jnp.float32)
        x = k_f * q_t[:, None, :]
        s = mm(x.reshape(rb * t, d), seg).reshape(rb, t, h) * scale
        s = jnp.where(k_idx <= qt, s, NEG_INF)
        m = jnp.max(s, axis=1, keepdims=True)
        p = jnp.exp(s - m)
        p = p / jnp.sum(p, axis=1, keepdims=True)  # (RB, T, H)
        # zero out padded query positions (t rounded up to the sublane
        # tile) so they don't pollute the dk/dv accumulators
        p = p * jnp.where(qt < t_len, 1.0, 0.0)
        p_d = mm(p.reshape(rb * t, h), seg_t).reshape(rb, t, d)
        dv_sum = dv_sum + p_d * g_t[:, None, :]
        dp = mm((v_f * g_t[:, None, :]).reshape(rb * t, d), seg)
        dp = dp.reshape(rb, t, h)
        delta = jnp.sum(dp * p, axis=1, keepdims=True)
        ds = p * (dp - delta) * scale  # masked keys: p == 0 -> ds == 0
        ds_d = mm(ds.reshape(rb * t, h), seg_t).reshape(rb, t, d)
        dq_ref[:, p_i, :] = jnp.sum(ds_d * k_f, axis=1).astype(dq_ref.dtype)
        dk_sum = dk_sum + ds_d * q_t[:, None, :]
    dk_acc[...] += dk_sum
    dv_acc[...] += dv_sum

    @pl.when(j == pl.num_programs(1) - 1)
    def _():
        dk_ref[...] = dk_acc[...].astype(dk_ref.dtype)
        dv_ref[...] = dv_acc[...].astype(dv_ref.dtype)


def _fullclip_temporal_bwd_pallas(q, k, v, g, num_heads, row_block=16,
                                  interpret=False):
    r, t, d = q.shape
    while r % row_block:
        row_block -= 1
    qb = min(8, t)  # query-block width: the sublane tile (static slices)
    tq = _round_up(t, qb)
    if tq != t:
        pad = [(0, 0), (0, tq - t), (0, 0)]
        q, g = jnp.pad(q, pad), jnp.pad(g, pad)
    # grid inner dim sweeps query blocks; k/v/dk/dv blocks are constant over
    # it (one DMA per row block), q/g/dq stream qb positions at a time
    row_spec = pl.BlockSpec((row_block, qb, d), lambda i, j: (i, j, 0),
                            memory_space=pltpu.VMEM)
    kv_spec = pl.BlockSpec((row_block, t, d), lambda i, j: (i, 0, 0),
                           memory_space=pltpu.VMEM)
    shape = jax.ShapeDtypeStruct((r, t, d), q.dtype)
    dq, dk, dv = pl.pallas_call(
        functools.partial(_fullclip_temporal_bwd_kernel,
                          num_heads=num_heads, t_len=t),
        grid=(r // row_block, tq // qb),
        in_specs=[row_spec, kv_spec, kv_spec, row_spec],
        out_specs=(row_spec, kv_spec, kv_spec),
        out_shape=(jax.ShapeDtypeStruct((r, tq, d), q.dtype), shape, shape),
        scratch_shapes=[
            pltpu.VMEM((row_block, t, d), jnp.float32),
            pltpu.VMEM((row_block, t, d), jnp.float32),
        ],
        interpret=interpret,
    )(q, k, v, g)
    return dq[:, :t], dk, dv


def _ftf_bwd(num_heads, res, g):
    q, k, v = res
    if q.dtype == jnp.bfloat16 and jax.default_backend() != "cpu":
        return _fullclip_temporal_bwd_pallas(q, k, v, g, num_heads)
    _, vjp = jax.vjp(
        lambda q, k, v: fullclip_temporal_reference(q, k, v, num_heads),
        q, k, v,
    )
    return vjp(g)


fused_temporal_fullclip.defvjp(_ftf_fwd, _ftf_bwd)


# ---------------------------------------------------------------------------
# fused spatial attention, flat-D form (full-forward hot loop)
# ---------------------------------------------------------------------------


def _spatial_flat_kernel(q_ref, k_ref, v_ref, o_ref, *, num_heads: int):
    """Per-row (b,t) softmax attention over N patches, heads as 64-lane
    slices of the flat D dim — avoids the ~2.7x tile-padded (..., H, dh)
    materializations the XLA fused-attention path needs.

    Matmul operands stay in the INPUT dtype with fp32 accumulation
    (preferred_element_type): upcasting bf16 inputs to fp32 operands adds
    no information (the data arrived as bf16) but drops the MXU to its
    ~8x-slower fp32 path. Softmax stats run in fp32 either way."""
    rb, n, d = q_ref.shape
    h = num_heads
    dh = d // h
    scale = dh**-0.5
    for r in range(rb):
        qf = q_ref[r]  # (N, D), input dtype
        kf = k_ref[r]
        vf = v_ref[r]
        outs = []
        for hh in range(h):
            sl = slice(hh * dh, (hh + 1) * dh)
            s = jax.lax.dot_general(
                qf[:, sl], kf[:, sl], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * scale
            s = s - jnp.max(s, axis=-1, keepdims=True)
            p = jnp.exp(s)
            p = p / jnp.sum(p, axis=-1, keepdims=True)
            outs.append(
                jax.lax.dot_general(
                    p.astype(vf.dtype), vf[:, sl], (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
            )
        # concat once and store the full-width tile: per-head lane-slice
        # stores measure ~40% slower here (masked partial-lane writes)
        o_ref[r] = jnp.concatenate(outs, axis=-1).astype(o_ref.dtype)


def _spatial_flat_pallas(q, k, v, num_heads, row_block=1):
    r, n, d = q.shape
    spec = pl.BlockSpec((row_block, n, d), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_spatial_flat_kernel, num_heads=num_heads),
        grid=(r // row_block,),
        in_specs=[spec] * 3,
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((r, n, d), q.dtype),
    )(q, k, v)


def spatial_flat_reference(q, k, v, num_heads):
    r, n, d = q.shape
    dh = d // num_heads
    qh = q.reshape(r, n, num_heads, dh)
    kh = k.reshape(r, n, num_heads, dh)
    vh = v.reshape(r, n, num_heads, dh)
    s = jnp.einsum("rqhd,rkhd->rhqk", qh, kh,
                   preferred_element_type=jnp.float32) * dh**-0.5
    p = jax.nn.softmax(s, axis=-1).astype(q.dtype)
    return jnp.einsum("rhqk,rkhd->rqhd", p, vh).reshape(r, n, d)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def fused_spatial_flat(q, k, v, num_heads):
    """Spatial attention on (R, N, D) flat-D rows; Pallas forward, einsum
    backward."""
    return _spatial_flat_pallas(q, k, v, num_heads)


def _fsf_fwd(q, k, v, num_heads):
    return _spatial_flat_pallas(q, k, v, num_heads), (q, k, v)


def _spatial_flat_bwd_kernel(q_ref, k_ref, v_ref, g_ref,
                             dq_ref, dk_ref, dv_ref, *,
                             num_heads: int, dh: int):
    """Fused flash-style backward for the per-row spatial attention.

    One grid instance = one (b, t) row, all heads (full flat-D lane dim).
    Five matmuls per head — s, dp, dq, and the two transposed-operand
    products dk = ds^T q and dv = p^T g use in-register Mosaic transposes
    of the (N, N) probability/score tiles. (An earlier dual-orientation
    design recomputed s^T/dp^T by extra matmuls to avoid the transposes;
    measured on v5e at N=196 the transpose version is ~9% faster, and
    keeping matmul operands in bf16 with fp32 accumulation
    (preferred_element_type) another ~5% — the (R, H, N, N) probability
    tensors never touch HBM either way, unlike the XLA recompute path
    which writes them twice per layer.) Grads are written per-head into
    lane slices of the output refs — no concatenate materialization."""
    _, n, _ = q_ref.shape
    scale = dh**-0.5
    qf, kf, vf, gf = q_ref[0], k_ref[0], v_ref[0], g_ref[0]  # input dtype

    def mm(a, b):  # (M, K) @ (K, L)
        return jax.lax.dot_general(
            a, b, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    def mmt(a, b):  # (M, K) @ (L, K)^T
        return jax.lax.dot_general(
            a, b, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    for hh in range(num_heads):
        sl = slice(hh * dh, (hh + 1) * dh)
        qh, kh, vh, gh = qf[:, sl], kf[:, sl], vf[:, sl], gf[:, sl]
        s = mmt(qh, kh) * scale  # (Nq, Nk) fp32
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        p = p / jnp.sum(p, axis=-1, keepdims=True)
        dp = mmt(gh, vh)  # (Nq, Nk) fp32
        delta = jnp.sum(dp * p, axis=-1, keepdims=True)
        ds = (p * (dp - delta) * scale).astype(qf.dtype)
        pb = p.astype(qf.dtype)
        dq_ref[0, :, sl] = mm(ds, kh).astype(dq_ref.dtype)
        dk_ref[0, :, sl] = mm(ds.T, qh).astype(dk_ref.dtype)
        dv_ref[0, :, sl] = mm(pb.T, gh).astype(dv_ref.dtype)


def _spatial_flat_bwd_pallas(q, k, v, g, num_heads, interpret=False):
    r, n, d = q.shape
    dh = d // num_heads
    spec = pl.BlockSpec((1, n, d), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    shape = jax.ShapeDtypeStruct((r, n, d), q.dtype)
    return pl.pallas_call(
        functools.partial(_spatial_flat_bwd_kernel,
                          num_heads=num_heads, dh=dh),
        grid=(r,),
        in_specs=[spec] * 4,
        out_specs=(spec, spec, spec),
        out_shape=(shape, shape, shape),
        interpret=interpret,
    )(q, k, v, g)


def _fsf_bwd(num_heads, res, g):
    q, k, v = res
    if q.dtype == jnp.bfloat16 and jax.default_backend() != "cpu":
        return _spatial_flat_bwd_pallas(q, k, v, g, num_heads)
    _, vjp = jax.vjp(
        lambda q, k, v: spatial_flat_reference(q, k, v, num_heads), q, k, v
    )
    return vjp(g)


fused_spatial_flat.defvjp(_fsf_fwd, _fsf_bwd)
