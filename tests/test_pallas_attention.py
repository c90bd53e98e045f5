"""Pallas kernel parity vs the einsum reference (interpret mode on CPU —
kernel-vs-reference, the pattern of the reference's own op test,
downstream/OVIS/.../ops/test.py)."""

import numpy as np
import pytest

pytestmark = pytest.mark.fast

import jax
import jax.numpy as jnp

from streamformer_tpu.ops import attention as A


@pytest.fixture(autouse=True)
def _interpret(monkeypatch):
    # run all pallas kernels in interpreter mode on CPU
    from jax.experimental import pallas as pl

    orig = pl.pallas_call

    def patched(*args, **kw):
        kw["interpret"] = True
        return orig(*args, **kw)

    monkeypatch.setattr(pl, "pallas_call", patched)
    monkeypatch.setattr(A.pl, "pallas_call", patched)
    yield


def test_fused_spatial_matches_reference(rng):
    r, h, n, dh = 3, 4, 196, 32
    q = jnp.asarray(rng.standard_normal((r, h, n, dh)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((r, h, n, dh)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((r, h, n, dh)).astype(np.float32))
    ref = A.spatial_attention_reference(q, k, v)
    got = A.fused_spatial_attention(q, k, v)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5,
                               rtol=2e-5)


def test_fused_spatial_grad_matches_reference(rng):
    r, h, n, dh = 2, 2, 60, 16
    q = jnp.asarray(rng.standard_normal((r, h, n, dh)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((r, h, n, dh)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((r, h, n, dh)).astype(np.float32))

    def loss_fused(q, k, v):
        return jnp.sum(A.fused_spatial_attention(q, k, v) ** 2)

    def loss_ref(q, k, v):
        return jnp.sum(A.spatial_attention_reference(q, k, v) ** 2)

    gf = jax.grad(loss_fused, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4,
                                   rtol=1e-4)


def _decode_oracle(q, k, v, clen, h):
    """Per-row multihead attention over positions <= clen (numpy)."""
    r, c, d = k.shape
    dh = d // h
    qh = np.asarray(q).reshape(r, h, dh)
    kh = np.asarray(k).reshape(r, c, h, dh)
    vh = np.asarray(v).reshape(r, c, h, dh)
    s = np.einsum("rhd,rchd->rhc", qh, kh) * dh**-0.5
    s = np.where(np.arange(c)[None, None] <= clen, s, -1e30)
    p = np.exp(s - s.max(-1, keepdims=True))
    p /= p.sum(-1, keepdims=True)
    return np.einsum("rhc,rchd->rhd", p, vh).reshape(r, d)


@pytest.mark.parametrize("clen", [0, 5, 11])
def test_fused_temporal_decode_matches_oracle(rng, clen):
    r, c, h, dh = 56, 12, 4, 16
    d = h * dh
    q = jnp.asarray(rng.standard_normal((r, d)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((r, c, d)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((r, c, d)).astype(np.float32))
    got = A.fused_temporal_decode(
        q, k, v, None, None, jnp.asarray(clen, jnp.int32), num_heads=h
    )
    ref = _decode_oracle(q, k, v, clen, h)
    np.testing.assert_allclose(np.asarray(got), ref, atol=2e-5, rtol=2e-5)


def test_fused_temporal_decode_int8(rng):
    """int8 KV cache: kernel == attention over the dequantized cache
    exactly; quantization error vs full precision stays small."""
    from streamformer_tpu.models.encoder import dequantize_kv, quantize_kv

    r, c, h, dh = 28, 16, 4, 16
    d = h * dh
    clen = jnp.asarray(c - 1, jnp.int32)
    q = jnp.asarray(rng.standard_normal((r, d)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((r, c, d)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((r, c, d)).astype(np.float32))
    ki, ks = quantize_kv(k.reshape(r, c, h, dh))
    vi, vs = quantize_kv(v.reshape(r, c, h, dh))
    got = A.fused_temporal_decode(
        q, ki.reshape(r, c, d), vi.reshape(r, c, d), ks, vs, clen,
        num_heads=h,
    )
    kd = dequantize_kv(ki, ks, jnp.float32).reshape(r, c, d)
    vd = dequantize_kv(vi, vs, jnp.float32).reshape(r, c, d)
    ref_deq = _decode_oracle(q, kd, vd, c - 1, h)
    np.testing.assert_allclose(np.asarray(got), ref_deq, atol=2e-4, rtol=2e-4)
    ref_full = _decode_oracle(q, k, v, c - 1, h)
    g = np.asarray(got)
    cos = (g * ref_full).sum() / np.sqrt((g**2).sum() * (ref_full**2).sum())
    assert cos > 0.999, cos


@pytest.mark.parametrize("clen", [0, 5, 7, 8, 31])
def test_fused_temporal_decode_inplace(rng, clen):
    """Production decode: in-kernel append + attend; caches aliased in/out.
    Checks attention output AND the full cache contents after the write."""
    r, c, h, dh = 56, 32, 4, 16
    d = h * dh
    q = jnp.asarray(rng.standard_normal((r, d)).astype(np.float32))
    kc = jnp.asarray(rng.standard_normal((r, c, d)).astype(np.float32))
    vc = jnp.asarray(rng.standard_normal((r, c, d)).astype(np.float32))
    kn = jnp.asarray(rng.standard_normal((r, d)).astype(np.float32))
    vn = jnp.asarray(rng.standard_normal((r, d)).astype(np.float32))
    out, ko, vo = A.fused_temporal_decode_inplace(
        q, kn, vn, kc, vc, jnp.asarray(clen, jnp.int32), num_heads=h
    )
    k_full = np.asarray(kc).copy()
    k_full[:, clen] = kn
    v_full = np.asarray(vc).copy()
    v_full[:, clen] = vn
    ref = _decode_oracle(q, jnp.asarray(k_full), jnp.asarray(v_full), clen, h)
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-5, rtol=2e-5)
    np.testing.assert_array_equal(np.asarray(ko), k_full)
    np.testing.assert_array_equal(np.asarray(vo), v_full)


def test_fused_spatial_flat_matches_reference(rng):
    r, n, h, dh = 4, 60, 4, 16
    d = h * dh
    q = jnp.asarray(rng.standard_normal((r, n, d)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((r, n, d)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((r, n, d)).astype(np.float32))
    got = A.fused_spatial_flat(q, k, v, h)
    ref = A.spatial_flat_reference(q, k, v, h)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5,
                               rtol=2e-5)
    gf = jax.grad(lambda q: jnp.sum(A.fused_spatial_flat(q, k, v, h) ** 2))(q)
    gr = jax.grad(
        lambda q: jnp.sum(A.spatial_flat_reference(q, k, v, h) ** 2)
    )(q)
    np.testing.assert_allclose(np.asarray(gf), np.asarray(gr), atol=1e-4,
                               rtol=1e-4)


def test_fused_temporal_fullclip_matches_reference(rng):
    r, t, h, dh = 56, 8, 4, 16
    d = h * dh
    q = jnp.asarray(rng.standard_normal((r, t, d)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((r, t, d)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((r, t, d)).astype(np.float32))
    got = A.fused_temporal_fullclip(q, k, v, h)
    ref = A.fullclip_temporal_reference(q, k, v, h)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5,
                               rtol=2e-5)
    gf = jax.grad(
        lambda q: jnp.sum(A.fused_temporal_fullclip(q, k, v, h) ** 2)
    )(q)
    gr = jax.grad(
        lambda q: jnp.sum(A.fullclip_temporal_reference(q, k, v, h) ** 2)
    )(q)
    np.testing.assert_allclose(np.asarray(gf), np.asarray(gr), atol=1e-4,
                               rtol=1e-4)


# ---------------------------------------------------------------------------
# pos-major cache layout kernels (the production streaming path)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("clen", [0, 5, 15, 31])
def test_fused_temporal_decode_pm_matches_oracle(rng, clen):
    """Pos-major (C, R, D) append-and-attend == per-row oracle; the new
    frame's plane is written in-kernel (caches aliased in/out)."""
    r, c, h, dh = 56, 32, 4, 16
    d = h * dh
    q = jnp.asarray(rng.standard_normal((r, d)).astype(np.float32))
    kc = jnp.asarray(rng.standard_normal((c, r, d)).astype(np.float32))
    vc = jnp.asarray(rng.standard_normal((c, r, d)).astype(np.float32))
    kn = jnp.asarray(rng.standard_normal((r, d)).astype(np.float32))
    vn = jnp.asarray(rng.standard_normal((r, d)).astype(np.float32))
    got, ko, vo = A.fused_temporal_decode_pm(
        q, kn, vn, kc, vc, jnp.asarray(clen, jnp.int32), num_heads=h
    )
    k_full = np.asarray(kc).copy()
    k_full[clen] = kn
    v_full = np.asarray(vc).copy()
    v_full[clen] = vn
    ref = _decode_oracle(q, jnp.asarray(k_full).transpose(1, 0, 2),
                         jnp.asarray(v_full).transpose(1, 0, 2), clen, h)
    np.testing.assert_allclose(np.asarray(got), ref, atol=2e-5, rtol=2e-5)
    np.testing.assert_array_equal(np.asarray(ko), k_full)
    np.testing.assert_array_equal(np.asarray(vo), v_full)


@pytest.mark.parametrize("clen", [0, 9, 15])
def test_fused_temporal_decode_pm_int8(rng, clen):
    """Pos-major int8 append-and-attend == attention over the dequantized
    cache (per-(pos,row) scales); close to full precision."""
    r, c, h, dh = 64, 16, 4, 16
    d = h * dh
    q = jnp.asarray(rng.standard_normal((r, d)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((c, r, d)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((c, r, d)).astype(np.float32))
    kn = jnp.asarray(rng.standard_normal((r, d)).astype(np.float32))
    vn = jnp.asarray(rng.standard_normal((r, d)).astype(np.float32))

    def quant(x):  # per-(pos, row) over D
        ax = jnp.max(jnp.abs(x), axis=-1)
        s = jnp.maximum(ax, 1e-8) / 127.0
        qq = jnp.clip(jnp.round(x / s[..., None]), -127, 127)
        return qq.astype(jnp.int8), s

    ki, ks = quant(k)
    vi, vs = quant(v)
    kni, kns = quant(kn)
    vni, vns = quant(vn)
    got, ko, vo = A.fused_temporal_decode_pm_int8(
        q, kni, vni, kns[:, None], vns[:, None],
        ki, vi, jnp.swapaxes(ks, 0, 1), jnp.swapaxes(vs, 0, 1),
        jnp.asarray(clen, jnp.int32), num_heads=h, out_dtype=jnp.float32,
    )
    # dequantized cache with the new plane appended
    kd = np.array(ki.astype(jnp.float32) * ks[..., None])
    vd = np.array(vi.astype(jnp.float32) * vs[..., None])
    kd[clen] = np.asarray(kni.astype(jnp.float32) * kns[:, None])
    vd[clen] = np.asarray(vni.astype(jnp.float32) * vns[:, None])
    ref_deq = _decode_oracle(q, jnp.asarray(kd).transpose(1, 0, 2),
                             jnp.asarray(vd).transpose(1, 0, 2), clen, h)
    np.testing.assert_allclose(np.asarray(got), ref_deq, atol=2e-4, rtol=2e-4)
    # the int8 planes were appended
    ki_full = np.asarray(ki).copy()
    ki_full[clen] = np.asarray(kni)
    np.testing.assert_array_equal(np.asarray(ko), ki_full)
    # quantization stays close to full precision
    k_full = np.asarray(k).copy()
    k_full[clen] = np.asarray(kn)
    v_full = np.asarray(v).copy()
    v_full[clen] = np.asarray(vn)
    ref_full = _decode_oracle(q, jnp.asarray(k_full).transpose(1, 0, 2),
                              jnp.asarray(v_full).transpose(1, 0, 2), clen, h)
    g = np.asarray(got)
    cos = (g * ref_full).sum() / np.sqrt((g**2).sum() * (ref_full**2).sum())
    assert cos > 0.999, cos


@pytest.mark.parametrize("clen", [33, 40, 63])
def test_fused_temporal_decode_pm_ring_wraparound(rng, clen):
    """cache_len beyond capacity: the plane write wraps to slot
    (clen mod C) and the slot-exclusion mask yields exactly the sliding
    window over the last C frames (ring mode on the same kernel)."""
    r, c, h, dh = 56, 32, 4, 16
    d = h * dh
    # full history of per-position K/V; the ring cache holds the last C
    hist_k = rng.standard_normal((clen + 1, r, d)).astype(np.float32)
    hist_v = rng.standard_normal((clen + 1, r, d)).astype(np.float32)
    kc = np.zeros((c, r, d), np.float32)
    vc = np.zeros((c, r, d), np.float32)
    for p_abs in range(clen):  # pre-write cache: positions < clen
        kc[p_abs % c] = hist_k[p_abs]
        vc[p_abs % c] = hist_v[p_abs]
    q = jnp.asarray(rng.standard_normal((r, d)).astype(np.float32))
    kn = jnp.asarray(hist_k[clen])
    vn = jnp.asarray(hist_v[clen])
    got, ko, vo = A.fused_temporal_decode_pm(
        q, kn, vn, jnp.asarray(kc), jnp.asarray(vc),
        jnp.asarray(clen, jnp.int32), num_heads=h,
    )
    # oracle: window = positions (clen - c, clen]
    lo = clen + 1 - c
    wk = hist_k[lo : clen + 1].transpose(1, 0, 2)  # (R, W, D)
    wv = hist_v[lo : clen + 1].transpose(1, 0, 2)
    ref = _decode_oracle(q, jnp.asarray(wk), jnp.asarray(wv), c - 1, h)
    np.testing.assert_allclose(np.asarray(got), ref, atol=2e-5, rtol=2e-5)
    # the new plane landed at slot clen mod C
    kc_after = kc.copy()
    kc_after[clen % c] = hist_k[clen]
    np.testing.assert_array_equal(np.asarray(ko), kc_after)


def test_spatial_flat_bwd_kernel_matches_reference_vjp(rng):
    """The fused flash-style spatial backward (the TPU-training path for
    bf16) produces the same dq/dk/dv as autodiff through the einsum
    reference."""
    r, n, h, dh = 4, 60, 4, 16
    d = h * dh
    q = jnp.asarray(rng.standard_normal((r, n, d)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((r, n, d)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((r, n, d)).astype(np.float32))
    g = jnp.asarray(rng.standard_normal((r, n, d)).astype(np.float32))
    dq, dk, dv = A._spatial_flat_bwd_pallas(q, k, v, g, h)
    _, vjp = jax.vjp(
        lambda a, b, c: A.spatial_flat_reference(a, b, c, h), q, k, v
    )
    rq, rk, rv = vjp(g)
    np.testing.assert_allclose(np.asarray(dq), np.asarray(rq), atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(dk), np.asarray(rk), atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(dv), np.asarray(rv), atol=1e-4, rtol=1e-4)


def test_temporal_fullclip_bwd_kernel_matches_reference_vjp(rng):
    """The fused segmented-matmul causal temporal backward matches autodiff
    through the einsum reference (causal mask rows included)."""
    r, t, h, dh = 56, 8, 4, 16
    d = h * dh
    q = jnp.asarray(rng.standard_normal((r, t, d)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((r, t, d)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((r, t, d)).astype(np.float32))
    g = jnp.asarray(rng.standard_normal((r, t, d)).astype(np.float32))
    dq, dk, dv = A._fullclip_temporal_bwd_pallas(q, k, v, g, h)
    _, vjp = jax.vjp(
        lambda a, b, c: A.fullclip_temporal_reference(a, b, c, h), q, k, v
    )
    rq, rk, rv = vjp(g)
    np.testing.assert_allclose(np.asarray(dq), np.asarray(rq), atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(dk), np.asarray(rk), atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(dv), np.asarray(rv), atol=1e-4, rtol=1e-4)
