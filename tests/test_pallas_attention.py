"""Pallas kernel parity vs the einsum reference (interpret mode on CPU —
kernel-vs-reference, the pattern of the reference's own op test,
downstream/OVIS/.../ops/test.py)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from streamformer_tpu.ops import attention as A


@pytest.fixture(autouse=True)
def _interpret(monkeypatch):
    # run all pallas kernels in interpreter mode on CPU
    from jax.experimental import pallas as pl

    orig = pl.pallas_call

    def patched(*args, **kw):
        kw.setdefault("interpret", True)
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


def test_fused_temporal_streaming_matches_reference(rng):
    b, n, h, t, dh, c = 2, 28, 2, 1, 16, 8
    cache_len = jnp.asarray(5, jnp.int32)
    q = jnp.asarray(rng.standard_normal((b, n, h, t, dh)).astype(np.float32))
    ck = jnp.asarray(rng.standard_normal((b, c, n, h, dh)).astype(np.float32))
    cv = jnp.asarray(rng.standard_normal((b, c, n, h, dh)).astype(np.float32))

    # reference expects (B, N, H, C, dh)
    ck_r = jnp.transpose(ck, (0, 2, 3, 1, 4))
    cv_r = jnp.transpose(cv, (0, 2, 3, 1, 4))
    ref = A.temporal_streaming_reference(q, ck_r, cv_r, cache_len)
    got = A.fused_temporal_streaming_attention(q, ck, cv, cache_len)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5,
                               rtol=2e-5)


def test_fused_temporal_multi_frame_append(rng):
    """t_new > 1: appended chunk obeys the staircase mask."""
    b, n, h, t, dh, c = 1, 14, 2, 3, 8, 12
    cache_len = jnp.asarray(4, jnp.int32)
    q = jnp.asarray(rng.standard_normal((b, n, h, t, dh)).astype(np.float32))
    ck = jnp.asarray(rng.standard_normal((b, c, n, h, dh)).astype(np.float32))
    cv = jnp.asarray(rng.standard_normal((b, c, n, h, dh)).astype(np.float32))
    ck_r = jnp.transpose(ck, (0, 2, 3, 1, 4))
    cv_r = jnp.transpose(cv, (0, 2, 3, 1, 4))
    ref = A.temporal_streaming_reference(q, ck_r, cv_r, cache_len)
    got = A.fused_temporal_streaming_attention(q, ck, cv, cache_len)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5,
                               rtol=2e-5)
