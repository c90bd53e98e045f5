"""Native C++ MSDeformAttn vs the JAX core: forward equality + gradcheck —
the exact test protocol of the reference's op test
(downstream/OVIS/.../ops/test.py: forward-equality + autograd gradcheck)."""

import shutil

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from streamformer_tpu.ops import msdeform_attn as MS

pytestmark = [
    pytest.mark.fast,
    pytest.mark.skipif(shutil.which("g++") is None, reason="no C++ toolchain"),
]


@pytest.fixture(scope="module")
def native():
    from streamformer_tpu import native as N

    N.build()
    return N


@pytest.fixture()
def inputs(rng):
    n, m, d, lq, p = 2, 4, 8, 6, 3
    shapes = [(5, 7), (3, 4)]
    s = sum(h * w for h, w in shapes)
    value = rng.standard_normal((n, s, m, d)).astype(np.float32)
    loc = rng.uniform(-0.1, 1.1, (n, lq, m, len(shapes), p, 2)).astype(np.float32)
    aw = rng.random((n, lq, m, len(shapes), p)).astype(np.float32)
    aw /= aw.reshape(n, lq, m, -1).sum(-1).reshape(n, lq, m, 1, 1)
    return value, shapes, loc, aw


def test_native_forward_matches_jax(native, inputs):
    value, shapes, loc, aw = inputs
    ref = np.asarray(
        MS.ms_deform_attn_core(jnp.asarray(value), shapes, jnp.asarray(loc),
                               jnp.asarray(aw))
    )
    got = native.ms_deform_attn_forward_np(value, np.asarray(shapes), loc, aw)
    np.testing.assert_allclose(got, ref, atol=1e-5, rtol=1e-5)


def test_native_backward_matches_jax_grads(native, inputs):
    value, shapes, loc, aw = inputs
    g_out = np.ones(
        (value.shape[0], loc.shape[1], value.shape[2] * value.shape[3]),
        np.float32,
    )

    def f(v, l, w):
        return jnp.sum(MS.ms_deform_attn_core(v, shapes, l, w))

    gv_ref, gl_ref, gw_ref = jax.grad(f, argnums=(0, 1, 2))(
        jnp.asarray(value), jnp.asarray(loc), jnp.asarray(aw)
    )
    gv, gl, gw = native.ms_deform_attn_backward_np(
        value, np.asarray(shapes), loc, aw, g_out
    )
    np.testing.assert_allclose(gv, np.asarray(gv_ref), atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(gw, np.asarray(gw_ref), atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(gl, np.asarray(gl_ref), atol=1e-3, rtol=1e-3)
