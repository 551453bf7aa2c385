"""Blockwise (trainable flash-style) attention: forward + gradient parity
against dense softmax attention."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fastmax_tpu.ops.attention import scaled_dot_product_attention
from fastmax_tpu.ops.blockwise_attention import blockwise_attention


@pytest.fixture(scope="module")
def qkv():
    key = jax.random.PRNGKey(0)
    b, h, t, d = 2, 3, 256, 32
    return tuple(jax.random.normal(k, (b, h, t, d), jnp.float32)
                 for k in jax.random.split(key, 3))


def test_forward_matches_dense(qkv):
    q, k, v = qkv
    ref = scaled_dot_product_attention(q, k, v, is_causal=True, scale=q.shape[-1] ** -0.5)
    out = blockwise_attention(q, k, v, None, 64)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=1e-4)


def test_gradients_match_dense(qkv):
    q, k, v = qkv
    g = jax.random.normal(jax.random.PRNGKey(9), q.shape)

    def loss_block(q, k, v):
        return jnp.vdot(blockwise_attention(q, k, v, None, 64), g)

    def loss_dense(q, k, v):
        return jnp.vdot(
            scaled_dot_product_attention(q, k, v, is_causal=True, scale=q.shape[-1] ** -0.5), g
        )

    gb = jax.grad(loss_block, argnums=(0, 1, 2))(q, k, v)
    gd = jax.grad(loss_dense, argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(gb, gd, "qkv"):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=5e-5, rtol=1e-3, err_msg=f"d{name}"
        )


def test_block_size_invariance(qkv):
    q, k, v = qkv
    a = blockwise_attention(q, k, v, None, 32)
    b = blockwise_attention(q, k, v, None, 256)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5, rtol=1e-4)


def test_jit_and_remat_compatible(qkv):
    q, k, v = qkv

    @jax.jit
    def loss(q, k, v):
        fn = jax.checkpoint(lambda q, k, v: blockwise_attention(q, k, v, None, 64))
        return jnp.sum(fn(q, k, v) ** 2)

    val, grads = jax.value_and_grad(loss, argnums=(0, 1, 2))(q, k, v)
    assert np.isfinite(float(val))
    assert all(np.isfinite(np.asarray(g)).all() for g in grads)
