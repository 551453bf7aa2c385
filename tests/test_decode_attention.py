"""Parity tests for the Pallas int8-cache decode attention kernels
(ops/decode_attention.py) in interpret mode, against the XLA
scale-on-scores formulation (ops/attention.int8_cache_attention)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fastmax_tpu.ops.attention import int8_cache_attention
from fastmax_tpu.ops.decode_attention import (
    int8_decode_attention,
    int8_decode_attention_stacked,
)


def _inputs(b, hq, g, s, d, seed=0):
    rng = np.random.default_rng(seed)
    q = jnp.asarray(rng.standard_normal((b, hq, 1, d)), jnp.float32).astype(jnp.bfloat16)
    kc = jnp.asarray(rng.integers(-127, 128, (b, g, s, d)), jnp.int8)
    vc = jnp.asarray(rng.integers(-127, 128, (b, g, s, d)), jnp.int8)
    ks = jnp.asarray(rng.uniform(0.001, 0.02, (b, g, s)), jnp.float32)
    vs = jnp.asarray(rng.uniform(0.001, 0.02, (b, g, s)), jnp.float32)
    return q, kc, vc, ks, vs


@pytest.mark.parametrize("hq,g", [(8, 8), (8, 4), (8, 1)])  # MHA, GQA, MQA
def test_int8_decode_attention_parity(hq, g):
    b, s, d = 2, 256, 64
    q, kc, vc, ks, vs = _inputs(b, hq, g, s, d)
    pos = jnp.asarray([s - 1, 37], jnp.int32)
    mask = jnp.arange(s)[None, None, None, :] <= pos[:, None, None, None]
    ref = int8_cache_attention(q, kc, vc, ks, vs, mask=mask, scale=d ** -0.5)
    got = int8_decode_attention(q, kc, vc, ks, vs, pos, scale=d ** -0.5,
                                interpret=True)
    err = float(jnp.max(jnp.abs(ref.astype(jnp.float32) - got.astype(jnp.float32))))
    assert err < 2e-2, err


@pytest.mark.parametrize("hq,g,layer", [(8, 4, 0), (8, 4, 2), (4, 1, 1)])
def test_int8_decode_attention_stacked_parity(hq, g, layer):
    """The stacked variant must read exactly layer `layer` of the stack."""
    b, s, d, n_layer = 2, 128, 64, 3
    rng = np.random.default_rng(layer)
    q, _, _, _, _ = _inputs(b, hq, g, s, d, seed=layer)
    k_all = jnp.asarray(rng.integers(-127, 128, (n_layer, b, g, s, d)), jnp.int8)
    v_all = jnp.asarray(rng.integers(-127, 128, (n_layer, b, g, s, d)), jnp.int8)
    ks_all = jnp.asarray(rng.uniform(0.001, 0.02, (n_layer, b, g, s)), jnp.float32)
    vs_all = jnp.asarray(rng.uniform(0.001, 0.02, (n_layer, b, g, s)), jnp.float32)
    pos = jnp.asarray([100, 55], jnp.int32)
    mask = jnp.arange(s)[None, None, None, :] <= pos[:, None, None, None]
    ref = int8_cache_attention(
        q, k_all[layer], v_all[layer], ks_all[layer], vs_all[layer],
        mask=mask, scale=d ** -0.5,
    )
    got = int8_decode_attention_stacked(
        q, k_all, v_all, ks_all, vs_all, jnp.int32(layer), pos,
        scale=d ** -0.5, interpret=True,
    )
    err = float(jnp.max(jnp.abs(ref.astype(jnp.float32) - got.astype(jnp.float32))))
    assert err < 2e-2, (layer, err)
