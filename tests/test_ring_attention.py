"""Ring attention on the virtual 8-device mesh vs single-device softmax
attention."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fastmax_tpu.ops.attention import scaled_dot_product_attention
from fastmax_tpu.parallel.ring_attention import ring_attention_sharded
from fastmax_tpu.parallel.sharding import make_mesh


@pytest.mark.parametrize("p", [2, 4, 8])
def test_ring_matches_full_causal(p):
    key = jax.random.PRNGKey(0)
    b, h, n, d = 2, 4, 128, 32
    q, k, v = (jax.random.normal(kk, (b, h, n, d), jnp.float32)
               for kk in jax.random.split(key, 3))
    ref = scaled_dot_product_attention(q, k, v, is_causal=True, scale=d ** -0.5)

    mesh = make_mesh(data=8 // p, fsdp=1, model=p)
    out = ring_attention_sharded(q, k, v, mesh, axis="model")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=1e-4)


def test_ring_gqa_via_expanded_heads():
    """GQA inputs: expand before sharding (ring operates on full heads)."""
    from fastmax_tpu.ops.attention import repeat_kv_heads

    key = jax.random.PRNGKey(1)
    b, hq, g, n, d = 1, 8, 2, 64, 16
    q = jax.random.normal(key, (b, hq, n, d), jnp.float32)
    k = jax.random.normal(jax.random.fold_in(key, 1), (b, g, n, d), jnp.float32)
    v = jax.random.normal(jax.random.fold_in(key, 2), (b, g, n, d), jnp.float32)
    ref = scaled_dot_product_attention(q, k, v, is_causal=True, scale=d ** -0.5)
    mesh = make_mesh(data=2, fsdp=1, model=4)
    out = ring_attention_sharded(q, repeat_kv_heads(k, hq), repeat_kv_heads(v, hq),
                                 mesh, axis="model")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=1e-4)


def test_ring_jits_under_mesh():
    """jit + sharded inputs: the ring compiles to ppermute collectives."""
    from jax.sharding import NamedSharding, PartitionSpec as P
    from jax.experimental.shard_map import shard_map
    import functools
    from fastmax_tpu.parallel.ring_attention import ring_attention_local

    mesh = make_mesh(data=1, fsdp=1, model=8)
    spec = P(None, None, "model", None)
    fn = jax.jit(shard_map(
        functools.partial(ring_attention_local, axis_name="model"),
        mesh=mesh, in_specs=(spec, spec, spec), out_specs=spec,
    ))
    key = jax.random.PRNGKey(2)
    q, k, v = (jax.random.normal(kk, (1, 2, 64, 16), jnp.float32)
               for kk in jax.random.split(key, 3))
    sharding = NamedSharding(mesh, spec)
    q, k, v = (jax.device_put(x, sharding) for x in (q, k, v))
    out = fn(q, k, v)
    ref = scaled_dot_product_attention(q, k, v, is_causal=True, scale=16 ** -0.5)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=1e-4)
    txt = fn.lower(q, k, v).compile().as_text()
    assert "collective-permute" in txt
