"""Flash attention kernel vs the XLA softmax-attention reference
(interpret mode on CPU; Mosaic compilation exercised on TPU by the engine)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fastmax_tpu.ops.attention import scaled_dot_product_attention
from fastmax_tpu.ops.flash_attention import flash_attention, flash_attention_trainable


def ref_attention(q, k, v, pos0=0, kv_len=None):
    s = k.shape[2]
    t = q.shape[2]
    kv_len = kv_len if kv_len is not None else s
    qpos = pos0 + jnp.arange(t)[:, None]
    mask = (jnp.arange(s)[None, :] <= qpos) & (jnp.arange(s)[None, :] < kv_len)
    return scaled_dot_product_attention(q, k, v, mask=mask[None, None])


@pytest.mark.parametrize("hq,g", [(4, 4), (8, 2), (4, 1)])
def test_flash_matches_reference_causal(hq, g):
    key = jax.random.PRNGKey(0)
    b, t, d = 2, 256, 64
    kq, kk, kv = jax.random.split(key, 3)
    q = jax.random.normal(kq, (b, hq, t, d), jnp.float32)
    k = jax.random.normal(kk, (b, g, t, d), jnp.float32)
    v = jax.random.normal(kv, (b, g, t, d), jnp.float32)
    ref = ref_attention(q, k, v)
    out = flash_attention(q, k, v, block_q=128, block_k=128, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=1e-4)


def test_flash_prefill_with_offset_and_padded_cache():
    """pos0 > 0 + kv_len < S: the chunked-prefill-over-padded-cache case."""
    key = jax.random.PRNGKey(1)
    b, h, d = 1, 4, 64
    t, s = 128, 512  # query chunk of 128 at offset 128 in a 512 buffer
    pos0, kv_len = 128, 256
    q = jax.random.normal(key, (b, h, t, d), jnp.float32)
    k = jax.random.normal(jax.random.fold_in(key, 1), (b, h, s, d), jnp.float32)
    v = jax.random.normal(jax.random.fold_in(key, 2), (b, h, s, d), jnp.float32)
    # zero the invalid tail like a real cache
    k = k.at[:, :, kv_len:].set(0)
    v = v.at[:, :, kv_len:].set(0)
    ref = ref_attention(q, k, v, pos0=pos0, kv_len=kv_len)
    out = flash_attention(q, k, v, pos0=pos0, kv_len=kv_len, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=1e-4)


def test_flash_trainable_forward_matches_reference():
    key = jax.random.PRNGKey(3)
    b, h, t, d = 2, 3, 256, 64
    q = jax.random.normal(key, (b, h, t, d), jnp.float32)
    k = jax.random.normal(jax.random.fold_in(key, 1), (b, h, t, d), jnp.float32)
    v = jax.random.normal(jax.random.fold_in(key, 2), (b, h, t, d), jnp.float32)
    ref = ref_attention(q, k, v)
    out = flash_attention_trainable(q, k, v, None, 128, 128, True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=1e-4)


def test_flash_trainable_grads_match_reference():
    """dq/dk/dv from the Pallas backward kernels vs autodiff through the
    dense XLA softmax attention."""
    key = jax.random.PRNGKey(4)
    b, h, t, d = 1, 2, 256, 64
    q = jax.random.normal(key, (b, h, t, d), jnp.float32)
    k = jax.random.normal(jax.random.fold_in(key, 1), (b, h, t, d), jnp.float32)
    v = jax.random.normal(jax.random.fold_in(key, 2), (b, h, t, d), jnp.float32)
    w = jax.random.normal(jax.random.fold_in(key, 3), (b, h, t, d), jnp.float32)

    def loss_ref(q, k, v):
        return jnp.sum(ref_attention(q, k, v) * w)

    def loss_flash(q, k, v):
        return jnp.sum(flash_attention_trainable(q, k, v, None, 128, 128, True) * w)

    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    gf = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=3e-4, rtol=1e-3)


def test_flash_fused_forward_matches_reference():
    from fastmax_tpu.ops.flash_attention import flash_attention_fused

    key = jax.random.PRNGKey(6)
    b, h, t, d = 2, 2, 1024, 64  # t > 512: exercises the 512-block loops
    q = jax.random.normal(key, (b, h, t, d), jnp.float32)
    k = jax.random.normal(jax.random.fold_in(key, 1), (b, h, t, d), jnp.float32)
    v = jax.random.normal(jax.random.fold_in(key, 2), (b, h, t, d), jnp.float32)
    ref = ref_attention(q, k, v)
    out = flash_attention_fused(q, k, v, None, True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=1e-4)


def test_flash_fused_grads_match_reference():
    """Single-pass whole-head backward (dq+dk+dv in one kernel) vs autodiff
    through dense XLA softmax attention."""
    from fastmax_tpu.ops.flash_attention import flash_attention_fused

    key = jax.random.PRNGKey(7)
    b, h, t, d = 1, 2, 1024, 64
    q = jax.random.normal(key, (b, h, t, d), jnp.float32)
    k = jax.random.normal(jax.random.fold_in(key, 1), (b, h, t, d), jnp.float32)
    v = jax.random.normal(jax.random.fold_in(key, 2), (b, h, t, d), jnp.float32)
    w = jax.random.normal(jax.random.fold_in(key, 3), (b, h, t, d), jnp.float32)

    def loss_ref(q, k, v):
        return jnp.sum(ref_attention(q, k, v) * w)

    def loss_fused(q, k, v):
        return jnp.sum(flash_attention_fused(q, k, v, None, True) * w)

    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    gf = jax.grad(loss_fused, argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=3e-4, rtol=1e-3)


def test_flash_fused_short_sequence_single_block():
    from fastmax_tpu.ops.flash_attention import flash_attention_fused

    key = jax.random.PRNGKey(8)
    b, h, t, d = 1, 3, 256, 64  # t <= 512: whole-T single block
    q = jax.random.normal(key, (b, h, t, d), jnp.float32)
    k = jax.random.normal(jax.random.fold_in(key, 1), (b, h, t, d), jnp.float32)
    v = jax.random.normal(jax.random.fold_in(key, 2), (b, h, t, d), jnp.float32)
    ref = ref_attention(q, k, v)
    out = flash_attention_fused(q, k, v, None, True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=1e-4)


def test_flash_trainable_dispatch_pads_odd_lengths(monkeypatch):
    """attn dispatch with FASTMAX_TPU_TRAIN_ATTN=flash pads T to the block."""
    import fastmax_tpu.ops.attention as attn_mod

    monkeypatch.setattr(attn_mod, "TRAIN_ATTN", "flash")
    monkeypatch.setattr(attn_mod, "BLOCKWISE_MIN_T", 64)
    # interpret mode: patch the kernel entry to force interpret=True on CPU
    orig = flash_attention_trainable

    def interp(q, k, v, scale=None, bq=128, bk=128, interpret=False):
        return orig(q, k, v, scale, bq, bk, True)

    monkeypatch.setattr(
        "fastmax_tpu.ops.flash_attention.flash_attention_trainable", interp
    )
    key = jax.random.PRNGKey(5)
    b, hq, g, t, d = 1, 4, 2, 200, 64  # t=200: needs padding to 256
    q = jax.random.normal(key, (b, hq, t, d), jnp.float32)
    k = jax.random.normal(jax.random.fold_in(key, 1), (b, g, t, d), jnp.float32)
    v = jax.random.normal(jax.random.fold_in(key, 2), (b, g, t, d), jnp.float32)
    ref = ref_attention(q, k, v)
    out = attn_mod.attention(q, k, v, attn_alg="quadratic", head_size=d)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=1e-4)


def test_flash_rows_before_pos0_see_prefix():
    """kv_len > pos0 + t is fine too (keys beyond the frontier are masked
    by causality regardless)."""
    key = jax.random.PRNGKey(2)
    q = jax.random.normal(key, (1, 2, 128, 64), jnp.float32)
    k = jax.random.normal(jax.random.fold_in(key, 1), (1, 2, 256, 64), jnp.float32)
    v = jax.random.normal(jax.random.fold_in(key, 2), (1, 2, 256, 64), jnp.float32)
    ref = ref_attention(q, k, v, pos0=64, kv_len=256)
    out = flash_attention(q, k, v, pos0=64, kv_len=256, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=1e-4)
