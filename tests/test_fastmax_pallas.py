"""Pallas fastmax kernel vs the lax.scan formulation (interpret mode)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fastmax_tpu.ops.fastmax import fastmax, polynomial_attention_reference
from fastmax_tpu.ops.fastmax_pallas import fastmax_pallas, fastmax_pallas_trainable


@pytest.mark.parametrize("p", [1, 2])
def test_pallas_matches_scan(p):
    key = jax.random.PRNGKey(0)
    b, h, n, d = 2, 2, 256, 32
    q, k, v = (jax.random.normal(kk, (b, h, n, d), jnp.float32)
               for kk in jax.random.split(key, 3))
    ref = fastmax(q, k, v, mask=True, p=p, chunk=128)
    out = fastmax_pallas(q, k, v, p=p, chunk=128, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-2, rtol=1e-2)


@pytest.mark.parametrize("p", [1, 2])
def test_pallas_trainable_forward_matches_reference(p):
    key = jax.random.PRNGKey(2)
    b, h, n, d = 1, 2, 256, 32
    q, k, v = (jax.random.normal(kk, (b, h, n, d), jnp.float32)
               for kk in jax.random.split(key, 3))
    ref = polynomial_attention_reference(q, k, v, p=p, mask=True)
    out = fastmax_pallas_trainable(q, k, v, p, 8.0, 128, True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-4, rtol=1e-3)


@pytest.mark.parametrize("p", [1, 2])
def test_pallas_trainable_grads_match_reference(p):
    """dq/dk/dv from the reverse-walk Pallas backward vs autodiff through
    the O(N^2) formula (ref: attention_mechanisms/fastmax.py:337-381)."""
    key = jax.random.PRNGKey(3)
    b, h, n, d = 1, 2, 256, 32
    q, k, v = (jax.random.normal(kk, (b, h, n, d), jnp.float32)
               for kk in jax.random.split(key, 3))
    w = jax.random.normal(jax.random.fold_in(key, 9), (b, h, n, d), jnp.float32)

    def loss_ref(q, k, v):
        return jnp.sum(polynomial_attention_reference(q, k, v, p=p, mask=True) * w)

    def loss_pal(q, k, v):
        return jnp.sum(fastmax_pallas_trainable(q, k, v, p, 8.0, 128, True) * w)

    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    gp = jax.grad(loss_pal, argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(gp, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=5e-4, rtol=2e-3)


def test_pallas_trainable_multi_chunk_state_walk():
    """4 chunks: the reverse subtraction walk must reproduce every
    intermediate state exactly (additivity), checked via grad parity."""
    key = jax.random.PRNGKey(4)
    b, h, n, d = 1, 1, 256, 16
    q, k, v = (jax.random.normal(kk, (b, h, n, d), jnp.float32) * 0.5
               for kk in jax.random.split(key, 3))

    def loss_ref(q):
        return jnp.sum(polynomial_attention_reference(q, k, v, p=2, mask=True) ** 2)

    def loss_pal(q):
        return jnp.sum(fastmax_pallas_trainable(q, k, v, 2, 8.0, 64, True) ** 2)

    np.testing.assert_allclose(
        np.asarray(jax.grad(loss_pal)(q)), np.asarray(jax.grad(loss_ref)(q)),
        atol=5e-4, rtol=2e-3,
    )


def test_fastmax_impl_pallas_route(monkeypatch):
    """fastmax() with FASTMAX_TPU_FASTMAX_IMPL=pallas routes the masked path
    through the fused kernel pair (interpret on CPU) — fwd + grad parity,
    including an odd length that needs padding."""
    import fastmax_tpu.ops.fastmax as fm

    monkeypatch.setattr(fm, "FASTMAX_IMPL", "pallas")
    key = jax.random.PRNGKey(5)
    b, h, n, d = 1, 2, 200, 32  # 200: pads to 256
    q, k, v = (jax.random.normal(kk, (b, h, n, d), jnp.float32)
               for kk in jax.random.split(key, 3))
    ref = polynomial_attention_reference(q, k, v, p=2, mask=True)
    out = fm.fastmax(q, k, v, mask=True, p=2)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-4, rtol=1e-3)

    g = jax.random.normal(jax.random.fold_in(key, 9), q.shape)

    def loss_pal(q):
        return jnp.vdot(fm.fastmax(q, k, v, mask=True, p=2), g)

    def loss_ref(q):
        return jnp.vdot(polynomial_attention_reference(q, k, v, p=2, mask=True), g)

    np.testing.assert_allclose(
        np.asarray(jax.grad(loss_pal)(q)), np.asarray(jax.grad(loss_ref)(q)),
        atol=5e-4, rtol=2e-3,
    )


def test_pallas_long_sequence_grad_parity_vs_scan():
    """Many-chunk gradient parity vs the lax.scan reversible-state VJP
    (advisor r02: the backward reconstructs S_{c-1} = S_c - U_c by
    subtraction, so cancellation error could grow with chunk count — bound
    it at 16 chunks / N=2048 before trusting the kernel for long-context
    training)."""
    from fastmax_tpu.ops.fastmax import fastmax

    key = jax.random.PRNGKey(7)
    b, h, n, d = 1, 1, 2048, 16
    q, k, v = (jax.random.normal(kk, (b, h, n, d), jnp.float32) * 0.5
               for kk in jax.random.split(key, 3))
    w = jax.random.normal(jax.random.fold_in(key, 11), (b, h, n, d), jnp.float32)

    def loss_scan(q, k, v):
        return jnp.vdot(fastmax(q, k, v, mask=True, p=2, chunk=128), w)

    def loss_pal(q, k, v):
        return jnp.vdot(fastmax_pallas_trainable(q, k, v, 2, 8.0, 128, True), w)

    gs = jax.grad(loss_scan, argnums=(0, 1, 2))(q, k, v)
    gp = jax.grad(loss_pal, argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(gp, gs):
        scale = float(jnp.max(jnp.abs(b_))) or 1.0
        # relative-to-max error: catches systematic rewind drift while
        # tolerating the f32 noise floor of 16 accumulation steps
        assert float(jnp.max(jnp.abs(a - b_))) / scale < 5e-3


def test_pallas_multi_head_state_isolation():
    """Each (batch, head) scans its own state — heads must not leak."""
    key = jax.random.PRNGKey(1)
    b, h, n, d = 1, 3, 128, 16
    q, k, v = (jax.random.normal(kk, (b, h, n, d), jnp.float32)
               for kk in jax.random.split(key, 3))
    full = fastmax_pallas(q, k, v, p=1, chunk=64, interpret=True)
    # head 1 alone must equal head 1 of the batched run
    solo = fastmax_pallas(q[:, 1:2], k[:, 1:2], v[:, 1:2], p=1, chunk=64, interpret=True)
    np.testing.assert_allclose(np.asarray(full[:, 1:2]), np.asarray(solo), atol=1e-4)


def test_pallas_bf16_pair_operand_path_parity(monkeypatch):
    """Exercise the bf16 pairwise-operand precision the real chip uses at
    d >= 64 (advisor r03: interpret-mode tests previously only ever saw
    exact f32 pair math). FASTMAX_TPU_FORCE_PAIR_BF16 forces the chip's
    operand dtype through the interpret kernels; parity vs the O(N^2)
    reference holds at bf16-appropriate tolerances, fwd and grad."""
    monkeypatch.setenv("FASTMAX_TPU_FORCE_PAIR_BF16", "1")
    key = jax.random.PRNGKey(11)
    b, h, n, d = 1, 2, 256, 64
    q, k, v = (jax.random.normal(kk, (b, h, n, d), jnp.float32) * 0.5
               for kk in jax.random.split(key, 3))
    ref = polynomial_attention_reference(q, k, v, p=2, mask=True)
    out = fastmax_pallas_trainable(q, k, v, 2, 8.0, 128, True)
    scale = float(jnp.max(jnp.abs(ref))) or 1.0
    assert float(jnp.max(jnp.abs(out - ref))) / scale < 4e-2

    w = jax.random.normal(jax.random.fold_in(key, 7), (b, h, n, d), jnp.float32)

    def loss_ref(q, k, v):
        return jnp.sum(polynomial_attention_reference(q, k, v, p=2, mask=True) * w)

    def loss_pal(q, k, v):
        return jnp.sum(fastmax_pallas_trainable(q, k, v, 2, 8.0, 128, True) * w)

    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    gp = jax.grad(loss_pal, argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(gp, gr):
        scale = float(jnp.max(jnp.abs(b_))) or 1.0
        assert float(jnp.max(jnp.abs(a - b_))) / scale < 6e-2


def test_pallas_f32_d64_warns_once_on_tpu_path():
    """The silent f32 -> bf16 operand downgrade at d >= 64 must warn."""
    import warnings as _w

    from fastmax_tpu.ops import fastmax_pallas as fmp

    fmp._warned_pair_bf16 = False
    with _w.catch_warnings(record=True) as rec:
        _w.simplefilter("always")
        dt = fmp._pair_dtype(jnp.float32, 64, interpret=False)
        assert dt == jnp.bfloat16
        assert any("bfloat16 pairwise" in str(r.message) for r in rec)
    # second call: warned flag set, no duplicate
    with _w.catch_warnings(record=True) as rec2:
        _w.simplefilter("always")
        fmp._pair_dtype(jnp.float32, 64, interpret=False)
        assert not rec2
    # bf16 inputs never warn; interpret mode keeps f32
    fmp._warned_pair_bf16 = False
    with _w.catch_warnings(record=True) as rec3:
        _w.simplefilter("always")
        assert fmp._pair_dtype(jnp.bfloat16, 64, interpret=False) == jnp.bfloat16
        assert fmp._pair_dtype(jnp.float32, 64, interpret=True) == jnp.float32
        assert not rec3
