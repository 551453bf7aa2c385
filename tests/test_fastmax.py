"""Parity tests for the fastmax linear-attention family.

The reference ships an O(N^2) implementation (compute_attn,
attention_mechanisms/fastmax.py:337-381) but has zero test coverage for it
(SURVEY.md §4.8); here every linear-time path is checked against the
quadratic-time formula. Note the f32 rounding floor of this computation is
~1e-2 absolute (the denominator g can reach ~0.7 while partial sums are
O(100)), so tolerances are set accordingly; exactness is asserted via a
float64-free agreement band between two independent formulations.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fastmax_tpu.ops.fastmax import (
    fastmax,
    linearmax,
    performer,
    polynomial_attention_reference,
    linear_attn_state_init,
    linear_attn_decode_step,
    _hack_normalize,
)

B, H, N, D = 2, 3, 200, 16


@pytest.fixture(scope="module")
def qkv():
    key = jax.random.PRNGKey(0)
    return tuple(jax.random.normal(k, (B, H, N, D)) for k in jax.random.split(key, 3))


@pytest.mark.parametrize("p", [1, 2])
@pytest.mark.parametrize("mask", [True, False])
def test_fastmax_matches_quadratic_reference(qkv, p, mask):
    q, k, v = qkv
    ref = polynomial_attention_reference(q, k, v, p=p, mask=mask)
    out = fastmax(q, k, v, mask=mask, p=p, chunk=64)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-2, rtol=1e-2)


@pytest.mark.parametrize("p", [1, 2])
def test_fastmax_chunk_size_invariance(qkv, p):
    q, k, v = qkv
    a = fastmax(q, k, v, mask=True, p=p, chunk=32)
    b = fastmax(q, k, v, mask=True, p=p, chunk=200)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-2, rtol=1e-2)


def test_fastmax_ragged_tail(qkv):
    """N not divisible by the chunk size exercises the zero-padding path."""
    q, k, v = qkv
    q, k, v = q[:, :, :137], k[:, :, :137], v[:, :, :137]
    ref = polynomial_attention_reference(q, k, v, p=2, mask=True)
    out = fastmax(q, k, v, mask=True, p=2, chunk=64)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-2, rtol=1e-2)


def test_linearmax_matches_normalized_reference(qkv):
    q, k, v = qkv
    qn, kn = _hack_normalize(q.astype(jnp.float32), k.astype(jnp.float32))
    ref = polynomial_attention_reference(qn, kn, v, p=1, mask=True, normalize_term=1.0)
    out = linearmax(q, k, v, p=1, mask=True, chunk=64)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-2, rtol=1e-2)


def _well_conditioned_rows(q, k):
    """Rows where the performer conditioning floor is inactive: |den| above
    both the absolute floor and the relative (rel * |q| * |cumsum k|) floor,
    and the output within the clip range."""
    from fastmax_tpu.ops.fastmax import DEN_FLOOR, DEN_REL_FLOOR

    k_cum = jnp.cumsum(k, axis=-2) + 1e-6
    den = jnp.einsum("bhnd,bhnd->bhn", q, k_cum)
    qn = jnp.sqrt(jnp.sum(q * q, axis=-1))
    kn = jnp.sqrt(jnp.sum(k_cum**2, axis=-1))
    floor = np.maximum(DEN_REL_FLOOR * np.asarray(qn * kn), DEN_FLOOR)
    return np.abs(np.asarray(den)) > np.maximum(floor * 1.01, 1.0), den


def test_performer_matches_naive(qkv):
    q, k, v = qkv
    s = jnp.einsum("bhid,bhjd->bhij", q, k)
    causal = jnp.tril(jnp.ones((N, N), dtype=bool))
    num = jnp.einsum("bhij,bhjd->bhid", jnp.where(causal, s, 0.0), v)
    den = jnp.einsum("bhnd,bhnd->bhn", q, jnp.cumsum(k, axis=-2) + 1e-6)
    ref = num / den[..., None]
    out = performer(q, k, v, chunk=64)
    # the identity feature map lets denominators pass arbitrarily close to
    # zero; the op floors those rows (DEN_REL_FLOOR) — compare only where
    # the floor is inactive, and additionally require chunk-size
    # invariance everywhere (an unconditioned internal check)
    good, _ = _well_conditioned_rows(q, k)
    good &= np.all(np.abs(np.asarray(ref)) < 64.0, axis=-1)
    assert good.mean() > 0.5
    np.testing.assert_allclose(
        np.asarray(out)[good], np.asarray(ref)[good], atol=5e-2, rtol=5e-2
    )
    out2 = performer(q, k, v, chunk=100)
    np.testing.assert_allclose(
        np.asarray(out)[good], np.asarray(out2)[good], atol=5e-2, rtol=5e-2
    )


@pytest.mark.parametrize("p", [1, 2])
def test_recurrent_decode_matches_full(qkv, p):
    """O(1)-state decode emits the same outputs as the full masked pass."""
    import math

    q, k, v = qkv
    n = 48
    q, k, v = q[:, :, :n], k[:, :, :n], v[:, :, :n]
    z = 8.0 * math.sqrt(D)
    state = linear_attn_state_init(B, H, D, p)
    outs = []
    step = jax.jit(linear_attn_decode_step, static_argnames=("z", "p"))
    for t in range(n):
        state, o = step(state, q[:, :, t], k[:, :, t], v[:, :, t], z=z, p=p)
        outs.append(o)
    dec = jnp.stack(outs, axis=2)
    full = fastmax(q, k, v, mask=True, p=p, chunk=16)
    np.testing.assert_allclose(np.asarray(dec), np.asarray(full), atol=2e-2, rtol=1e-2)


@pytest.mark.parametrize("p", [1, 2])
def test_fastmax_grad_runs(qkv, p):
    """Autodiff through the chunked scan (replaces the reference's hand-derived
    backward, fastmax.py:383-691) produces finite grads of the right shape."""
    q, k, v = qkv
    q, k, v = q[:, :1, :64], k[:, :1, :64], v[:, :1, :64]

    def loss(q, k, v):
        return jnp.sum(fastmax(q, k, v, mask=True, p=p, chunk=32) ** 2)

    gq, gk, gv = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
    for g, x in ((gq, q), (gk, k), (gv, v)):
        assert g.shape == x.shape
        assert np.isfinite(np.asarray(g)).all()


@pytest.mark.parametrize("p", [1, 2])
def test_fastmax_grad_matches_reference_grad(qkv, p):
    """Gradients of the linear formulation match autodiff of the O(N^2) one."""
    q, k, v = qkv
    q, k, v = q[:1, :1, :48], k[:1, :1, :48], v[:1, :1, :48]
    g = jax.random.normal(jax.random.PRNGKey(7), q.shape)

    def loss_lin(q, k, v):
        return jnp.vdot(fastmax(q, k, v, mask=True, p=p, chunk=16), g)

    def loss_ref(q, k, v):
        return jnp.vdot(polynomial_attention_reference(q, k, v, p=p, mask=True), g)

    gl = jax.grad(loss_lin, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gl, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-2, rtol=5e-2)


@pytest.mark.parametrize("p", [1, 2])
def test_custom_vjp_matches_scan_autodiff(p):
    """The reversible-state backward == plain autodiff through the scan
    (which stores every chunk state) on a longer sequence."""
    from fastmax_tpu.ops.fastmax import _masked_chunked, _masked_chunked_vjp
    import math

    key = jax.random.PRNGKey(3)
    b, h, n, d = 1, 2, 512, 16
    q, k, v = (jax.random.normal(kk, (b, h, n, d)) for kk in jax.random.split(key, 3))
    z = 8.0 * math.sqrt(d)
    g = jax.random.normal(jax.random.PRNGKey(8), q.shape)

    def loss_vjp(q, k, v):
        return jnp.vdot(_masked_chunked_vjp(q, k, v, z, p, 64), g)

    def loss_ad(q, k, v):
        return jnp.vdot(_masked_chunked(q, k, v, z, p, 64), g)

    gv = jax.grad(loss_vjp, argnums=(0, 1, 2))(q, k, v)
    ga = jax.grad(loss_ad, argnums=(0, 1, 2))(q, k, v)
    for a, b2, name in zip(gv, ga, "qkv"):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b2), atol=1e-4, rtol=1e-3,
                                   err_msg=f"d{name}")


def test_custom_vjp_ragged_tail_grads(qkv):
    """N not divisible by chunk: padding correction in the backward."""
    q, k, v = qkv
    q, k, v = q[:1, :1, :100], k[:1, :1, :100], v[:1, :1, :100]
    g = jax.random.normal(jax.random.PRNGKey(5), q.shape)

    def loss_lin(q, k, v):
        return jnp.vdot(fastmax(q, k, v, mask=True, p=2, chunk=32), g)

    def loss_ref(q, k, v):
        return jnp.vdot(polynomial_attention_reference(q, k, v, p=2, mask=True), g)

    gl = jax.grad(loss_lin, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b2 in zip(gl, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b2), atol=5e-2, rtol=5e-2)


@pytest.mark.parametrize("p", [1, 2])
def test_head_grouped_matches_ungrouped(qkv, p):
    """head_group splits the (independent) head axis into sequential
    lax.map groups to bound the p=2 scan-state working set; outputs and
    gradients must be identical to the all-at-once path."""
    q, k, v = qkv

    def loss(fn_kwargs):
        def f(q, k, v):
            o = fastmax(q, k, v, mask=True, p=p, chunk=64, **fn_kwargs)
            return jnp.sum(o * jnp.cos(jnp.arange(o.size, dtype=o.dtype).reshape(o.shape)))
        return f

    o1 = fastmax(q, k, v, mask=True, p=p, chunk=64, head_group=1)
    o3 = fastmax(q, k, v, mask=True, p=p, chunk=64, head_group=3)
    np.testing.assert_allclose(np.asarray(o1), np.asarray(o3), atol=1e-5, rtol=1e-5)

    g1 = jax.grad(loss({"head_group": 1}), argnums=(0, 1, 2))(q, k, v)
    g3 = jax.grad(loss({"head_group": 3}), argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g1, g3):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5, rtol=1e-5)


def test_auto_head_groups_divides_heads():
    from fastmax_tpu.ops.fastmax import _auto_head_groups

    assert _auto_head_groups(2, 3, 16, p=1) == 1
    assert _auto_head_groups(2, 3, 16, p=2) == 1  # tiny state: no grouping
    # 16*32*64^3 f32 = 512 MB -> 8 groups at the 64 MB default limit
    assert _auto_head_groups(16, 32, 64, p=2) == 8
    # always a divisor of h
    g = _auto_head_groups(16, 12, 64, p=2)
    assert 12 % g == 0 and g > 1


def test_performer_bf16_long_T_finite_fwd_and_grad():
    """Performer must stay finite in bf16 at training scale (verdict r03
    weak #3: NaN loss at bs16 seq1024). The raw-q.k denominator crosses
    zero for real activations; the sign-preserving clamp keeps 1/den and
    its gradient bounded. Checks a long-T bf16 forward + the f32 grad of a
    scalar loss through the scan."""
    key = jax.random.PRNGKey(42)
    b, h, t, d = 2, 4, 2048, 64
    # large-magnitude inputs drive q.cumsum(k) through zero many times
    q, k, v = (3.0 * jax.random.normal(kk, (b, h, t, d), jnp.bfloat16)
               for kk in jax.random.split(key, 3))
    out = performer(q, k, v, chunk=128)
    assert out.dtype == jnp.bfloat16
    assert bool(jnp.all(jnp.isfinite(out.astype(jnp.float32))))

    def loss(q, k, v):
        return jnp.mean(performer(q, k, v, chunk=128).astype(jnp.float32) ** 2)

    g = jax.grad(loss, argnums=(0, 1, 2))(
        q.astype(jnp.float32), k.astype(jnp.float32), v.astype(jnp.float32)
    )
    for a in g:
        assert bool(jnp.all(jnp.isfinite(a)))


def test_performer_clamp_inactive_on_conditioned_rows(qkv):
    """Away from the den ~ 0 singularity the conditioning floor must not
    perturb the reference formula: outputs on well-conditioned rows are
    identical with and without a (tiny) absolute floor."""
    q, k, v = qkv
    out_default = performer(q, k, v, chunk=64)
    out_tiny_floor = performer(q, k, v, chunk=64, den_floor=1e-30)
    good, _ = _well_conditioned_rows(q, k)
    np.testing.assert_array_equal(
        np.asarray(out_default)[good], np.asarray(out_tiny_floor)[good]
    )


def test_performer_training_scale_gradients_bounded():
    """Regression for the r03 bench-scale NaN: an 8-layer d=64 bf16 model's
    gradient global-norm through performer attention must stay O(10), not
    the 1e10+ amplification the unconditioned denominator produced (which
    overflowed the f32 norm-square at 22 layers and nan'd the model via
    clip_by_global_norm)."""
    import optax

    from fastmax_tpu.models import gpt
    from fastmax_tpu.models.config import Config
    from fastmax_tpu.training.step import make_loss_fn

    cfg = Config(
        name="performer-gnorm", block_size=256, vocab_size=256,
        padded_vocab_size=256, n_layer=4, n_head=4, n_embd=256,
        n_query_groups=4, rotary_percentage=1.0, parallel_residual=False,
        bias=False, _norm_class="RMSNorm", _mlp_class="LLaMAMLP",
        intermediate_size=512, attn_alg="performer",
    )
    params = gpt.init_params(cfg, jax.random.PRNGKey(0), jnp.bfloat16)
    loss_fn = make_loss_fn(cfg, remat=True)
    batch = jnp.asarray(
        np.random.default_rng(0).integers(0, 256, (2, 257)), jnp.int32
    )
    loss, grads = jax.jit(jax.value_and_grad(loss_fn))(params, batch)
    gnorm = float(optax.global_norm(grads))
    assert np.isfinite(float(loss))
    assert np.isfinite(gnorm) and gnorm < 1e3, gnorm
