"""Sorted (ragged_dot) vs dense MoE dispatch parity."""

import jax
import jax.numpy as jnp
import numpy as np

from fastmax_tpu.models.config import Config
from fastmax_tpu.models import gpt


def _setup():
    cfg = Config(
        name="moe-disp", block_size=64, vocab_size=96, padded_vocab_size=96,
        n_layer=1, n_head=4, n_embd=64, rotary_percentage=1.0,
        parallel_residual=False, bias=False, _norm_class="RMSNorm",
        _mlp_class="LLaMAMoE", intermediate_size=96, n_expert=6, n_expert_per_token=2,
    )
    params = gpt.init_params(cfg, jax.random.PRNGKey(0))
    mlp = jax.tree.map(lambda a: a[0], params["blocks"]["mlp"])
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 10, 64))
    return cfg, mlp, x


def test_sorted_matches_dense():
    cfg, mlp, x = _setup()
    dense = gpt.apply_moe(mlp, x, cfg, sorted_dispatch=False)
    sorted_ = gpt.apply_moe(mlp, x, cfg, sorted_dispatch=True)
    np.testing.assert_allclose(np.asarray(sorted_), np.asarray(dense), atol=2e-5, rtol=1e-4)


def test_sorted_dispatch_grads_flow():
    cfg, mlp, x = _setup()

    def loss(mlp, x):
        return jnp.sum(gpt.apply_moe(mlp, x, cfg, sorted_dispatch=True) ** 2)

    g = jax.grad(loss)(mlp, x)
    leaves = jax.tree.leaves(g)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
    assert any(float(jnp.abs(l).max()) > 0 for l in leaves)
    # matches dense-dispatch gradients
    def loss_d(mlp, x):
        return jnp.sum(gpt.apply_moe(mlp, x, cfg, sorted_dispatch=False) ** 2)

    gd = jax.grad(loss_d)(mlp, x)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-3, rtol=1e-2),
        g, gd,
    )


def test_sorted_dispatch_flops_scale_with_k():
    """The sorted path's grouped matmuls process N*k rows, not N*E."""
    cfg, mlp, x = _setup()
    fn = jax.jit(lambda mlp, x: gpt.apply_moe(mlp, x, cfg, sorted_dispatch=True))
    txt = fn.lower(mlp, x).compile().as_text()
    assert "ragged" in txt.lower() or "dot" in txt.lower()
