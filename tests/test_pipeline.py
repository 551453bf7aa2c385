"""Pipeline-parallel (GPipe-over-ppermute) training mode on the virtual
8-device mesh: numerics must equal the dense loss exactly (the schedule
only reorders compute), and gradients must match the dense gradients."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from fastmax_tpu.models.config import Config
from fastmax_tpu.models import gpt
from fastmax_tpu.parallel import pipeline as pp
from fastmax_tpu.parallel.sharding import make_mesh, shard_params
from fastmax_tpu.training.step import make_loss_fn


@pytest.fixture(scope="module")
def model():
    cfg = Config(
        name="pp-test", block_size=64, vocab_size=96, padded_vocab_size=96,
        n_layer=4, n_head=4, n_embd=64, n_query_groups=2, rotary_percentage=1.0,
        parallel_residual=False, bias=False, _norm_class="RMSNorm",
        _mlp_class="LLaMAMLP", intermediate_size=128,
    )
    return cfg, gpt.init_params(cfg, jax.random.PRNGKey(0))


@pytest.mark.parametrize("p,n_micro", [(2, 2), (4, 4), (4, 2)])
def test_pp_loss_matches_dense(model, p, n_micro):
    cfg, params = model
    mesh = make_mesh(data=8 // p, fsdp=1, model=p)
    batch = jax.random.randint(jax.random.PRNGKey(1), (4, 33), 0, 96)
    dense = float(make_loss_fn(cfg, remat=False)(params, batch))
    loss_fn = pp.make_pp_loss_fn(cfg, mesh, axis="model", n_micro=n_micro)
    with mesh:
        sharded = shard_params(params, mesh, pp.pp_param_specs(cfg, params, axis="model"))
        got = float(jax.jit(loss_fn)(sharded, batch))
    assert abs(got - dense) < 2e-4, (got, dense)


def test_pp_grads_match_dense(model):
    cfg, params = model
    mesh = make_mesh(data=2, fsdp=1, model=4)
    batch = jax.random.randint(jax.random.PRNGKey(2), (4, 33), 0, 96)
    ref_grads = jax.grad(make_loss_fn(cfg, remat=False))(params, batch)
    loss_fn = pp.make_pp_loss_fn(cfg, mesh, axis="model", n_micro=2)
    with mesh:
        sharded = shard_params(params, mesh, pp.pp_param_specs(cfg, params, axis="model"))
        got = jax.jit(jax.grad(loss_fn))(sharded, batch)
    flat_ref = jax.tree.leaves(ref_grads)
    flat_got = jax.tree.leaves(got)
    for r, g in zip(flat_ref, flat_got):
        np.testing.assert_allclose(np.asarray(g), np.asarray(r), atol=3e-4, rtol=2e-3)


def test_pp_train_step_learns(model):
    cfg, params = model
    mesh = make_mesh(data=1, fsdp=1, model=4)
    optimizer = optax.adamw(5e-3)
    step = pp.make_pp_train_step(cfg, mesh, optimizer, axis="model", n_micro=2)
    batch = jax.random.randint(jax.random.PRNGKey(3), (4, 33), 0, 96)
    with mesh:
        sharded = shard_params(params, mesh, pp.pp_param_specs(cfg, params, axis="model"))
        opt_state = optimizer.init(sharded)
        p1, opt_state, l1 = step(sharded, opt_state, batch)
        p2, opt_state, l2 = step(p1, opt_state, batch)
        _, _, l3 = step(p2, opt_state, batch)
    assert np.isfinite(float(l1)) and float(l3) < float(l1)


def test_pp_rejects_indivisible_layers(model):
    cfg, params = model
    import dataclasses

    bad = dataclasses.replace(cfg, n_layer=3, name="pp-bad")
    mesh = make_mesh(data=4, fsdp=1, model=2)
    with pytest.raises(ValueError, match="divide"):
        pp.make_pp_loss_fn(bad, mesh, axis="model", n_micro=2)
