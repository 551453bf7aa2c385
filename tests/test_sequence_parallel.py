"""Sequence-parallel training mode on the virtual 8-device mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from fastmax_tpu.models.config import Config
from fastmax_tpu.models import gpt
from fastmax_tpu.parallel import sequence_parallel as sp
from fastmax_tpu.parallel.sharding import make_mesh
from fastmax_tpu.utils.loss import cross_entropy


@pytest.fixture(scope="module")
def model():
    cfg = Config(
        name="sp-test", block_size=128, vocab_size=96, padded_vocab_size=96,
        n_layer=2, n_head=4, n_embd=64, n_query_groups=2, rotary_percentage=1.0,
        parallel_residual=False, bias=False, _norm_class="RMSNorm",
        _mlp_class="LLaMAMLP", intermediate_size=128,
    )
    return cfg, gpt.init_params(cfg, jax.random.PRNGKey(0))


@pytest.mark.parametrize("p", [2, 4])
def test_sp_forward_matches_plain(model, p):
    cfg, params = model
    mesh = make_mesh(data=8 // p, fsdp=1, model=p)
    idx = jax.random.randint(jax.random.PRNGKey(1), (2, 64), 0, 96)
    ref, _ = gpt.forward(params, cfg, idx)
    fwd = sp.make_sp_forward(cfg, mesh, axis="model")
    with mesh:
        out = fwd(params, idx)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-4, rtol=1e-3)


def test_sp_loss_matches_dense(model):
    cfg, params = model
    mesh = make_mesh(data=2, fsdp=1, model=4)
    batch = jax.random.randint(jax.random.PRNGKey(2), (2, 65), 0, 96)
    loss_fn = sp.make_sp_loss_fn(cfg, mesh, axis="model")
    with mesh:
        sp_loss = float(jax.jit(loss_fn)(params, batch))
    # dense equivalent over the same stream: inputs batch[:, :64] (the
    # sharded stream), next-token targets within it
    stream = batch[:, :-1]
    logits, _ = gpt.forward(params, cfg, stream)
    dense = float(cross_entropy(logits[:, :-1], stream[:, 1:]))
    assert abs(sp_loss - dense) < 5e-3, (sp_loss, dense)


def test_sp_train_step_learns(model):
    cfg, params = model
    mesh = make_mesh(data=1, fsdp=1, model=8)
    optimizer = optax.adamw(5e-3)
    opt_state = optimizer.init(params)
    step = sp.make_sp_train_step(cfg, mesh, optimizer, axis="model")
    batch = jax.random.randint(jax.random.PRNGKey(3), (2, 65), 0, 96)
    with mesh:
        params1, opt_state, l1 = step(params, opt_state, batch)
        params2, opt_state, l2 = step(params1, opt_state, batch)
        _, _, l3 = step(params2, opt_state, batch)
    assert np.isfinite(float(l1)) and float(l3) < float(l1)
