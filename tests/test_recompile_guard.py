"""Recompile-guard tests (verdict r03 missing #5).

The JAX analogue of the reference's torch.compile graph-break assertions
(tests/test_model.py:620-645): a serving or training session must compile
a FIXED number of executables — shape-driven or value-driven recompiles in
the hot loop would silently multiply the compile cost and latency on real
chips (first compile through the tunnel costs minutes at 7B scale).

Counts are asserted via the jit caches' `_cache_size()`.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fastmax_tpu.models import gpt
from fastmax_tpu.models.config import Config


def small_cfg(**kw):
    base = dict(
        name="guard-test", block_size=128, vocab_size=128,
        padded_vocab_size=128, n_layer=2, n_head=4, n_embd=64,
        n_query_groups=2, rotary_percentage=1.0, parallel_residual=False,
        bias=False, _norm_class="RMSNorm", _mlp_class="LLaMAMLP",
        intermediate_size=128,
    )
    base.update(kw)
    return Config(**base)


@pytest.fixture(scope="module")
def model():
    cfg = small_cfg()
    params = gpt.init_params(cfg, jax.random.PRNGKey(0))
    return cfg, params


def test_engine_decode_session_compiles_once(model):
    """One engine serving many requests — different prompts (same length),
    different generation budgets, different sampling keys — must hold ONE
    decode-loop executable and ONE prefill executable (max_new is traced;
    the token buffer is statically sized — engine.py docstring, now
    asserted)."""
    from fastmax_tpu.inference.engine import InferenceEngine

    cfg, params = model
    eng = InferenceEngine(cfg, params, max_seq_length=128, batch_size=1)
    p = np.random.default_rng(0).integers(1, 100, size=(3, 16))
    eng.generate(jnp.asarray(p[0], jnp.int32), 24, temperature=0.0)
    for i, budget in ((1, 40), (2, 64)):
        eng.generate(jnp.asarray(p[i], jnp.int32), budget, temperature=0.0,
                     key=jax.random.PRNGKey(i))
    assert eng._decode_loop._cache_size() == 1
    assert eng._prefill._cache_size() == 1

    # temperature-MODE change (greedy -> sampled) is the documented single
    # recompile; further sampled calls reuse it
    eng.generate(jnp.asarray(p[0], jnp.int32), 24, temperature=0.8,
                 key=jax.random.PRNGKey(9))
    eng.generate(jnp.asarray(p[1], jnp.int32), 32, temperature=0.5,
                 key=jax.random.PRNGKey(10))
    assert eng._decode_loop._cache_size() == 2


def test_continuous_batcher_session_compiles_once(model):
    """A continuous-batching session across staggered joins/finishes holds
    one step executable and one prefill executable per bucket."""
    from fastmax_tpu.inference.continuous import ContinuousBatcher

    cfg, params = model
    b = ContinuousBatcher(cfg, params, n_slots=2, max_seq_length=128,
                          prefill_bucket=32)
    rng = np.random.default_rng(1)
    b.submit(rng.integers(1, 100, 16).astype(np.int32), 8, temperature=0.0)
    b.submit(rng.integers(1, 100, 20).astype(np.int32), 12, temperature=0.0)
    for _ in range(3):
        b.step()
    b.submit(rng.integers(1, 100, 12).astype(np.int32), 6, temperature=0.0)
    b.run_to_completion()
    assert b._step._cache_size() == 1
    # all three prompts fall in the same 32-token prefill bucket
    assert b._prefill._cache_size() == 1


def test_train_step_compiles_once_across_iters():
    """N optimizer steps with fixed shapes = ONE executable (the fit loop's
    jit discipline; a per-step recompile would be catastrophic at 7B)."""
    import optax

    from fastmax_tpu.training.step import make_loss_fn

    cfg = small_cfg()
    params = gpt.init_params(cfg, jax.random.PRNGKey(0))
    tx = optax.adamw(1e-3)
    opt_state = tx.init(params)
    loss_fn = make_loss_fn(cfg, remat=True)

    @jax.jit
    def step(params, opt_state, batch):
        loss, grads = jax.value_and_grad(loss_fn)(params, batch)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    rng = np.random.default_rng(0)
    for i in range(4):
        batch = jnp.asarray(rng.integers(0, 128, (2, 33)), jnp.int32)
        params, opt_state, loss = step(params, opt_state, batch)
    assert step._cache_size() == 1
    assert np.isfinite(float(loss))
