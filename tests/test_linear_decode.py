"""Recurrent-state decode for the linear attention algorithms.

The engine's O(1)-per-token decode must produce the SAME sequence as
recomputing the full masked linear attention from scratch at every step
(the mathematically-correct causal continuation)."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fastmax_tpu.models.config import Config
from fastmax_tpu.models import gpt
from fastmax_tpu.inference.engine import InferenceEngine
from fastmax_tpu.ops import fastmax as fm


def cfg_for(alg):
    return Config(
        name=f"lin-{alg}", block_size=96, vocab_size=96, padded_vocab_size=96,
        n_layer=2, n_head=4, n_embd=64, n_query_groups=2, rotary_percentage=1.0,
        parallel_residual=False, bias=False, _norm_class="RMSNorm",
        _mlp_class="LLaMAMLP", intermediate_size=128, attn_alg=alg,
    )


@pytest.mark.parametrize("alg", ["fastmax", "linearmax", "performer"])
def test_state_prefill_matches_no_cache_forward(alg):
    """Prefill through the state cache == plain masked forward logits."""
    cfg = cfg_for(alg)
    params = gpt.init_params(cfg, jax.random.PRNGKey(0))
    idx = jax.random.randint(jax.random.PRNGKey(1), (1, 17), 0, 96)
    full, _ = gpt.forward(params, cfg, idx)
    state = gpt.init_linear_cache(cfg, 1)
    logits, _ = gpt.forward_linear_cache(params, cfg, idx, state=state, input_pos=0)
    np.testing.assert_allclose(np.asarray(logits), np.asarray(full), atol=2e-3, rtol=1e-2)


@pytest.mark.parametrize("alg", ["fastmax", "linearmax", "performer"])
def test_recurrent_decode_matches_full_recompute(alg):
    """Greedy decode via state == greedy decode recomputing the full masked
    pass over the growing sequence each step."""
    cfg = cfg_for(alg)
    params = gpt.init_params(cfg, jax.random.PRNGKey(0))
    prompt = np.arange(1, 11, dtype=np.int32)
    n_new = 8

    # reference: recompute the full (masked) forward each step, greedy
    seq = list(prompt)
    for _ in range(n_new):
        logits, _ = gpt.forward(params, cfg, jnp.asarray([seq], jnp.int32))
        seq.append(int(jnp.argmax(logits[0, -1])))
    ref_new = seq[len(prompt):]

    # engine with O(1) state decode
    eng = InferenceEngine(cfg, params, max_seq_length=96, batch_size=1)
    out = eng.generate(jnp.asarray(prompt), len(prompt) + n_new, temperature=0.0,
                       key=jax.random.PRNGKey(5))
    got = np.asarray(out[0, len(prompt):]).tolist()

    if alg == "linearmax":
        # the frozen-normalizer decode deviates from the (acausal) full
        # renormalization; require agreement on the first steps only
        assert got[:2] == ref_new[:2], (got, ref_new)
    else:
        assert got == ref_new, (got, ref_new)


def test_fastmax_prefill_state_continues_correctly():
    """fastmax: (prefill state + decode steps) == full masked fastmax."""
    key = jax.random.PRNGKey(0)
    b, h, n, d = 1, 2, 24, 16
    q, k, v = (jax.random.normal(kk, (b, h, n, d)) for kk in jax.random.split(key, 3))
    z = 8.0 * math.sqrt(d)
    pre = 16
    o_pre, state = fm.fastmax_prefill_state(q[:, :, :pre], k[:, :, :pre], v[:, :, :pre], p=2)
    outs = [o_pre]
    for t in range(pre, n):
        core = {key_: state[key_] for key_ in ("cnt", "s_v", "s_kv", "s_k", "s_kkv", "s_kk")}
        core, o = fm.linear_attn_decode_step(core, q[:, :, t], k[:, :, t], v[:, :, t], z, 2)
        state = {**state, **core}
        outs.append(o[:, :, None])
    got = jnp.concatenate(outs, axis=2)
    ref = fm.fastmax(q, k, v, mask=True, p=2, chunk=8)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-2, rtol=1e-2)


def test_performer_decode_state_matches_training_math():
    key = jax.random.PRNGKey(1)
    b, h, n, d = 1, 2, 20, 16
    q, k, v = (jax.random.normal(kk, (b, h, n, d)) for kk in jax.random.split(key, 3))
    o_full = fm.performer(q, k, v, chunk=8)
    pre = 12
    _, state = fm.performer_prefill_state(q[:, :, :pre], k[:, :, :pre], v[:, :, :pre])
    outs = []
    for t in range(pre, n):
        state, o = fm.performer_decode_step(state, q[:, :, t], k[:, :, t], v[:, :, t])
        outs.append(o[:, :, None])
    got = np.concatenate([np.asarray(o) for o in outs], axis=2)
    ref = np.asarray(o_full[:, :, pre:])
    den = np.einsum("bhnd,bhnd->bhn", np.asarray(q[:, :, pre:]),
                    np.cumsum(np.asarray(k), axis=2)[:, :, pre:] + 1e-6)
    good = np.abs(den) > 0.5
    np.testing.assert_allclose(got[good], ref[good], atol=5e-2, rtol=5e-2)
