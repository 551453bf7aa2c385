"""Speculative (prompt-lookup) decoding: exact greedy parity with the
engine's plain decode loop, acceptance on repetitive text, eos handling."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fastmax_tpu.models.config import Config
from fastmax_tpu.models import gpt
from fastmax_tpu.inference.engine import InferenceEngine
from fastmax_tpu.inference.speculative import SpeculativeDecoder, ngram_draft


@pytest.fixture(scope="module")
def setup():
    cfg = Config(block_size=128, vocab_size=96, padded_vocab_size=96,
                 n_layer=2, n_head=4, n_embd=64, rotary_percentage=1.0)
    params = gpt.init_params(cfg, jax.random.PRNGKey(0), jnp.float32)
    eng = InferenceEngine(cfg, params, max_seq_length=128, batch_size=1)
    return cfg, eng


def test_ngram_draft_lookup():
    hist = jnp.asarray([5, 6, 7, 8, 9, 5, 6, 0, 0, 0, 0, 0], jnp.int32)
    # current bigram (5,6) at pos 7 matches hist[0:2]; draft = tokens after
    d = ngram_draft(hist, jnp.asarray(7), 3, hist.shape[0])
    np.testing.assert_array_equal(np.asarray(d), [7, 8, 9])
    # no match -> repeat last token
    hist2 = jnp.asarray([1, 2, 3, 4, 0, 0], jnp.int32)
    d2 = ngram_draft(hist2, jnp.asarray(4), 3, hist2.shape[0])
    np.testing.assert_array_equal(np.asarray(d2), [4, 4, 4])


@pytest.mark.parametrize("k", [4, 8])
def test_speculative_matches_greedy(setup, k):
    _, eng = setup
    for seed, name in ((0, "random"), (1, "repetitive")):
        if name == "repetitive":
            prompt = jnp.asarray(np.tile([3, 4, 5, 6], 6), jnp.int32)
        else:
            prompt = jnp.asarray(
                np.random.default_rng(seed).integers(1, 96, (16,)), jnp.int32
            )
        ref = np.asarray(eng.generate(prompt, 80, temperature=0.0,
                                      key=jax.random.PRNGKey(9)))
        spec = SpeculativeDecoder(eng, k=k)
        got = np.asarray(spec.generate(prompt, 80))
        np.testing.assert_array_equal(got, ref, err_msg=f"{name} k={k}")
        assert spec.last_steps <= 80 - len(np.asarray(prompt))


def test_speculative_eos_truncation(setup):
    _, eng = setup
    prompt = jnp.asarray(np.arange(1, 17), jnp.int32)
    ref = np.asarray(eng.generate(prompt, 64, temperature=0.0,
                                  key=jax.random.PRNGKey(9)))
    # pick the 4th generated token as a fake eos: both paths must stop there
    eos = int(ref[0, 16 + 3])
    ref_eos = np.asarray(eng.generate(prompt, 64, temperature=0.0, eos_id=eos,
                                      key=jax.random.PRNGKey(9)))
    spec = SpeculativeDecoder(eng, k=6)
    got = np.asarray(spec.generate(prompt, 64, eos_id=eos))
    np.testing.assert_array_equal(got, ref_eos)


def test_speculative_budget_guard(setup):
    _, eng = setup
    spec = SpeculativeDecoder(eng, k=8)
    with pytest.raises(ValueError, match="headroom"):
        spec.generate(jnp.asarray([1, 2, 3], jnp.int32), 128)


# --------------------------------------------------------- sampling mode


def test_speculative_accept_distribution():
    """The rejection rule emits tokens marginally distributed exactly as
    temperature sampling from the verifier: check the empirical marginal of
    the first emitted token against p_0, and of the second emitted token
    (conditional on the first draft being accepted) against p_1."""
    from fastmax_tpu.ops.sampling import filtered_log_probs, speculative_accept

    k, v, temp = 3, 16, 0.8
    rng = np.random.default_rng(0)
    logits = jnp.asarray(rng.normal(size=(k + 1, v)) * 2.0, jnp.float32)
    draft = jnp.asarray([5, 11, 2], jnp.int32)

    n = 40_000
    keys = jax.random.split(jax.random.PRNGKey(42), n)
    a, tokens = jax.vmap(lambda s: speculative_accept(logits, draft, s, temp))(keys)
    a, tokens = np.asarray(a), np.asarray(tokens)

    p = np.exp(np.asarray(filtered_log_probs(logits, temp)))
    # marginal of the first emitted token == p_0
    emp0 = np.bincount(tokens[:, 0], minlength=v) / n
    np.testing.assert_allclose(emp0, p[0], atol=4.5 / np.sqrt(n))
    # conditional on draft[0] accepted, second emitted token == p_1
    sel = a >= 1
    emp1 = np.bincount(tokens[sel, 1], minlength=v) / sel.sum()
    np.testing.assert_allclose(emp1, p[1], atol=4.5 / np.sqrt(sel.sum()))
    # acceptance prob of draft[0] == p_0(draft[0])
    np.testing.assert_allclose(sel.mean(), p[0, 5], atol=4.5 / np.sqrt(n))


def test_speculative_accept_top_k():
    """With top_k the emitted token always lies in the verifier's top-k set
    even when the draft does not."""
    from fastmax_tpu.ops.sampling import speculative_accept

    k, v, top_k = 2, 32, 4
    rng = np.random.default_rng(1)
    logits = jnp.asarray(rng.normal(size=(k + 1, v)), jnp.float32)
    topsets = np.argsort(np.asarray(logits), axis=-1)[:, -top_k:]
    # draft tokens outside the top-k set: always rejected at position 0
    draft = jnp.asarray(
        [np.setdiff1d(np.arange(v), topsets[i])[0] for i in range(k)], jnp.int32
    )
    keys = jax.random.split(jax.random.PRNGKey(7), 500)
    a, tokens = jax.vmap(lambda s: speculative_accept(logits, draft, s, 1.0, top_k))(keys)
    a, tokens = np.asarray(a), np.asarray(tokens)
    assert (a == 0).all()
    assert np.isin(tokens[:, 0], topsets[0]).all()


def test_speculative_sampling_generate(setup):
    """End-to-end temperature>0 speculation: deterministic per key, valid
    output, and a greedy run is untouched by the new plumbing."""
    _, eng = setup
    spec = SpeculativeDecoder(eng, k=4)
    prompt = jnp.asarray(np.tile([3, 4, 5, 6], 4), jnp.int32)
    key = jax.random.PRNGKey(3)
    out1 = np.asarray(spec.generate(prompt, 64, temperature=0.7, top_k=20, key=key))
    out2 = np.asarray(spec.generate(prompt, 64, temperature=0.7, top_k=20, key=key))
    np.testing.assert_array_equal(out1, out2)
    out3 = np.asarray(
        spec.generate(prompt, 64, temperature=0.7, top_k=20, key=jax.random.PRNGKey(4))
    )
    assert out1.shape[1] <= 64 and (out1 >= 0).all() and (out1 < 96).all()
    assert out1.shape != out3.shape or not np.array_equal(out1, out3)
    # prompt preserved
    np.testing.assert_array_equal(out1[0, :16], np.asarray(prompt))


def test_speculative_sampling_eos(setup):
    _, eng = setup
    prompt = jnp.asarray(np.arange(1, 17), jnp.int32)
    spec = SpeculativeDecoder(eng, k=4)
    key = jax.random.PRNGKey(11)
    ref = np.asarray(spec.generate(prompt, 64, temperature=0.9, key=key))
    eos = int(ref[0, 16 + 2])
    got = np.asarray(spec.generate(prompt, 64, temperature=0.9, eos_id=eos, key=key))
    # same key -> same sampled stream -> must stop at that eos
    assert got.shape[1] <= ref.shape[1]
    assert got[0, -1] == eos or got.shape[1] == 64


# ----------------------------------------------------- draft-model decoder


@pytest.fixture(scope="module")
def draft_setup(setup):
    from fastmax_tpu.inference.speculative import DraftSpeculativeDecoder

    cfg, eng = setup
    dcfg = Config(block_size=128, vocab_size=96, padded_vocab_size=96,
                  n_layer=1, n_head=2, n_embd=32, rotary_percentage=1.0)
    dparams = gpt.init_params(dcfg, jax.random.PRNGKey(7), jnp.float32)
    deng = InferenceEngine(dcfg, dparams, max_seq_length=128, batch_size=1)
    return eng, deng, DraftSpeculativeDecoder


def test_draft_spec_greedy_parity(draft_setup):
    """With ANY draft model, temperature-0 output is exactly the target's
    greedy decode (f32 CPU: no near-ties)."""
    eng, deng, Draft = draft_setup
    spec = Draft(eng, deng, k=4)
    for seed in (0, 1):
        prompt = jnp.asarray(np.random.default_rng(seed).integers(1, 96, (16,)), jnp.int32)
        ref = np.asarray(eng.generate(prompt, 80, temperature=0.0,
                                      key=jax.random.PRNGKey(9)))
        got = np.asarray(spec.generate(prompt, 80))
        np.testing.assert_array_equal(got, ref)
        assert spec.last_steps <= 80 - 16


def test_draft_spec_self_draft_accepts_everything(draft_setup):
    """Draft == target: every draft token is the target's own argmax, so
    acceptance is total and each verify step decides k+1 tokens."""
    eng, _, Draft = draft_setup
    spec = Draft(eng, eng, k=4)
    prompt = jnp.asarray(np.random.default_rng(3).integers(1, 96, (16,)), jnp.int32)
    ref = np.asarray(eng.generate(prompt, 66, temperature=0.0,
                                  key=jax.random.PRNGKey(9)))
    got = np.asarray(spec.generate(prompt, 66))
    np.testing.assert_array_equal(got, ref)
    # 49 tokens to decide after the first -> ceil(49/5) = 10 verify steps
    assert spec.last_steps <= 11
    assert spec.last_accepted >= spec.last_steps * 3


def test_draft_spec_sampling_runs(draft_setup):
    eng, deng, Draft = draft_setup
    spec = Draft(eng, deng, k=3)
    prompt = jnp.asarray(np.random.default_rng(5).integers(1, 96, (12,)), jnp.int32)
    key = jax.random.PRNGKey(21)
    o1 = np.asarray(spec.generate(prompt, 60, temperature=0.8, top_k=30, key=key))
    o2 = np.asarray(spec.generate(prompt, 60, temperature=0.8, top_k=30, key=key))
    np.testing.assert_array_equal(o1, o2)
    assert o1.shape[1] <= 60 and (o1 >= 0).all() and (o1 < 96).all()
    np.testing.assert_array_equal(o1[0, :12], np.asarray(prompt))


def test_speculative_accept_logq_distribution():
    """General rejection rule: drafting d_0 ~ q_0 then accept/resample must
    emit the first token marginally distributed as p_0 for q != p."""
    from fastmax_tpu.ops.sampling import filtered_log_probs, speculative_accept_logq

    k, v, temp = 2, 12, 1.0
    rng = np.random.default_rng(2)
    logits_p = jnp.asarray(rng.normal(size=(k + 1, v)) * 1.5, jnp.float32)
    logits_q = jnp.asarray(rng.normal(size=(k, v)) * 1.5, jnp.float32)
    logq = filtered_log_probs(logits_q, temp)
    p = np.exp(np.asarray(filtered_log_probs(logits_p, temp)))
    q = np.exp(np.asarray(logq))

    def trial(key):
        kd, ka = jax.random.split(key)
        g = -jnp.log(-jnp.log(jax.random.uniform(kd, (k, v)) + 1e-20) + 1e-20)
        draft = jnp.argmax(logq + g, axis=-1).astype(jnp.int32)  # d_i ~ q_i
        a, tokens = speculative_accept_logq(logits_p, draft, logq, ka, temp)
        return tokens[0], a

    n = 40_000
    keys = jax.random.split(jax.random.PRNGKey(0), n)
    tok0, a = jax.vmap(trial)(keys)
    emp = np.bincount(np.asarray(tok0), minlength=v) / n
    np.testing.assert_allclose(emp, p[0], atol=4.5 / np.sqrt(n))
    # acceptance rate of d_0 equals sum_d q(d) min(1, p(d)/q(d))
    expect_acc = np.sum(np.minimum(p[0], q[0]))
    np.testing.assert_allclose((np.asarray(a) >= 1).mean(), expect_acc,
                               atol=4.5 / np.sqrt(n))


def test_draft_spec_guards(draft_setup):
    eng, deng, Draft = draft_setup
    spec = Draft(eng, deng, k=8)
    with pytest.raises(ValueError, match="headroom"):
        spec.generate(jnp.asarray([1, 2, 3], jnp.int32), 128)
    with pytest.raises(ValueError, match=">= 2"):
        spec.generate(jnp.asarray([1], jnp.int32), 32)
    bad_cfg = Config(block_size=64, vocab_size=50, padded_vocab_size=50,
                     n_layer=1, n_head=2, n_embd=32, rotary_percentage=1.0)
    bad = InferenceEngine(
        bad_cfg, gpt.init_params(bad_cfg, jax.random.PRNGKey(0), jnp.float32),
        max_seq_length=64, batch_size=1,
    )
    with pytest.raises(ValueError, match="vocab"):
        Draft(eng, bad, k=4)
