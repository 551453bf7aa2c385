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
