"""Extended HF golden-parity tests: Mixtral MoE, GPT-NeoX non-parallel
residual, Gemma-style GeGLU with scaled embeddings, MQA (falcon-style
grouped single-KV) — widening the reference's tests/test_model.py family
coverage (:115-618)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from fastmax_tpu.models.config import Config
from fastmax_tpu.models import gpt
from fastmax_tpu.models.params import flat_to_params
from tests.test_against_hf import _hf_to_flat_llama


@pytest.fixture(scope="module")
def tokens():
    return np.random.default_rng(0).integers(0, 90, size=(2, 13), dtype=np.int64)


def test_mixtral_moe_parity(tokens):
    from transformers import MixtralConfig, MixtralForCausalLM

    hf_cfg = MixtralConfig(
        vocab_size=96, hidden_size=64, intermediate_size=112,
        num_hidden_layers=2, num_attention_heads=8, num_key_value_heads=2,
        num_local_experts=4, num_experts_per_tok=2,
        max_position_embeddings=64, rms_norm_eps=1e-5,
        attn_implementation="eager", tie_word_embeddings=False,
    )
    torch.manual_seed(0)
    hf = MixtralForCausalLM(hf_cfg).eval()

    cfg = Config(
        name="mixtral-tiny", block_size=64, vocab_size=96, padded_vocab_size=96,
        n_layer=2, n_head=8, n_embd=64, n_query_groups=2, rotary_percentage=1.0,
        parallel_residual=False, bias=False, _norm_class="RMSNorm",
        _mlp_class="LLaMAMoE", intermediate_size=112, norm_eps=1e-5,
        n_expert=4, n_expert_per_token=2,
    )
    flat = _hf_to_flat_llama(hf.state_dict(), cfg)
    params = flat_to_params(flat, cfg, jnp.float32)
    with torch.no_grad():
        ref = hf(torch.from_numpy(tokens)).logits.numpy()
    ours, _ = gpt.forward(params, cfg, jnp.asarray(tokens, jnp.int32))
    # router top-k near-ties flip expert choice between frameworks for a
    # handful of tokens; tolerance covers that boundary sensitivity
    np.testing.assert_allclose(np.asarray(ours), ref, atol=5e-3, rtol=1e-2)


def test_neox_nonparallel_residual_parity(tokens):
    from transformers import GPTNeoXConfig, GPTNeoXForCausalLM

    from tests.test_against_hf import _hf_to_flat_neox

    hf_cfg = GPTNeoXConfig(
        vocab_size=96, hidden_size=64, num_attention_heads=4, num_hidden_layers=2,
        intermediate_size=256, rotary_pct=1.0, max_position_embeddings=64,
        use_parallel_residual=False, attn_implementation="eager",
    )
    torch.manual_seed(1)
    hf = GPTNeoXForCausalLM(hf_cfg).eval()
    cfg = Config(
        name="neox-seq", block_size=64, vocab_size=96, padded_vocab_size=96,
        n_layer=2, n_head=4, n_embd=64, rotary_percentage=1.0,
        parallel_residual=False, bias=True, _norm_class="LayerNorm",
        _mlp_class="GptNeoxMLP",
    )
    params = flat_to_params(_hf_to_flat_neox(hf.state_dict(), cfg), cfg, jnp.float32)
    with torch.no_grad():
        ref = hf(torch.from_numpy(tokens)).logits.numpy()
    ours, _ = gpt.forward(params, cfg, jnp.asarray(tokens, jnp.int32))
    np.testing.assert_allclose(np.asarray(ours), ref, atol=3e-4, rtol=1e-3)


def test_mqa_single_group_parity(tokens):
    """MQA (n_query_groups=1, the falcon-7b arrangement) against HF llama
    with num_key_value_heads=1."""
    from transformers import LlamaConfig, LlamaForCausalLM

    hf_cfg = LlamaConfig(
        vocab_size=96, hidden_size=64, num_attention_heads=8, num_key_value_heads=1,
        num_hidden_layers=2, intermediate_size=112, max_position_embeddings=64,
        rms_norm_eps=1e-5, attn_implementation="eager", tie_word_embeddings=False,
    )
    torch.manual_seed(2)
    hf = LlamaForCausalLM(hf_cfg).eval()
    cfg = Config(
        name="mqa-tiny", block_size=64, vocab_size=96, padded_vocab_size=96,
        n_layer=2, n_head=8, n_embd=64, n_query_groups=1, rotary_percentage=1.0,
        parallel_residual=False, bias=False, _norm_class="RMSNorm",
        _mlp_class="LLaMAMLP", intermediate_size=112, norm_eps=1e-5,
    )
    params = flat_to_params(_hf_to_flat_llama(hf.state_dict(), cfg), cfg, jnp.float32)
    with torch.no_grad():
        ref = hf(torch.from_numpy(tokens)).logits.numpy()
    ours, _ = gpt.forward(params, cfg, jnp.asarray(tokens, jnp.int32))
    np.testing.assert_allclose(np.asarray(ours), ref, atol=3e-4, rtol=1e-3)


def test_gemma_geglu_scale_embeddings(tokens):
    """Gemma semantics: sqrt(n_embd) embedding scaling, GeGLU MLP, RMSNorm
    with unit offset — verified against HF's GemmaForCausalLM."""
    from transformers import GemmaConfig, GemmaForCausalLM

    hf_cfg = GemmaConfig(
        vocab_size=96, hidden_size=64, num_attention_heads=8, num_key_value_heads=1,
        num_hidden_layers=2, intermediate_size=112, max_position_embeddings=64,
        rms_norm_eps=1e-5, head_dim=8, attn_implementation="eager",
        tie_word_embeddings=False, hidden_act="gelu", hidden_activation="gelu",
    )
    torch.manual_seed(3)
    hf = GemmaForCausalLM(hf_cfg).eval()
    cfg = Config(
        name="Gemma-tiny", block_size=64, vocab_size=96, padded_vocab_size=96,
        n_layer=2, n_head=8, n_embd=64, n_query_groups=1, rotary_percentage=1.0,
        parallel_residual=False, bias=False, _norm_class="RMSNorm",
        _mlp_class="GemmaMLP", intermediate_size=112, norm_eps=1e-5,
        scale_embeddings=True,
    )
    flat = _hf_to_flat_llama(hf.state_dict(), cfg)
    params = flat_to_params(flat, cfg, jnp.float32)
    with torch.no_grad():
        ref = hf(torch.from_numpy(tokens)).logits.numpy()
    ours, _ = gpt.forward(params, cfg, jnp.asarray(tokens, jnp.int32))
    np.testing.assert_allclose(np.asarray(ours), ref, atol=1e-3, rtol=1e-2)
