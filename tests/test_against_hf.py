"""Numerical-parity tests against HuggingFace transformers.

The single most valuable test class from the reference's strategy
(SURVEY.md §4.1; reference tests/test_model.py:42-618): build a tiny
random-weight HF model, convert its checkpoint through our converter, and
assert logits match. Runs fully offline — models are instantiated from
config, never downloaded.
"""

import json
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from fastmax_tpu.models.config import Config
from fastmax_tpu.models import gpt
from fastmax_tpu.models.params import flat_to_params, params_to_flat
from fastmax_tpu.scripts.convert_hf_checkpoint import (
    interleave_qkv,
    split_qkv,
    iter_hf_tensors,
    neox_weight_map,
    llama_weight_map,
)


def _hf_to_flat_neox(hf_sd, cfg):
    flat = {}
    wm = neox_weight_map()
    for name, t in hf_sd.items():
        parts = name.split(".")
        if len(parts) > 2 and parts[1] == "layers":
            layer = parts[2]
            parts[2] = "{}"
            key = ".".join(parts)
            to = wm.get(key)
            if to is None:
                continue
            flat[to.format(layer)] = t.float().numpy()
        else:
            to = wm.get(name)
            if to is not None:
                flat[to] = t.float().numpy()
    return flat


def _hf_to_flat_llama(hf_sd, cfg):
    import re

    flat = {}
    wm = llama_weight_map(cfg)
    trio = {}
    for name, t in hf_sd.items():
        arr = t.float().numpy()
        parts = name.split(".")
        if len(parts) > 2 and parts[1] == "layers":
            layer = int(parts[2])
            parts[2] = "{}"
            key = ".".join(parts)
            if any(p in name for p in ("q_proj", "k_proj", "v_proj")):
                trio.setdefault(layer, {})[parts[-2][0]] = arr
                continue
            expert = None
            m = re.search(r"experts\.(\d+)\.", key)
            if m:
                expert = int(m.group(1))
                key = key.replace(f"experts.{expert}.", "experts.{e}.")
            to = wm.get(key)
            if to is None:
                continue
            flat[to.format(layer, e=expert)] = arr
        else:
            to = wm.get(name)
            if to is not None:
                flat[to] = arr
    for layer, qkv in trio.items():
        flat[f"transformer.h.{layer}.attn.attn.weight"] = interleave_qkv(
            qkv["q"], qkv["k"], qkv["v"], cfg
        )
    if "lm_head.weight" not in flat:
        flat["lm_head.weight"] = flat["transformer.wte.weight"]
    return flat


@pytest.fixture(scope="module")
def token_batch():
    rng = np.random.default_rng(0)
    return rng.integers(0, 90, size=(2, 17), dtype=np.int64)


def test_gpt_neox_parity(token_batch):
    """Pythia-style: parallel residual, LayerNorm, partial rope, biases."""
    from transformers import GPTNeoXConfig, GPTNeoXForCausalLM

    hf_cfg = GPTNeoXConfig(
        vocab_size=96,
        hidden_size=64,
        num_attention_heads=4,
        num_hidden_layers=2,
        intermediate_size=256,
        rotary_pct=0.25,
        max_position_embeddings=64,
        use_parallel_residual=True,
        attn_implementation="eager",
    )
    torch.manual_seed(0)
    hf_model = GPTNeoXForCausalLM(hf_cfg).eval()

    cfg = Config(
        name="neox-tiny",
        block_size=64,
        vocab_size=96,
        padded_vocab_size=96,
        n_layer=2,
        n_head=4,
        n_embd=64,
        rotary_percentage=0.25,
        parallel_residual=True,
        bias=True,
        _norm_class="LayerNorm",
        _mlp_class="GptNeoxMLP",
    )
    flat = _hf_to_flat_neox(hf_model.state_dict(), cfg)
    params = flat_to_params(flat, cfg, jnp.float32)

    with torch.no_grad():
        ref = hf_model(torch.from_numpy(token_batch)).logits.numpy()
    ours, _ = gpt.forward(params, cfg, jnp.asarray(token_batch, jnp.int32))
    np.testing.assert_allclose(np.asarray(ours), ref, atol=3e-4, rtol=1e-3)


@pytest.mark.parametrize("n_kv_heads", [8, 2, 1])
def test_llama_gqa_parity(token_batch, n_kv_heads):
    """Llama-2 style: RMSNorm, SwiGLU, full rope, GQA/MQA, no biases."""
    from transformers import LlamaConfig, LlamaForCausalLM

    hf_cfg = LlamaConfig(
        vocab_size=96,
        hidden_size=64,
        num_attention_heads=8,
        num_key_value_heads=n_kv_heads,
        num_hidden_layers=2,
        intermediate_size=112,
        max_position_embeddings=64,
        rms_norm_eps=1e-5,
        attn_implementation="eager",
        tie_word_embeddings=False,
    )
    torch.manual_seed(1)
    hf_model = LlamaForCausalLM(hf_cfg).eval()

    cfg = Config(
        name="llama-tiny",
        block_size=64,
        vocab_size=96,
        padded_vocab_size=96,
        n_layer=2,
        n_head=8,
        n_embd=64,
        n_query_groups=n_kv_heads,
        rotary_percentage=1.0,
        parallel_residual=False,
        bias=False,
        _norm_class="RMSNorm",
        _mlp_class="LLaMAMLP",
        intermediate_size=112,
        norm_eps=1e-5,
    )
    flat = _hf_to_flat_llama(hf_model.state_dict(), cfg)
    params = flat_to_params(flat, cfg, jnp.float32)

    with torch.no_grad():
        ref = hf_model(torch.from_numpy(token_batch)).logits.numpy()
    ours, _ = gpt.forward(params, cfg, jnp.asarray(token_batch, jnp.int32))
    np.testing.assert_allclose(np.asarray(ours), ref, atol=3e-4, rtol=1e-3)


def test_llama_parity_through_cache_decode(token_batch):
    """End-to-end: HF logits vs our prefill+decode path."""
    from transformers import LlamaConfig, LlamaForCausalLM

    hf_cfg = LlamaConfig(
        vocab_size=96, hidden_size=64, num_attention_heads=8, num_key_value_heads=2,
        num_hidden_layers=2, intermediate_size=112, max_position_embeddings=64,
        rms_norm_eps=1e-5, attn_implementation="eager", tie_word_embeddings=False,
    )
    torch.manual_seed(2)
    hf_model = LlamaForCausalLM(hf_cfg).eval()
    cfg = Config(
        name="llama-tiny", block_size=64, vocab_size=96, padded_vocab_size=96,
        n_layer=2, n_head=8, n_embd=64, n_query_groups=2, rotary_percentage=1.0,
        parallel_residual=False, bias=False, _norm_class="RMSNorm",
        _mlp_class="LLaMAMLP", intermediate_size=112,
    )
    params = flat_to_params(_hf_to_flat_llama(hf_model.state_dict(), cfg), cfg, jnp.float32)

    toks = token_batch[:1]
    with torch.no_grad():
        ref = hf_model(torch.from_numpy(toks)).logits.numpy()

    cache = gpt.init_kv_cache(cfg, 1, cfg.block_size)
    pre = 9
    lp, cache = gpt.forward(params, cfg, jnp.asarray(toks[:, :pre], jnp.int32), input_pos=0, kv_cache=cache)
    logits = [lp]
    for i in range(pre, toks.shape[1]):
        li, cache = gpt.forward(params, cfg, jnp.asarray(toks[:, i:i+1], jnp.int32), input_pos=i, kv_cache=cache)
        logits.append(li)
    ours = np.concatenate([np.asarray(l) for l in logits], axis=1)
    np.testing.assert_allclose(ours, ref, atol=5e-4, rtol=1e-3)


def test_qkv_interleave_roundtrip():
    cfg = Config(name="t", n_layer=1, n_head=8, n_embd=64, n_query_groups=2, vocab_size=32, padded_vocab_size=32)
    rng = np.random.default_rng(0)
    q = rng.normal(size=(8 * 8, 64)).astype(np.float32)
    k = rng.normal(size=(2 * 8, 64)).astype(np.float32)
    v = rng.normal(size=(2 * 8, 64)).astype(np.float32)
    fused = interleave_qkv(q, k, v, cfg)
    q2, k2, v2 = split_qkv(fused, cfg)
    np.testing.assert_array_equal(q, q2)
    np.testing.assert_array_equal(k, k2)
    np.testing.assert_array_equal(v, v2)


def test_params_flat_roundtrip():
    cfg = Config(
        name="t", block_size=32, vocab_size=64, padded_vocab_size=64, n_layer=3,
        n_head=4, n_embd=32, _norm_class="RMSNorm", _mlp_class="LLaMAMLP",
        intermediate_size=48, bias=False, parallel_residual=False,
    )
    params = gpt.init_params(cfg, jax.random.PRNGKey(0))
    flat = params_to_flat(params, cfg)
    params2 = flat_to_params(flat, cfg, jnp.float32)
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        params, params2,
    )


def test_convert_hf_checkpoint_end_to_end(tmp_path, token_batch):
    """Full converter flow: HF save_pretrained dir -> native dir -> engine."""
    from transformers import LlamaConfig, LlamaForCausalLM

    from fastmax_tpu.scripts import convert_hf_checkpoint as conv
    from fastmax_tpu.utils.checkpoint import load_model_params

    hf_cfg = LlamaConfig(
        vocab_size=96, hidden_size=64, num_attention_heads=8, num_key_value_heads=2,
        num_hidden_layers=2, intermediate_size=112, max_position_embeddings=64,
        rms_norm_eps=1e-5, attn_implementation="eager", tie_word_embeddings=False,
    )
    torch.manual_seed(3)
    hf_model = LlamaForCausalLM(hf_cfg).eval()
    src = tmp_path / "hf"
    hf_model.save_pretrained(src)

    # register a matching architecture under the dir name
    from fastmax_tpu.models.config import registry

    registry()["hf-tiny-llama"] = dict(
        name="hf-tiny-llama", block_size=64, vocab_size=96, padded_vocab_size=96,
        n_layer=2, n_head=8, n_embd=64, n_query_groups=2, rotary_percentage=1.0,
        parallel_residual=False, bias=False, _norm_class="RMSNorm",
        _mlp_class="LLaMAMLP", intermediate_size=112,
    )
    out = tmp_path / "native"
    conv.convert_hf_checkpoint(src, model_name="hf-tiny-llama", out_dir=out)
    assert (out / "lit_config.json").is_file()
    cfg, params = load_model_params(out)

    with torch.no_grad():
        ref = hf_model(torch.from_numpy(token_batch)).logits.numpy()
    ours, _ = gpt.forward(params, cfg, jnp.asarray(token_batch, jnp.int32))
    np.testing.assert_allclose(np.asarray(ours), ref, atol=3e-4, rtol=1e-3)
