"""int8-quantized KV cache tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fastmax_tpu.models.config import Config
from fastmax_tpu.models import gpt
from fastmax_tpu.inference.engine import InferenceEngine


@pytest.fixture(scope="module")
def model():
    cfg = Config(
        name="kvq-tiny", block_size=96, vocab_size=96, padded_vocab_size=96,
        n_layer=2, n_head=4, n_embd=64, n_query_groups=2, rotary_percentage=1.0,
        parallel_residual=False, bias=False, _norm_class="RMSNorm",
        _mlp_class="LLaMAMLP", intermediate_size=128,
    )
    return cfg, gpt.init_params(cfg, jax.random.PRNGKey(0))


def test_int8_cache_shapes_and_memory(model):
    cfg, _ = model
    c8 = gpt.init_kv_cache(cfg, 1, 96, jnp.int8)
    cf = gpt.init_kv_cache(cfg, 1, 96, jnp.float32)
    assert c8["k"].dtype == jnp.int8 and "k_scale" in c8
    bytes8 = sum(x.size * x.dtype.itemsize for x in jax.tree.leaves(c8))
    bytesf = sum(x.size * x.dtype.itemsize for x in jax.tree.leaves(cf))
    assert bytes8 < 0.35 * bytesf  # ~4x smaller than f32 (2x vs bf16)


def test_int8_cache_decode_close_to_fp(model):
    cfg, params = model
    idx = jax.random.randint(jax.random.PRNGKey(1), (1, 14), 0, 96)
    full, _ = gpt.forward(params, cfg, idx)

    cache = gpt.init_kv_cache(cfg, 1, 96, jnp.int8)
    pre = 8
    lp, cache = gpt.forward(params, cfg, idx[:, :pre], input_pos=0, kv_cache=cache)
    logits = [lp]
    for i in range(pre, 14):
        li, cache = gpt.forward(params, cfg, idx[:, i:i+1], input_pos=i, kv_cache=cache)
        logits.append(li)
    ours = np.concatenate([np.asarray(l) for l in logits], axis=1)
    ref = np.asarray(full)
    # int8 KV introduces ~1% noise; rankings must survive
    assert np.abs(ours - ref).max() < 0.15 * max(np.abs(ref).max(), 1.0)
    top_ref = ref.argmax(-1)
    top_ours = ours.argmax(-1)
    assert (top_ref == top_ours).mean() > 0.85


def test_engine_with_int8_cache_generates(model):
    cfg, params = model
    eng_fp = InferenceEngine(cfg, params, max_seq_length=96, batch_size=1)
    eng_q8 = InferenceEngine(cfg, params, max_seq_length=96, batch_size=1,
                             cache_dtype=jnp.int8)
    prompt = jnp.arange(1, 11, dtype=jnp.int32)
    out_fp = eng_fp.generate(prompt, 30, temperature=0.0, key=jax.random.PRNGKey(2))
    out_q8 = eng_q8.generate(prompt, 30, temperature=0.0, key=jax.random.PRNGKey(2))
    assert out_q8.shape == out_fp.shape
    # greedy paths stay identical for at least the first few tokens
    a, b = np.asarray(out_fp[0]), np.asarray(out_q8[0])
    assert np.array_equal(a[:14], b[:14])
