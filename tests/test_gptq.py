"""GPTQ error-compensated quantization (ops/gptq.py).

The reference has no GPTQ; BASELINE names gptq.int4 as an extension target.
These tests pin (a) format compatibility with the 4-bit serving path,
(b) the degenerate case H = I reproducing plain round-to-nearest, and
(c) the point of the algorithm: lower layer-output error than RTN on
correlated calibration inputs, at the kernel and whole-model level.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fastmax_tpu.ops import quant
from fastmax_tpu.ops.gptq import gptq_quantize_kernel, gptq_quantize_model, hessian
from fastmax_tpu.models.config import Config
from fastmax_tpu.models import gpt


def _correlated_inputs(n, d, seed=0):
    rng = np.random.default_rng(seed)
    base = rng.normal(size=(n, 8))
    mix = rng.normal(size=(8, d))
    return (base @ mix + 0.1 * rng.normal(size=(n, d))).astype(np.float32)


@pytest.mark.parametrize("kind", ["int4", "nf4"])
def test_gptq_identity_hessian_equals_rtn(kind):
    """H = I disables error propagation: GPTQ must reproduce plain RTN
    (same codes, same scales, same dequantized kernel)."""
    rng = np.random.default_rng(0)
    w = rng.normal(size=(128, 48)).astype(np.float32)
    rtn = quant.quantize_4bit(w, kind=kind)
    g = gptq_quantize_kernel(w, np.eye(128), kind=kind, percdamp=0.0)
    np.testing.assert_array_equal(np.asarray(g["q4"]), np.asarray(rtn["q4"]))
    np.testing.assert_allclose(np.asarray(g["absmax"]), np.asarray(rtn["absmax"]),
                               rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(quant.dequantize(g)), np.asarray(quant.dequantize(rtn)), rtol=1e-5
    )


def test_gptq_serves_through_quantized_matmul():
    """Output format is the standard packed 4-bit dict: the fused matmul,
    preload, and int8 re-representation paths all accept it."""
    rng = np.random.default_rng(1)
    w = rng.normal(size=(128, 32)).astype(np.float32)
    x = _correlated_inputs(64, 128, seed=2)
    g = gptq_quantize_kernel(w, hessian(x), kind="int4")
    y = quant.quantized_matmul(jnp.asarray(x), g)
    ref = x @ np.asarray(quant.dequantize(g))
    np.testing.assert_allclose(np.asarray(y), ref, atol=1e-3, rtol=1e-3)


@pytest.mark.parametrize("kind", ["int4", "nf4"])
def test_gptq_beats_rtn_on_correlated_inputs(kind):
    """The algorithm's reason to exist: ||X (W - W_q)|| strictly below RTN."""
    rng = np.random.default_rng(3)
    w = rng.normal(size=(256, 64)).astype(np.float32)
    x = _correlated_inputs(512, 256, seed=4)
    rtn_err = np.linalg.norm(x @ (w - np.asarray(quant.dequantize(
        quant.quantize_4bit(w, kind=kind), jnp.float32))))
    g = gptq_quantize_kernel(w, hessian(x), kind=kind)
    gptq_err = np.linalg.norm(x @ (w - np.asarray(quant.dequantize(g, jnp.float32))))
    assert gptq_err < 0.9 * rtn_err, (gptq_err, rtn_err)


def test_gptq_model_beats_rtn_and_serves():
    """Sequential whole-model GPTQ: quantized params run through the normal
    forward and track the dense logits more closely than RTN does."""
    cfg = Config(
        name="gptq-tiny", block_size=64, vocab_size=128, padded_vocab_size=128,
        n_layer=2, n_head=4, n_embd=64, n_query_groups=2, rotary_percentage=1.0,
        parallel_residual=False, bias=False, _norm_class="RMSNorm",
        _mlp_class="LLaMAMLP", intermediate_size=128,
    )
    params = gpt.init_params(cfg, jax.random.PRNGKey(0), jnp.float32)
    tokens = jnp.asarray(np.random.default_rng(5).integers(1, 128, (2, 48)), jnp.int32)

    dense, _ = gpt.forward(params, cfg, tokens)
    qp = gptq_quantize_model(params, cfg, tokens, kind="int4")
    gq, _ = gpt.forward(qp, cfg, tokens)
    rp = quant.quantize_model(params, "gptq.int4")
    gr, _ = gpt.forward(rp, cfg, tokens)

    err_gptq = float(jnp.mean(jnp.abs(gq - dense)))
    err_rtn = float(jnp.mean(jnp.abs(gr - dense)))
    assert np.isfinite(err_gptq)
    assert err_gptq < err_rtn, (err_gptq, err_rtn)
    # embeddings/lm_head stay dense (the bnb skip policy)
    assert "kernel" in qp["lm_head"]
    # every block linear is packed 4-bit, stacked on the layer axis
    assert qp["blocks"]["attn"]["attn"]["q4"].shape[0] == cfg.n_layer


def test_gptq_double_quant_roundtrip():
    rng = np.random.default_rng(6)
    w = rng.normal(size=(128, 32)).astype(np.float32)
    x = _correlated_inputs(64, 128, seed=7)
    g = gptq_quantize_kernel(w, hessian(x), kind="int4", double_quant=True)
    assert "absmax_q" in g and "absmax" not in g
    deq = np.asarray(quant.dequantize(g, jnp.float32))
    assert np.linalg.norm(deq - w) / np.linalg.norm(w) < 0.2


def test_gptq_model_gptneox_style():
    """GPTQ on the pythia block shape: parallel residual, biases, GptNeoxMLP
    — exercises the fc branch and bias carry-through."""
    cfg = Config(
        name="gptq-neox", block_size=64, vocab_size=128, padded_vocab_size=128,
        n_layer=2, n_head=4, n_embd=64, rotary_percentage=0.25,
        parallel_residual=True, bias=True, _norm_class="LayerNorm",
        _mlp_class="GptNeoxMLP", intermediate_size=256,
    )
    params = gpt.init_params(cfg, jax.random.PRNGKey(1), jnp.float32)
    tokens = jnp.asarray(np.random.default_rng(8).integers(1, 128, (2, 48)), jnp.int32)

    dense, _ = gpt.forward(params, cfg, tokens)
    qp = gptq_quantize_model(params, cfg, tokens, kind="nf4")
    gq, _ = gpt.forward(qp, cfg, tokens)
    rp = quant.quantize_model(params, "bnb.nf4")
    gr, _ = gpt.forward(rp, cfg, tokens)
    err_gptq = float(jnp.mean(jnp.abs(gq - dense)))
    err_rtn = float(jnp.mean(jnp.abs(gr - dense)))
    assert np.isfinite(err_gptq) and err_gptq < err_rtn, (err_gptq, err_rtn)
    # biases survive quantization
    assert "bias" in qp["blocks"]["attn"]["attn"]
