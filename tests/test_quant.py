"""Quantization tests: round-trip accuracy, format invariants, model-level
quantize + generate (the role of the reference's bnb integration tests,
tests/test_lora.py:396-465 — here runnable on CPU, no GPU gate needed)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fastmax_tpu.ops import quant
from fastmax_tpu.ops.linear import linear


@pytest.fixture
def kernel():
    rng = np.random.default_rng(0)
    return (rng.normal(size=(256, 96)) * 0.04).astype(np.float32)


@pytest.mark.parametrize("kind", ["nf4", "fp4", "int4"])
def test_4bit_roundtrip_error_bounded(kernel, kind):
    q = quant.quantize_4bit(kernel, kind=kind)
    deq = np.asarray(quant.dequantize(q))
    assert deq.shape == kernel.shape
    # per-block absmax scaling bounds the error by absmax * max code gap
    err = np.abs(deq - kernel)
    blocks = kernel.reshape(-1, quant.DEFAULT_BLOCK, kernel.shape[1])
    absmax = np.abs(blocks).max(axis=1)
    code = np.sort(quant.CODEBOOKS[kind])
    # worst case: half the largest inter-code gap, or clipping at the code
    # range edge (int4's max level is 7/8, so +absmax values clip by 1/8)
    worst = max(np.diff(code).max() / 2, 1.0 - code.max(), abs(-1.0 - code.min()))
    bound = (absmax * worst + 1e-7).repeat(quant.DEFAULT_BLOCK, axis=0).reshape(err.shape)
    assert (err <= bound).all()


def test_nf4_exact_at_codebook_points():
    """Values that ARE codebook points (times the block absmax) survive
    quantization exactly — a bit-fidelity check on the codebook."""
    code = quant.NF4_CODE
    block = np.tile(code, 4)  # 64 values, absmax 1.0
    kernel = np.stack([block, block * 0.5], axis=1)  # (64, 2)
    q = quant.quantize_4bit(kernel, kind="nf4")
    deq = np.asarray(quant.dequantize(q))
    np.testing.assert_allclose(deq, kernel, atol=1e-7)


def test_double_quant_close_to_single(kernel):
    q = quant.quantize_4bit(kernel, kind="nf4", double_quant=False)
    qdq = quant.quantize_4bit(kernel, kind="nf4", double_quant=True)
    a = np.asarray(quant.dequantize(q))
    b = np.asarray(quant.dequantize(qdq))
    # dq adds at most ~1% relative error on the scales
    assert np.abs(a - b).max() <= np.abs(kernel).max() * 0.02
    # and the dq payload is smaller than the fp32 scales it replaces
    assert qdq["absmax_q"].dtype == jnp.int8


def test_int8_roundtrip(kernel):
    q = quant.quantize_int8(kernel)
    deq = np.asarray(quant.dequantize(q))
    scale = np.abs(kernel).max(axis=0) / 127.0
    assert (np.abs(deq - kernel) <= scale[None, :] * 0.51 + 1e-8).all()


@pytest.mark.parametrize("mode", ["bnb.nf4", "bnb.nf4-dq", "bnb.fp4", "bnb.int8", "gptq.int4"])
def test_quantized_linear_matmul(kernel, mode):
    p = quant.quantize_linear_params({"kernel": jnp.asarray(kernel)}, mode)
    x = jnp.asarray(np.random.default_rng(1).normal(size=(3, 256)), jnp.float32)
    y = linear(p, x)
    y_ref = x @ kernel
    rel = np.abs(np.asarray(y) - np.asarray(y_ref)).max() / np.abs(y_ref).max()
    assert rel < 0.2  # 4-bit noise bound on random gaussian weights
    assert y.shape == (3, 96)


def test_quantize_model_and_generate():
    """Quantize a whole model (stacked layer axis) and run the engine."""
    from fastmax_tpu.models.config import Config
    from fastmax_tpu.models import gpt
    from fastmax_tpu.inference.engine import InferenceEngine

    cfg = Config(
        name="t", block_size=64, vocab_size=96, padded_vocab_size=96, n_layer=2,
        n_head=4, n_embd=64, rotary_percentage=1.0, _norm_class="RMSNorm",
        _mlp_class="LLaMAMLP", intermediate_size=128, bias=False, parallel_residual=False,
    )
    params = gpt.init_params(cfg, jax.random.PRNGKey(0))
    qparams = quant.quantize_model(params, "bnb.nf4")
    # fp and quantized logits agree roughly
    idx = jax.random.randint(jax.random.PRNGKey(1), (1, 8), 0, 96)
    lf, _ = gpt.forward(params, cfg, idx)
    lq, _ = gpt.forward(qparams, cfg, idx)
    assert np.isfinite(np.asarray(lq)).all()
    # correlation between fp32 and nf4 logits should be strong
    a, b = np.asarray(lf).ravel(), np.asarray(lq).ravel()
    corr = np.corrcoef(a, b)[0, 1]
    assert corr > 0.98, corr

    eng = InferenceEngine(cfg, qparams, max_seq_length=64, batch_size=1)
    out = eng.generate(jnp.arange(1, 9, dtype=jnp.int32), 24, temperature=0.0,
                       key=jax.random.PRNGKey(2))
    assert out.shape[1] == 24


def test_unknown_mode_rejected(kernel):
    with pytest.raises(ValueError, match="unknown quantization mode"):
        quant.quantize_linear_params({"kernel": jnp.asarray(kernel)}, "bnb.bogus")


def test_int8_matmul_fused_matches_dequant(kernel):
    """The fused int8 matmul (convert-in-dot + scale-on-output) must equal
    the reference dequant->matmul formulation."""
    q = quant.quantize_int8(kernel)
    x = jnp.asarray(np.random.default_rng(1).normal(size=(3, kernel.shape[0])), jnp.float32)
    ref = jnp.einsum("bi,io->bo", x, quant.dequantize(q, jnp.float32))
    got = quant.int8_matmul(x, q["q8"], q["scale8"])
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-5, atol=2e-5)


def test_requantize_int8_model_parity():
    """int8 serving of an NF4 checkpoint: same greedy tokens on a tiny
    model, bounded logits shift, stacked (n_layer,) axes handled."""
    from fastmax_tpu.models.config import Config
    from fastmax_tpu.models import gpt
    from fastmax_tpu.inference.engine import InferenceEngine

    cfg = Config(block_size=64, vocab_size=128, padded_vocab_size=128,
                 n_layer=2, n_head=4, n_embd=64, rotary_percentage=1.0)
    params = gpt.init_params(cfg, jax.random.PRNGKey(0), jnp.float32)
    q = quant.quantize_model(params, "bnb.nf4")
    r = quant.requantize_int8_model(q)

    # stacked block linears became stacked int8
    attn = r["blocks"]["attn"]["attn"]
    assert attn["q8"].dtype == jnp.int8 and attn["q8"].ndim == 3
    assert attn["scale8"].shape == attn["q8"].shape[:1] + attn["q8"].shape[-1:]

    prompt = jnp.asarray(np.arange(1, 17), jnp.int32)
    outs = {}
    for mode in ("preload", "preload_int8"):
        eng = InferenceEngine(cfg, q, max_seq_length=64, batch_size=1, weights_mode=mode)
        outs[mode] = np.asarray(
            eng.generate(prompt, 32, temperature=0.0, key=jax.random.PRNGKey(1))
        )
        cache = eng.new_cache()
        lg, _ = eng._prefill(eng.params, prompt[None], cache, 0)
        outs[mode + "_logits"] = np.asarray(lg)
    assert np.array_equal(outs["preload"], outs["preload_int8"])
    rel = np.abs(outs["preload_logits"] - outs["preload_int8_logits"]).max() / (
        np.abs(outs["preload_logits"]).max() + 1e-9
    )
    assert rel < 0.05


def test_auto_mode_keeps_int8_native():
    """auto weights mode must NOT widen an int8 model to the activation
    dtype — native int8 through the fused matmul is the fast path."""
    from fastmax_tpu.models.config import Config
    from fastmax_tpu.models import gpt
    from fastmax_tpu.inference.engine import InferenceEngine

    cfg = Config(block_size=32, vocab_size=64, padded_vocab_size=64,
                 n_layer=1, n_head=2, n_embd=32, rotary_percentage=1.0)
    params = gpt.init_params(cfg, jax.random.PRNGKey(0), jnp.float32)
    q8m = quant.quantize_model(params, "bnb.int8")
    resolved = InferenceEngine._resolve_weights(q8m, "auto")
    assert "q8" in resolved["blocks"]["attn"]["attn"]


def test_auto_mode_keeps_tiled_int4_native():
    """auto must NOT re-represent tiled-int4 weights as int8: int4 is the
    faster decode representation (decode_table_r04) and an int8 re-rep
    would stack a second quantization error (r04: the 7B disk-weights e2e
    initially lost 23% throughput to exactly this)."""
    from fastmax_tpu.models.config import Config
    from fastmax_tpu.models import gpt
    from fastmax_tpu.inference.engine import InferenceEngine

    cfg = Config(block_size=32, vocab_size=64, padded_vocab_size=64,
                 n_layer=1, n_head=2, n_embd=64, rotary_percentage=1.0)
    params = gpt.init_params(cfg, jax.random.PRNGKey(0), jnp.float32)
    for scheme, key in (("rank1", "q4r1"), ("block", "q4b")):
        m = quant.requantize_int4_model(
            quant.quantize_model(params, "bnb.nf4"), scheme)
        resolved = InferenceEngine._resolve_weights(m, "auto")
        assert key in resolved["blocks"]["attn"]["attn"], scheme


def test_fused_gate_up_exact():
    """The fc_12 (gate|up) fused inference layout is numerically exact for
    dense, int8, and packed-4-bit weights, and skipped for double-quant."""
    from fastmax_tpu.models.config import Config
    from fastmax_tpu.models import gpt
    from fastmax_tpu.inference.engine import InferenceEngine, _fuse_mlp_gates

    cfg = Config(block_size=64, vocab_size=128, padded_vocab_size=128,
                 n_layer=2, n_head=4, n_embd=64, rotary_percentage=1.0,
                 _mlp_class="LLaMAMLP", intermediate_size=128,
                 _norm_class="RMSNorm", bias=False, parallel_residual=False)
    params = gpt.init_params(cfg, jax.random.PRNGKey(0), jnp.float32)
    prompt = jnp.asarray(np.arange(1, 17), jnp.int32)[None]

    fused = _fuse_mlp_gates(params)
    assert "fc_12" in fused["blocks"]["mlp"]
    l0, _ = gpt.forward(params, cfg, prompt)
    l1, _ = gpt.forward(fused, cfg, prompt)
    assert float(jnp.abs(l0 - l1).max()) == 0.0

    q = quant.quantize_model(params, "bnb.nf4")
    r = quant.requantize_int8_model(q)
    lr0, _ = gpt.forward(r, cfg, prompt)
    lr1, _ = gpt.forward(_fuse_mlp_gates(r), cfg, prompt)
    assert float(jnp.abs(lr0 - lr1).max()) == 0.0

    lq0, _ = gpt.forward(q, cfg, prompt)
    lq1, _ = gpt.forward(_fuse_mlp_gates(q), cfg, prompt)
    assert float(jnp.abs(lq0 - lq1).max()) == 0.0

    qdq = quant.quantize_model(params, "bnb.nf4-dq")
    eng = InferenceEngine(cfg, qdq, max_seq_length=64, batch_size=1,
                          weights_mode="quantized")
    assert "fc_12" not in eng.params["blocks"]["mlp"]
