"""Pallas fused dequant-matmul kernel vs the XLA reference path.

Runs in interpreter mode on CPU (the Mosaic compile path is validated on
real TPU by bench.py / the verify drive)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fastmax_tpu.ops import quant
from fastmax_tpu.ops.quant_pallas import nf4_matmul, pallas_eligible, TILE_K, TILE_N


@pytest.mark.parametrize("kind", ["nf4", "fp4"])
@pytest.mark.parametrize("m", [1, 8])
def test_fused_matches_xla_dequant(kind, m):
    k, n = TILE_K, TILE_N
    rng = np.random.default_rng(0)
    kernel = (rng.normal(size=(k, n)) * 0.05).astype(np.float32)
    x = jnp.asarray(rng.normal(size=(m, k)), jnp.float32)
    p = quant.quantize_4bit(kernel, kind=kind)
    ref = quant.quantized_matmul(x, p)
    out = nf4_matmul(x, p["q4"], p["absmax"], p["code"], interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-4, rtol=1e-4)


def test_fused_multi_tile():
    k, n = 2 * TILE_K, 2 * TILE_N
    rng = np.random.default_rng(1)
    kernel = (rng.normal(size=(k, n)) * 0.05).astype(np.float32)
    x = jnp.asarray(rng.normal(size=(4, k)), jnp.float32)
    p = quant.quantize_4bit(kernel, kind="nf4")
    ref = quant.quantized_matmul(x, p)
    out = nf4_matmul(x, p["q4"], p["absmax"], p["code"], interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=5e-4, rtol=1e-4)


def test_eligibility():
    rng = np.random.default_rng(0)
    p = quant.quantize_4bit((rng.normal(size=(TILE_K, TILE_N)) * 0.1).astype(np.float32))
    assert pallas_eligible(p, TILE_K, TILE_N)
    p2 = quant.quantize_4bit((rng.normal(size=(128, 96)) * 0.1).astype(np.float32))
    assert not pallas_eligible(p2, 128, 96)


# ---------------------------------------------------- tiled linear-int4 path

from fastmax_tpu.ops.quant_pallas import int4_matmul_rank1, int4_matmul_block


@pytest.mark.parametrize("scheme", ["rank1", "block"])
def test_quantize_int4_tiled_roundtrip(scheme):
    rng = np.random.default_rng(0)
    kernel = (rng.normal(size=(512, 1024)) * 0.05).astype(np.float32)
    p = quant.quantize_int4_tiled(kernel, scheme)
    deq = np.asarray(quant.dequantize(p))
    assert deq.shape == kernel.shape
    # step = scale/8; round error <= step/2, and +scale clips to level 7
    # (symmetric int4), so worst error <= scale/8
    blocks = kernel.reshape(-1, quant.DEFAULT_BLOCK, kernel.shape[1])
    absmax = np.abs(blocks).max(axis=1)
    err = np.abs(deq - kernel).reshape(blocks.shape)
    if scheme == "block":
        bound = absmax[:, None, :] / 8 + 1e-6
    else:
        u, v = quant.rank1_envelope(absmax)
        bound = (u[:, None] * v[None, :])[:, None, :] / 8 + 1e-6
    assert (err <= bound).all()


@pytest.mark.parametrize("scheme", ["rank1", "block"])
@pytest.mark.parametrize("m", [1, 4])
def test_int4_tiled_matmul_matches_dequant(scheme, m):
    rng = np.random.default_rng(1)
    kernel = (rng.normal(size=(512, 1024)) * 0.05).astype(np.float32)
    p = quant.quantize_int4_tiled(kernel, scheme)
    x = jnp.asarray(rng.normal(size=(m, 512)), jnp.float32)
    ref = jnp.einsum("mk,kn->mn", x, quant.dequantize(p, jnp.float32))
    fn = int4_matmul_rank1 if scheme == "rank1" else int4_matmul_block
    out = fn(x, p, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-4, rtol=2e-3)


@pytest.mark.parametrize("scheme", ["rank1", "block"])
def test_int4_tiled_odd_shapes_padded(scheme):
    """k not a multiple of 512, n not a multiple of 1024 -> zero-padding."""
    rng = np.random.default_rng(2)
    k, n = 192, 1100
    kernel = (rng.normal(size=(k, n)) * 0.05).astype(np.float32)
    p = quant.quantize_int4_tiled(kernel, scheme)
    deq = np.asarray(quant.dequantize(p))
    assert deq.shape == (k, n)
    x = jnp.asarray(rng.normal(size=(3, k)), jnp.float32)
    ref = jnp.einsum("mk,kn->mn", x, quant.dequantize(p, jnp.float32))
    fn = int4_matmul_rank1 if scheme == "rank1" else int4_matmul_block
    out = fn(x, p, interpret=True)
    assert out.shape == (3, n)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-4, rtol=2e-3)


def test_int4_large_m_falls_back_to_dense():
    """Prefill-size m routes through the XLA dequant path (same numbers)."""
    rng = np.random.default_rng(3)
    kernel = (rng.normal(size=(128, 1024)) * 0.05).astype(np.float32)
    p = quant.quantize_int4_tiled(kernel, "rank1")
    x = jnp.asarray(rng.normal(size=(200, 128)), jnp.float32)
    ref = jnp.einsum("mk,kn->mn", x, quant.dequantize(p, jnp.float32))
    out = int4_matmul_rank1(x, p, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-3, rtol=2e-3)


def test_requantize_int4_model_and_decode_parity():
    """NF4 model -> int4 serving rerep: engine decode stays close to the
    bit-exact quantized path (greedy tokens on a tiny model)."""
    from fastmax_tpu.models.config import Config
    from fastmax_tpu.models import gpt
    from fastmax_tpu.inference.engine import InferenceEngine

    cfg = Config(block_size=64, vocab_size=128, padded_vocab_size=128,
                 n_layer=2, n_head=2, n_embd=128, n_query_groups=2,
                 intermediate_size=256, _norm_class="RMSNorm", _mlp_class="LLaMAMLP",
                 bias=False)
    params = gpt.init_params(cfg, jax.random.PRNGKey(0), jnp.float32)
    q = quant.quantize_model(params, "bnb.nf4")
    r = quant.requantize_int4_model(q, "rank1")
    names = {str(p[-1]) for p, _ in jax.tree_util.tree_flatten_with_path(r)[0]}
    assert any("q4r1" in s for s in names)
    x = jnp.asarray(np.random.default_rng(0).integers(1, 128, (1, 8)), jnp.int32)
    logits_q, _ = gpt.forward(q, cfg, x)
    logits_r, _ = gpt.forward(r, cfg, x)
    # int4-rerep logits track the NF4 logits loosely (tiny random model)
    corr = np.corrcoef(np.asarray(logits_q).ravel(), np.asarray(logits_r).ravel())[0, 1]
    assert corr > 0.95


def test_int4_rank1_stacked_matches_per_layer():
    """The stacked rank-1 kernel must reproduce the per-layer kernel for
    every layer index (scalar-prefetched index maps read the stack)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from fastmax_tpu.ops.quant_pallas import (
        int4_matmul_rank1,
        int4_matmul_rank1_stacked,
        pack_int4_tiled,
    )

    rng = np.random.default_rng(0)
    k, n, L = 512, 1024, 3
    layers = []
    for l in range(L):
        codes = rng.integers(-8, 8, size=(k, n), dtype=np.int64)
        layers.append({
            "q4r1": pack_int4_tiled(codes),
            "u4": rng.uniform(0.5, 2.0, (k,)).astype(np.float32),
            "v4": rng.uniform(0.5, 2.0, (n,)).astype(np.float32),
        })
    stacked = {key: jnp.asarray(np.stack([p[key] for p in layers]))
               for key in ("q4r1", "u4", "v4")}
    x = jnp.asarray(rng.standard_normal((2, k)), jnp.float32)
    for l in range(L):
        per = {key: jnp.asarray(layers[l][key]) for key in layers[l]}
        ref = np.asarray(int4_matmul_rank1(x, per, interpret=True), np.float32)
        got = np.asarray(
            int4_matmul_rank1_stacked(x, stacked, jnp.int32(l), interpret=True),
            np.float32)
        np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5,
                                   err_msg=f"layer {l}")
