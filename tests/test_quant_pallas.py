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
