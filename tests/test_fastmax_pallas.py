"""Pallas fastmax kernel vs the lax.scan formulation (interpret mode)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fastmax_tpu.ops.fastmax import fastmax
from fastmax_tpu.ops.fastmax_pallas import fastmax_pallas


@pytest.mark.parametrize("p", [1, 2])
def test_pallas_matches_scan(p):
    key = jax.random.PRNGKey(0)
    b, h, n, d = 2, 2, 256, 32
    q, k, v = (jax.random.normal(kk, (b, h, n, d), jnp.float32)
               for kk in jax.random.split(key, 3))
    ref = fastmax(q, k, v, mask=True, p=p, chunk=128)
    out = fastmax_pallas(q, k, v, p=p, chunk=128, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-2, rtol=1e-2)


def test_pallas_multi_head_state_isolation():
    """Each (batch, head) scans its own state — heads must not leak."""
    key = jax.random.PRNGKey(1)
    b, h, n, d = 1, 3, 128, 16
    q, k, v = (jax.random.normal(kk, (b, h, n, d), jnp.float32)
               for kk in jax.random.split(key, 3))
    full = fastmax_pallas(q, k, v, p=1, chunk=64, interpret=True)
    # head 1 alone must equal head 1 of the batched run
    solo = fastmax_pallas(q[:, 1:2], k[:, 1:2], v[:, 1:2], p=1, chunk=64, interpret=True)
    np.testing.assert_allclose(np.asarray(full[:, 1:2]), np.asarray(solo), atol=1e-4)
