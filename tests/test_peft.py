"""PEFT tests: LoRA and adapter v1/v2 (the reference's test_lora.py /
test_adapter.py coverage, functional-style)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from fastmax_tpu.models.config import Config
from fastmax_tpu.models import gpt, lora, adapter
from fastmax_tpu.ops import quant


def cfg_small(**kw):
    d = dict(
        name="peft-test", block_size=64, vocab_size=96, padded_vocab_size=96,
        n_layer=2, n_head=4, n_embd=64, n_query_groups=2, rotary_percentage=1.0,
        parallel_residual=False, bias=False, _norm_class="RMSNorm",
        _mlp_class="LLaMAMLP", intermediate_size=128,
    )
    d.update(kw)
    return Config(**d)


@pytest.fixture
def base(scope="module"):
    cfg = cfg_small()
    params = gpt.init_params(cfg, jax.random.PRNGKey(0))
    idx = jax.random.randint(jax.random.PRNGKey(1), (2, 12), 0, 96)
    return cfg, params, idx


def test_lora_init_is_identity(base):
    """B = 0 at init -> output identical to base model (ref lora semantics)."""
    cfg, params, idx = base
    ref, _ = gpt.forward(params, cfg, idx)
    lcfg = lora.LoRAConfig(r=4, alpha=8, query=True, value=True, projection=True, mlp=True, head=True)
    lp = lora.add_lora_params(params, cfg, lcfg, jax.random.PRNGKey(2))
    out, _ = gpt.forward(lp, cfg, idx)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)


def test_lora_qkv_mask_restricts_updates(base):
    """With only `query` enabled, perturbing lora_B changes logits, but the
    delta respects the fused-QKV mask: key/value projections see no delta."""
    cfg, params, idx = base
    lcfg = lora.LoRAConfig(r=4, alpha=8, query=True, key=False, value=False)
    lp = lora.add_lora_params(params, cfg, lcfg, jax.random.PRNGKey(2))
    # nonzero B
    lp["blocks"]["attn"]["attn"]["lora_B"] = (
        jnp.ones_like(lp["blocks"]["attn"]["attn"]["lora_B"]) * 0.1
    )
    mask = lp["blocks"]["attn"]["attn"]["lora_mask"]
    q_per_kv = cfg.n_head // cfg.n_query_groups
    hs = cfg.head_size
    expected = np.tile(
        np.concatenate([np.ones(q_per_kv * hs), np.zeros(2 * hs)]), cfg.n_query_groups
    )
    np.testing.assert_array_equal(np.asarray(mask[0]), expected)
    out, _ = gpt.forward(lp, cfg, idx)
    ref, _ = gpt.forward(params, cfg, idx)
    assert np.abs(np.asarray(out) - np.asarray(ref)).max() > 1e-4  # q-delta flows


def test_lora_trainable_mask_and_training_updates_only_lora(base):
    cfg, params, idx = base
    lcfg = lora.LoRAConfig(r=4, alpha=8)
    lp = lora.add_lora_params(params, cfg, lcfg, jax.random.PRNGKey(2))
    mask = lora.trainable_mask(lp)
    n_train = sum(
        int(np.prod(p.shape)) for p, m in zip(jax.tree.leaves(lp), jax.tree.leaves(mask)) if m
    )
    n_total = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(lp))
    assert 0 < n_train < 0.05 * n_total

    from fastmax_tpu.training.step import masked_optimizer

    opt = masked_optimizer(optax.sgd(1e-2), mask)
    state = opt.init(lp)

    def loss_fn(p):
        logits, _ = gpt.forward(p, cfg, idx)
        return jnp.mean(logits.astype(jnp.float32) ** 2)

    grads = jax.grad(loss_fn)(lp)
    updates, state = opt.update(grads, state, lp)
    new_p = optax.apply_updates(lp, updates)
    # base weights unchanged, lora_B changed
    np.testing.assert_array_equal(
        np.asarray(new_p["blocks"]["attn"]["attn"]["kernel"]),
        np.asarray(lp["blocks"]["attn"]["attn"]["kernel"]),
    )
    assert np.abs(np.asarray(new_p["blocks"]["attn"]["attn"]["lora_B"])).max() > 0


def test_lora_merge_matches_unmerged(base):
    cfg, params, idx = base
    lcfg = lora.LoRAConfig(r=4, alpha=8, query=True, value=True, mlp=True)
    lp = lora.add_lora_params(params, cfg, lcfg, jax.random.PRNGKey(2))
    # make the LoRA non-trivial
    lp = jax.tree_util.tree_map_with_path(
        lambda path, x: x + 0.02 if str(path[-1]).find("lora_B") >= 0 else x, lp
    )
    unmerged, _ = gpt.forward(lp, cfg, idx)
    merged = lora.merge_lora(lp)
    # no lora leaves remain
    names = [str(p) for p, _ in jax.tree_util.tree_flatten_with_path(merged)[0]]
    assert not any("lora" in n for n in names)
    out, _ = gpt.forward(merged, cfg, idx)
    np.testing.assert_allclose(np.asarray(out), np.asarray(unmerged), atol=2e-4, rtol=1e-3)


def test_lora_merge_into_quantized(base):
    """Merge into NF4 base: dequant -> add -> requant (ref lora.py:150-161)."""
    cfg, params, idx = base
    qparams = quant.quantize_model(params, "bnb.nf4")
    lcfg = lora.LoRAConfig(r=4, alpha=8, query=True, value=True)
    lp = lora.add_lora_params(qparams, cfg, lcfg, jax.random.PRNGKey(2))
    lp = jax.tree_util.tree_map_with_path(
        lambda path, x: x + 0.02 if str(path[-1]).find("lora_B") >= 0 else x, lp
    )
    unmerged, _ = gpt.forward(lp, cfg, idx)
    merged = lora.merge_lora(lp)
    out, _ = gpt.forward(merged, cfg, idx)
    # requantization noise bounds the difference
    a, b = np.asarray(out).ravel(), np.asarray(unmerged).ravel()
    assert np.corrcoef(a, b)[0, 1] > 0.99


def test_lora_split_state(base):
    cfg, params, _ = base
    lcfg = lora.LoRAConfig(r=4, alpha=8)
    lp = lora.add_lora_params(params, cfg, lcfg, jax.random.PRNGKey(2))
    base_p, lora_p = lora.split_lora_state(lp)
    lora_names = [str(p) for p, _ in jax.tree_util.tree_flatten_with_path(lora_p)[0]]
    assert lora_names and all("lora_" in n for n in lora_names)


def test_adapter_v1_init_is_identity_and_trains(base):
    cfg, params, idx = base
    ref, _ = gpt.forward(params, cfg, idx)
    ad = adapter.AdapterConfig(adapter_prompt_length=5, adapter_start_layer=1)
    ap = adapter.add_adapter_params(params, cfg, ad, jax.random.PRNGKey(3))
    out, _ = gpt.forward(ap, cfg, idx)
    # zero-init gating -> identity
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)
    # nonzero gating changes layers >= start only
    ap2 = jax.tree.map(lambda x: x, ap)
    ap2["blocks"]["attn"]["adapter"]["gating"] = (
        jnp.ones_like(ap2["blocks"]["attn"]["adapter"]["gating"])
    )
    out2, _ = gpt.forward(ap2, cfg, idx)
    assert np.abs(np.asarray(out2) - np.asarray(ref)).max() > 1e-4

    mask = adapter.trainable_mask(ap)
    trainable = [m for m in jax.tree.leaves(mask) if m]
    assert len(trainable) == 2  # wte + gating


def test_adapter_start_layer_gates_disabled_layers(base):
    """Layers below adapter_start_layer contribute zero even with gate=1."""
    cfg, params, idx = base
    ref, _ = gpt.forward(params, cfg, idx)
    ad = adapter.AdapterConfig(adapter_prompt_length=5, adapter_start_layer=cfg.n_layer)
    ap = adapter.add_adapter_params(params, cfg, ad, jax.random.PRNGKey(3))
    ap["blocks"]["attn"]["adapter"]["gating"] = (
        jnp.ones_like(ap["blocks"]["attn"]["adapter"]["gating"])
    )
    out, _ = gpt.forward(ap, cfg, idx)  # all layers disabled by `on`
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)


def test_adapter_v2_wrappers(base):
    cfg, params, idx = base
    ref, _ = gpt.forward(params, cfg, idx)
    ad = adapter.AdapterConfig(adapter_prompt_length=5, adapter_start_layer=1)
    ap = adapter.add_adapter_params(params, cfg, ad, jax.random.PRNGKey(3), v2=True)
    out, _ = gpt.forward(ap, cfg, idx)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)  # identity init
    # scale perturbation changes output
    ap["blocks"]["mlp"]["proj"]["adapter_scale"] = (
        ap["blocks"]["mlp"]["proj"]["adapter_scale"] * 1.5
    )
    out2, _ = gpt.forward(ap, cfg, idx)
    assert np.abs(np.asarray(out2) - np.asarray(ref)).max() > 1e-3
    # v2 trainable mask includes norms and wrappers
    mask = adapter.trainable_mask(ap, v2=True)
    flat = jax.tree_util.tree_flatten_with_path(mask)[0]
    assert any("adapter_scale" in str(p) and m for p, m in flat)
    assert any("ln_f" in str(p) and m for p, m in flat)
