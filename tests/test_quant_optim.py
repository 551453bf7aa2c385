"""Blockwise int8 AdamW (training/quant_optim.py) — the PagedAdamW/bnb-8bit
optimizer role of the reference's QLoRA recipe (finetune/lora.py:152-160)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from fastmax_tpu.training.quant_optim import (
    MIN_QUANT_SIZE,
    adamw8bit,
    dequantize_m,
    dequantize_v,
    quantize_m,
    quantize_v,
    state_nbytes,
)


def test_codec_roundtrip_accuracy():
    rng = np.random.default_rng(0)
    m = jnp.asarray(rng.normal(size=(8192,)) * np.exp(rng.normal(size=(8192,))), jnp.float32)
    dm = dequantize_m(quantize_m(m), m.size, m.shape)
    # absmax int8: error bounded by scale/2 = absmax/254 per 256-block
    blocks = np.asarray(m).reshape(-1, 256)
    bound = np.abs(blocks).max(axis=1, keepdims=True) / 254.0 + 1e-9
    assert (np.abs(np.asarray(dm).reshape(-1, 256) - blocks) <= bound).all()

    v = jnp.asarray(np.exp(rng.normal(size=(8192,)) * 4), jnp.float32)  # huge range
    dv = dequantize_v(quantize_v(v), v.size, v.shape)
    assert (np.asarray(dv) >= 0).all()
    # sqrt-space: relative error on sqrt(v) bounded blockwise
    rb = np.sqrt(np.asarray(v)).reshape(-1, 256)
    drb = np.sqrt(np.asarray(dv)).reshape(-1, 256)
    bound = rb.max(axis=1, keepdims=True) / 508.0 + 1e-9
    assert (np.abs(drb - rb) <= bound).all()


def test_matches_adamw_on_small_leaves():
    """Leaves under MIN_QUANT_SIZE keep exact f32 moments: identical to
    optax.adamw step-for-step."""
    params = {"w": jnp.asarray(np.random.default_rng(1).normal(size=(16, 8)), jnp.float32),
              "b": jnp.zeros((8,), jnp.float32)}
    kw = dict(b1=0.9, b2=0.95, eps=1e-8, weight_decay=0.02)
    ref = optax.adamw(1e-2, **kw)
    q8 = adamw8bit(1e-2, **kw)
    rs, qs = ref.init(params), q8.init(params)
    p_ref, p_q8 = params, params
    for i in range(5):
        g = jax.tree.map(lambda p: jnp.sin(p + i).astype(p.dtype), p_ref)
        ur, rs = ref.update(g, rs, p_ref)
        p_ref = optax.apply_updates(p_ref, ur)
        uq, qs = q8.update(g, qs, p_q8)
        p_q8 = optax.apply_updates(p_q8, uq)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-7), p_ref, p_q8
    )


def test_quantized_state_dtypes_and_size():
    params = {"big": jnp.zeros((64, 128), jnp.float32),  # 8192 >= MIN_QUANT_SIZE
              "small": jnp.zeros((10,), jnp.float32),
              "codes": jnp.zeros((64, 64), jnp.int8)}  # quantized-weight leaf
    assert params["big"].size >= MIN_QUANT_SIZE
    opt = adamw8bit(1e-3)
    state = opt.init(params)
    flat, _ = jax.tree.flatten(params)
    i_big = [i for i, p in enumerate(flat) if p.shape == (64, 128)][0]
    assert state.m[i_big]["q"].dtype == jnp.int8
    assert state.v[i_big]["q"].dtype == jnp.uint8
    # one int8 + one uint8 moment + per-block scales << 2 f32 moments
    f32_bytes = 2 * 4 * params["big"].size
    assert state_nbytes(state) < 0.35 * f32_bytes
    # non-float leaf carries no state and a zero update
    g = jax.tree.map(lambda p: jnp.ones_like(p), params)
    upd, state = jax.jit(opt.update)(g, state, params)
    assert np.asarray(upd["codes"]).sum() == 0
    assert np.asarray(upd["big"]).sum() != 0


def test_converges_like_f32_adamw():
    """Noisy linear regression with a quantized-size weight: final loss within
    a small factor of exact AdamW's."""
    rng = np.random.default_rng(2)
    w_true = rng.normal(size=(128, 64)).astype(np.float32)
    x = rng.normal(size=(256, 128)).astype(np.float32)
    y = x @ w_true

    def loss_fn(params):
        return jnp.mean((x @ params["w"] - y) ** 2)

    def train(opt, steps=300):
        params = {"w": jnp.zeros((128, 64), jnp.float32)}
        state = opt.init(params)

        @jax.jit
        def step(params, state):
            l, g = jax.value_and_grad(loss_fn)(params)
            u, state = opt.update(g, state, params)
            return optax.apply_updates(params, u), state, l

        for _ in range(steps):
            params, state, l = step(params, state)
        return float(l)

    l_ref = train(optax.adamw(3e-2, b1=0.9, b2=0.95, weight_decay=0.0))
    l_q8 = train(adamw8bit(3e-2, b1=0.9, b2=0.95, weight_decay=0.0))
    assert l_q8 < 0.05, l_q8  # it actually learns
    assert l_q8 < max(l_ref * 10, 0.05), (l_ref, l_q8)


def test_schedule_and_masked_composition():
    """Works under the PEFT freeze mask and with a schedule callable."""
    from fastmax_tpu.training.step import masked_optimizer

    sched = optax.warmup_cosine_decay_schedule(0.0, 1e-2, 2, 20, 1e-4)
    params = {"train_me": jnp.ones((4096,), jnp.float32),
              "frozen": jnp.ones((4096,), jnp.float32)}
    opt = masked_optimizer(adamw8bit(sched), {"train_me": True, "frozen": False})
    state = opt.init(params)
    g = jax.tree.map(jnp.ones_like, params)
    for _ in range(3):
        u, state = jax.jit(opt.update)(g, state, params)
        params = optax.apply_updates(params, u)
    assert np.allclose(np.asarray(params["frozen"]), 1.0)
    assert not np.allclose(np.asarray(params["train_me"]), 1.0)


def test_orbax_roundtrip(tmp_path):
    """The quantized state (dict-of-array moments, () placeholders for
    non-float leaves) survives save_train_state/load_train_state."""
    from fastmax_tpu.training.fit import TrainState, load_train_state, save_train_state

    params = {"big": jnp.ones((64, 128), jnp.float32),
              "codes": jnp.zeros((8, 8), jnp.int8),
              "small": jnp.ones((4,), jnp.float32)}
    opt = adamw8bit(1e-3)
    st = opt.init(params)
    g = jax.tree.map(jnp.ones_like, params)
    _, st = opt.update(g, st, params)
    save_train_state(TrainState(params, st, step=3), tmp_path / "ck")
    restored = load_train_state(tmp_path / "ck", TrainState(params, opt.init(params)))
    assert restored.step == 3
    for a, b in zip(jax.tree.leaves(st), jax.tree.leaves(restored.opt_state)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_build_optimizer_and_fit_integration(tmp_path):
    """TrainArgs(optimizer='adamw8bit') trains a tiny model end-to-end and the
    loss decreases; the state survives the fit loop's jitted apply_step."""
    from fastmax_tpu.models import gpt
    from fastmax_tpu.models.config import Config
    from fastmax_tpu.training.fit import TrainState, build_optimizer, fit
    from fastmax_tpu.utils.args import TrainArgs

    cfg = Config(block_size=32, vocab_size=64, padded_vocab_size=64,
                 n_layer=2, n_head=2, n_embd=32, rotary_percentage=1.0)
    params = gpt.init_params(cfg, jax.random.PRNGKey(0), jnp.float32)
    train = TrainArgs(global_batch_size=4, micro_batch_size=4, max_iters=20,
                      learning_rate=5e-3, lr_warmup_steps=2, log_interval=1,
                      save_interval=1000, optimizer="adamw8bit")
    opt = build_optimizer(train)
    state = TrainState(params, opt.init(params))

    rng = np.random.default_rng(0)
    data = rng.integers(0, 8, 4096).astype(np.int32)  # tiny vocab = learnable

    def batches():
        while True:
            ix = rng.integers(0, len(data) - 17, 4)
            yield np.stack([data[i : i + 17] for i in ix])

    losses = []

    class Rec:
        def log_dict(self, d, step):
            if "loss" in d:
                losses.append(d["loss"])

        def finalize(self):
            pass

    fit(cfg, state, opt, batches(), train=train, logger=Rec())
    assert losses[-1] < losses[0], losses
