"""Sharding tests on the virtual 8-device CPU mesh.

The pjit/GSPMD replacement for the reference's distributed test strategy
(tests/test_generate_tp.py mock-fabric sharding-math tests + real 2-GPU
runs): here the XLA SPMD partitioner actually executes on 8 virtual
devices, so both the sharding rules AND the collective insertion run.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest
from jax.sharding import NamedSharding

from fastmax_tpu.models.config import Config
from fastmax_tpu.models import gpt
from fastmax_tpu.parallel import sharding as sh
from fastmax_tpu.training.step import make_loss_fn


def small_cfg(**kw):
    d = dict(
        name="shard-test", block_size=64, vocab_size=128, padded_vocab_size=128,
        n_layer=2, n_head=8, n_embd=64, n_query_groups=4, rotary_percentage=1.0,
        parallel_residual=False, bias=False, _norm_class="RMSNorm",
        _mlp_class="LLaMAMLP", intermediate_size=128,
    )
    d.update(kw)
    return Config(**d)


def test_mesh_construction():
    mesh = sh.make_mesh(data=2, fsdp=2, model=2)
    assert mesh.shape == {"data": 2, "fsdp": 2, "model": 2}


def test_hybrid_mesh_placement():
    # simulated 2-granule topology: 8 devices, granules of 4 (the CPU
    # devices all report process 0, so granule_size drives the grouping)
    mesh = sh.make_hybrid_mesh(data=2, fsdp=2, model=2, granule_size=4)
    assert mesh.shape == {"data": 2, "fsdp": 2, "model": 2}
    sh.assert_hybrid_placement(mesh, granule_size=4)
    devs = jax.devices()
    # data index 0 must be exactly granule 0 (first 4 devices), 1 the rest
    assert set(mesh.devices[0].ravel()) == set(devs[:4])
    assert set(mesh.devices[1].ravel()) == set(devs[4:])


def test_hybrid_mesh_rejects_bad_topology():
    # asking for more granules than the topology has must fail loudly
    with pytest.raises(ValueError, match="hybrid mesh needs"):
        sh.make_hybrid_mesh(data=4, fsdp=2, model=1, granule_size=4)
    # a flat mesh that interleaves granules must fail the placement check
    flat = sh.make_mesh(data=2, fsdp=2, model=2)
    with pytest.raises(AssertionError):
        sh.assert_hybrid_placement(flat, granule_size=2)


def test_gather_fsdp_local_roundtrip():
    # ZeRO-3 manual gather: shard a leaf over fsdp, gather inside shard_map
    from jax.sharding import PartitionSpec as P
    from jax import shard_map

    mesh = sh.make_mesh(data=1, fsdp=2, model=1)
    x = jnp.arange(32, dtype=jnp.float32).reshape(4, 8)
    params = {"a": {"kernel": x}, "b": x[:, :4]}
    specs = {"a": {"kernel": P(None, "fsdp")}, "b": P()}

    def body(p):
        full = sh.gather_fsdp_local(p, specs)
        return full["a"]["kernel"] + 0.0, full["b"] + 0.0

    # gathered values are formally still "varying" over fsdp (every peer
    # holds the same bytes); skip the static replication check
    fn = shard_map(body, mesh=mesh, in_specs=(specs,), out_specs=(P(), P()),
                   check_vma=False)
    with mesh:
        got_a, got_b = fn(params)
    np.testing.assert_array_equal(np.asarray(got_a), np.asarray(x))
    np.testing.assert_array_equal(np.asarray(got_b), np.asarray(x[:, :4]))


@pytest.mark.parametrize("tp,fsdp", [(2, 1), (1, 2), (2, 2)])
def test_sharded_forward_matches_single_device(tp, fsdp):
    cfg = small_cfg()
    params = gpt.init_params(cfg, jax.random.PRNGKey(0))
    idx = jax.random.randint(jax.random.PRNGKey(1), (8, 16), 0, 128)
    ref, _ = gpt.forward(params, cfg, idx)

    mesh = sh.make_mesh(data=8 // (tp * fsdp), fsdp=fsdp, model=tp)
    specs = sh.param_specs(cfg, params, tp=tp > 1, fsdp_size=fsdp)
    sharded = sh.shard_params(params, mesh, specs)
    idx_sharded = jax.device_put(idx, NamedSharding(mesh, sh.batch_spec()))

    with mesh:
        out, _ = jax.jit(lambda p, i: gpt.forward(p, cfg, i))(sharded, idx_sharded)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-4, rtol=1e-3)


def test_sharded_train_step_runs_and_updates():
    cfg = small_cfg()
    mesh = sh.make_mesh(data=2, fsdp=2, model=2)
    params = gpt.init_params(cfg, jax.random.PRNGKey(0))
    specs = sh.param_specs(cfg, params, tp=True, fsdp_size=2)
    params = sh.shard_params(params, mesh, specs)
    optimizer = optax.adamw(1e-2)
    opt_state = optimizer.init(params)
    loss_fn = make_loss_fn(cfg, remat=True)

    def train_step(params, opt_state, batch):
        loss, grads = jax.value_and_grad(loss_fn)(params, batch)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    batch = jax.random.randint(jax.random.PRNGKey(2), (8, 17), 0, 128)
    batch = jax.device_put(batch, NamedSharding(mesh, sh.batch_spec()))
    with mesh:
        step = jax.jit(train_step, donate_argnums=(0, 1))
        p1, opt_state, l1 = step(params, opt_state, batch)
        p2, opt_state, l2 = step(p1, opt_state, batch)
    assert np.isfinite(float(l1)) and np.isfinite(float(l2))
    assert float(l2) < float(l1)  # overfits a repeated batch


def test_quantized_params_shard():
    """NF4 block layout must survive TP sharding (block-aligned splits)."""
    from fastmax_tpu.ops.quant import quantize_model

    cfg = small_cfg(n_embd=128, intermediate_size=256, n_head=8, n_query_groups=8)
    params = gpt.init_params(cfg, jax.random.PRNGKey(0))
    qparams = quantize_model(params, "bnb.nf4")
    idx = jax.random.randint(jax.random.PRNGKey(1), (2, 8), 0, 128)
    ref, _ = gpt.forward(qparams, cfg, idx)

    mesh = sh.make_mesh(data=1, fsdp=1, model=2)
    specs = sh.param_specs(cfg, qparams, tp=True, fsdp_size=1)
    sharded = sh.shard_params(qparams, mesh, specs)
    with mesh:
        out, _ = jax.jit(lambda p, i: gpt.forward(p, cfg, i))(sharded, idx)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-4, rtol=1e-3)


def test_dryrun_multichip_entry():
    import sys, pathlib

    sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)


@pytest.mark.parametrize("fmt", ["npy", "safetensors"])
def test_sharded_streaming_load_matches_dense(tmp_path, fmt):
    """load_sharded_model_params: params arrive pre-sharded on the mesh via
    per-shard mmap callback reads, numerically equal to the dense loader
    (the host-RAM-bounded multi-host load path, ref xla/utils.py:34-113)."""
    import json as _json

    from fastmax_tpu.models.params import params_to_flat
    from fastmax_tpu.utils.checkpoint import save_flat_checkpoint
    from fastmax_tpu.utils.sharded_load import (
        load_sharded_model_params,
        open_lazy_checkpoint,
    )

    cfg = small_cfg(bias=True, _mlp_class="GptNeoxMLP", _norm_class="LayerNorm",
                    intermediate_size=None)
    params = gpt.init_params(cfg, jax.random.PRNGKey(0))
    flat = params_to_flat(params, cfg)
    ckpt = tmp_path / "ckpt"
    ckpt.mkdir()
    if fmt == "npy":
        save_flat_checkpoint(flat, ckpt)
    else:
        save_flat_checkpoint(flat, ckpt / "model.safetensors")
    with open(ckpt / "lit_config.json", "w") as fp:
        _json.dump({k: v for k, v in cfg.__dict__.items() if not k.startswith("hf")}, fp,
                   default=str)

    if fmt == "npy":
        # storage handles are mmaps: opening reads no tensor data
        handles = open_lazy_checkpoint(ckpt)
        assert all(isinstance(h, np.memmap) for h in handles.values())

    mesh = sh.make_mesh(data=2, fsdp=2, model=2)
    _, sharded = load_sharded_model_params(
        ckpt, mesh, cfg=cfg, dtype=jnp.float32, tp=True, fsdp_size=2
    )

    # every leaf is a committed global array with the expected sharding
    specs = sh.param_specs(cfg, params, tp=True, fsdp_size=2)
    for (path, leaf), (_, spec) in zip(
        jax.tree_util.tree_flatten_with_path(sharded)[0],
        jax.tree_util.tree_flatten_with_path(specs)[0],
    ):
        assert leaf.sharding == NamedSharding(mesh, spec), path

    # numerics match the dense loader
    for (path, a), (_, b) in zip(
        jax.tree_util.tree_flatten_with_path(sharded)[0],
        jax.tree_util.tree_flatten_with_path(params)[0],
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6, err_msg=str(path))

    # and the sharded forward runs
    idx = jax.random.randint(jax.random.PRNGKey(1), (8, 16), 0, 128)
    ref, _ = gpt.forward(params, cfg, idx)
    idx_sharded = jax.device_put(idx, NamedSharding(mesh, sh.batch_spec()))
    with mesh:
        out, _ = jax.jit(lambda p, i: gpt.forward(p, cfg, i))(sharded, idx_sharded)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-4, rtol=1e-3)


def test_sharded_streaming_load_moe(tmp_path):
    """MoE expert stacks (L, E, in, out) assemble lazily from per-expert
    tensors and shard over the model axis."""
    from fastmax_tpu.models.params import params_to_flat
    from fastmax_tpu.utils.checkpoint import save_flat_checkpoint
    from fastmax_tpu.utils.sharded_load import load_sharded_model_params

    cfg = small_cfg(_mlp_class="LLaMAMoE", n_expert=4, n_expert_per_token=2,
                    intermediate_size=96)
    params = gpt.init_params(cfg, jax.random.PRNGKey(0))
    ckpt = tmp_path / "ckpt"
    ckpt.mkdir()
    save_flat_checkpoint(params_to_flat(params, cfg), ckpt)

    mesh = sh.make_mesh(data=2, fsdp=1, model=4)
    _, sharded = load_sharded_model_params(
        ckpt, mesh, cfg=cfg, dtype=jnp.float32, tp=True, fsdp_size=1
    )
    ex = sharded["blocks"]["mlp"]["experts"]["fc_1"]["kernel"]
    assert ex.shape == (cfg.n_layer, 4, cfg.n_embd, 96)
    np.testing.assert_allclose(
        np.asarray(ex),
        np.asarray(params["blocks"]["mlp"]["experts"]["fc_1"]["kernel"]),
        atol=1e-6,
    )


@pytest.mark.parametrize("cache_dtype", [jnp.bfloat16, jnp.int8])
def test_tp_engine_decode_with_sharded_cache(cache_dtype):
    """The plain engine under TP places fresh KV caches with explicit specs
    (heads over the model axis, incl. the int8 cache's k_scale/v_scale
    leaves) and decodes identically to the unsharded engine."""
    from fastmax_tpu.inference.engine import InferenceEngine

    cfg = small_cfg()
    params = gpt.init_params(cfg, jax.random.PRNGKey(0))
    prompt = jax.random.randint(jax.random.PRNGKey(1), (12,), 1, 128)

    ref_engine = InferenceEngine(cfg, params, max_seq_length=32, batch_size=1,
                                 cache_dtype=cache_dtype)
    ref = ref_engine.generate(prompt, 24, temperature=0.0, key=jax.random.PRNGKey(2))

    mesh = sh.make_mesh(data=1, fsdp=2, model=2)
    specs = sh.param_specs(cfg, params, tp=True, fsdp_size=2)
    sharded = sh.shard_params(params, mesh, specs)
    engine = InferenceEngine(cfg, sharded, max_seq_length=32, batch_size=1,
                             cache_dtype=cache_dtype, mesh=mesh)

    cache = engine.new_cache()
    expected = sh.kv_cache_specs(cfg, tp=True)
    for name, leaf in cache.items():
        got = leaf.sharding.spec
        want = sh.sanitize_spec(expected[name], leaf.shape, mesh)
        assert got == want, (name, got, want)
    if cache_dtype == jnp.int8:
        assert set(cache) == {"k", "v", "k_scale", "v_scale"}

    with mesh:
        out = engine.generate(prompt, 24, temperature=0.0, key=jax.random.PRNGKey(2))
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


@pytest.mark.parametrize("mode", ["int8", "int4"])
def test_streaming_quantized_load_matches_in_memory(tmp_path, mode):
    """load_quantized_model_params: streaming layer-at-a-time quantization
    from the mmap'd checkpoint must be BIT-IDENTICAL to quantizing the
    in-memory dense model (verdict r03 next #6 — the 7B serve path loads
    real disk weights through this)."""
    from fastmax_tpu.models.params import params_to_flat
    from fastmax_tpu.ops import quant
    from fastmax_tpu.utils.checkpoint import save_flat_checkpoint
    from fastmax_tpu.utils.sharded_load import load_quantized_model_params

    cfg = small_cfg()
    params = gpt.init_params(cfg, jax.random.PRNGKey(0))
    ckpt = tmp_path / "ckpt"
    ckpt.mkdir()
    save_flat_checkpoint(params_to_flat(params, cfg), ckpt)

    _, streamed = load_quantized_model_params(ckpt, cfg=cfg, mode=mode)

    if mode == "int8":
        ref = quant.quantize_model(params, "bnb.int8")
        ref_attn = ref["blocks"]["attn"]["attn"]
        got_attn = streamed["blocks"]["attn"]["attn"]
        np.testing.assert_array_equal(np.asarray(got_attn["q8"]),
                                      np.asarray(ref_attn["q8"]))
        np.testing.assert_array_equal(np.asarray(got_attn["scale8"]),
                                      np.asarray(ref_attn["scale8"]))
    else:
        kern = np.asarray(params["blocks"]["attn"]["attn"]["kernel"], np.float32)
        per_layer = [quant.quantize_int4_tiled(kern[l], "rank1")
                     for l in range(kern.shape[0])]
        got_attn = streamed["blocks"]["attn"]["attn"]
        for key in per_layer[0]:
            ref_stack = np.stack([np.asarray(p[key]) for p in per_layer])
            np.testing.assert_array_equal(np.asarray(got_attn[key]), ref_stack,
                                          err_msg=key)

    # dense leaves (wte, lm_head, norms) arrive unquantized in act dtype
    assert streamed["wte"].dtype == jnp.bfloat16
    assert "q8" not in streamed.get("lm_head", {})

    # and the engine serves the streamed pytree directly
    from fastmax_tpu.inference.engine import InferenceEngine

    eng = InferenceEngine(cfg, streamed, max_seq_length=32, batch_size=1)
    out = eng.generate(jnp.arange(1, 6, dtype=jnp.int32), 12, temperature=0.0)
    assert out.shape == (1, 12)
