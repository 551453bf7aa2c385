"""Tests for the user-facing tools: generate CLI, chat streaming, eval
harness, converters, merge_lora (reference test_generate.py / test_chat.py /
test_convert_lit_checkpoint.py coverage)."""

import json
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fastmax_tpu.models.config import Config, registry
from fastmax_tpu.models import gpt
from fastmax_tpu.models.params import params_to_flat
from fastmax_tpu.utils.checkpoint import save_flat_checkpoint

TINY = dict(
    name="tools-tiny", block_size=128, vocab_size=None, padded_vocab_size=None,
    n_layer=2, n_head=4, n_embd=64, rotary_percentage=1.0, parallel_residual=False,
    bias=False, _norm_class="RMSNorm", _mlp_class="LLaMAMLP", intermediate_size=128,
)


@pytest.fixture(scope="module")
def checkpoint_dir(tmp_path_factory):
    """A full deployable checkpoint dir: weights + config + HF tokenizer."""
    from tokenizers import Tokenizer as HFTok
    from tokenizers.models import BPE
    from tokenizers.trainers import BpeTrainer
    from tokenizers.pre_tokenizers import Whitespace

    tmp = tmp_path_factory.mktemp("ckpt")
    tok = HFTok(BPE(unk_token="[UNK]"))
    tok.pre_tokenizer = Whitespace()
    trainer = BpeTrainer(special_tokens=["[UNK]", "<eos>"], vocab_size=120)
    tok.train_from_iterator(
        ["hello world this is a tiny tokenizer for the chat and generate tools"] * 20,
        trainer,
    )
    tok.save(str(tmp / "tokenizer.json"))
    (tmp / "tokenizer_config.json").write_text(json.dumps({"eos_token": "<eos>"}))

    vocab = tok.get_vocab_size()
    cfg = Config(**{**TINY, "vocab_size": vocab, "padded_vocab_size": vocab})
    params = gpt.init_params(cfg, jax.random.PRNGKey(0))
    save_flat_checkpoint(params_to_flat(params, cfg), tmp)
    cfg.to_json(tmp / "lit_config.json")
    registry()["tools-tiny"] = {**TINY, "vocab_size": vocab, "padded_vocab_size": vocab}
    return tmp


def test_generate_cli(checkpoint_dir, capsys):
    from fastmax_tpu.inference.generate import main

    main(
        prompt="hello world", checkpoint_dir=checkpoint_dir, num_samples=2,
        max_new_tokens=8, temperature=0.0, precision="float32",
    )
    out = capsys.readouterr()
    assert "hello world" in out.out
    assert "tokens/sec" in out.err


def test_generate_cli_quantized(checkpoint_dir, capsys):
    from fastmax_tpu.inference.generate import main

    main(
        prompt="hello", checkpoint_dir=checkpoint_dir, num_samples=1,
        max_new_tokens=4, temperature=0.0, quantize="bnb.int8", precision="float32",
    )
    assert "tokens/sec" in capsys.readouterr().err


def test_chat_streaming_session(checkpoint_dir):
    from fastmax_tpu.inference.chat import StreamingSession, decode_stream
    from fastmax_tpu.models.tokenizer import Tokenizer
    from fastmax_tpu.utils.checkpoint import load_model_params

    cfg, params = load_model_params(checkpoint_dir)
    tokenizer = Tokenizer(checkpoint_dir)
    session = StreamingSession(cfg, params, 64)
    enc = tokenizer.encode("hello world this")
    toks = list(
        session.generate_stream(enc, len(enc) + 10, temperature=0.0,
                                stop_tokens=([tokenizer.eos_id],),
                                key=jax.random.PRNGKey(0))
    )
    flat = np.concatenate([np.asarray(t).reshape(-1) for t in toks]) if toks else np.array([])
    assert 0 < len(flat) <= 10
    # streamed greedy tokens match the engine's greedy decode
    from fastmax_tpu.inference.engine import InferenceEngine

    eng = InferenceEngine(cfg, params, max_seq_length=64, batch_size=1)
    ref = eng.generate(jnp.asarray(enc), len(enc) + 10, temperature=0.0,
                       eos_id=tokenizer.eos_id, key=jax.random.PRNGKey(0))
    ref_new = np.asarray(ref[0, len(enc):])
    np.testing.assert_array_equal(flat, ref_new[: len(flat)])


def test_chat_stop_sequence_mid_stream(checkpoint_dir):
    """A multi-token stop sequence truncates the stream and is not yielded."""
    from fastmax_tpu.inference.chat import StreamingSession
    from fastmax_tpu.utils.checkpoint import load_model_params
    from fastmax_tpu.models.tokenizer import Tokenizer

    cfg, params = load_model_params(checkpoint_dir)
    tokenizer = Tokenizer(checkpoint_dir)
    session = StreamingSession(cfg, params, 64)
    enc = tokenizer.encode("hello world")
    # find what greedy emits, then use its 3rd+4th tokens as the stop pair
    all_toks = list(session.generate_stream(enc, len(enc) + 8, temperature=0.0,
                                            key=jax.random.PRNGKey(0)))
    flat = np.concatenate([np.asarray(t).reshape(-1) for t in all_toks])
    stop_pair = [int(flat[2]), int(flat[3])]
    stopped = list(session.generate_stream(enc, len(enc) + 8, temperature=0.0,
                                           stop_tokens=(stop_pair,),
                                           key=jax.random.PRNGKey(0)))
    got = np.concatenate([np.asarray(t).reshape(-1) for t in stopped]) if stopped else np.array([])
    np.testing.assert_array_equal(got, flat[:2])


def test_prompt_config_families(checkpoint_dir):
    from fastmax_tpu.inference.chat import prompt_config
    from fastmax_tpu.models.tokenizer import Tokenizer

    tokenizer = Tokenizer(checkpoint_dir)
    for name in ("Llama-2-7b-chat-hf", "vicuna-7b-v1.5", "Mistral-7B-Instruct-v0.1",
                 "TinyLlama-1.1B-Chat-v1.0", "phi-1_5", "phi-2", "unknown-model",
                 "RedPajama-INCITE-Chat-3B-v1", "RedPajama-INCITE-Instruct-3B-v1",
                 "falcon-7b-instruct", "Llama-2-7b-chat-hf-function-calling-v2",
                 "Platypus2-7B", "Nous-Hermes-llama-2-7b", "stablecode-instruct-alpha-3b",
                 "CodeLlama-7b-Instruct-hf", "FreeWilly2", "gemma-7b-it",
                 "stablelm-tuned-alpha-3b", "stablelm-zephyr-3b"):
        template, stops = prompt_config(name, tokenizer)
        assert "{prompt}" in template
        assert all(isinstance(s, (list, tuple)) for s in stops)


def test_eval_loglikelihood_and_mc(checkpoint_dir, tmp_path):
    from fastmax_tpu.eval.harness import FastmaxLM, multiple_choice_accuracy, perplexity_on_tokens
    from fastmax_tpu.models.tokenizer import Tokenizer
    from fastmax_tpu.utils.checkpoint import load_model_params

    cfg, params = load_model_params(checkpoint_dir)
    tokenizer = Tokenizer(checkpoint_dir)
    lm = FastmaxLM(cfg, params, tokenizer)

    # loglikelihood agrees with a manual full-forward computation
    ctx, cont = "hello world", " this is"
    (ll, greedy), = lm.loglikelihood([(ctx, cont)])
    toks = lm.tok_encode(ctx + cont)
    n_cont = len(lm.tok_encode(cont))
    logits, _ = gpt.forward(params, cfg, jnp.asarray([toks], jnp.int32))
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)[0]
    manual = sum(float(logp[len(toks) - n_cont + i - 1, toks[len(toks) - n_cont + i]])
                 for i in range(n_cont))
    assert abs(ll - manual) < 1e-3

    task = [
        {"query": "hello world", "choices": ["this is", "tokenizer chat"], "gold": 0},
        {"query": "a tiny", "choices": ["tokenizer", "world"], "gold": 0},
    ]
    task_file = tmp_path / "task.json"
    task_file.write_text(json.dumps(task))
    res = multiple_choice_accuracy(lm, task_file)
    assert set(res) == {"acc", "acc_norm", "n"} and res["n"] == 2

    ppl = perplexity_on_tokens(lm, tokenizer.encode("hello world this is a tiny " * 10))
    assert np.isfinite(ppl) and ppl > 1.0


def test_eval_batched_loglikelihood_matches_serial(checkpoint_dir, tmp_path):
    """Batched scoring (batch_size > 1, mixed lengths) == one-at-a-time, and
    the CachingLM wrapper returns identical results on a warm cache."""
    from fastmax_tpu.eval.harness import CachingLM, FastmaxLM
    from fastmax_tpu.models.tokenizer import Tokenizer
    from fastmax_tpu.utils.checkpoint import load_model_params

    cfg, params = load_model_params(checkpoint_dir)
    tokenizer = Tokenizer(checkpoint_dir)
    reqs = [
        ("hello world", " this is"),
        ("a tiny tokenizer chat hello world this", " is a"),
        ("chat", " hello"),
        ("hello world this is", " a tiny tokenizer"),
        ("tokenizer", " chat chat"),
    ]
    serial = FastmaxLM(cfg, params, tokenizer, batch_size=1).loglikelihood(reqs)
    batched = FastmaxLM(cfg, params, tokenizer, batch_size=4).loglikelihood(reqs)
    for (ls, gs), (lb, gb) in zip(serial, batched):
        assert abs(ls - lb) < 1e-3, (ls, lb)
        assert gs == gb

    cache_file = tmp_path / "evalcache.json"
    lm = FastmaxLM(cfg, params, tokenizer, batch_size=4)
    cached = CachingLM(lm, cache_file)
    first = cached.loglikelihood(reqs)
    assert cache_file.exists()

    def boom(requests):
        raise AssertionError("cache miss on warm cache")

    lm.loglikelihood = boom  # all hits: the wrapped LM must not be called
    warm = CachingLM(lm, cache_file).loglikelihood(reqs)
    for (l1, g1), (l2, g2) in zip(first, warm):
        assert l1 == l2 and g1 == g2


def test_rolling_loglikelihood_covers_every_token(checkpoint_dir):
    """A document 3x the context length must have every token scored exactly
    once by sliding windows (the r02 version silently kept only the tail)."""
    from fastmax_tpu.eval.harness import FastmaxLM
    from fastmax_tpu.models.tokenizer import Tokenizer
    from fastmax_tpu.utils.checkpoint import load_model_params

    cfg, params = load_model_params(checkpoint_dir)
    tokenizer = Tokenizer(checkpoint_dir)
    lm = FastmaxLM(cfg, params, tokenizer, max_seq_length=32, batch_size=2)
    toks = list(np.random.default_rng(0).integers(1, cfg.vocab_size, 3 * 32))

    seen_requests = []
    orig = lm.loglikelihood_tokens_batch

    def capture(reqs):
        seen_requests.extend(reqs)
        return orig(reqs)

    lm.loglikelihood_tokens_batch = capture
    ll = lm.loglikelihood_rolling_tokens(toks)
    assert np.isfinite(ll) and ll < 0.0

    # every window fits the context; continuations tile the stream exactly
    scored = []
    for ctx, cont in seen_requests:
        assert len(ctx) + len(cont) <= lm.max_seq_length
        assert len(ctx) >= 1
        scored.extend(cont)
    assert scored == toks  # full coverage, in order, no token twice
    # lm-eval contract: disjoint windows, exactly ONE context token each —
    # the first window conditions on the EOT prefix, later windows on the
    # single preceding stream token (context_len=1 + make_disjoint_window)
    assert seen_requests[0][0] == [lm.eot_token_id]
    pos = 0
    for ctx, cont in seen_requests:
        assert len(ctx) == 1
        if pos > 0:
            assert ctx == [toks[pos - 1]]
        pos += len(cont)


def test_run_lm_eval_against_stubbed_package(checkpoint_dir, monkeypatch):
    """Exercise the _run_lm_eval integration path (never runnable for real in
    this image: the lm_eval package is absent) against a sys.modules stub
    providing the documented contract — api.model.LM + simple_evaluate with
    Instance-style requests (ref eval/lm_eval_harness.py:85-133). Catches
    signature drift in the wrapper."""
    import sys
    import types

    from fastmax_tpu.eval import harness
    from fastmax_tpu.models.tokenizer import Tokenizer
    from fastmax_tpu.utils.checkpoint import load_model_params

    cfg, params = load_model_params(checkpoint_dir)
    tokenizer = Tokenizer(checkpoint_dir)
    lm = harness.FastmaxLM(cfg, params, tokenizer, max_seq_length=64, batch_size=2)

    class Instance:
        def __init__(self, args):
            self.args = args

    captured = {}

    class LM:  # the base class the wrapper must subclass
        pass

    def simple_evaluate(model=None, tasks=None, num_fewshot=0, limit=None):
        assert isinstance(model, LM)
        captured["lls"] = model.loglikelihood(
            [Instance(("hello world", " this is")), Instance(("a tiny", " tokenizer"))]
        )
        captured["roll"] = model.loglikelihood_rolling(
            [Instance(("hello world this is a tiny tokenizer for the chat tools",))]
        )
        captured["gen"] = model.generate_until(
            [Instance(("hello world", {"until": ["\n"]}))]
        )
        captured["tasks"] = tasks
        return {"results": {t: {"acc": 0.5} for t in tasks}}

    pkg = types.ModuleType("lm_eval")
    api = types.ModuleType("lm_eval.api")
    model_mod = types.ModuleType("lm_eval.api.model")
    model_mod.LM = LM
    api.model = model_mod
    pkg.api = api
    pkg.simple_evaluate = simple_evaluate
    monkeypatch.setitem(sys.modules, "lm_eval", pkg)
    monkeypatch.setitem(sys.modules, "lm_eval.api", api)
    monkeypatch.setitem(sys.modules, "lm_eval.api.model", model_mod)

    results = harness._run_lm_eval(lm, ["arc_stub", "piqa_stub"], 0, None)
    assert set(results) == {"arc_stub", "piqa_stub"}
    assert captured["tasks"] == ["arc_stub", "piqa_stub"]
    # loglikelihood plumbing: (float, bool) per request
    assert len(captured["lls"]) == 2
    for ll, greedy in captured["lls"]:
        assert np.isfinite(ll) and ll < 0.0 and isinstance(greedy, bool)
    # rolling: one (float,) per request
    (roll,) = captured["roll"]
    assert np.isfinite(roll[0]) and roll[0] < 0.0
    # generation returns a string
    assert isinstance(captured["gen"][0], str)


def test_convert_lit_roundtrip_through_hf(tmp_path, checkpoint_dir):
    """native -> HF layout -> native again preserves weights exactly."""
    from fastmax_tpu.scripts.convert_lit_checkpoint import convert_lit_checkpoint
    from fastmax_tpu.scripts import convert_hf_checkpoint as fwd
    from fastmax_tpu.utils.checkpoint import load_flat_checkpoint

    hf_path = tmp_path / "hf_out.safetensors"
    convert_lit_checkpoint(checkpoint_dir, hf_path, model_name="tools-tiny")

    # forward-convert the HF file back
    hf_dir = tmp_path / "hf_dir"
    hf_dir.mkdir()
    import shutil

    shutil.copy2(hf_path, hf_dir / "model.safetensors")
    out = tmp_path / "native2"
    fwd.convert_hf_checkpoint(hf_dir, model_name="tools-tiny", out_dir=out)

    a = load_flat_checkpoint(checkpoint_dir)
    b = load_flat_checkpoint(out)
    assert set(a) == set(b)
    for k in a:
        np.testing.assert_array_equal(np.asarray(a[k]), np.asarray(b[k]), err_msg=k)


def test_merge_lora_cli(tmp_path, checkpoint_dir):
    from fastmax_tpu.models import lora as lora_mod
    from fastmax_tpu.utils.checkpoint import load_model_params
    from fastmax_tpu.scripts.merge_lora import merge_lora
    from fastmax_tpu.training.finetune import _flatten_delta

    cfg, params = load_model_params(checkpoint_dir)
    lp = lora_mod.add_lora_params(params, cfg, lora_mod.LoRAConfig(r=2, alpha=4),
                                  jax.random.PRNGKey(1))
    lp = jax.tree_util.tree_map_with_path(
        lambda path, x: x + 0.05 if "lora_B" in str(path[-1]) else x, lp
    )
    _, delta = lora_mod.split_lora_state(lp)
    delta_path = tmp_path / "lora.safetensors"
    save_flat_checkpoint(_flatten_delta(delta), delta_path)

    out = tmp_path / "merged"
    merge_lora(checkpoint_dir, delta_path, out)
    assert (out / "lit_config.json").is_file()
    cfg2, merged_params = load_model_params(out)
    idx = jnp.asarray([[1, 2, 3, 4]], jnp.int32)
    lm, _ = gpt.forward(merged_params, cfg2, idx)
    lu, _ = gpt.forward(lp, cfg, idx)
    np.testing.assert_allclose(np.asarray(lm), np.asarray(lu), atol=2e-4, rtol=1e-3)


def test_generate_cli_gptq_calib(checkpoint_dir, capsys, tmp_path):
    """--gptq_calib routes a 4-bit quantize through GPTQ error compensation."""
    from fastmax_tpu.inference.generate import main

    calib = tmp_path / "calib.txt"
    calib.write_text("hello world this is a tiny tokenizer " * 4)
    main(
        prompt="hello", checkpoint_dir=checkpoint_dir, num_samples=1,
        max_new_tokens=4, temperature=0.0, quantize="gptq.int4",
        precision="float32", gptq_calib=calib,
    )
    assert "tokens/sec" in capsys.readouterr().err


def test_engine_scan_unroll_parity(checkpoint_dir):
    """scan_unroll only changes scheduling: greedy decode must be identical."""
    from fastmax_tpu.inference.engine import InferenceEngine
    from fastmax_tpu.models.config import Config
    from fastmax_tpu.utils.checkpoint import load_model_params

    cfg = Config.from_checkpoint(checkpoint_dir)
    _, params = load_model_params(checkpoint_dir, cfg, jnp.float32)
    prompt = jnp.asarray(np.arange(1, 9), jnp.int32)
    outs = []
    for unroll in (1, 2):
        eng = InferenceEngine(cfg, params, max_seq_length=64, batch_size=1,
                              scan_unroll=unroll)
        outs.append(np.asarray(eng.generate(prompt, 24, temperature=0.0,
                                            key=jax.random.PRNGKey(3))))
    np.testing.assert_array_equal(outs[0], outs[1])


def test_chunked_prefill_matches_single_call():
    """generate() auto-chunks long prompts (engine.PREFILL_CHUNK); the
    chunked cache fill must produce identical greedy tokens."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from fastmax_tpu.models.config import Config
    from fastmax_tpu.models import gpt
    from fastmax_tpu.inference.engine import InferenceEngine

    cfg = Config(
        name="chunk-t", block_size=96, vocab_size=96, padded_vocab_size=96,
        n_layer=2, n_head=4, n_embd=64, n_query_groups=2, rotary_percentage=1.0,
        parallel_residual=False, bias=False, _norm_class="RMSNorm",
        _mlp_class="LLaMAMLP", intermediate_size=128,
    )
    params = gpt.init_params(cfg, jax.random.PRNGKey(0))
    prompt = jnp.asarray(np.random.default_rng(3).integers(1, 96, (40,)), jnp.int32)

    ref_eng = InferenceEngine(cfg, params, max_seq_length=96, batch_size=1)
    ref = np.asarray(ref_eng.generate(prompt, 56, temperature=0.0,
                                      key=jax.random.PRNGKey(1)))

    ch_eng = InferenceEngine(cfg, params, max_seq_length=96, batch_size=1)
    ch_eng.PREFILL_CHUNK = 16  # force chunking (40-token prompt -> 16+16+8)
    got = np.asarray(ch_eng.generate(prompt, 56, temperature=0.0,
                                     key=jax.random.PRNGKey(1)))
    np.testing.assert_array_equal(got, ref)
