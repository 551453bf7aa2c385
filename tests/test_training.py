"""End-to-end training recipe tests (the reference's test_pretrain_tinyllama /
test_lora script-level coverage, run for real on tiny models)."""

import json
from pathlib import Path

import jax
import numpy as np
import pytest

from fastmax_tpu.models.config import Config, registry
from fastmax_tpu.utils.args import EvalArgs, IOArgs, TrainArgs


@pytest.fixture
def tiny_registry_entry():
    registry()["test-tiny-model"] = dict(
        name="test-tiny-model", block_size=64, vocab_size=256, padded_vocab_size=256,
        n_layer=2, n_head=4, n_embd=64, rotary_percentage=1.0, parallel_residual=False,
        bias=False, _norm_class="RMSNorm", _mlp_class="LLaMAMLP", intermediate_size=128,
    )
    yield "test-tiny-model"


def test_pretrain_enwik8_loss_decreases(tmp_path, tiny_registry_entry):
    from fastmax_tpu.training import pretrain

    # synthetic "enwik8": structured bytes so the model can learn quickly
    data = (np.arange(400_000) % 7 + 65).astype(np.uint8).tobytes()
    src = tmp_path / "enwik8"
    src.write_bytes(data)

    out = tmp_path / "out"
    pretrain.setup(
        model_name=tiny_registry_entry,
        data_format="enwik8",
        logger_name="csv",
        train=TrainArgs(global_batch_size=4, micro_batch_size=2, max_iters=30,
                        learning_rate=3e-3, save_interval=1000, log_interval=5,
                        lr_warmup_steps=5),
        eval=EvalArgs(interval=25, max_iters=4),
        io=IOArgs(train_data_dir=src, out_dir=out),
    )
    metrics = (out / "metrics.csv").read_text().strip().splitlines()
    rows = [dict(zip(metrics[0].split(","), r.split(","))) for r in metrics[1:]]
    losses = [float(r["loss"]) for r in rows if r.get("loss")]
    assert losses[-1] < losses[0] * 0.8, losses
    # deploy checkpoint written
    assert (out / "final" / "lit_config.json").is_file()
    assert (out / "final" / "model" / "index.json").is_file()


def test_pretrain_resume(tmp_path, tiny_registry_entry):
    from fastmax_tpu.training import pretrain

    data = (np.arange(200_000) % 11 + 40).astype(np.uint8).tobytes()
    src = tmp_path / "enwik8"
    src.write_bytes(data)
    out = tmp_path / "out"
    args = dict(
        model_name=tiny_registry_entry, data_format="enwik8", logger_name="csv",
        eval=EvalArgs(interval=1000, max_iters=1),
        io=IOArgs(train_data_dir=src, out_dir=out, resume=True),
    )
    pretrain.setup(
        train=TrainArgs(global_batch_size=2, micro_batch_size=2, max_iters=5,
                        save_interval=5, log_interval=100, lr_warmup_steps=2),
        **args,
    )
    # resume continues past step 5
    pretrain.setup(
        train=TrainArgs(global_batch_size=2, micro_batch_size=2, max_iters=8,
                        save_interval=5, log_interval=100, lr_warmup_steps=2),
        **args,
    )


def test_finetune_lora_quantized(tmp_path, tiny_registry_entry):
    """QLoRA smoke: nf4 base + lora deltas, loss decreases, delta ckpt saved."""
    from fastmax_tpu.training import finetune

    rng = np.random.default_rng(0)
    examples = []
    for _ in range(32):
        n = int(rng.integers(10, 30))
        ids = rng.integers(1, 250, size=n)
        labels = ids.copy()
        labels[: n // 2] = -1
        examples.append({"input_ids": ids, "labels": labels})
    data_path = tmp_path / "train.npz"
    np.savez_compressed(data_path, examples=np.asarray(examples, dtype=object))

    out = tmp_path / "out"
    finetune.setup(
        method="lora",
        model_name=tiny_registry_entry,
        data_path=data_path,
        quantize="bnb.nf4",
        lora_mlp=True,
        train=TrainArgs(global_batch_size=4, micro_batch_size=2, max_iters=10,
                        learning_rate=1e-2, save_interval=100, log_interval=2,
                        lr_warmup_steps=2, max_seq_length=64),
        eval=EvalArgs(interval=1000),
        io=IOArgs(out_dir=out),
    )
    assert (out / "lora_weights.safetensors").is_file()
    from safetensors import safe_open

    with safe_open(str(out / "lora_weights.safetensors"), framework="np") as sf:
        names = list(sf.keys())
    assert names and all("lora_" in n for n in names)


@pytest.mark.parametrize("method", ["adapter", "adapter_v2", "full"])
def test_finetune_methods_smoke(tmp_path, tiny_registry_entry, method):
    from fastmax_tpu.training import finetune

    rng = np.random.default_rng(0)
    examples = [
        {"input_ids": rng.integers(1, 250, size=16), "labels": rng.integers(1, 250, size=16)}
        for _ in range(8)
    ]
    data_path = tmp_path / "train.npz"
    np.savez_compressed(data_path, examples=np.asarray(examples, dtype=object))
    out = tmp_path / "out"
    finetune.setup(
        method=method, model_name=tiny_registry_entry, data_path=data_path,
        train=TrainArgs(global_batch_size=2, micro_batch_size=2, max_iters=3,
                        save_interval=100, log_interval=10, lr_warmup_steps=1,
                        max_seq_length=64),
        eval=EvalArgs(interval=1000),
        io=IOArgs(out_dir=out),
    )
    suffix = f"{method}_weights.safetensors"
    assert (out / suffix).is_file()


def test_prepare_alpaca_roundtrip(tmp_path):
    """prepare -> SFTDataset.load -> batch shapes/masking."""
    from fastmax_tpu.scripts import prepare_alpaca
    from fastmax_tpu.data.lm_datasets import SFTDataset

    # minimal HF-tokenizer checkpoint dir
    from tokenizers import Tokenizer as HFTok
    from tokenizers.models import BPE
    from tokenizers.trainers import BpeTrainer
    from tokenizers.pre_tokenizers import Whitespace

    tok = HFTok(BPE(unk_token="[UNK]"))
    tok.pre_tokenizer = Whitespace()
    trainer = BpeTrainer(special_tokens=["[UNK]", "<eos>"], vocab_size=200)
    tok.train_from_iterator(["the quick brown fox writes responses to instructions"] * 10, trainer)
    ckpt = tmp_path / "ckpt"
    ckpt.mkdir()
    tok.save(str(ckpt / "tokenizer.json"))
    (ckpt / "tokenizer_config.json").write_text(json.dumps({"eos_token": "<eos>"}))

    records = [
        {"instruction": "write the fox", "input": "", "output": "the quick brown fox"},
        {"instruction": "respond", "input": "quick", "output": "responses to instructions"},
    ] * 10
    data_file = tmp_path / "records.json"
    data_file.write_text(json.dumps(records))

    dest = tmp_path / "prepared"
    prepare_alpaca.prepare(
        data_file=data_file, checkpoint_dir=ckpt, destination_path=dest,
        test_split_fraction=0.1, max_seq_length=64,
    )
    ds = SFTDataset.load(dest / "train.npz")
    inputs, labels = ds.sample_batch(4, 64)
    assert inputs.shape == labels.shape
    assert (labels == -1).any()  # prompt masking applied
    assert inputs.shape[1] % 64 == 0  # bucketed padding


def test_prepare_style_normalizers():
    """Per-dataset record layouts map onto {instruction, input, output}
    exactly as the reference's per-dataset prepare scripts do
    (prepare_dolly.py:54-55, prepare_flan.py:208/227, prepare_lima.py:105-116,
    prepare_booksum.py:104-130)."""
    from fastmax_tpu.data.prompts import NORMALIZERS, STYLES

    dolly = NORMALIZERS["dolly"]({"instruction": "i", "context": "c", "response": "r"})
    assert dolly == [{"instruction": "i", "input": "c", "output": "r"}]

    flan = NORMALIZERS["flan"]({"inputs": "task text", "targets": "answer"})
    assert flan == [{"instruction": "task text", "input": "", "output": "answer"}]
    # flan's template shows the task under "### Instruction:" with no Input block
    assert "### Instruction:\ntask text" in STYLES["flan"](flan[0])
    assert "### Input" not in STYLES["flan"](flan[0])

    convo = {"conversations": ["q1", "a1", "q2", "a2"]}
    assert NORMALIZERS["lima"](convo) == [
        {"instruction": "q1", "input": "", "output": "a1"}
    ]
    assert NORMALIZERS["lima"](convo, include_multiturn=True) == [
        {"instruction": "q1", "input": "", "output": "a1"},
        {"instruction": "q2", "input": "", "output": "a2"},
    ]

    book = NORMALIZERS["booksum"]({"chapter": "long text", "summary_text": "short"})
    assert book[0]["instruction"].startswith("Write a summary")
    assert book[0]["input"] == "long text" and book[0]["output"] == "short"

    # alpaca/longform/csv records pass through untouched
    rec = {"instruction": "i", "input": "x", "output": "o"}
    assert NORMALIZERS["alpaca"](rec) == [rec]


def test_remat_policies_same_grads():
    """remat=False / "full" / "dots" change memory, never numerics."""
    import jax.numpy as jnp

    from fastmax_tpu.models import gpt
    from fastmax_tpu.utils.loss import cross_entropy

    cfg = Config(block_size=32, vocab_size=64, padded_vocab_size=64,
                 n_layer=2, n_head=2, n_embd=32, rotary_percentage=1.0)
    params = gpt.init_params(cfg, jax.random.PRNGKey(0), jnp.float32)
    batch = jnp.asarray(
        np.random.default_rng(0).integers(0, 64, (2, 33)), jnp.int32
    )

    def loss(params, remat):
        logits, _ = gpt.forward(params, cfg, batch[:, :-1], remat=remat)
        return cross_entropy(logits, batch[:, 1:])

    ref_l, ref_g = jax.value_and_grad(loss)(params, False)
    for policy in (True, "full", "dots", "attn"):
        l, g = jax.value_and_grad(loss)(params, policy)
        np.testing.assert_allclose(float(l), float(ref_l), rtol=1e-6)
        jax.tree.map(
            lambda a, b: np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6),
            g, ref_g,
        )

    with pytest.raises(ValueError, match="remat"):
        loss(params, "bogus")


def test_remat_attn_with_blockwise_kernel(monkeypatch):
    """remat="attn" saves the blockwise kernel's named (out, lse) residuals;
    gradients still match the no-remat reference exactly."""
    import jax.numpy as jnp

    from fastmax_tpu.models import gpt
    from fastmax_tpu.ops import attention as attn_mod
    from fastmax_tpu.utils.loss import cross_entropy

    # force the blockwise kernel on at toy sizes so the named residuals exist
    monkeypatch.setattr(attn_mod, "BLOCKWISE_MIN_T", 16)
    monkeypatch.setattr(attn_mod, "BLOCKWISE_BLOCK", 16)

    cfg = Config(block_size=32, vocab_size=64, padded_vocab_size=64,
                 n_layer=2, n_head=2, n_embd=32, rotary_percentage=1.0)
    params = gpt.init_params(cfg, jax.random.PRNGKey(0), jnp.float32)
    batch = jnp.asarray(np.random.default_rng(0).integers(0, 64, (2, 33)), jnp.int32)

    def loss(params, remat):
        logits, _ = gpt.forward(params, cfg, batch[:, :-1], remat=remat)
        return cross_entropy(logits, batch[:, 1:])

    ref_l, ref_g = jax.value_and_grad(loss)(params, False)
    l, g = jax.value_and_grad(loss)(params, "attn")
    np.testing.assert_allclose(float(l), float(ref_l), rtol=1e-6)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6),
        g, ref_g,
    )


def test_finetune_qlora_gptq_calibrated(tmp_path, tiny_registry_entry):
    """QLoRA with --gptq_calib: the base quantizes with GPTQ error
    compensation against a training-data batch, then trains normally."""
    from fastmax_tpu.training import finetune

    rng = np.random.default_rng(1)
    examples = []
    for _ in range(16):
        n = int(rng.integers(10, 30))
        ids = rng.integers(1, 250, size=n)
        examples.append({"input_ids": ids, "labels": ids.copy()})
    data_path = tmp_path / "train.npz"
    np.savez_compressed(data_path, examples=np.asarray(examples, dtype=object))

    out = tmp_path / "out_gptq"
    finetune.setup(
        method="lora",
        model_name=tiny_registry_entry,
        data_path=data_path,
        quantize="gptq.int4",
        gptq_calib=True,
        train=TrainArgs(global_batch_size=2, micro_batch_size=2, max_iters=4,
                        learning_rate=1e-2, save_interval=100, log_interval=2,
                        lr_warmup_steps=2, max_seq_length=64),
        eval=EvalArgs(interval=1000),
        io=IOArgs(out_dir=out),
    )
    assert (out / "lora_weights.safetensors").is_file()


def test_pretrain_sharded_mesh(tmp_path, tiny_registry_entry):
    """--dp/--fsdp/--tp pretrain (the reference's FSDP-when-devices>1 role):
    the full recipe runs SPMD over an 8-device mesh and the loss decreases."""
    from fastmax_tpu.training import pretrain

    data = (np.arange(300_000) % 7 + 65).astype(np.uint8).tobytes()
    src = tmp_path / "enwik8"
    src.write_bytes(data)
    out = tmp_path / "out"
    pretrain.setup(
        model_name=tiny_registry_entry,
        data_format="enwik8",
        logger_name="csv",
        dp=2, fsdp=2, tp=2,
        train=TrainArgs(global_batch_size=8, micro_batch_size=4, max_iters=20,
                        learning_rate=3e-3, save_interval=1000, log_interval=5,
                        lr_warmup_steps=5),
        eval=EvalArgs(interval=100, max_iters=2),
        io=IOArgs(train_data_dir=src, out_dir=out),
    )
    metrics = (out / "metrics.csv").read_text().strip().splitlines()
    rows = [dict(zip(metrics[0].split(","), r.split(","))) for r in metrics[1:]]
    losses = [float(r["loss"]) for r in rows if r.get("loss")]
    assert losses[-1] < losses[0] * 0.9, losses


def test_pretrain_sharded_batch_guard(tmp_path, tiny_registry_entry):
    from fastmax_tpu.training import pretrain

    with pytest.raises(ValueError, match="must divide over"):
        pretrain.setup(
            model_name=tiny_registry_entry, data_format="enwik8",
            dp=4, fsdp=2,
            train=TrainArgs(global_batch_size=3, micro_batch_size=3, max_iters=1),
            io=IOArgs(train_data_dir=tmp_path, out_dir=tmp_path / "o"),
        )


def test_finetune_lora_sharded(tmp_path, tiny_registry_entry):
    """QLoRA over a mesh: quantized base + LoRA deltas shard (PEFT leaves
    fall back to fsdp/replicated specs) and training produces a delta file."""
    import safetensors.numpy as st

    from fastmax_tpu.training import finetune

    rng = np.random.default_rng(0)
    examples = [
        {"input_ids": rng.integers(1, 250, size=(24,)),
         "labels": rng.integers(1, 250, size=(24,))}
        for _ in range(16)
    ]
    data_path = tmp_path / "train.npz"
    np.savez_compressed(data_path, examples=np.asarray(examples, dtype=object))
    out = tmp_path / "out"

    finetune.setup(
        method="lora",
        model_name=tiny_registry_entry,
        data_path=data_path,
        quantize="bnb.nf4",
        fsdp=2, tp=2,
        train=TrainArgs(global_batch_size=4, micro_batch_size=2, max_iters=6,
                        learning_rate=3e-3, save_interval=1000, log_interval=2,
                        max_seq_length=24),
        io=IOArgs(out_dir=out),
    )
    delta = st.load_file(out / "lora_weights.safetensors")
    assert any("lora" in k for k in delta)
