"""From-scratch pretraining recipe.

Covers the reference's pretrain family with one CLI
(pretrain/openwebtext.py, pretrain/enwik8.py, pretrain/redpajama.py,
pretrain/tinyllama.py — SURVEY.md §2.5):

  --data_format openwebtext   nanoGPT train.bin/val.bin memmaps
  --data_format enwik8        byte-level random crops (easy-transformer cfg)
  --data_format packed        LITPKDS chunk dirs (redpajama/tinyllama style)

Supports --attn_alg (the fork's flag: quadratic/performer/linearmax/
fastmax/fastmax_cuda), sharded meshes via --dp/--fsdp/--tp, resume, and
csv/tensorboard/wandb logging.

Example:
  python -m fastmax_tpu.training.pretrain --model_name pythia-14m \\
      --data_format openwebtext --train_data_dir data/openwebtext \\
      --attn_alg fastmax --train.max_iters 1000
"""

from __future__ import annotations

import time
from pathlib import Path
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..models.config import Config
from ..models import gpt
from ..utils.args import EvalArgs, IOArgs, TrainArgs
from ..utils.logging import choose_logger
from .fit import TrainState, build_optimizer, fit, load_train_state, save_train_state


def data_iterators(data_format: str, io: IOArgs, block_size: int, batch_size: int, seed: int = 0):
    from ..data.packed_dataset import CombinedDataset, PackedDataset, batch_iterator
    from ..data.lm_datasets import Enwik8Dataset, MemmapDataset

    if data_format == "openwebtext":
        import json as _json

        data_dir = Path(io.train_data_dir)
        # prepare_openwebtext writes meta.json with the token dtype (int32
        # for >64k vocabularies); plain nanoGPT dirs default to uint16
        meta = data_dir / "meta.json"
        dtype = "uint16"
        if meta.is_file():
            dtype = _json.loads(meta.read_text()).get("dtype", "uint16")
        import numpy as _np

        train_ds = MemmapDataset(data_dir / "train.bin", block_size, seed,
                                 dtype=getattr(_np, dtype))
        val_dir = Path(io.val_data_dir or io.train_data_dir)
        val_dtype = dtype
        val_meta = val_dir / "meta.json"
        if val_meta.is_file():
            val_dtype = _json.loads(val_meta.read_text()).get("dtype", "uint16")
        val_path = val_dir / "val.bin"
        val_ds = (
            MemmapDataset(val_path, block_size, seed + 1, dtype=getattr(_np, val_dtype))
            if val_path.exists() else None
        )
    elif data_format == "enwik8":
        src = Path(io.train_data_dir)
        src = src / "enwik8.gz" if src.is_dir() else src
        train_ds = Enwik8Dataset(src, block_size, "train", seed)
        val_ds = Enwik8Dataset(src, block_size, "val", seed + 1)
    elif data_format == "packed":
        files = sorted(Path(io.train_data_dir).glob("*.bin"))
        if not files:
            raise FileNotFoundError(f"no .bin chunks under {io.train_data_dir}")
        from ..native.loader import NativePackedDataset, native_available

        if native_available():
            # C++ prefetch-threaded reader (fastmax_tpu/native)
            train_ds = NativePackedDataset(files, block_size + 1, seed=seed, wrap=True)
        else:
            train_ds = PackedDataset(files, n_chunks=min(8, len(files)),
                                     block_size=block_size + 1, seed=seed, wrap=True)
        val_ds = None
        if io.val_data_dir:
            vfiles = sorted(Path(io.val_data_dir).glob("*.bin"))
            val_ds = PackedDataset(vfiles, n_chunks=min(2, len(vfiles)),
                                   block_size=block_size + 1, seed=seed + 1, wrap=True)
    else:
        raise ValueError(f"unknown data_format {data_format!r}")

    train_iter = batch_iterator(train_ds, batch_size)
    val_iter_fn = (lambda: batch_iterator(val_ds, batch_size)) if val_ds is not None else None
    return train_iter, val_iter_fn


def setup(
    model_name: str = "easy-transformer",
    data_format: str = "openwebtext",
    attn_alg: Optional[str] = None,
    logger_name: str = "csv",
    seed: int = 1337,
    dtype: str = "float32",
    dp: int = 1,
    fsdp: int = 1,
    tp: int = 1,
    train: TrainArgs = TrainArgs(
        global_batch_size=8, micro_batch_size=4, max_iters=100, learning_rate=6e-4,
        save_interval=1000, log_interval=10,
    ),
    eval: EvalArgs = EvalArgs(interval=50, max_iters=20),
    io: IOArgs = IOArgs(),
) -> None:
    cfg = Config.from_name(model_name, **({"attn_alg": attn_alg} if attn_alg else {}))
    if train.max_seq_length:
        cfg.block_size = min(cfg.block_size, train.max_seq_length)

    out_dir = Path(io.out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    logger = choose_logger(logger_name, out_dir)

    params = gpt.init_params(cfg, jax.random.PRNGKey(seed), getattr(jnp, dtype))
    n_params = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))
    print(f"model {cfg.name}: {n_params/1e6:.1f}M params, attn_alg={cfg.attn_alg}")

    # ---- mesh: dp replicates, fsdp shards params+moments, tp megatron-shards
    # (the reference's FSDPStrategy / HYBRID_SHARD / XLAFSDP roles in one)
    mesh = None
    if dp * fsdp * tp > 1:
        from ..parallel import sharding as sh

        if train.micro_batch_size % (dp * fsdp) != 0:
            raise ValueError(
                f"micro_batch_size {train.micro_batch_size} must divide over "
                f"dp*fsdp = {dp * fsdp} (the batch mesh axes)"
            )
        mesh = sh.make_mesh(data=dp, fsdp=fsdp, model=tp)
        specs = sh.param_specs(cfg, params, tp=tp > 1, fsdp_size=fsdp)
        params = sh.shard_params(params, mesh, specs)
        print(f"mesh: dp={dp} fsdp={fsdp} tp={tp}")

    optimizer = build_optimizer(train)
    ckpt_dir = out_dir / "state"
    # optimizer moments inherit the params' shardings through init
    fresh = TrainState(params, optimizer.init(params))
    if io.resume and ckpt_dir.exists():
        state = load_train_state(ckpt_dir, template=fresh)
        print(f"resumed at step {state.step}")
    else:
        state = fresh

    train_iter, val_iter_fn = data_iterators(
        data_format, io, cfg.block_size, train.micro_batch_size, seed
    )

    t0 = time.perf_counter()
    state = fit(
        cfg, state, optimizer, train_iter,
        train=train, eval_args=eval, val_iter_fn=val_iter_fn, logger=logger,
        out_dir=out_dir, checkpoint_fn=lambda s: save_train_state(s, ckpt_dir),
        mesh=mesh,
    )
    print(f"done: {state.step} steps in {time.perf_counter()-t0:.1f}s")

    # deploy checkpoint (weights only, reference lit_model-style contract)
    from ..models.params import params_to_flat
    from ..utils.checkpoint import save_flat_checkpoint

    save_flat_checkpoint(params_to_flat(state.params, cfg), out_dir / "final")
    cfg.to_json(out_dir / "final" / "lit_config.json")
    logger.finalize()


def main() -> None:
    from ..utils.cli import CLI

    CLI(setup)


if __name__ == "__main__":
    main()
