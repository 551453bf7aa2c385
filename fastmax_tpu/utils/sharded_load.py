"""Host-RAM-bounded sharded checkpoint loading.

The reference's XLA path solved "load a 70B model on hosts with less RAM
than the checkpoint" with per-block sequential load + broadcast
(xla/utils.py:34-113 ``sequential_load_and_fsdp_wrap``). The TPU-native
redesign: every parameter is built directly as a global ``jax.Array`` via
``jax.make_array_from_callback`` — each host's callback reads ONLY the
index-slices its addressable shards need, straight from memory-mapped
checkpoint storage. No host ever materializes a full tensor it doesn't
own, and the weights land pre-sharded (no resharding collective at load).

Works with the native npy-per-tensor layout (mmap slices read only the
touched pages) and .safetensors (``get_slice`` partial reads); the torch
``lit_model.pth`` format falls back to mmap'd full-tensor reads (still one
tensor at a time).

Usage:
    mesh = make_mesh(data=1, fsdp=4, model=2)
    cfg, params = load_sharded_model_params(
        ckpt_dir, mesh, dtype=jnp.bfloat16, tp=True, fsdp_size=4)
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


class LazyLeaf:
    """A tensor that knows its shape and how to read an index-slice of
    itself from storage; the pytree leaf type for the lazy parameter tree."""

    __slots__ = ("shape", "read")

    def __init__(self, shape: Tuple[int, ...], read: Callable):
        self.shape = tuple(shape)
        self.read = read  # read(idx: tuple of slices) -> np.ndarray


def _lazy_get(src, transpose: bool = False) -> LazyLeaf:
    """LazyLeaf over one stored tensor (optionally 2D-transposed)."""
    shape = tuple(src.shape)
    if transpose:
        if len(shape) != 2:
            raise ValueError(f"transpose only supported for 2D, got {shape}")
        t_shape = (shape[1], shape[0])

        def read_t(idx):
            return np.asarray(src[(idx[1], idx[0])]).T

        return LazyLeaf(t_shape, read_t)
    return LazyLeaf(shape, lambda idx: np.asarray(src[idx]))


def _lazy_stack(leaves) -> LazyLeaf:
    """Stack LazyLeaf tensors on a new leading axis, reading lazily."""
    leaves = list(leaves)
    shape = (len(leaves),) + leaves[0].shape

    def read(idx):
        lead, rest = idx[0], tuple(idx[1:])
        if isinstance(lead, int):
            return leaves[lead].read(rest)
        sel = range(*lead.indices(len(leaves)))
        return np.stack([leaves[i].read(rest) for i in sel])

    return LazyLeaf(shape, read)


class _SafetensorSlice:
    """Adapter giving safetensors' get_slice the mmap-array interface."""

    def __init__(self, handle, name):
        self._sl = handle.get_slice(name)
        self.shape = tuple(self._sl.get_shape())

    def __getitem__(self, idx):
        return self._sl[idx]


class _TorchTensorSlice:
    """Adapter over an mmap'd torch tensor (bf16-safe numpy conversion)."""

    def __init__(self, tensor):
        self._t = tensor
        self.shape = tuple(tensor.shape)

    def __getitem__(self, idx):
        import torch

        t = self._t[idx]
        if t.dtype == torch.bfloat16:
            t = t.float()
        return t.numpy()


def open_lazy_checkpoint(path: Path) -> dict:
    """name -> sliceable storage handle for every tensor, without reading
    any tensor data (mmap / lazy handles only)."""
    path = Path(path)
    if path.is_dir() and (path / "model" / "index.json").is_file():
        model_dir = path / "model"
        with open(model_dir / "index.json") as fp:
            names = json.load(fp)
        return {
            name: np.load(model_dir / (name.replace("/", "_") + ".npy"), mmap_mode="r")
            for name in names
        }
    if path.is_dir():
        for candidate in ("lit_model.pth", "model.safetensors"):
            if (path / candidate).is_file():
                return open_lazy_checkpoint(path / candidate)
        raise FileNotFoundError(f"no weights found under {path}")
    if path.suffix == ".safetensors":
        from safetensors import safe_open

        handle = safe_open(str(path), framework="np")
        return {name: _SafetensorSlice(handle, name) for name in handle.keys()}
    if path.suffix in (".pth", ".pt", ".bin"):
        import torch

        sd = torch.load(str(path), map_location="cpu", weights_only=True, mmap=True)
        return {name: _TorchTensorSlice(t) for name, t in sd.items()}
    raise ValueError(f"unsupported checkpoint path {path}")


def lazy_model_params(checkpoint_dir: Path, cfg) -> dict:
    """The model parameter pytree with LazyLeaf leaves (nothing read yet)."""
    from ..models.params import flat_to_params

    flat = open_lazy_checkpoint(Path(checkpoint_dir))
    return flat_to_params(
        flat, cfg, leaf_get=_lazy_get, leaf_stack=_lazy_stack
    )


def materialize_sharded(lazy_params: dict, mesh, specs: dict, dtype=jnp.bfloat16) -> dict:
    """Build global jax.Arrays from LazyLeafs: per-shard callback reads."""
    from jax.sharding import NamedSharding

    np_dtype = np.dtype(dtype)

    def make(leaf: LazyLeaf, spec):
        sharding = NamedSharding(mesh, spec)

        def cb(idx, leaf=leaf):
            return np.ascontiguousarray(leaf.read(idx)).astype(np_dtype)

        return jax.make_array_from_callback(leaf.shape, sharding, cb)

    return jax.tree.map(
        make, lazy_params, specs, is_leaf=lambda x: isinstance(x, LazyLeaf)
    )


def load_quantized_model_params(
    checkpoint_dir: Path,
    *,
    cfg=None,
    mode: str = "int8",
    act_dtype=jnp.bfloat16,
):
    """(config, quantized params): stream a converted checkpoint straight
    into the int8 / tiled-int4 serving pytree with host RAM bounded at
    ~one layer slice plus one leaf's quantized copy.

    The role of the reference's load-then-quantize flow (generate/base.py's
    BitsandbytesPrecision converting each Linear as the checkpoint streams
    through it) at 7B-70B scale: each stacked linear kernel is read
    layer-slice-at-a-time from the mmap'd converted checkpoint, quantized
    on host in numpy, and shipped to device once per leaf — the dense
    model never exists in host RAM or on device. wte / lm_head / MoE
    experts stay dense (the engine's quantization skip rules).

    mode "int8": per-output-channel symmetric int8 ({"q8", "scale8"}).
    mode "int4": tiled linear-int4, rank-1 scale envelope (the fastest
                 decode representation measured on this chip — see
                 ops/quant_pallas.py).
    """
    from ..models.config import Config
    from ..ops import quant

    import mmap as _mmap

    from ..models.params import flat_to_params

    checkpoint_dir = Path(checkpoint_dir)
    if cfg is None:
        cfg = Config.from_checkpoint(checkpoint_dir)
    flat = open_lazy_checkpoint(checkpoint_dir)
    lazy = flat_to_params(flat, cfg, leaf_get=_lazy_get, leaf_stack=_lazy_stack)
    np_dtype = np.dtype(act_dtype)

    def drop_pages() -> None:
        """Release the mmap'd checkpoint pages read so far. Without this,
        clean file-backed pages stay resident and peak RSS grows to the
        full checkpoint size even though the quantizer only ever NEEDS one
        layer slice (measured r04: 17.1 GB VmHWM on a 12.55 GB 7B load;
        with per-leaf madvise(DONTNEED) the walk stays bounded)."""
        for h in flat.values():
            mm = getattr(h, "_mmap", None)
            if mm is not None:
                try:
                    mm.madvise(_mmap.MADV_DONTNEED)
                except (AttributeError, OSError, ValueError):
                    pass

    def read_full(leaf: LazyLeaf) -> np.ndarray:
        return leaf.read(tuple(slice(None) for _ in leaf.shape))

    def put_dense(leaf: LazyLeaf):
        return jnp.asarray(read_full(leaf).astype(np_dtype))

    def layer_slices(leaf: LazyLeaf):
        """Yield per-layer 2D (in, out) kernels of a (L, in, out) stack —
        one layer in host RAM at a time — or the kernel itself if 2D."""
        if len(leaf.shape) == 2:
            yield read_full(leaf)
            return
        for l in range(leaf.shape[0]):
            yield leaf.read((l,) + tuple(slice(None) for _ in leaf.shape[1:]))

    def quantize_leaf(leaf: LazyLeaf) -> dict:
        if mode == "int8":
            qs, ss = [], []
            for w in layer_slices(leaf):
                w = np.asarray(w, np.float32)
                scale = np.abs(w).max(axis=0) / 127.0
                scale = np.where(scale == 0, 1.0, scale).astype(np.float32)
                qs.append(np.clip(np.round(w / scale[None, :]), -128, 127)
                          .astype(np.int8))
                ss.append(scale)
            if len(leaf.shape) == 2:
                return {"q8": jnp.asarray(qs[0]), "scale8": jnp.asarray(ss[0])}
            return {"q8": jnp.asarray(np.stack(qs)),
                    "scale8": jnp.asarray(np.stack(ss))}
        if mode == "int4":
            per_layer = [quant.quantize_int4_tiled(w, "rank1")
                         for w in layer_slices(leaf)]
            if len(leaf.shape) == 2:
                return per_layer[0]
            return {k: jnp.stack([p[k] for p in per_layer])
                    for k in per_layer[0]}
        raise ValueError(f"unknown quantization mode {mode!r}")

    def walk(node, path):
        if isinstance(node, LazyLeaf):
            out = put_dense(node)
            drop_pages()
            return out
        if isinstance(node, dict):
            if ("kernel" in node and path[0] not in ("lm_head", "wte")
                    and "experts" not in path):
                out = quantize_leaf(node["kernel"])
                if "bias" in node:
                    out["bias"] = put_dense(node["bias"])
                drop_pages()
                return out
            return {k: walk(v, path + (k,)) for k, v in node.items()}
        return node

    result = {k: walk(v, (k,)) for k, v in lazy.items()}
    drop_pages()
    return cfg, result


def load_sharded_model_params(
    checkpoint_dir: Path,
    mesh,
    *,
    cfg=None,
    dtype=jnp.bfloat16,
    tp: bool = True,
    fsdp_size: int = 1,
    specs: Optional[dict] = None,
):
    """(config, sharded params): the multi-host-safe load path."""
    from ..models.config import Config
    from ..parallel.sharding import param_specs

    checkpoint_dir = Path(checkpoint_dir)
    if cfg is None:
        cfg = Config.from_checkpoint(checkpoint_dir)
    lazy = lazy_model_params(checkpoint_dir, cfg)
    if specs is None:
        specs = param_specs(cfg, lazy, tp=tp, fsdp_size=fsdp_size)
    return cfg, materialize_sharded(lazy, mesh, specs, dtype)
