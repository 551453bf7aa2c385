"""Mesh construction and parameter sharding rules (pjit/GSPMD).

This single module replaces four reference subsystems (SURVEY.md §2.7):
generate/tp.py's hook-based tensor parallelism, generate/sequentially.py's
layer streaming, Lightning's FSDPStrategy, and the XLAFSDP path — all become
NamedSharding annotations on one mesh; XLA's SPMD partitioner inserts the
all-gathers/psums that the reference wrote by hand (tp.py:73-74).

Mesh axes:
  data   pure data parallelism (gradient psum only)
  fsdp   parameter sharding (ZeRO-3): params sharded here, all-gathered
         per-layer by GSPMD; batch is also split over this axis
  model  tensor parallelism (megatron): QKV/fc colwise, proj rowwise

Rules mirror the reference TP layout (generate/tp.py:48-74): attention QKV
and MLP up-projections shard output features; attn.proj / mlp.proj shard
input features (their outputs are partial sums -> GSPMD inserts the
reduce). The fused QKV shards along query groups, so `n_query_groups` must
be divisible by the model-axis size (the reference divides n_head/config
the same way, tp.py:82-90). MoE experts shard their leading expert axis on
the model axis (expert parallelism; the reference instead TP-sliced every
expert, tp.py:58-62).

All specs account for the leading (n_layer,) stack axis of the scan layout.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.config import Config

DATA_AXIS = "data"
FSDP_AXIS = "fsdp"
MODEL_AXIS = "model"


def make_mesh(
    data: int = 1, fsdp: int = 1, model: int = 1, devices=None
) -> Mesh:
    """Build a (data, fsdp, model) mesh over the available devices."""
    devices = devices if devices is not None else jax.devices()
    n = data * fsdp * model
    if n > len(devices):
        raise ValueError(f"mesh needs {n} devices, have {len(devices)}")
    arr = np.asarray(devices[:n]).reshape(data, fsdp, model)
    return Mesh(arr, (DATA_AXIS, FSDP_AXIS, MODEL_AXIS))


def granule_ids(devices, granule_size: int | None = None) -> list:
    """Connectivity granule of each device: devices in the same granule share
    fast links (ICI); different granules talk over DCN. On real TPU pods the
    granule is the slice (``slice_index``); multi-host single-slice setups
    fall back to ``process_index``. ``granule_size`` overrides with a
    simulated granule width (for virtual-device dryruns, where every CPU
    device reports process 0)."""
    out = []
    for i, d in enumerate(devices):
        if granule_size:
            out.append(i // granule_size)
            continue
        gid = getattr(d, "slice_index", None)
        out.append(gid if gid is not None else d.process_index)
    return out


def make_hybrid_mesh(
    data: int = 1,
    fsdp: int = 1,
    model: int = 1,
    devices=None,
    granule_size: int | None = None,
) -> Mesh:
    """DCN-aware hybrid mesh: the ``data`` axis spans granules (so pure-DP
    gradient all-reduces — the only cross-granule traffic under hybrid
    shard — ride DCN), while ``fsdp`` and ``model`` stay inside a granule
    (per-layer all-gathers and TP psums ride ICI).

    The TPU-native equivalent of the reference's
    ``FSDPStrategy(sharding_strategy="HYBRID_SHARD")``
    (pretrain/tinyllama.py:66): shard parameters intra-node, replicate
    inter-node. ``make_mesh``'s flat ``reshape`` ignores physical
    connectivity — on a multi-granule slice it can land the fsdp axis
    *across* DCN, which is exactly backwards; this constructor orders
    devices granule-major so mesh coordinates map onto the topology.

    Requires at least ``data`` granules with ``fsdp*model`` devices each.
    Verify placement with :func:`assert_hybrid_placement`.
    """
    devices = list(devices if devices is not None else jax.devices())
    gids = granule_ids(devices, granule_size)
    groups: dict = {}
    for d, g in zip(devices, gids):
        groups.setdefault(g, []).append(d)
    ordered = sorted(groups)
    per = fsdp * model
    usable = [g for g in ordered if len(groups[g]) >= per]
    if len(usable) < data:
        raise ValueError(
            f"hybrid mesh needs {data} granules of >= {per} devices; "
            f"topology has {[(g, len(groups[g])) for g in ordered]} "
            "(single-granule topologies should use make_mesh)"
        )
    arr = np.empty((data, fsdp, model), dtype=object)
    for i in range(data):
        arr[i] = np.asarray(groups[usable[i]][:per]).reshape(fsdp, model)
    return Mesh(arr, (DATA_AXIS, FSDP_AXIS, MODEL_AXIS))


def assert_hybrid_placement(mesh: Mesh, granule_size: int | None = None,
                            all_devices=None) -> None:
    """Check the hybrid invariant: each mesh.devices[i] (one data index)
    lies inside a single granule, and distinct data indices lie in distinct
    granules. ``granule_size``/``all_devices`` must match the values given
    to make_hybrid_mesh (simulated granules are defined by position in the
    full device list)."""
    all_devices = list(all_devices if all_devices is not None else jax.devices())
    gid_of = dict(zip(all_devices, granule_ids(all_devices, granule_size)))
    arr = mesh.devices
    granules_seen = []
    for i in range(arr.shape[0]):
        gids = {gid_of[d] for d in arr[i].ravel()}
        assert len(gids) == 1, (
            f"data index {i} spans granules {sorted(gids)} — fsdp/model "
            "collectives would cross DCN"
        )
        granules_seen.append(gids.pop())
    assert len(set(granules_seen)) == arr.shape[0], (
        f"data axis reuses granules: {granules_seen}"
    )


def _fsdp_dim(spec: tuple, shape: tuple, fsdp_on: bool, divisor: int) -> tuple:
    """Add the fsdp axis to the largest still-unsharded, divisible dim."""
    if not fsdp_on:
        return spec
    best, best_size = None, 0
    for i, (s, dim) in enumerate(zip(spec, shape)):
        if s is None and dim % divisor == 0 and dim > best_size:
            best, best_size = i, dim
    if best is None:
        return spec
    out = list(spec)
    out[best] = FSDP_AXIS
    return tuple(out)


def param_specs(cfg: Config, params: dict, *, tp: bool = True, fsdp_size: int = 1) -> dict:
    """PartitionSpec pytree matching ``params``.

    tp=False gives pure FSDP/replicated layouts. fsdp_size > 1 additionally
    shards every tensor's largest free dim over the fsdp axis.
    """
    fsdp_on = fsdp_size > 1

    def leaf_spec(path: tuple, leaf) -> P:
        shape = leaf.shape
        name = path[-1]
        col = MODEL_AXIS if tp else None  # output-feature sharding
        row = MODEL_AXIS if tp else None  # input-feature sharding
        spec = [None] * len(shape)

        def tagged(*tags):
            s = list(tags)
            return tuple(s + [None] * (len(shape) - len(s)))

        if path[0] == "blocks":
            # leading axis is n_layer (and experts add another)
            if "experts" in path:
                # (L, E, in, out): expert parallelism over the model axis
                spec = [None, col] + [None] * (len(shape) - 2)
            elif path[-2] == "attn" and name in ("kernel", "bias", "q4", "q8", "absmax"):
                # fused QKV: shard output features (last dim)
                spec = [None] * (len(shape) - 1) + [col]
            elif path[-2] == "proj" and name in ("kernel", "q4", "q8"):
                # rowwise: shard input features (dim 1 after the layer axis)
                spec = [None, row] + [None] * (len(shape) - 2)
            elif path[-2] == "proj" and name == "absmax":
                # (L, in/block, out) blocks follow the input axis
                spec = [None, row] + [None] * (len(shape) - 2)
            elif path[-2] in ("fc", "fc_1", "fc_2") and name in ("kernel", "bias", "q4", "q8", "absmax"):
                spec = [None] * (len(shape) - 1) + [col]
            elif path[-2] == "gate":
                spec = [None] * len(shape)
            # norms and other biases stay replicated (tiny)
        elif path[0] == "lm_head" and name in ("kernel", "q4", "q8"):
            spec = [None] * (len(shape) - 1) + [col]
        elif path[0] == "wte":
            # replicated over model: the embedding lookup is a gather, and a
            # vocab-sharded table would force an all-gather per token; with
            # fsdp>1 the table still gets its largest dim sharded below
            spec = [None] * len(shape)

        spec = _fsdp_dim(tuple(spec), shape, fsdp_on, fsdp_size)
        return P(*spec)

    def walk(node, path):
        if isinstance(node, dict):
            return {k: walk(v, path + (k,)) for k, v in node.items()}
        return leaf_spec(path, node)

    return {k: walk(v, (k,)) for k, v in params.items()}


def sanitize_spec(spec: P, shape: tuple, mesh: Mesh) -> P:
    """Drop axis names whose mesh size doesn't divide the dim (quantized
    scale planes and PEFT leaves have tiny dims — e.g. an absmax block
    count of 1 — that a generic layout rule can't shard)."""
    out = []
    for d, names in enumerate(tuple(spec) + (None,) * (len(shape) - len(spec))):
        if names is None:
            out.append(None)
            continue
        group = names if isinstance(names, tuple) else (names,)
        size = 1
        for n in group:
            size *= mesh.shape.get(n, 1)
        out.append(names if shape[d] % size == 0 else None)
    return P(*out)


def shard_params(params: dict, mesh: Mesh, specs: dict) -> dict:
    """device_put the pytree with NamedShardings from ``specs``."""
    return jax.tree.map(
        lambda x, s: jax.device_put(
            x, NamedSharding(mesh, sanitize_spec(s, x.shape, mesh))
        ),
        params,
        specs,
    )


def gather_fsdp_local(params, specs, axis: str = FSDP_AXIS):
    """Inside ``shard_map``: undo the fsdp (ZeRO-3) sharding of a param
    pytree by all-gathering each leaf's fsdp-sharded dim (tiled) — the
    manual counterpart of GSPMD's per-layer all-gather, used by the
    composed shard_map training modes (sequence_parallel, pipeline) where
    params arrive as explicit local shards."""

    def g(x, spec):
        for d, names in enumerate(tuple(spec)):
            group = names if isinstance(names, tuple) else (names,)
            if axis in group:
                return jax.lax.all_gather(x, axis, axis=d, tiled=True)
        return x

    def walk(p, s):
        if isinstance(p, dict):
            return {k: walk(v, s[k]) for k, v in p.items()}
        return g(p, s)

    return walk(params, specs)


def kv_cache_specs(cfg: Config, *, tp: bool = True) -> dict:
    """Cache specs: batch over data+fsdp, query groups over model.

    Covers both cache layouts of gpt.init_kv_cache — k/v (L, B, G, S, hs)
    and, for the int8 cache, k_scale/v_scale (L, B, G, S).

    MQA (G == 1) cannot shard groups — the cache is replicated over model
    (the reference hits the same constraint and keeps a single KV head,
    model.py:408-416).
    """
    group_axis = MODEL_AXIS if (tp and cfg.n_query_groups > 1) else None
    kv = P(None, (DATA_AXIS, FSDP_AXIS), group_axis, None, None)
    scale = P(None, (DATA_AXIS, FSDP_AXIS), group_axis, None)
    return {"k": kv, "v": kv, "k_scale": scale, "v_scale": scale}


def shard_kv_cache(cache: dict, mesh: Mesh, cfg: Config, *, tp: bool = True) -> dict:
    """Place a fresh KV cache on the mesh (engine path; the continuous
    batcher builds its own slotted specs, inference/continuous.py)."""
    specs = kv_cache_specs(cfg, tp=tp)
    return {
        k: jax.device_put(
            v, NamedSharding(mesh, sanitize_spec(specs[k], v.shape, mesh))
        )
        for k, v in cache.items()
    }


def batch_spec() -> P:
    return P((DATA_AXIS, FSDP_AXIS))
