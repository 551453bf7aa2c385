"""LoRA: low-rank adaptation, functional-style.

Capability parity with the reference's lora.py (737 LoC of nn.Module
subclassing, /root/reference/lit_gpt/lora.py): rank-r A/B residuals on any
linear, per-projection enable flags on the fused QKV (to_query/to_key/
to_value), MLP/head/projection coverage, LoRA-only checkpoint filtering,
merge (including merge into quantized base weights by dequantize -> add ->
requantize, ref lora.py:150-161).

TPU-native design: instead of subclassed modules, LoRA terms are extra
array leaves inside each linear's param dict —

  {"kernel"|q4/q8...: base,
   "lora_A": (in, r), "lora_B": (r, out), "lora_scale": (),
   ["lora_mask": (out,)]}

ops.linear applies  y += ((x @ A) @ B) * scale * mask  when the leaves are
present; gradients flow only into lora_A/lora_B under the trainable mask.
The fused-QKV enable flags become a static 0/1 mask over output features in
the GQA-interleaved layout — masking the *output* of the delta is exactly
the reference's zero_pad scatter of enabled projections (lora.py:263-342)
without the index bookkeeping. Everything stacks on the (n_layer,) scan
axis and shards under the same rules as base weights.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from .config import Config


@dataclass
class LoRAConfig:
    r: int = 8
    alpha: float = 16.0
    dropout: float = 0.0
    query: bool = True
    key: bool = False
    value: bool = True
    projection: bool = False
    mlp: bool = False
    head: bool = False


def qkv_enable_mask(cfg: Config, lora: LoRAConfig) -> np.ndarray:
    """0/1 over the fused QKV output features in grouped-interleaved layout
    [per group: q x q_per_kv | k | v] (ref lora.py lora_ind semantics)."""
    q_per_kv = cfg.n_head // cfg.n_query_groups
    hs = cfg.head_size
    group = np.concatenate(
        [
            np.full(q_per_kv * hs, 1.0 if lora.query else 0.0),
            np.full(hs, 1.0 if lora.key else 0.0),
            np.full(hs, 1.0 if lora.value else 0.0),
        ]
    )
    return np.tile(group, cfg.n_query_groups).astype(np.float32)


def _init_lora(key, n_in: int, n_out: int, lora: LoRAConfig, dtype, mask=None) -> dict:
    """A ~ kaiming-uniform (ref lora.py reset_parameters), B = 0."""
    bound = float(np.sqrt(3.0) * np.sqrt(1.0 / n_in))
    a = jax.random.uniform(key, (n_in, lora.r), minval=-bound, maxval=bound)
    extra = {
        "lora_A": a.astype(dtype),
        "lora_B": jnp.zeros((lora.r, n_out), dtype),
        "lora_scale": jnp.asarray(lora.alpha / lora.r, jnp.float32),
    }
    if mask is not None:
        extra["lora_mask"] = jnp.asarray(mask, dtype)
    return extra


def add_lora_params(
    params: dict, cfg: Config, lora: LoRAConfig, key, dtype=jnp.float32
) -> dict:
    """Return params with LoRA leaves added to the selected linears.

    Handles the stacked (n_layer,) layout: each layer gets an independently
    initialized lora_A.
    """
    out = jax.tree.map(lambda x: x, params)  # shallow-ish copy
    L = cfg.n_layer

    def stacked_lora(subkey, n_in, n_out, mask=None):
        per_layer = [
            _init_lora(jax.random.fold_in(subkey, i), n_in, n_out, lora, dtype, mask)
            for i in range(L)
        ]
        return {k: jnp.stack([p[k] for p in per_layer]) for k in per_layer[0]}

    k1, k2, k3, k4, k5, k6 = jax.random.split(key, 6)
    blocks = out["blocks"]

    if lora.query or lora.key or lora.value:
        mask = qkv_enable_mask(cfg, lora)
        blocks["attn"]["attn"].update(
            stacked_lora(k1, cfg.n_embd, cfg.qkv_shape, mask)
        )
    if lora.projection:
        blocks["attn"]["proj"].update(
            stacked_lora(k2, cfg.head_size * cfg.n_head, cfg.n_embd)
        )
    if lora.mlp:
        mlp = blocks["mlp"]
        if cfg.mlp_class_name == "GptNeoxMLP":
            mlp["fc"].update(stacked_lora(k3, cfg.n_embd, cfg.intermediate_size))
            mlp["proj"].update(stacked_lora(k4, cfg.intermediate_size, cfg.n_embd))
        elif cfg.mlp_class_name in ("LLaMAMLP", "GemmaMLP"):
            mlp["fc_1"].update(stacked_lora(k3, cfg.n_embd, cfg.intermediate_size))
            mlp["fc_2"].update(stacked_lora(k5, cfg.n_embd, cfg.intermediate_size))
            mlp["proj"].update(stacked_lora(k4, cfg.intermediate_size, cfg.n_embd))
        elif cfg.mlp_class_name == "LLaMAMoE":
            mlp["gate"].update(stacked_lora(k3, cfg.n_embd, cfg.n_expert))
    if lora.head:
        out["lm_head"].update(
            {
                k: v
                for k, v in _init_lora(
                    k6, cfg.n_embd, cfg.padded_vocab_size, lora, dtype
                ).items()
            }
        )
    return out


# ------------------------------------------------------------------- masks


def _leaf_name(path) -> str:
    last = path[-1]
    return str(getattr(last, "key", getattr(last, "name", last)))


def trainable_mask(params: dict) -> dict:
    """True for lora_A/lora_B only (mark_only_lora_as_trainable equivalent,
    ref lora.py:436-466). Feed to optax.masked / manual grad-zeroing."""
    return jax.tree_util.tree_map_with_path(
        lambda path, _: _leaf_name(path) in ("lora_A", "lora_B"), params
    )


def lora_filter_flat(name: str) -> bool:
    """Checkpoint filter: keep only LoRA tensors (ref lora.py:469)."""
    return "lora_" in name


def split_lora_state(params: dict):
    """(base, lora_only) pytrees for LoRA-only checkpointing."""
    lora_only = {}
    base = {}

    def walk(node, path, into_l, into_b):
        for k, v in node.items():
            if isinstance(v, dict):
                l2, b2 = {}, {}
                walk(v, path + (k,), l2, b2)
                if l2:
                    into_l[k] = l2
                if b2:
                    into_b[k] = b2
            elif k.startswith("lora_"):
                into_l[k] = v
            else:
                into_b[k] = v

    walk(params, (), lora_only, base)
    return base, lora_only


# ------------------------------------------------------------------- merge


def merge_lora(params: dict, cfg: Optional[Config] = None) -> dict:
    """Fold every LoRA delta into its base weight and drop the LoRA leaves.

    Quantized bases are dequantized, merged, and requantized with their own
    codebook/blocking (the bnb 4-bit merge, ref lora.py:150-161).
    """
    from ..ops import quant

    def merge_linear(p: dict) -> dict:
        if "lora_A" not in p:
            return p
        a = np.asarray(p["lora_A"], np.float32)
        b = np.asarray(p["lora_B"], np.float32)
        scale = np.asarray(p["lora_scale"], np.float32)
        lead = a.shape[:-2]
        delta = np.einsum("...ir,...ro->...io", a, b) * scale.reshape(lead + (1, 1))
        if "lora_mask" in p:
            delta = delta * np.asarray(p["lora_mask"], np.float32)[..., None, :]

        out = {k: v for k, v in p.items() if not k.startswith("lora_")}
        if "kernel" in p:
            out["kernel"] = jnp.asarray(np.asarray(p["kernel"], np.float32) + delta).astype(
                p["kernel"].dtype
            )
            return out
        # quantized base: dequant each slice, merge, requant
        kind = "nf4"
        if "q8" in p:
            mode = "bnb.int8"
        else:
            # identify codebook by comparing against known tables
            code = np.asarray(p["code"]).reshape(-1, 16)[0]
            for name, table in quant.CODEBOOKS.items():
                if np.allclose(np.sort(code), np.sort(table)):
                    kind = name
                    break
            mode = {"nf4": "bnb.nf4", "fp4": "bnb.fp4", "int4": "gptq.int4"}[kind]
            if "absmax_q" in p:
                mode += "-dq" if mode.startswith("bnb") else ""

        if not lead:
            dense = np.asarray(quant.dequantize(p)) + delta
            q = quant.quantize_linear_params({"kernel": dense}, mode)
        else:
            slices = []
            for idx in np.ndindex(*lead):
                pslice = {
                    k: np.asarray(v)[idx] if np.asarray(v).ndim > _base_rank(k) else np.asarray(v)
                    for k, v in p.items()
                    if not k.startswith("lora_") and k != "bias"
                }
                dense = np.asarray(quant.dequantize(pslice)) + delta[idx]
                slices.append(quant.quantize_linear_params({"kernel": dense}, mode))
            q = {
                k: jnp.asarray(
                    np.stack([np.asarray(s[k]) for s in slices]).reshape(
                        lead + np.asarray(slices[0][k]).shape
                    )
                )
                for k in slices[0]
            }
        if "bias" in p:
            q["bias"] = p["bias"]
        return q

    def walk(node):
        if isinstance(node, dict):
            if "lora_A" in node:
                return merge_linear(node)
            return {k: walk(v) for k, v in node.items()}
        return node

    return {k: walk(v) for k, v in params.items()}


def _base_rank(key: str) -> int:
    return {"q4": 2, "q8": 2, "absmax": 2, "code": 1, "absmax_q": 2,
            "absmax_scale": 1, "absmax_offset": 0, "scale8": 1, "kernel": 2}.get(key, 0)
