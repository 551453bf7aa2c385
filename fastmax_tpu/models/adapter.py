"""LLaMA-Adapter v1 and v2, functional-style.

Parity with the reference adapter.py / adapter_v2.py
(/root/reference/lit_gpt/adapter.py:24-168, adapter_v2.py:50-224):

v1: per-layer learnable prompt of ``adapter_prompt_length`` embeddings whose
keys/values (through the block's own QKV projection, no RoPE) receive
unmasked attention from every query, gated by a zero-initialized per-head
``gating_factor`` and added to the regular attention output
(adapter.py:119-149). Layers below ``adapter_start_layer`` are unmodified.

v2: additionally wraps every linear with a learnable elementwise
``adapter_scale`` (ones) and ``adapter_bias`` (zeros):
y = scale * linear(x) + bias (adapter_v2.py:50-62); its trainable set also
unfreezes all norms and biases (adapter_v2.py:34-47).

TPU-native representation: adapter leaves ride inside the param pytree
(stacked on the n_layer axis, scan/shard-compatible):

  blocks.attn.adapter = {"wte": (L, aT, E), "gating": (L, n_head),
                         "on": (L,)}          # 0/1 below start_layer
  every linear [v2]   += {"adapter_scale": (out,), "adapter_bias": (out,)}

The ``on`` mask multiplies the gate, so disabled layers contribute exactly
zero delta AND zero gradient (grad gating ∝ on = 0).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from .config import Config


@dataclass
class AdapterConfig:
    adapter_prompt_length: int = 10
    adapter_start_layer: int = 2


def add_adapter_params(
    params: dict, cfg: Config, ad: AdapterConfig, key, dtype=jnp.float32, v2: bool = False
) -> dict:
    out = jax.tree.map(lambda x: x, params)
    L = cfg.n_layer
    wte = jax.random.normal(key, (L, ad.adapter_prompt_length, cfg.n_embd)) * 0.02
    on = (np.arange(L) >= ad.adapter_start_layer).astype(np.float32)
    out["blocks"]["attn"]["adapter"] = {
        "wte": wte.astype(dtype),
        "gating": jnp.zeros((L, cfg.n_head), dtype),
        "on": jnp.asarray(on, dtype),
    }
    if v2:
        out = _add_v2_wrappers(out, dtype)
    return out


def _add_v2_wrappers(params: dict, dtype) -> dict:
    """adapter_scale/adapter_bias on every linear (incl. lm_head)."""

    def walk(node, path=()):
        if isinstance(node, dict):
            node = {k: walk(v, path + (k,)) for k, v in node.items()}
            weight = node.get("kernel", node.get("q4", node.get("q8")))
            # MoE expert kernels are contracted directly in apply_moe, which
            # bypasses ops.linear — leave them unwrapped for now
            if weight is not None and "experts" not in path:
                n_out = weight.shape[-1]
                lead = weight.shape[:-2]
                node["adapter_scale"] = jnp.ones(lead + (n_out,), dtype)
                node["adapter_bias"] = jnp.zeros(lead + (n_out,), dtype)
        return node

    return walk(params)


def apply_adapter_attention(
    adapter: dict, attn_linear: dict, q: jnp.ndarray, cfg: Config, scale: float
) -> jnp.ndarray:
    """Prefix attention delta (B, nh, T, hs) for one layer.

    q: (B, nh, T, hs) post-RoPE queries. The prompt's k/v come from the
    same fused QKV projection, un-roped, attended without mask
    (ref adapter.py:126-149).
    """
    from ..ops.attention import scaled_dot_product_attention
    from ..ops.linear import linear

    wte = adapter["wte"]  # (aT, E)
    a_t = wte.shape[0]
    g = cfg.n_query_groups
    q_per_kv = cfg.n_head // g
    aqkv = linear(attn_linear, wte[None])  # (1, aT, qkv_shape)
    aqkv = aqkv.reshape(1, a_t, g, q_per_kv + 2, cfg.head_size)
    ak = aqkv[..., q_per_kv, :].transpose(0, 2, 1, 3)  # (1, G, aT, hs)
    av = aqkv[..., q_per_kv + 1, :].transpose(0, 2, 1, 3)
    ay = scaled_dot_product_attention(q, ak, av, mask=None, scale=scale, is_causal=False)
    gate = adapter["gating"] * adapter["on"]  # (n_head,)
    return ay * gate[None, :, None, None]


# ------------------------------------------------------------------- masks


def _leaf_name(path) -> str:
    last = path[-1]
    return str(getattr(last, "key", getattr(last, "name", last)))


def _path_names(path):
    return [str(getattr(p, "key", getattr(p, "name", p))) for p in path]


def trainable_mask(params: dict, v2: bool = False) -> dict:
    """v1: adapter wte + gating only (ref adapter.py adapter_filter).
    v2: + adapter_scale/adapter_bias, all norm params, all linear biases
    (ref adapter_v2.py:34-47)."""

    def fn(path, _):
        names = _path_names(path)
        leaf = names[-1]
        if "adapter" in names and leaf in ("wte", "gating"):
            return True
        if v2:
            if leaf in ("adapter_scale", "adapter_bias", "bias"):
                return True
            if any(n.startswith("norm") or n == "ln_f" for n in names):
                return True
        return False

    return jax.tree_util.tree_map_with_path(fn, params)


def adapter_filter_flat(name: str, v2: bool = False) -> bool:
    """Checkpoint filter for adapter-only saves."""
    if "adapter_wte" in name or "gating_factor" in name or "adapter.wte" in name or "adapter.gating" in name:
        return True
    if v2:
        return any(s in name for s in ("adapter_scale", "adapter_bias", "norm_1", "norm_2", "ln_f", ".bias"))
    return False
