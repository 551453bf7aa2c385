"""Parameter pytree <-> flat lit-gpt-style state dict conversion.

The on-disk checkpoint contract is the reference's: a flat mapping of
``transformer.h.{i}.attn.attn.weight``-style names to (out, in)-layout
tensors (what ``lit_model.pth`` holds, and what the HF converters in
scripts/convert_hf_checkpoint.py produce). Internally we use:

* kernels in (in, out) layout — the natural ``x @ W`` orientation,
* per-layer weights stacked on a leading (n_layer,) axis for lax.scan,
* MoE expert weights stacked on a leading (n_expert,) axis.

These two functions are the only place the naming/layout translation lives.
"""

from __future__ import annotations

from typing import Dict

import jax.numpy as jnp
import numpy as np

from .config import Config

_LINEAR_KEYS = ("attn", "proj", "fc", "fc_1", "fc_2", "gate")


def _is_linear(path: tuple) -> bool:
    return path[-1] in _LINEAR_KEYS or (len(path) >= 2 and path[-2] == "experts")


def params_to_flat(params: dict, cfg: Config) -> Dict[str, np.ndarray]:
    """Convert the internal pytree to a flat lit-gpt-named state dict."""
    out: Dict[str, np.ndarray] = {}
    out["transformer.wte.weight"] = np.asarray(params["wte"])
    out["lm_head.weight"] = np.asarray(params["lm_head"]["kernel"]).T
    if "bias" in params["lm_head"]:
        out["lm_head.bias"] = np.asarray(params["lm_head"]["bias"])
    for k, v in params["ln_f"].items():
        out[f"transformer.ln_f.{k}"] = np.asarray(v)

    blocks = params["blocks"]

    def emit(prefix: str, sub: dict, layer: int):
        for name, leaf in sub.items():
            if isinstance(leaf, dict):
                emit(f"{prefix}.{name}", leaf, layer)
            elif name == "kernel":
                out[f"{prefix}.weight"] = np.asarray(leaf[layer]).T
            else:  # bias / norm weight
                out[f"{prefix}.{name}"] = np.asarray(leaf[layer])

    for i in range(cfg.n_layer):
        for name, sub in blocks.items():
            if name == "mlp" and cfg.mlp_class_name == "LLaMAMoE":
                gate = sub["gate"]
                out[f"transformer.h.{i}.mlp.gate.weight"] = np.asarray(gate["kernel"][i]).T
                ex = sub["experts"]
                for e in range(cfg.n_expert):
                    for lin_name, lin in ex.items():
                        out[f"transformer.h.{i}.mlp.experts.{e}.{lin_name}.weight"] = (
                            np.asarray(lin["kernel"][i, e]).T
                        )
                        if "bias" in lin:
                            out[f"transformer.h.{i}.mlp.experts.{e}.{lin_name}.bias"] = (
                                np.asarray(lin["bias"][i, e])
                            )
            elif isinstance(sub, dict):
                emit(f"transformer.h.{i}.{name}", sub, i)
    return out


def flat_to_params(
    flat: Dict[str, np.ndarray],
    cfg: Config,
    dtype=jnp.float32,
    *,
    leaf_get=None,
    leaf_stack=None,
) -> dict:
    """Build the internal pytree from a flat lit-gpt-named state dict.

    ``leaf_get(src, transpose)`` / ``leaf_stack(leaves)`` override how leaves
    are materialized — the default reads into device arrays; the sharded
    loader (utils/sharded_load.py) passes lazy mmap-backed constructors so
    each host only ever reads the slices its shards need.
    """

    if leaf_get is None:
        def leaf_get(src, transpose=False):
            w = np.asarray(src)
            return jnp.asarray(w.T if transpose else w, dtype)
    if leaf_stack is None:
        def leaf_stack(leaves):
            return jnp.stack(list(leaves))

    def get(name, transpose=False):
        return leaf_get(flat[name], transpose)

    def has(name):
        return name in flat

    def stack(fn):
        return leaf_stack(fn(i) for i in range(cfg.n_layer))

    def linear_of(prefix_fn):
        p = {"kernel": stack(lambda i: get(f"{prefix_fn(i)}.weight", transpose=True))}
        if has(f"{prefix_fn(0)}.bias"):
            p["bias"] = stack(lambda i: get(f"{prefix_fn(i)}.bias"))
        return p

    def norm_of(name):
        p = {"weight": stack(lambda i: get(f"transformer.h.{i}.{name}.weight"))}
        if has(f"transformer.h.0.{name}.bias"):
            p["bias"] = stack(lambda i: get(f"transformer.h.{i}.{name}.bias"))
        return p

    blocks = {
        "norm_1": norm_of("norm_1"),
        "attn": {
            "attn": linear_of(lambda i: f"transformer.h.{i}.attn.attn"),
            "proj": linear_of(lambda i: f"transformer.h.{i}.attn.proj"),
        },
    }
    if has("transformer.h.0.norm_2.weight"):
        blocks["norm_2"] = norm_of("norm_2")

    if cfg.mlp_class_name == "GptNeoxMLP":
        blocks["mlp"] = {
            "fc": linear_of(lambda i: f"transformer.h.{i}.mlp.fc"),
            "proj": linear_of(lambda i: f"transformer.h.{i}.mlp.proj"),
        }
    elif cfg.mlp_class_name in ("LLaMAMLP", "GemmaMLP"):
        blocks["mlp"] = {
            "fc_1": linear_of(lambda i: f"transformer.h.{i}.mlp.fc_1"),
            "fc_2": linear_of(lambda i: f"transformer.h.{i}.mlp.fc_2"),
            "proj": linear_of(lambda i: f"transformer.h.{i}.mlp.proj"),
        }
    else:  # MoE
        def expert_lin(name):
            k = leaf_stack(
                leaf_stack(
                    get(f"transformer.h.{i}.mlp.experts.{e}.{name}.weight", transpose=True)
                    for e in range(cfg.n_expert)
                )
                for i in range(cfg.n_layer)
            )
            return {"kernel": k}

        blocks["mlp"] = {
            "gate": linear_of(lambda i: f"transformer.h.{i}.mlp.gate"),
            "experts": {
                "fc_1": expert_lin("fc_1"),
                "fc_2": expert_lin("fc_2"),
                "proj": expert_lin("proj"),
            },
        }

    params = {
        "wte": get("transformer.wte.weight"),
        "lm_head": {"kernel": get("lm_head.weight", transpose=True)},
        "ln_f": {"weight": get("transformer.ln_f.weight")},
        "blocks": blocks,
    }
    if has("lm_head.bias"):
        params["lm_head"]["bias"] = get("lm_head.bias")
    if has("transformer.ln_f.bias"):
        params["ln_f"]["bias"] = get("transformer.ln_f.bias")
    return params
