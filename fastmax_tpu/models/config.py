"""Model architecture configuration and registry.

TPU-native re-design of the reference's config layer
(/root/reference/lit_gpt/config.py:16-150 and the in-code registry at
config.py:153-1476). The registry data lives in ``registry.json`` (pure data,
one entry per supported checkpoint); the ``Config`` dataclass carries the same
architectural knobs (GQA via ``n_query_groups``, partial RoPE via
``rotary_percentage``, ``rope_condense_ratio``/``rope_base`` context
extension, MoE via ``n_expert``, and the fork's ``attn_alg`` attention
algorithm selector).

Unlike the reference, nothing here touches an ML framework: Config is plain
Python so it can be used for checkpoint tooling without pulling in JAX.
"""

from __future__ import annotations

import json
from dataclasses import asdict, dataclass, field
from pathlib import Path
from typing import Any, Literal, Optional

ATTN_ALGS = ("quadratic", "performer", "linearmax", "fastmax", "fastmax_cuda")


def find_multiple(n: int, k: int) -> int:
    """Round ``n`` up to the nearest multiple of ``k`` (ref: lit_gpt/utils.py:25)."""
    if n % k == 0:
        return n
    return n + k - (n % k)


@dataclass
class Config:
    name: str = ""
    hf_config: dict = field(default_factory=dict)
    scale_embeddings: bool = False
    block_size: int = 4096
    vocab_size: int = 50254
    padding_multiple: int = 512
    padded_vocab_size: Optional[int] = None
    n_layer: int = 16
    n_head: int = 32
    head_size: Optional[int] = None
    n_embd: int = 4096
    rotary_percentage: float = 0.25
    parallel_residual: bool = True
    bias: bool = True
    lm_head_bias: bool = False
    # n_query_groups == n_head -> MHA; == 1 -> MQA; in between -> GQA
    n_query_groups: Optional[int] = None
    shared_attention_norm: bool = False
    _norm_class: Literal["LayerNorm", "RMSNorm"] = "LayerNorm"
    norm_eps: float = 1e-5
    _mlp_class: Literal["GptNeoxMLP", "LLaMAMLP", "GemmaMLP", "LLaMAMoE"] = "GptNeoxMLP"
    gelu_approximate: str = "none"
    intermediate_size: Optional[int] = None
    rope_condense_ratio: int = 1
    rope_base: int = 10000
    n_expert: int = 0
    n_expert_per_token: int = 0
    # attention algorithm dispatched inside the attention op
    # (ref: lit_gpt/config.py:64, model.py:432-451). "fastmax_cuda" is accepted
    # as an alias of the degree-2 kernelized path for checkpoint compatibility.
    attn_alg: str = "quadratic"

    def __post_init__(self) -> None:
        if not self.name:
            self.name = self.hf_config.get("name", self.name)

        if self.head_size is None:
            assert self.n_embd % self.n_head == 0
            self.head_size = self.n_embd // self.n_head

        if self.padded_vocab_size is None:
            self.padded_vocab_size = find_multiple(self.vocab_size, self.padding_multiple)
        else:
            self.vocab_size = min(self.vocab_size, self.padded_vocab_size)

        if self.n_query_groups is not None:
            assert self.n_head % self.n_query_groups == 0
        else:
            self.n_query_groups = self.n_head

        if self.intermediate_size is None:
            if self._mlp_class == "LLaMAMLP":
                raise ValueError("The config needs to set the `intermediate_size`")
            self.intermediate_size = 4 * self.n_embd

        self.rope_n_elem = int(self.rotary_percentage * self.head_size)

        if isinstance(self.attn_alg, (tuple, list)):
            self.attn_alg = self.attn_alg[0]
        if self.attn_alg not in ATTN_ALGS:
            raise ValueError(f"Unknown attn_alg {self.attn_alg!r}; expected one of {ATTN_ALGS}")

    # ------------------------------------------------------------------ loaders

    @classmethod
    def from_name(cls, name: str, **kwargs: Any) -> "Config":
        reg = registry()
        if name in reg:
            conf = dict(reg[name])
        else:
            for entry in reg.values():
                if entry.get("hf_config", {}).get("name") == name:
                    conf = dict(entry)
                    break
            else:
                raise ValueError(f"{name!r} is not a supported config name")
        if "condense_ratio" in kwargs:  # legacy spelling
            kwargs["rope_condense_ratio"] = kwargs.pop("condense_ratio")
        conf.update(kwargs)
        return cls(**conf)

    @classmethod
    def from_json(cls, path: "str | Path", **kwargs: Any) -> "Config":
        with open(path, encoding="utf-8") as fp:
            data = json.load(fp)
        for src in (data, kwargs):
            if "condense_ratio" in src:
                src["rope_condense_ratio"] = src.pop("condense_ratio")
        if "org" in data:  # legacy lit_config.json spelling
            data["hf_config"] = {"name": data["name"], "org": data.pop("org")}
        data.update(kwargs)
        data = {k: v for k, v in data.items() if k in cls.__dataclass_fields__}
        return cls(**data)

    @classmethod
    def from_checkpoint(cls, path: Path, **kwargs: Any) -> "Config":
        """Load ``lit_config.json`` from a checkpoint dir, else match by dir name."""
        path = Path(path)
        config_path = path / "lit_config.json"
        if config_path.is_file():
            return cls.from_json(config_path, **kwargs)
        if path.name in registry():
            return cls.from_name(path.name, **kwargs)
        raise FileNotFoundError(
            f"For {str(path)!r} neither 'lit_config.json' nor a matching registry entry exists."
        )

    def to_json(self, path: "str | Path") -> None:
        data = {k: v for k, v in asdict(self).items() if k != "rope_n_elem"}
        with open(path, "w", encoding="utf-8") as fp:
            json.dump(data, fp, indent=2)

    # --------------------------------------------------------------- properties

    @property
    def mlp_class_name(self) -> str:
        return self._mlp_class

    @property
    def norm_class_name(self) -> str:
        return self._norm_class

    @property
    def add_unit_offset(self) -> bool:
        """Gemma's RMSNorm multiplies by (1 + weight)."""
        return "Gemma" in self.name

    @property
    def qkv_shape(self) -> int:
        """Output features of the fused QKV projection (grouped layout)."""
        return (self.n_head + 2 * self.n_query_groups) * self.head_size


_REGISTRY: Optional[dict] = None


def registry() -> dict:
    """name -> config-kwargs dict for every supported checkpoint family.

    Covers the same model surface as the reference registry
    (lit_gpt/config.py:153-1476): StableLM, Pythia 14m-12B, Dolly,
    RedPajama-INCITE, Falcon, OpenLLaMA, Vicuna, LongChat, Nous-Hermes,
    Llama-2, Gemma, FreeWilly2, CodeLlama, Platypus, StableCode,
    LLaMA-2-7B-32K, phi, Mistral/Mixtral, TinyLlama, and the fork's
    easy-transformer / easy-transformer-fastmax pretraining configs.
    """
    global _REGISTRY
    if _REGISTRY is None:
        data_path = Path(__file__).parent / "registry.json"
        with open(data_path, encoding="utf-8") as fp:
            entries = json.load(fp)
        _REGISTRY = {e["name"]: e for e in entries}
    return _REGISTRY


def available_models() -> list:
    return sorted(registry())
