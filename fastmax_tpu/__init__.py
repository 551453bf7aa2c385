"""fastmax_tpu — a TPU-native (JAX/XLA/Pallas/pjit) LLM framework.

Built from scratch with the capability surface of the reference lit-gpt fork
(ryansynk/fastmax-experiments): decoder-only transformers with a pluggable
attention-algorithm family (softmax + fastmax polynomial linear attention),
KV-cached inference, NF4/FP4/int8 weight-only quantization, LoRA/adapter
PEFT, pretrain/finetune recipes, and mesh-sharded multi-chip execution.
"""

from .models.config import Config, available_models
from .models import gpt
from .models.tokenizer import Tokenizer

__all__ = ["Config", "available_models", "gpt", "Tokenizer"]

__version__ = "0.1.0"
