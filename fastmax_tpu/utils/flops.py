"""FLOP estimation for throughput/MFU metrics
(parity: /root/reference/lit_gpt/utils.py:309-339 flops_per_param/estimate_flops).
"""

from __future__ import annotations

from ..models.config import Config


def flops_per_param(max_seq_length: int, n_layer: int, n_embd: int, n_params: int) -> int:
    flops_per_token = 2 * n_params  # each parameter is used in a MAC
    flops_per_seq = flops_per_token * max_seq_length
    attn_flops_per_seq = n_layer * 2 * 2 * (n_embd * (max_seq_length**2))
    return flops_per_seq + attn_flops_per_seq


def estimate_flops(cfg: Config, n_params: int, max_seq_length: int, training: bool = True) -> int:
    """Forward(+backward) FLOPs per sequence. The backward multiplier 2.0
    (3.0 with recompute) follows the reference's convention."""
    flops = flops_per_param(max_seq_length, cfg.n_layer, cfg.n_embd, n_params)
    mult = 3 if training else 1  # fwd + 2x bwd
    return flops * mult


# peak bf16 matmul throughput per chip, FLOP/s
TPU_PEAK_FLOPS = {
    "v4": 275e12,
    "v5e": 394e12 / 2,  # 197 TFLOP/s bf16
    "v5p": 459e12,
    "v5 lite": 197e12,
}


def device_peak_flops(device_kind: str = "") -> float:
    kind = device_kind.lower()
    for key, val in TPU_PEAK_FLOPS.items():
        if key in kind:
            return val
    return 197e12  # default to v5e


def mfu(tokens_per_sec: float, cfg: Config, n_params: int, seq_len: int, device_kind: str = "") -> float:
    flops_per_tok = estimate_flops(cfg, n_params, seq_len, training=True) / seq_len
    return tokens_per_sec * flops_per_tok / device_peak_flops(device_kind)
