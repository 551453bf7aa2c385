"""GPTQ: error-compensated one-shot weight quantization (Frantar et al. 2022).

The reference has no GPTQ (its quantization surface is the bitsandbytes
round-to-nearest family, SURVEY.md §2.7); BASELINE.json names ``gptq.int4``
as an extension target. ``ops/quant.py`` serves any 4-bit codebook, so this
module only has to produce better codes: instead of rounding each weight
independently, GPTQ quantizes the input dimension column by column and
folds each column's rounding error back into the not-yet-quantized columns,
weighted by the inverse Hessian of the layer's calibration inputs — the
classic OBQ/OBS update, run in the fixed column order with a blocked lazy
update so the whole layer is O(in^2 (in + out)).

Two entry points:

* ``gptq_quantize_kernel(kernel, H, kind=...)`` — quantize one (in, out)
  kernel against a Hessian ``H = X^T X`` of its calibration inputs. Output
  is the exact packed format of ``quant.quantize_4bit`` (q4/code/absmax,
  group size = quant.DEFAULT_BLOCK per input block per output channel), so
  every downstream path (fused matmul, preload, int8 re-representation,
  LoRA merge) works unchanged.
* ``gptq_quantize_model(params, cfg, calib_tokens)`` — the sequential
  procedure: walk the blocks in order, collect each linear's actual inputs
  (embeddings -> norms -> attention -> MLP), quantize it, and propagate
  activations through the *quantized* block so later layers calibrate
  against what they will really see at inference time.

Works with any codebook in ``quant.CODEBOOKS`` ("int4" for gptq.int4, and
"nf4"/"fp4" as error-compensated upgrades of the bnb formats).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from . import quant
from .norms import apply_norm


def hessian(x) -> np.ndarray:
    """Accumulate H = X^T X over calibration activations x (..., in)."""
    x2 = np.asarray(x, np.float64).reshape(-1, np.asarray(x).shape[-1])
    return x2.T @ x2


def _quantize_column(w: np.ndarray, scale: np.ndarray, code: np.ndarray):
    """Round one weight column (out,) to the codebook at the group scale."""
    safe = np.where(scale == 0, 1.0, scale)
    idx = quant._nearest_code(w / safe, code)
    return code[idx] * scale, idx


def gptq_quantize_kernel(
    kernel: np.ndarray,
    H: np.ndarray,
    kind: str = "int4",
    block_size: int = quant.DEFAULT_BLOCK,
    percdamp: float = 0.01,
    double_quant: bool = False,
) -> dict:
    """Quantize an (in, out) kernel with GPTQ error compensation.

    H: (in, in) Hessian of calibration inputs (``hessian`` above). Group
    scales (per input block of ``block_size``, per output channel) are
    computed from the *updated* weights when the column sweep reaches each
    group, exactly like groupsize quantization in the original
    implementation. Returns the quant.quantize_4bit packed dict.
    """
    code = np.sort(np.asarray(quant.CODEBOOKS[kind], np.float64))
    k_in, k_out = kernel.shape
    if k_in % block_size:
        raise ValueError(f"in-dim {k_in} not divisible by block_size {block_size}")
    W = np.asarray(kernel, np.float64).T.copy()  # (out, in): paper layout
    H = np.asarray(H, np.float64).copy()

    diag = np.arange(k_in)
    dead = H[diag, diag] == 0
    H[diag[dead], diag[dead]] = 1.0
    W[:, dead] = 0.0
    H[diag, diag] += percdamp * np.mean(H[diag, diag])

    # upper-Cholesky factor U of H^-1 (H^-1 = U^T U); U[j, j:] carries the
    # error-propagation weights for column j
    Hinv = np.linalg.inv(H)
    # symmetrize against inversion round-off before factorizing
    Hinv = (Hinv + Hinv.T) / 2.0
    U = np.linalg.cholesky(Hinv).T

    codes = np.zeros((k_out, k_in), np.uint8)
    absmax = np.zeros((k_in // block_size, k_out), np.float32)

    for g0 in range(0, k_in, block_size):
        g1 = g0 + block_size
        scale = np.abs(W[:, g0:g1]).max(axis=1)  # (out,) from updated weights
        absmax[g0 // block_size] = np.where(scale == 0, 1.0, scale)
        err_blk = np.zeros((k_out, block_size))
        for j in range(g0, g1):
            w = W[:, j]
            qv, idx = _quantize_column(w, scale, code)
            codes[:, j] = idx
            err = (w - qv) / U[j, j]
            # eager update inside the group; the current column keeps its
            # quantized value implicitly (codes are the output)
            W[:, j + 1 : g1] -= err[:, None] * U[j, j + 1 : g1][None, :]
            err_blk[:, j - g0] = err
        # lazy update of everything past the group
        W[:, g1:] -= err_blk @ U[g0:g1, g1:]

    # map codebook-sorted indices back to the codebook's native order and
    # pack like quant.quantize_4bit (pairs along the input dim)
    native = np.asarray(quant.CODEBOOKS[kind], np.float32)
    order = np.argsort(native)
    codes = order[codes].astype(np.uint8).T  # (in, out), native-order codes
    packed = (codes[0::2] << 4) | codes[1::2]
    out = {"q4": jnp.asarray(packed), "code": jnp.asarray(native)}
    if double_quant:
        out.update(quant._quantize_scales(absmax))
    else:
        out["absmax"] = jnp.asarray(absmax)
    return out


# ---------------------------------------------------------------------------
# Sequential model quantization
# ---------------------------------------------------------------------------


def _gptq_linear(p: dict, x, kind: str, double_quant: bool) -> dict:
    """Quantize one linear param dict against its calibration inputs x."""
    if "kernel" not in p:
        return p
    q = gptq_quantize_kernel(
        np.asarray(p["kernel"], np.float32), hessian(x), kind=kind,
        double_quant=double_quant,
    )
    if "bias" in p:
        q["bias"] = p["bias"]
    return q


def gptq_quantize_model(
    params: dict,
    cfg,
    calib_tokens,
    kind: str = "int4",
    double_quant: bool = False,
    skip=("lm_head", "wte"),
) -> dict:
    """Sequentially GPTQ-quantize every block linear of a GPT param pytree.

    calib_tokens: (B, T) int32 calibration token ids (a few hundred to a few
    thousand tokens of representative text). Activations are propagated
    through each block *after* it is quantized, so downstream Hessians see
    the quantization error of upstream layers (the standard sequential GPTQ
    setup). MoE expert kernels are kept dense (matching quantize_model).
    """
    from ..models import gpt
    from ..ops.linear import linear
    from ..ops.rope import build_rope_cache

    calib_tokens = jnp.asarray(calib_tokens, jnp.int32)
    t = calib_tokens.shape[1]
    rope = build_rope_cache(t, cfg.rope_n_elem, cfg.rope_base, cfg.rope_condense_ratio)
    cos, sin = rope[0][:t], rope[1][:t]

    x = jnp.take(params["wte"], calib_tokens, axis=0)
    if cfg.scale_embeddings:
        x = x * (cfg.n_embd ** 0.5)
    x = x.astype(jnp.float32)

    def norm(v, bp, name):
        return apply_norm(v, bp[name], cfg.norm_class_name, cfg.norm_eps,
                          cfg.add_unit_offset)

    n_hd = cfg.head_size * cfg.n_head
    eye_proj = {"kernel": jnp.eye(n_hd, dtype=jnp.float32)}

    new_blocks = []
    for l in range(cfg.n_layer):
        bp = jax.tree.map(lambda a: a[l], params["blocks"])

        n1 = norm(x, bp, "norm_1")
        attn = dict(bp["attn"])
        attn["attn"] = _gptq_linear(attn["attn"], n1, kind, double_quant)
        # pre-proj activations through the QUANTIZED qkv: identity proj tap
        y_pre, _ = gpt.apply_attn(
            {**attn, "proj": eye_proj}, n1, cfg, cos, sin, None, None, None
        )
        attn["proj"] = _gptq_linear(attn["proj"], y_pre, kind, double_quant)
        nb = dict(bp)
        nb["attn"] = attn

        h = linear(attn["proj"], y_pre)
        if cfg.parallel_residual:
            n2 = n1 if cfg.shared_attention_norm else norm(x, bp, "norm_2")
        else:
            n2 = norm(h + x, nb, "norm_2")

        mlp = dict(bp["mlp"])
        if "experts" in mlp:  # MoE: experts stay dense (see quantize_model)
            if "gate" in mlp:
                mlp["gate"] = _gptq_linear(mlp["gate"], n2, kind, double_quant)
        elif "fc" in mlp:  # GptNeoxMLP
            mlp["fc"] = _gptq_linear(mlp["fc"], n2, kind, double_quant)
            mid = jax.nn.gelu(linear(mlp["fc"], n2),
                              approximate=cfg.gelu_approximate == "tanh")
            mlp["proj"] = _gptq_linear(mlp["proj"], mid, kind, double_quant)
        else:  # LLaMAMLP / GemmaMLP
            mlp["fc_1"] = _gptq_linear(mlp["fc_1"], n2, kind, double_quant)
            mlp["fc_2"] = _gptq_linear(mlp["fc_2"], n2, kind, double_quant)
            h1 = linear(mlp["fc_1"], n2)
            h2 = linear(mlp["fc_2"], n2)
            act = (jax.nn.silu(h1) if cfg.mlp_class_name == "LLaMAMLP"
                   else jax.nn.gelu(h1, approximate=False))
            mlp["proj"] = _gptq_linear(mlp["proj"], act * h2, kind, double_quant)
        nb["mlp"] = mlp

        # propagate through the quantized block
        x, _ = gpt.apply_block(nb, x, cfg, cos, sin, None, None, None)
        new_blocks.append(nb)

    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *new_blocks)
    out = {k: v for k, v in params.items() if k != "blocks"}
    out["blocks"] = stacked
    # non-block linears follow quantize_model's skip policy
    if "lm_head" not in skip:
        xf = apply_norm(x, params["ln_f"], cfg.norm_class_name, cfg.norm_eps,
                        cfg.add_unit_offset)
        out["lm_head"] = _gptq_linear(dict(params["lm_head"]), xf, kind, double_quant)
    return out
