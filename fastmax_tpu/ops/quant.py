"""Weight-only quantization: NF4 / FP4 / int4 (4-bit, blockwise absmax,
optional double-quantization of the scales) and int8 (per-output-channel).

Replaces the reference's bitsandbytes runtime (BitsandbytesPrecision plugin:
bnb.nf4, bnb.nf4-dq, bnb.fp4, bnb.fp4-dq, bnb.int8 — SURVEY.md §2.7,
generate/base.py:129-134) with a TPU-native design:

* The NF4/FP4 codebooks are bit-identical to bitsandbytes' (the QLoRA
  normal-float table), so accuracy deltas match the reference at the same
  bit-width.
* Blocking is **along the input-channel axis of the (in, out) kernel**
  (absmax shape (in/block, out)) instead of bnb's flat row-major blocks.
  This aligns quantization blocks with the matmul reduction axis — the
  dequant factors through the k-loop of a fused Pallas dequant+matmul
  kernel — and makes tensor-parallel sharding safe: a rowwise (in-dim)
  shard boundary always falls on a block boundary (the reference sharded
  bnb's opaque flat blocks and was only accidentally correct,
  generate/tp.py:38-40).
* 4-bit codes pack two-per-byte along the input axis (even index in the
  high nibble).

Quantized linears are plain pytrees of ARRAYS (the 16-entry codebook rides
along as an array leaf, the block size is derived from shapes), so they
stack on the (n_layer,) scan axis and shard under pjit like any other
parameter. A linear param dict is one of:

  {"kernel": (in, out)}                                    dense
  {"q4": (in/2, out) u8, "absmax": (in/b, out) f32,
   "code": (16,) f32}                                      4-bit
  {"q4": ..., "code": ...,
   "absmax_q": (nb, 256) i8, "absmax_scale": (nb,) f32,
   "absmax_offset": () f32}                                4-bit double-quant
  {"q8": (in, out) i8, "scale8": (out,) f32}               int8

`quantized_matmul` is the XLA reference path (dequant -> matmul, which XLA
fuses); the Pallas fused kernel in ops/quant_pallas.py overrides it on TPU
for decode-bandwidth-bound shapes.

Reference parity notes: bnb modes map 1:1 (nf4, nf4-dq, fp4, fp4-dq, int8);
gptq.int4 (a BASELINE.json extension target, absent from the reference)
rides the same 4-bit path with uniform int4 levels as the codebook.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

# The QLoRA NF4 codebook (16 quantiles of N(0,1) normalized to [-1, 1]).
# Identical to bitsandbytes' create_normal_map output.
NF4_CODE = np.array(
    [
        -1.0,
        -0.6961928009986877,
        -0.5250730514526367,
        -0.39491748809814453,
        -0.28444138169288635,
        -0.18477343022823334,
        -0.09105003625154495,
        0.0,
        0.07958029955625534,
        0.16093020141124725,
        0.24611230194568634,
        0.33791524171829224,
        0.44070982933044434,
        0.5626170039176941,
        0.7229568362236023,
        1.0,
    ],
    dtype=np.float32,
)

# bitsandbytes FP4: 3-bit magnitude table + sign in the high bit.
_FP4_MAG = np.array(
    [0.0, 0.0052083334, 0.6666667, 1.0, 0.33333334, 0.5, 0.16666667, 0.25],
    dtype=np.float32,
)
FP4_CODE = np.concatenate([_FP4_MAG, -_FP4_MAG]).astype(np.float32)

# uniform signed int4 levels (the gptq.int4 extension target)
INT4_CODE = (np.arange(-8, 8, dtype=np.float32) / 8.0).astype(np.float32)

CODEBOOKS = {"nf4": NF4_CODE, "fp4": FP4_CODE, "int4": INT4_CODE}
DEFAULT_BLOCK = 64
DQ_BLOCK = 256  # scale-quantization block for double-quant (bnb default)

QUANT_MODES = ("bnb.nf4", "bnb.nf4-dq", "bnb.fp4", "bnb.fp4-dq", "bnb.int8", "gptq.int4")


def _nearest_code(x: np.ndarray, code: np.ndarray) -> np.ndarray:
    """Index of the nearest codebook entry (midpoint rule on sorted values)."""
    order = np.argsort(code)
    sorted_code = code[order]
    mids = (sorted_code[1:] + sorted_code[:-1]) / 2
    idx_sorted = np.searchsorted(mids, x, side="left")
    return order[idx_sorted].astype(np.uint8)


def quantize_4bit(
    kernel: np.ndarray,
    kind: str = "nf4",
    block_size: int = DEFAULT_BLOCK,
    double_quant: bool = False,
) -> dict:
    """Quantize an (in, out) kernel to the packed 4-bit param dict."""
    code = CODEBOOKS[kind]
    k_in, k_out = kernel.shape
    if k_in % block_size:
        raise ValueError(f"in-dim {k_in} not divisible by block_size {block_size}")
    w = np.asarray(kernel, np.float32).reshape(k_in // block_size, block_size, k_out)
    absmax = np.abs(w).max(axis=1)  # (nblocks, out)
    safe = np.where(absmax == 0, 1.0, absmax).astype(np.float32)
    scaled = w / safe[:, None, :]
    codes = _nearest_code(scaled, code).reshape(k_in, k_out)
    packed = (codes[0::2] << 4) | codes[1::2]  # (in/2, out)

    out = {"q4": jnp.asarray(packed), "code": jnp.asarray(code)}
    if double_quant:
        out.update(_quantize_scales(safe))
    else:
        out["absmax"] = jnp.asarray(safe)
    return out


def _quantize_scales(absmax: np.ndarray) -> dict:
    """Double quantization: int8-quantize the (nblocks, out) absmax tensor in
    flat blocks of DQ_BLOCK after removing its mean."""
    flat = absmax.reshape(-1)
    offset = np.float32(flat.mean())
    centered = flat - offset
    pad = (-centered.size) % DQ_BLOCK
    padded = np.pad(centered, (0, pad))
    blocks = padded.reshape(-1, DQ_BLOCK)
    scale = np.abs(blocks).max(axis=1)
    scale = np.where(scale == 0, 1.0, scale).astype(np.float32)
    q = np.clip(np.round(blocks / scale[:, None] * 127.0), -128, 127).astype(np.int8)
    return {
        "absmax_q": jnp.asarray(q),
        "absmax_scale": jnp.asarray(scale / 127.0),
        "absmax_offset": jnp.asarray(offset),
    }


def _absmax_of(p: dict, k_in: int, k_out: int) -> jnp.ndarray:
    """Recover the (in/block, out) absmax tensor (dequantizing if needed).

    The 4-bit block size is fixed at DEFAULT_BLOCK (=64, the bnb default),
    keeping the format free of non-array metadata.
    """
    if "absmax" in p:
        return p["absmax"]
    flat = (p["absmax_q"].astype(jnp.float32) * p["absmax_scale"][:, None]).reshape(-1)
    n = (k_in // DEFAULT_BLOCK) * k_out
    return (flat[:n] + p["absmax_offset"]).reshape(-1, k_out)


def _unpack_int4_tiled(pw_t: jnp.ndarray) -> jnp.ndarray:
    """Tiled signed-nibble words (gk, gn, tk, 128) -> (k_pad, n_pad) f32."""
    gk, gn, tk, _ = pw_t.shape
    planes = [(pw_t << (28 - 4 * p)) >> 28 for p in range(8)]  # each (gk,gn,tk,128)
    q = jnp.stack(planes, axis=3)  # (gk, gn, tk, 8, 128)
    q = q.transpose(0, 2, 1, 3, 4).reshape(gk * tk, gn * 1024)
    return q.astype(jnp.float32)


def dequantize(p: dict, dtype=jnp.float32) -> jnp.ndarray:
    """Reconstruct the dense (in, out) kernel from a quantized param dict."""
    if "q8" in p:
        return (p["q8"].astype(jnp.float32) * p["scale8"][None, :]).astype(dtype)
    if "q4r1" in p:
        u, v = p["u4"], p["v4"]
        q = _unpack_int4_tiled(p["q4r1"])[: u.shape[0], : v.shape[0]]
        return (q * 0.125 * u[:, None] * v[None, :]).astype(dtype)
    if "q4b" in p:
        n_true = p["n4"].shape[0]
        s_t = p["scale4"]  # (gk, gn, nb, 1024)
        gk, gn, nb, _ = s_t.shape
        q = _unpack_int4_tiled(p["q4b"])
        k_true = p["k4"].shape[0] if "k4" in p else q.shape[0]
        s = s_t.transpose(0, 2, 1, 3).reshape(gk * nb, gn * 1024)
        w = q.reshape(-1, DEFAULT_BLOCK, q.shape[1]) * 0.125 * s[:, None, :]
        return w.reshape(q.shape)[:k_true, :n_true].astype(dtype)
    packed = p["q4"]
    k_in = packed.shape[0] * 2
    k_out = packed.shape[1]
    hi = (packed >> 4).astype(jnp.int32)
    lo = (packed & 0xF).astype(jnp.int32)
    codes = jnp.stack([hi, lo], axis=1).reshape(k_in, k_out)
    vals = p["code"][codes]
    absmax = _absmax_of(p, k_in, k_out)
    vals = vals.reshape(-1, DEFAULT_BLOCK, k_out) * absmax[:, None, :]
    return vals.reshape(k_in, k_out).astype(dtype)


def rank1_envelope(absmax: np.ndarray, iters: int = 8):
    """Minimal-ish rank-1 envelope u (x) v >= absmax (k-block x column).

    Alternating max-ratio descent from u = row-max; the envelope property
    guarantees no clipping when quantizing with step (u*v)/8, at the cost
    of coarser steps where absmax is far from separable."""
    u = np.maximum(absmax.max(axis=1), 1e-12).astype(np.float64)
    v = None
    for _ in range(iters):
        v = np.max(absmax / u[:, None], axis=0)
        v = np.maximum(v, 1e-12)
        u = np.max(absmax / v[None, :], axis=1)
        u = np.maximum(u, 1e-12)
    return u.astype(np.float32), v.astype(np.float32)


def quantize_int4_tiled(kernel: np.ndarray, scheme: str = "rank1",
                        block_size: int = DEFAULT_BLOCK) -> dict:
    """Quantize an (in, out) kernel to a tiled linear-int4 serving dict.

    scheme "rank1": w ~ q/8 * u[k] * v[n]   -> {"q4r1", "u4", "v4"}
    scheme "block": w ~ q/8 * absmax[b, n]  -> {"q4b", "scale4", "n4", "k4"}
    Codes are signed [-8, 7]; dequant is linear, which is what lets the
    Pallas kernel (ops/quant_pallas.py) run at ~800 G params/s where the
    exact NF4 codebook caps at ~150 (VPU select wall — see that module's
    speed-of-light analysis).
    """
    from .quant_pallas import pack_int4_tiled, tile_scales, INT4_TILE_N

    w = np.asarray(kernel, np.float32)
    k_in, k_out = w.shape
    pad = (-k_in) % block_size
    if pad:
        w = np.pad(w, ((0, pad), (0, 0)))
    wb = w.reshape(-1, block_size, k_out)
    absmax = np.abs(wb).max(axis=1)
    absmax = np.where(absmax == 0, 1e-12, absmax).astype(np.float32)
    n_pad = k_out + (-k_out) % INT4_TILE_N
    if scheme == "rank1":
        ub, v = rank1_envelope(absmax)
        step = (ub[:, None, None] * v[None, None, :]) / 8.0
        q = np.clip(np.round(wb / step), -8, 7).astype(np.int8)
        u_rows = np.repeat(ub, block_size)[:k_in]
        pw = pack_int4_tiled(q.reshape(-1, k_out))
        return {"q4r1": jnp.asarray(pw), "u4": jnp.asarray(u_rows),
                "v4": jnp.asarray(v)}
    q = np.clip(np.round(wb * 8.0 / absmax[:, None, :]), -8, 7).astype(np.int8)
    pw = pack_int4_tiled(q.reshape(-1, k_out))
    tk = pw.shape[2]
    s_t = tile_scales(absmax, tk, n_pad)
    return {"q4b": jnp.asarray(pw), "scale4": jnp.asarray(s_t),
            "n4": jnp.zeros((k_out, 0), jnp.uint8),
            "k4": jnp.zeros((k_in, 0), jnp.uint8)}


def quantize_int8(kernel: np.ndarray) -> dict:
    """Per-output-channel symmetric int8 (the bnb.int8 inference role)."""
    w = np.asarray(kernel, np.float32)
    scale = np.abs(w).max(axis=0) / 127.0  # (out,)
    scale = np.where(scale == 0, 1.0, scale).astype(np.float32)
    q = np.clip(np.round(w / scale[None, :]), -128, 127).astype(np.int8)
    return {"q8": jnp.asarray(q), "scale8": jnp.asarray(scale)}


# Which implementation executes 4-bit matmuls:
#   "xla"    dequant -> matmul in the XLA graph (fuses well; on
#            virtualized/tunneled TPUs where Pallas-initiated HBM DMA is
#            slow, this is the fastest path — measured 8.6ms vs 14.6ms per
#            decoded token on a TinyLlama-shaped stack on axon-v5e)
#   "pallas" fused Pallas dequant+matmul (ops/quant_pallas.py) — the
#            bandwidth-optimal kernel on hardware with full-rate DMA
#   "auto"   resolved by autotune_quant_backend() (engine init calls it)
_QUANT_BACKEND = "xla"


def set_quant_backend(name: str) -> None:
    global _QUANT_BACKEND
    if name not in ("xla", "pallas"):
        raise ValueError(name)
    _QUANT_BACKEND = name


def get_quant_backend() -> str:
    return _QUANT_BACKEND


def autotune_quant_backend(sample_p: dict, sample_x: "jnp.ndarray", iters: int = 20) -> str:
    """Time both 4-bit matmul implementations on a representative shape and
    select the faster one (must run OUTSIDE jit; the choice is baked into
    subsequent traces)."""
    import time as _time

    from .quant_pallas import pallas_eligible, quantized_matmul_pallas

    k_in = sample_p["q4"].shape[0] * 2
    k_out = sample_p["q4"].shape[1]
    if jax.default_backend() != "tpu" or not pallas_eligible(sample_p, k_in, k_out):
        set_quant_backend("xla")
        return _QUANT_BACKEND

    def timed(fn):
        y = fn(sample_x)
        y.block_until_ready()
        t0 = _time.perf_counter()
        for _ in range(iters):
            y = fn(sample_x)
        y.block_until_ready()
        return _time.perf_counter() - t0

    f_pallas = jax.jit(lambda x: quantized_matmul_pallas(x, sample_p))
    f_xla = jax.jit(lambda x: jnp.einsum("...i,io->...o", x, dequantize(sample_p, x.dtype)))
    set_quant_backend("pallas" if timed(f_pallas) < timed(f_xla) else "xla")
    return _QUANT_BACKEND


def int8_matmul(x: jnp.ndarray, q8: jnp.ndarray, scale8: jnp.ndarray) -> jnp.ndarray:
    """x @ (q8 * scale8) with the int8->activation-dtype convert FUSED into
    the dot and the per-channel scale applied to the output.

    Formulation matters on TPU: scaling the weight first materializes a
    dense bf16 kernel in HBM every step (measured 42.7us for 2048x8192 on
    v5e), while convert-inside-dot + scale-on-output streams the int8
    weight directly into the MXU (30.3us; bf16 dense = 46.6us — int8 decode
    runs ~1.5-1.9x faster than the bf16 HBM ceiling)."""
    acc = jax.lax.dot_general(
        x,
        q8.astype(x.dtype),
        (((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    return (acc * scale8).astype(x.dtype)


def quantized_matmul(x: jnp.ndarray, p: dict) -> jnp.ndarray:
    """x @ dequant(kernel), routed by the active quant backend."""
    if "q8" in p:
        return int8_matmul(x, p["q8"], p["scale8"])
    if "q4r1" in p:
        from .quant_pallas import int4_matmul_rank1

        return int4_matmul_rank1(x, p, interpret=jax.default_backend() != "tpu")
    if "q4b" in p:
        from .quant_pallas import int4_matmul_block

        return int4_matmul_block(x, p, interpret=jax.default_backend() != "tpu")
    if "q4" in p and _QUANT_BACKEND == "pallas" and jax.default_backend() == "tpu":
        from .quant_pallas import pallas_eligible, quantized_matmul_pallas

        k_in = p["q4"].shape[0] * 2
        k_out = p["q4"].shape[1]
        if pallas_eligible(p, k_in, k_out):
            return quantized_matmul_pallas(x, p)
    kernel = dequantize(p, x.dtype)
    return jnp.einsum("...i,io->...o", x, kernel)


def dequantize_model(params: dict, dtype=jnp.bfloat16) -> dict:
    """Materialize every quantized linear back to a dense kernel ("preload"
    execution: NF4 storage/accuracy, dense-bandwidth compute — the right
    trade when the dequantized model fits HBM; a 4x footprint cost)."""

    def walk(node):
        if isinstance(node, dict):
            if "q4" in node or "q8" in node:
                lead_key = "q4" if "q4" in node else "q8"
                arr = node[lead_key]
                if arr.ndim == 2:
                    out = {"kernel": dequantize(node, dtype)}
                else:
                    lead = arr.shape[:-2]
                    import numpy as _np

                    slices = []
                    for idx in _np.ndindex(*lead):
                        sub = {
                            k: v[idx] if hasattr(v, "ndim") and v.ndim > _RANK.get(k, 0) else v
                            for k, v in node.items()
                            if k != "bias"
                        }
                        slices.append(dequantize(sub, dtype))
                    out = {"kernel": jnp.stack(slices).reshape(lead + slices[0].shape)}
                if "bias" in node:
                    out["bias"] = node["bias"]
                return out
            return {k: walk(v) for k, v in node.items()}
        return node

    return {k: walk(v) for k, v in params.items()}


_RANK = {"q4": 2, "q8": 2, "absmax": 2, "code": 1, "absmax_q": 2,
         "absmax_scale": 1, "absmax_offset": 0, "scale8": 1,
         "q4r1": 4, "u4": 1, "v4": 1, "q4b": 4, "scale4": 4, "n4": 2, "k4": 2}


def requantize_int4_model(params: dict, scheme: str = "rank1") -> dict:
    """Re-represent every quantized/4-bit linear as tiled linear-int4
    ("int4 serving" of an NF4 checkpoint): decode reads 0.5 byte/param
    through the fused Pallas nibble kernel — ~1.15x the int8 path's
    params/s at HALF the weight footprint (docs/perf.md kernel table).
    Accuracy cost vs the int8 re-rep is larger (int4 steps on top of NF4);
    measured in docs/accuracy.md. Dense kernels stay dense."""

    def requant_slice(sub: dict) -> dict:
        return quantize_int4_tiled(np.asarray(dequantize(sub, jnp.float32)), scheme)

    def walk(node):
        if isinstance(node, dict):
            if "q4r1" in node or "q4b" in node:
                return node
            if "q4" in node or "q8" in node:
                lead_key = "q4" if "q4" in node else "q8"
                arr = node[lead_key]
                if arr.ndim == 2:
                    out = requant_slice({k: v for k, v in node.items() if k != "bias"})
                else:
                    lead = arr.shape[:-2]
                    stacks: dict = {}
                    for idx in np.ndindex(*lead):
                        sub = {
                            k: v[idx] if hasattr(v, "ndim") and v.ndim > _RANK.get(k, 0) else v
                            for k, v in node.items()
                            if k != "bias"
                        }
                        s = requant_slice(sub)
                        for key, val in s.items():
                            stacks.setdefault(key, []).append(np.asarray(val))
                    out = {
                        key: jnp.asarray(
                            np.stack(vals).reshape(lead + vals[0].shape)
                        )
                        for key, vals in stacks.items()
                    }
                if "bias" in node:
                    out["bias"] = node["bias"]
                return out
            return {k: walk(v) for k, v in node.items()}
        return node

    return {k: walk(v) for k, v in params.items()}


def requantize_int8_model(params: dict) -> dict:
    """Re-represent every 4-bit linear as dense per-channel int8 ("int8
    serving" of a 4-bit checkpoint): 4-bit accuracy characteristics are
    preserved up to the ~0.4% per-channel int8 step, while decode reads
    1 byte/param through the fused int8 matmul — faster than both the
    packed-4-bit paths (dequant cost) and bf16 preload (2 bytes/param) on
    chips where Pallas DMA underperforms. int8 linears pass through; dense
    kernels stay dense."""

    def requant_slice(sub: dict) -> dict:
        return quantize_int8(np.asarray(dequantize(sub, jnp.float32)))

    def walk(node):
        if isinstance(node, dict):
            if "q8" in node:
                return node
            if "q4" in node:
                arr = node["q4"]
                if arr.ndim == 2:
                    out = requant_slice({k: v for k, v in node.items() if k != "bias"})
                else:
                    lead = arr.shape[:-2]
                    qs, ss = [], []
                    for idx in np.ndindex(*lead):
                        sub = {
                            k: v[idx] if hasattr(v, "ndim") and v.ndim > _RANK.get(k, 0) else v
                            for k, v in node.items()
                            if k != "bias"
                        }
                        s = requant_slice(sub)
                        qs.append(np.asarray(s["q8"]))
                        ss.append(np.asarray(s["scale8"]))
                    out = {
                        "q8": jnp.asarray(np.stack(qs).reshape(lead + qs[0].shape)),
                        "scale8": jnp.asarray(np.stack(ss).reshape(lead + ss[0].shape)),
                    }
                if "bias" in node:
                    out["bias"] = node["bias"]
                return out
            return {k: walk(v) for k, v in node.items()}
        return node

    return {k: walk(v) for k, v in params.items()}


# ------------------------------------------------------------------ plumbing


def quantize_linear_params(p: dict, mode: str) -> dict:
    """Swap a dense linear param dict for its quantized form. ``mode``
    follows the reference CLI spelling (generate/base.py:105)."""
    if "kernel" not in p:
        return p
    kernel = np.asarray(p["kernel"], np.float32)
    if mode == "bnb.int8":
        q = quantize_int8(kernel)
    elif mode in ("bnb.nf4", "bnb.nf4-dq", "bnb.fp4", "bnb.fp4-dq"):
        kind = mode.split(".")[1].split("-")[0]
        q = quantize_4bit(kernel, kind=kind, double_quant=mode.endswith("-dq"))
    elif mode == "gptq.int4":
        q = quantize_4bit(kernel, kind="int4")
    else:
        raise ValueError(f"unknown quantization mode {mode!r}; expected one of {QUANT_MODES}")
    if "bias" in p:
        q["bias"] = p["bias"]
    return q


def quantize_model(params: dict, mode: str, skip=("lm_head", "wte")) -> dict:
    """Quantize every linear kernel in the model pytree (the role of the
    reference's BitsandbytesPrecision Linear replacement). ``skip`` names
    top-level modules kept dense (embeddings + lm_head, as bnb does)."""

    def walk(node, path):
        if isinstance(node, dict):
            # MoE expert kernels stay dense for now: apply_moe contracts the
            # stacked expert axis directly (models/gpt.py apply_moe)
            if "kernel" in node and path[0] not in skip and "experts" not in path:
                return _quantize_maybe_stacked(node, mode)
            return {k: walk(v, path + (k,)) for k, v in node.items()}
        return node

    return {k: walk(v, (k,)) for k, v in params.items()}


def _quantize_maybe_stacked(p: dict, mode: str) -> dict:
    """Quantize a linear whose kernel may carry leading stack axes
    (n_layer, [n_expert,]) from the scan layout."""
    kernel = np.asarray(p["kernel"], np.float32)
    if kernel.ndim == 2:
        return quantize_linear_params(p, mode)
    lead = kernel.shape[:-2]
    slices = [quantize_linear_params({"kernel": kernel[idx]}, mode) for idx in np.ndindex(*lead)]
    # every leaf (including the codebook) is stacked on the lead axes so the
    # whole dict scans over n_layer like any other block parameter
    out = {}
    for key in slices[0]:
        arrs = [np.asarray(s[key]) for s in slices]
        out[key] = jnp.asarray(np.stack(arrs).reshape(lead + arrs[0].shape))
    if "bias" in p:
        out["bias"] = p["bias"]
    return out
