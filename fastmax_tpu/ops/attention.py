"""Attention algorithms and the attn_alg dispatch.

TPU-native re-design of the reference's CausalSelfAttention algorithm zoo
(/root/reference/lit_gpt/model.py:432-580). Five algorithms:

  quadratic   softmax attention, scale 1/sqrt(head_size) (model.py:569-580)
  performer   causal dot-product linear attention        (model.py:534-567)
  linearmax   normalized degree-1 polynomial attention   (model.py:460-473)
  fastmax     degree-2 polynomial attention              (model.py:475-487)
  fastmax_cuda alias of fastmax: the reference's CUDA extension computed the
              same degree-2 polynomial attention (model.py:489-532); on TPU
              both resolve to the chunked-scan kernel in ops/fastmax.py.

GQA/MQA is handled natively on grouped shapes — q is reshaped to
(B, groups, q_per_group, T, D) and broadcast against un-expanded k/v of shape
(B, groups, S, D). The reference instead ``expand``s k/v to n_head
(model.py:408-416); the grouped einsum is mathematically identical and avoids
materializing the expansion, which also keeps the KV cache at group
granularity (a memory win for GQA models like Llama-2-70B/Mistral).
"""

from __future__ import annotations

import math
import os
from typing import Optional

import jax.numpy as jnp

from . import fastmax as fm

NEG_INF = float("-inf")

# full-sequence quadratic forwards at T >= this use the blockwise
# (flash-style) kernel instead of dense (B, H, T, T) scores; env-overridable.
# Measured on TPU v5e (TinyLlama bs16 seq1024 train step): blockwise 29.5%
# MFU vs dense 23.7% — the causally-sliced static-unroll kernel wins from
# T=1024 up, and it also fits large-batch shapes whose dense scores OOM.
BLOCKWISE_MIN_T = int(os.environ.get("FASTMAX_TPU_BLOCKWISE_MIN_T", 1024))

# query-block size for the blockwise kernel: smaller blocks skip more of the
# above-diagonal work (causal saving approaches 1/2) and cap the backward's
# per-block (B, H, block, T) f32 transients; larger blocks mean fewer,
# bigger fused steps. 0 = auto-size so one transient stays under ~512 MB
# (chosen so TinyLlama bs16 seq1024 gets 512 — measured best — while bs32
# fits in a 16 GB chip where a fixed 512 OOMs).
BLOCKWISE_BLOCK = int(os.environ.get("FASTMAX_TPU_BLOCKWISE_BLOCK", 0))

# trainable long-context attention kernel: "blockwise" (XLA static unroll),
# "flash" (Pallas split dq/dkv kernels), "flash2" (Pallas whole-head fused
# single-pass kernels), or "auto" (probe: time blockwise vs flash2 at the
# actual shape on first use, cache the winner — never a guess). Default:
# flash2 — r04 evidence-grade record (10 interleaved rounds per shape,
# bench_results/mfu_ab_bs{16x1024,8x2048}_r04.jsonl): flash2 won EVERY
# same-round pair at both shapes, median MFU 49.4% vs blockwise 42.6% at
# bs16 T=1024 and 48.5% vs 35.0% at bs8 T=2048 (docs/perf.md; whole-head
# VMEM residency, one DMA set per head, fused single-pass dq+dk+dv, each
# block pair's scores recomputed once).
# Shapes outside the flash2 VMEM gate (long T, d % 64 != 0) fall back to
# blockwise, which also remains the non-TPU default.
TRAIN_ATTN = os.environ.get("FASTMAX_TPU_TRAIN_ATTN", "flash2")
FLASH_MIN_T = int(os.environ.get("FASTMAX_TPU_FLASH_MIN_T", 2048))

_PROBE_CACHE: dict = {}


def _probe_train_kernel(b: int, h: int, t: int, d: int) -> str:
    """Time one fwd+bwd of each trainable kernel at the real shape and
    cache the winner (in-process + on disk keyed by device kind/shape).
    Runs eagerly at trace time — concrete inputs, outside any jit."""
    import json
    import pathlib
    import time

    import jax

    key = f"{jax.devices()[0].device_kind}|{b}x{h}x{t}x{d}"
    if key in _PROBE_CACHE:
        return _PROBE_CACHE[key]
    path = pathlib.Path(__file__).resolve().parents[2] / ".kernel_probe.json"
    disk = {}
    if path.exists():
        try:
            disk = json.loads(path.read_text())
        except Exception:
            disk = {}
    if key in disk:
        _PROBE_CACHE[key] = disk[key]
        return disk[key]

    from .blockwise_attention import blockwise_attention
    from .flash_attention import _fused_eligible, flash_attention_fused

    if not _fused_eligible(t, d):
        _PROBE_CACHE[key] = "blockwise"
        return "blockwise"
    rng = jax.random.PRNGKey(0)
    q, k, v = (
        jax.random.normal(jax.random.fold_in(rng, i), (b, h, t, d), jnp.bfloat16)
        for i in range(3)
    )

    def timed(fn) -> float:
        # grad w.r.t. ALL of (q, k, v): grading only q would let XLA
        # dead-code-eliminate parts of a kernel's backward (blockwise's dk/dv
        # contractions) while a custom-VJP kernel always computes all three —
        # biasing the probe (advisor r03)
        g = jax.jit(
            jax.grad(lambda q, k, v: jnp.sum(fn(q, k, v).astype(jnp.float32)), (0, 1, 2))
        )
        import numpy as np

        np.asarray(g(q, k, v)[0][0, 0, 0, :1])  # compile + warm (tunnel acks early)
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            np.asarray(g(q, k, v)[0][0, 0, 0, :1])
            best = min(best, time.perf_counter() - t0)
        return best

    scale = 1.0 / d**0.5
    t_block = timed(lambda q, k, v: blockwise_attention(q, k, v, scale))
    t_flash = timed(lambda q, k, v: flash_attention_fused(q, k, v, scale))
    winner = "flash2" if t_flash < t_block else "blockwise"
    _PROBE_CACHE[key] = disk[key] = winner
    try:
        # atomic publish: concurrent processes each write a private temp file
        # and race only on the final rename (advisor r03 — a plain write_text
        # could interleave partial JSON between processes)
        tmp = path.with_name(f".kernel_probe.{os.getpid()}.tmp")
        tmp.write_text(json.dumps(disk, indent=1))
        os.replace(tmp, path)
    except OSError:
        pass
    return winner


def _train_kernel(t: int, head_size: int, b: int = 0, h: int = 0) -> str:
    if TRAIN_ATTN == "auto":
        import jax

        if jax.default_backend() != "tpu" or head_size % 64 or t < FLASH_MIN_T:
            return "blockwise"
        return _probe_train_kernel(b, h, t, head_size)
    if TRAIN_ATTN in ("flash", "flash2") and "FASTMAX_TPU_TRAIN_ATTN" not in os.environ:
        import jax

        if jax.default_backend() != "tpu":
            # the Pallas default is a TPU measurement; off-TPU the XLA
            # blockwise kernel is the safe/fast path (tests force
            # interpret-mode Pallas explicitly where they want it)
            return "blockwise"
    return TRAIN_ATTN


def _auto_block(b: int, h: int, t: int) -> int:
    limit = 512 * 2**20
    blk = limit // max(b * h * t * 4, 1)
    return int(max(128, min(512, (blk // 128) * 128)))


def repeat_kv_heads(x: jnp.ndarray, n_head: int) -> jnp.ndarray:
    """Expand grouped KV heads (B, G, S, D) -> (B, n_head, S, D)."""
    b, g, s, d = x.shape
    if g == n_head:
        return x
    rep = n_head // g
    return jnp.broadcast_to(x[:, :, None], (b, g, rep, s, d)).reshape(b, n_head, s, d)


def scaled_dot_product_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    mask: Optional[jnp.ndarray] = None,
    scale: Optional[float] = None,
    is_causal: bool = False,
) -> jnp.ndarray:
    """Softmax attention with float32 softmax.

    q: (B, Hq, T, D); k, v: (B, G, S, D) with Hq % G == 0. ``mask`` is a
    boolean array broadcastable to (B, Hq, T, S); True = attend. When
    ``is_causal`` and no mask is given, a causal mask is applied (prefill).
    Returns (B, Hq, T, D).
    """
    b, hq, t, d = q.shape
    g, s = k.shape[1], k.shape[2]
    rep = hq // g
    if scale is None:
        scale = d ** -0.5

    qg = q.reshape(b, g, rep, t, d)
    scores = jnp.einsum("bgrtd,bgsd->bgrts", qg, k, preferred_element_type=jnp.float32)
    scores = scores * scale
    if mask is None and is_causal:
        mask = jnp.tril(jnp.ones((t, s), dtype=bool), k=s - t)
    if mask is not None:
        mask = jnp.broadcast_to(mask, (b, hq, t, s)).reshape(b, g, rep, t, s)
        scores = jnp.where(mask, scores, NEG_INF)
    probs = jax_softmax_f32(scores)
    out = jnp.einsum("bgrts,bgsd->bgrtd", probs.astype(v.dtype), v)
    return out.reshape(b, hq, t, d)


def int8_cache_attention(
    q: jnp.ndarray,
    k_codes: jnp.ndarray,
    v_codes: jnp.ndarray,
    k_scale: jnp.ndarray,
    v_scale: jnp.ndarray,
    mask: Optional[jnp.ndarray] = None,
    scale: Optional[float] = None,
) -> jnp.ndarray:
    """Softmax attention directly over an int8-quantized KV cache (decode).

    q: (B, Hq, T, D); k_codes/v_codes: (B, G, S, D) int8;
    k_scale/v_scale: (B, G, S) per-token-per-group symmetric scales.

    The per-position scales factor out of the head-dim contractions, so
    they are applied to the SCORE/PROBABILITY matrices ((..., T, S) — tiny
    at decode) instead of dequantizing the cache:

      scores[..., s] = (q . k_codes[s]) * k_scale[s]
      out = sum_s (probs[..., s] * v_scale[s]) v_codes[s]

    XLA fuses the int8->bf16 convert into the dot operand (the same
    convert-in-dot pattern as the int8 weight matmul), so per-token HBM
    traffic is the cache's int8 bytes. The previous formulation
    materialized a dequantized bf16 cache every decode step — measured
    2.5 ms/token at 7B S=1024 on v5e, ~22% of the whole step
    (bench_results/decode_profile_r05a.jsonl: fwd 11.0 ms vs fwd_nokv
    8.5 ms). Numerics: scales now multiply in f32 AFTER the f32-accumulated
    dot instead of rounding each dequantized element to bf16 first —
    equal-or-tighter error, covered by test_kv_quant's close-to-fp bounds.
    """
    b, hq, t, d = q.shape
    g, s = k_codes.shape[1], k_codes.shape[2]
    rep = hq // g
    if scale is None:
        scale = d ** -0.5

    qg = q.reshape(b, g, rep, t, d)
    scores = jnp.einsum(
        "bgrtd,bgsd->bgrts", qg, k_codes.astype(q.dtype),
        preferred_element_type=jnp.float32,
    )
    scores = scores * (scale * k_scale.astype(jnp.float32))[:, :, None, None, :]
    if mask is not None:
        mask = jnp.broadcast_to(mask, (b, hq, t, s)).reshape(b, g, rep, t, s)
        scores = jnp.where(mask, scores, NEG_INF)
    probs = jax_softmax_f32(scores)
    pv = (probs * v_scale.astype(jnp.float32)[:, :, None, None, :]).astype(q.dtype)
    out = jnp.einsum("bgrts,bgsd->bgrtd", pv, v_codes.astype(q.dtype))
    return out.reshape(b, hq, t, d)


def jax_softmax_f32(scores: jnp.ndarray) -> jnp.ndarray:
    """Numerically-stable softmax in float32 along the last axis.

    Fully-masked rows (all -inf) produce zeros rather than NaN.
    """
    m = jnp.max(scores, axis=-1, keepdims=True)
    m = jnp.where(jnp.isfinite(m), m, 0.0)
    e = jnp.exp(scores - m)
    denom = jnp.sum(e, axis=-1, keepdims=True)
    return e / jnp.where(denom == 0.0, 1.0, denom)


def attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    *,
    attn_alg: str,
    head_size: int,
    mask: Optional[jnp.ndarray] = None,
    is_decode: bool = False,
) -> jnp.ndarray:
    """Dispatch on ``attn_alg`` (ref: lit_gpt/model.py:432-451).

    q: (B, Hq, T, D); k, v: (B, G, S, D). For the linear-attention algorithms
    the grouped KV heads are broadcast to full head count first (their math
    has no grouped formulation in the reference). ``is_decode`` mirrors the
    reference's input_pos-driven mask toggle for the linear algorithms
    (model.py:463-466, 478-481): during KV-cache decode they run unmasked
    over the (already causal) cache contents.
    """
    scale = 1.0 / head_size ** 0.5
    if attn_alg == "quadratic":
        t, s = q.shape[2], k.shape[2]
        if mask is None and t == s and t >= BLOCKWISE_MIN_T:
            # long-context training/eval: memory-efficient attention with a
            # flash-style custom VJP — O(T*block) memory instead of the
            # dense (H, T, T) score tensor. Two trainable kernels:
            #   blockwise  XLA causal static-unroll (blockwise_attention.py)
            #   flash      Pallas fused fwd+bwd (flash_attention.py)
            # selected by FASTMAX_TPU_TRAIN_ATTN; default measured per-chip
            # (see docs/perf.md). Non-multiple lengths pad with tail tokens
            # that, being causal, never influence real rows.
            kf = repeat_kv_heads(k, q.shape[1])
            vf = repeat_kv_heads(v, q.shape[1])
            kern = _train_kernel(t, head_size, q.shape[0], q.shape[1])
            if kern in ("flash", "flash2") and head_size % 64 == 0:
                from .flash_attention import (
                    DEFAULT_BLOCK_K,
                    DEFAULT_BLOCK_Q,
                    _fused_block,
                    _fused_eligible,
                    flash_attention_fused,
                    flash_attention_trainable,
                )

                if kern == "flash2" and not _fused_eligible(t, head_size):
                    kern = "blockwise"  # measured faster than split flash
            else:
                kern = "blockwise"
            if kern in ("flash", "flash2"):
                if kern == "flash2":
                    # whole-head fused kernel: pad to its internal block
                    blk = _fused_block(t) if t % 512 == 0 or t <= 512 else 512
                    blk = max(blk, 128)
                else:
                    # pad so BOTH kernel block sizes divide T (advisor r02:
                    # a hardcoded 128 here silently coupled to the kernel
                    # defaults and would drop tail tokens if they diverge)
                    blk = math.lcm(DEFAULT_BLOCK_Q, DEFAULT_BLOCK_K)
                pad = (-t) % blk
                if pad:
                    q, kf, vf = (
                        jnp.pad(x, ((0, 0), (0, 0), (0, pad), (0, 0)))
                        for x in (q, kf, vf)
                    )
                if kern == "flash2":
                    out = flash_attention_fused(q, kf, vf, scale)
                else:
                    out = flash_attention_trainable(q, kf, vf, scale)
                return out[:, :, :t] if pad else out
            from .blockwise_attention import blockwise_attention

            blk = BLOCKWISE_BLOCK or _auto_block(q.shape[0], q.shape[1], t)
            pad = (-t) % blk
            if pad:
                qp, kp, vp = (
                    jnp.pad(x, ((0, 0), (0, 0), (0, pad), (0, 0))) for x in (q, kf, vf)
                )
                return blockwise_attention(qp, kp, vp, scale, blk)[:, :, :t]
            return blockwise_attention(q, kf, vf, scale, blk)
        return scaled_dot_product_attention(
            q, k, v, mask=mask, scale=scale, is_causal=mask is None
        )

    n_head = q.shape[1]
    k = repeat_kv_heads(k, n_head)
    v = repeat_kv_heads(v, n_head)
    if attn_alg == "performer":
        # ref truncates k/v to the query length (model.py:550-551)
        k = k[:, :, : q.shape[2]]
        v = v[:, :, : q.shape[2]]
        return fm.performer(q, k, v)
    if attn_alg == "linearmax":
        return fm.linearmax(q, k, v, p=1, mask=not is_decode)
    if attn_alg in ("fastmax", "fastmax_cuda"):
        return fm.fastmax(q, k, v, p=2, mask=not is_decode)
    raise ValueError(f"Attention algorithm {attn_alg} not supported")
