"""Functional decoder-only transformer (GPT) for TPU.

Re-designs the reference model (/root/reference/lit_gpt/model.py:196-747) as a
pure function over a parameter pytree:

* **Stacked blocks + lax.scan.** All transformer blocks share a structure, so
  per-layer weights are stacked along a leading (n_layer,) axis and the layer
  loop is a single ``lax.scan`` — one trace/compile of the block regardless of
  depth, the XLA-idiomatic replacement for the nn.ModuleList loop
  (model.py:278-279).
* **Grouped KV cache.** The cache keeps keys/values at query-group
  granularity (B, n_query_groups, S, head_size); GQA broadcast happens inside
  the attention einsum instead of materializing expanded heads
  (cf. model.py:408-420, 582-605).
* **Static-shape decode.** ``input_pos`` is a scalar (traced) position;
  prefill writes a T-token chunk at that offset, decode writes one token.
  Attention over the cache uses a position mask computed from ``input_pos``,
  keeping every shape static under jit (no index_select of a mask cache).

Supported architecture knobs mirror the reference Config: MHA/GQA/MQA,
partial RoPE (rotary_percentage), parallel/sequential residual, shared
attention norm, LayerNorm/RMSNorm (+Gemma unit offset), the four MLP classes
(GptNeox gelu / LLaMA SwiGLU / Gemma GeGLU / LLaMA MoE), scale_embeddings,
and the five attn_alg attention algorithms.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ..ops.attention import attention
from ..ops.linear import embedding, linear
from ..ops.norms import apply_norm
from ..ops.rope import apply_rope, build_rope_cache
from .config import Config

# --------------------------------------------------------------------------
# Parameter initialization (GPT-NeoX-style init, ref model.py:245-252)
# --------------------------------------------------------------------------


def _init_linear(key, n_in, n_out, bias, dtype, std=0.02):
    kkey, _ = jax.random.split(key)
    p = {"kernel": (jax.random.normal(kkey, (n_in, n_out)) * std).astype(dtype)}
    if bias:
        p["bias"] = jnp.zeros((n_out,), dtype)
    return p


def _init_norm(cfg: Config, dtype):
    p = {"weight": jnp.ones((cfg.n_embd,), dtype)}
    if cfg.norm_class_name == "LayerNorm":
        p["bias"] = jnp.zeros((cfg.n_embd,), dtype)
    return p


def _init_mlp(key, cfg: Config, dtype):
    ks = jax.random.split(key, 4)
    if cfg.mlp_class_name == "GptNeoxMLP":
        return {
            "fc": _init_linear(ks[0], cfg.n_embd, cfg.intermediate_size, cfg.bias, dtype),
            "proj": _init_linear(ks[1], cfg.intermediate_size, cfg.n_embd, cfg.bias, dtype),
        }
    if cfg.mlp_class_name in ("LLaMAMLP", "GemmaMLP"):
        return {
            "fc_1": _init_linear(ks[0], cfg.n_embd, cfg.intermediate_size, cfg.bias, dtype),
            "fc_2": _init_linear(ks[1], cfg.n_embd, cfg.intermediate_size, cfg.bias, dtype),
            "proj": _init_linear(ks[2], cfg.intermediate_size, cfg.n_embd, cfg.bias, dtype),
        }
    if cfg.mlp_class_name == "LLaMAMoE":
        ek = jax.random.split(ks[3], cfg.n_expert)
        experts = [
            {
                "fc_1": _init_linear(jax.random.fold_in(e, 0), cfg.n_embd, cfg.intermediate_size, cfg.bias, dtype),
                "fc_2": _init_linear(jax.random.fold_in(e, 1), cfg.n_embd, cfg.intermediate_size, cfg.bias, dtype),
                "proj": _init_linear(jax.random.fold_in(e, 2), cfg.intermediate_size, cfg.n_embd, cfg.bias, dtype),
            }
            for e in ek
        ]
        stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *experts)
        return {
            "gate": _init_linear(ks[0], cfg.n_embd, cfg.n_expert, False, dtype),
            "experts": stacked,
        }
    raise ValueError(cfg.mlp_class_name)


def init_block(key, cfg: Config, dtype):
    ks = jax.random.split(key, 3)
    block = {
        "norm_1": _init_norm(cfg, dtype),
        "attn": {
            "attn": _init_linear(ks[0], cfg.n_embd, cfg.qkv_shape, cfg.bias, dtype),
            "proj": _init_linear(ks[1], cfg.head_size * cfg.n_head, cfg.n_embd, cfg.bias, dtype),
        },
        "mlp": _init_mlp(ks[2], cfg, dtype),
    }
    if not cfg.shared_attention_norm:
        block["norm_2"] = _init_norm(cfg, dtype)
    return block


def init_params(cfg: Config, key, dtype=jnp.float32) -> dict:
    """Random-init parameter pytree with blocks stacked on a leading axis."""
    k_head, k_wte, k_blocks = jax.random.split(key, 3)
    blocks = [
        init_block(jax.random.fold_in(k_blocks, i), cfg, dtype)
        for i in range(cfg.n_layer)
    ]
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *blocks)
    return {
        "wte": (jax.random.normal(k_wte, (cfg.padded_vocab_size, cfg.n_embd)) * 0.02).astype(dtype),
        "lm_head": _init_linear(k_head, cfg.n_embd, cfg.padded_vocab_size, cfg.lm_head_bias, dtype),
        "ln_f": _init_norm(cfg, dtype),
        "blocks": stacked,
    }


# --------------------------------------------------------------------------
# KV cache
# --------------------------------------------------------------------------


def init_kv_cache(cfg: Config, batch_size: int, max_seq_length: int, dtype=jnp.float32) -> dict:
    """Grouped KV cache: (L, B, n_query_groups, S, head_size).

    dtype == jnp.int8 selects the quantized cache: values are stored int8
    with a per-token-per-group f32 absmax scale (1/head_size of the code
    bytes; nearly halves KV memory vs bf16 — the long-context lever the
    reference lacked; its cache was a dense pre-allocated fp buffer,
    model.py:711-740).
    """
    shape = (cfg.n_layer, batch_size, cfg.n_query_groups, max_seq_length, cfg.head_size)
    if dtype == jnp.int8:
        sshape = shape[:-1]
        return {
            "k": jnp.zeros(shape, jnp.int8),
            "v": jnp.zeros(shape, jnp.int8),
            "k_scale": jnp.zeros(sshape, jnp.float32),
            "v_scale": jnp.zeros(sshape, jnp.float32),
        }
    return {"k": jnp.zeros(shape, dtype), "v": jnp.zeros(shape, dtype)}


def _quantize_kv(x: jnp.ndarray):
    """Per-token-per-group symmetric int8: x (B, G, T, hs) -> (codes, scale)."""
    absmax = jnp.max(jnp.abs(x), axis=-1)
    # f32 scales: tiny next to the int8 codes (1/head_size of the bytes)
    # and the mosaic dialect takes them as decode-kernel operands directly
    # (f16 is rejected: "Unsupported type in mosaic dialect: 'f16'")
    scale = (absmax / 127.0).astype(jnp.float32)
    safe = jnp.where(scale == 0, 1.0, scale.astype(x.dtype))
    codes = jnp.clip(jnp.round(x / safe[..., None]), -127, 127).astype(jnp.int8)
    return codes, scale


def _dequantize_kv(codes: jnp.ndarray, scale: jnp.ndarray, dtype) -> jnp.ndarray:
    return codes.astype(dtype) * scale.astype(dtype)[..., None]


# --------------------------------------------------------------------------
# Sub-module application
# --------------------------------------------------------------------------


def apply_mlp(p: dict, x: jnp.ndarray, cfg: Config, layer=None) -> jnp.ndarray:
    """``layer`` selects stacked-weights mode (see ops/linear.linear)."""
    name = cfg.mlp_class_name
    if name == "GptNeoxMLP":
        h = linear(p["fc"], x, layer)
        h = jax.nn.gelu(h, approximate=cfg.gelu_approximate == "tanh")
        return linear(p["proj"], h, layer)
    if name == "LLaMAMLP":
        if "fc_12" in p:
            # fused gate+up: one matmul of [fc_1 | fc_2] (inference layout,
            # see InferenceEngine.prepare_params) — halves the MLP-up kernel
            # count, which matters at decode where each matmul is launch- and
            # bandwidth-granularity-bound
            h1, h2 = jnp.split(linear(p["fc_12"], x, layer), 2, axis=-1)
            return linear(p["proj"], jax.nn.silu(h1) * h2, layer)
        return linear(p["proj"], jax.nn.silu(linear(p["fc_1"], x, layer))
                      * linear(p["fc_2"], x, layer), layer)
    if name == "GemmaMLP":
        if "fc_12" in p:
            h1, h2 = jnp.split(linear(p["fc_12"], x, layer), 2, axis=-1)
            return linear(p["proj"], jax.nn.gelu(h1, approximate=False) * h2, layer)
        return linear(p["proj"], jax.nn.gelu(linear(p["fc_1"], x, layer), approximate=False)
                      * linear(p["fc_2"], x, layer), layer)
    if name == "LLaMAMoE":
        if layer is not None:
            p = jax.tree.map(
                lambda a: jax.lax.dynamic_index_in_dim(a, layer, 0, keepdims=False), p
            )
        return apply_moe(p, x, cfg)
    raise ValueError(name)


def apply_moe(p: dict, x: jnp.ndarray, cfg: Config, sorted_dispatch: bool = True) -> jnp.ndarray:
    """Mixtral-style top-k MoE (ref model.py:644-674), dropless.

    Two TPU-native dispatch strategies, both static-shaped:

    * sorted (default): token-expert pairs are sorted by expert id and each
      expert processes its contiguous segment via ``lax.ragged_dot`` group
      matmuls — FLOPs scale with k/n_expert like the reference's per-expert
      gather loop, without its dynamic shapes.
    * dense (fallback, also the grad-simple path): every expert runs over
      all tokens, outputs combined by the sparse router weights.
    """
    b, t, c = x.shape
    xf = x.reshape(-1, c)
    n = xf.shape[0]
    k = cfg.n_expert_per_token
    e = cfg.n_expert
    router = linear(p["gate"], xf)  # (N, E)
    probs, indices = jax.lax.top_k(router, k)
    probs = jax.nn.softmax(probs.astype(jnp.float32), axis=-1).astype(x.dtype)

    ex = p["experts"]  # stacked on leading expert axis
    has_bias = "bias" in ex["fc_1"]

    if sorted_dispatch and not has_bias and hasattr(jax.lax, "ragged_dot"):
        # ---- sorted segment dispatch (N*k rows, grouped by expert)
        flat_expert = indices.reshape(-1)  # (N*k,)
        order = jnp.argsort(flat_expert)
        token_of = order // k  # source token of each sorted row
        xs = xf[token_of]  # (N*k, C)
        group_sizes = jnp.bincount(flat_expert, length=e)
        w1 = ex["fc_1"]["kernel"].astype(x.dtype)  # (E, C, I)
        w2 = ex["fc_2"]["kernel"].astype(x.dtype)
        w3 = ex["proj"]["kernel"].astype(x.dtype)  # (E, I, C)
        h = jax.nn.silu(jax.lax.ragged_dot(xs, w1, group_sizes)) * jax.lax.ragged_dot(
            xs, w2, group_sizes
        )
        ys = jax.lax.ragged_dot(h, w3, group_sizes)  # (N*k, C)
        weight = probs.reshape(-1)[order].astype(x.dtype)  # (N*k,)
        out = jnp.zeros((n, c), ys.dtype).at[token_of].add(ys * weight[:, None])
        return out.reshape(b, t, c).astype(x.dtype)

    # ---- dense combine
    one_hot = jax.nn.one_hot(indices, e, dtype=x.dtype)  # (N, k, E)
    combine = jnp.einsum("nk,nke->ne", probs, one_hot)
    h1 = jnp.einsum("nc,eci->eni", xf, ex["fc_1"]["kernel"].astype(x.dtype))
    h2 = jnp.einsum("nc,eci->eni", xf, ex["fc_2"]["kernel"].astype(x.dtype))
    if has_bias:
        h1 = h1 + ex["fc_1"]["bias"][:, None, :]
        h2 = h2 + ex["fc_2"]["bias"][:, None, :]
    h = jax.nn.silu(h1) * h2
    y = jnp.einsum("eni,eic->enc", h, ex["proj"]["kernel"].astype(x.dtype))
    if "bias" in ex["proj"]:
        y = y + ex["proj"]["bias"][:, None, :]
    out = jnp.einsum("ne,enc->nc", combine, y)
    return out.reshape(b, t, c)


def apply_attn(
    p: dict,
    x: jnp.ndarray,
    cfg: Config,
    cos: jnp.ndarray,
    sin: jnp.ndarray,
    mask: Optional[jnp.ndarray],
    kv_cache: Optional[Tuple[jnp.ndarray, jnp.ndarray]],
    input_pos: Optional[jnp.ndarray],
    layer: Optional[jnp.ndarray] = None,
    stacked_weights: bool = False,
) -> Tuple[jnp.ndarray, Optional[Tuple[jnp.ndarray, jnp.ndarray]]]:
    """Fused-QKV grouped attention (ref model.py:380-458).

    ``layer`` selects the STACKED-cache mode: kv_cache leaves carry the
    full (n_layer, ...) stack (the forward's scan carry — in-place
    dynamic-update-slice; a scanned-xs/ys cache copied all 268 MB every
    decode step, measured 1.75 ms at 7B S=1024) and ``layer`` is this
    block's traced index. layer=None keeps per-layer cache slices (gptq
    calibration, direct callers).

    Returns (output, updated cache or None).
    """
    b, t, _ = x.shape
    hs, g = cfg.head_size, cfg.n_query_groups
    q_per_kv = cfg.n_head // g

    qkv = linear(p["attn"], x, layer if stacked_weights else None)  # (B, T, (n_head+2G)*hs)
    qkv = qkv.reshape(b, t, g, q_per_kv + 2, hs)
    q = qkv[..., :q_per_kv, :]  # (B, T, G, q_per_kv, hs)
    k = qkv[..., q_per_kv, :]  # (B, T, G, hs)
    v = qkv[..., q_per_kv + 1, :]

    q = q.reshape(b, t, cfg.n_head, hs).transpose(0, 2, 1, 3)  # (B, nh, T, hs)
    k = k.transpose(0, 2, 1, 3)  # (B, G, T, hs)
    v = v.transpose(0, 2, 1, 3)

    nre = cfg.rope_n_elem
    q = q.at[..., :nre].set(apply_rope(q[..., :nre], cos, sin)) if nre < hs else apply_rope(q, cos, sin)
    k = k.at[..., :nre].set(apply_rope(k[..., :nre], cos, sin)) if nre < hs else apply_rope(k, cos, sin)

    new_cache = None
    if kv_cache is not None:
        quantized_cache = "k_scale" in kv_cache
        act_dtype = k.dtype
        if quantized_cache:
            k_new, k_new_scale = _quantize_kv(k)
            v_new, v_new_scale = _quantize_kv(v)
        else:
            k_new, v_new = k, v
        k_cache, v_cache = kv_cache["k"], kv_cache["v"]
        stacked = layer is not None
        if input_pos.ndim == 0:
            # write the T new tokens at offset input_pos (prefill chunk/decode)
            zero = jnp.zeros_like(input_pos)
            lead = (layer, zero) if stacked else (zero,)
            expand = (lambda a: a[None]) if stacked else (lambda a: a)
            k_cache = jax.lax.dynamic_update_slice(
                k_cache, expand(k_new.astype(k_cache.dtype)),
                lead + (zero, input_pos, zero),
            )
            v_cache = jax.lax.dynamic_update_slice(
                v_cache, expand(v_new.astype(v_cache.dtype)),
                lead + (zero, input_pos, zero),
            )
            if quantized_cache:
                ks = jax.lax.dynamic_update_slice(
                    kv_cache["k_scale"], expand(k_new_scale),
                    lead + (zero, input_pos),
                )
                vs = jax.lax.dynamic_update_slice(
                    kv_cache["v_scale"], expand(v_new_scale),
                    lead + (zero, input_pos),
                )
        else:
            # per-slot positions (continuous batching): write row b's T
            # tokens at its own positions input_pos[b]..input_pos[b]+T-1.
            # One dynamic_update_slice per slot, NOT one advanced-index
            # scatter over all slots: XLA cannot alias a scatter into the
            # scanned cache carry when the operand is int8 (sub-sublane
            # rows on the (32, 128) int8 tile), so the quantized-cache
            # scatter re-materialized the full (L, B, G, S, D) codes every
            # layer — measured 596 ms vs 89 ms per 8-step decode quantum
            # at 7B B=8 S=256 on v5e. B small DUSes alias in place for
            # every dtype (same-shape measurement: 92 ms).
            zero = jnp.zeros((), input_pos.dtype)

            def write_rows(cache, new):
                # new: (B, G, T[, hs]); cache: ([L,] B, G, S[, hs])
                for bi in range(b):
                    upd = new[bi][None]  # (1, G, T[, hs])
                    if stacked:
                        upd = upd[None]
                    start = (layer, bi, zero, input_pos[bi]) if stacked \
                        else (bi, zero, input_pos[bi])
                    if new.ndim == 4:  # codes carry a trailing head dim
                        start = start + (zero,)
                    cache = jax.lax.dynamic_update_slice(
                        cache, upd.astype(cache.dtype), start)
                return cache

            k_cache = write_rows(k_cache, k_new)
            v_cache = write_rows(v_cache, v_new)
            if quantized_cache:
                ks = write_rows(kv_cache["k_scale"], k_new_scale)
                vs = write_rows(kv_cache["v_scale"], v_new_scale)

        def this_layer(a):
            return jax.lax.dynamic_index_in_dim(a, layer, 0, keepdims=False) \
                if stacked else a

        if quantized_cache:
            new_cache = {"k": k_cache, "v": v_cache, "k_scale": ks, "v_scale": vs}
            if cfg.attn_alg == "quadratic" and t == 1:
                # decode: attend over the int8 codes directly (scales fold
                # into scores/probs); dequantizing the whole cache here cost
                # 2.5 ms/token at 7B (decode_profile_r05a.jsonl). On TPU the
                # Pallas kernels stream the cache at its int8 bytes — the
                # XLA formulation still materializes the bf16 converts
                # (decode_profile_r05b.jsonl: 1.9 ms vs ~0.5 ms implied).
                from ..ops.attention import int8_cache_attention
                from ..ops.decode_attention import (
                    int8_decode_attention,
                    int8_decode_attention_stacked,
                    int8_decode_eligible,
                )

                s_len = k_cache.shape[3 if stacked else 2]
                pallas_ok = (
                    jax.default_backend() == "tpu"
                    and int8_decode_eligible(t, hs, s_len)
                )
                posv = (
                    input_pos
                    if input_pos.ndim == 1
                    else jnp.broadcast_to(input_pos, (b,))
                )
                if pallas_ok and stacked:
                    # read layer ``layer`` straight out of the carried stack
                    # (scalar-prefetched index maps — no 8 MB slice copy)
                    y = int8_decode_attention_stacked(
                        q, k_cache, v_cache, ks, vs, layer, posv, scale=hs ** -0.5
                    )
                elif pallas_ok:
                    y = int8_decode_attention(
                        q, k_cache, v_cache, ks, vs, posv, scale=hs ** -0.5
                    )
                else:
                    y = int8_cache_attention(
                        q, this_layer(k_cache), this_layer(v_cache),
                        this_layer(ks), this_layer(vs), mask=mask, scale=hs ** -0.5
                    )
                y = _finish_attn(p, y, x, cfg, q, b, t, hs,
                                 layer if stacked_weights else None)
                return y, new_cache
            # prefill (t > 1, one-time) and the linear algorithms read a
            # dense cache: dequantize once
            k = _dequantize_kv(this_layer(k_cache), this_layer(ks), act_dtype)
            v = _dequantize_kv(this_layer(v_cache), this_layer(vs), act_dtype)
        else:
            new_cache = {"k": k_cache, "v": v_cache}
            k, v = this_layer(k_cache), this_layer(v_cache)

    y = None
    if (
        cfg.attn_alg == "quadratic"
        and new_cache is not None
        and t > 1
        and input_pos.ndim == 0
        and jax.default_backend() == "tpu"
    ):
        # KV-cache prefill on TPU: flash attention over the padded cache
        # (pos0/kv_len mask the invalid tail). Queries pad to the block size.
        from ..ops.flash_attention import DEFAULT_BLOCK_Q, flash_attention, flash_eligible

        s_len = k.shape[2]
        t_pad = (-t) % DEFAULT_BLOCK_Q
        if flash_eligible(t + t_pad, s_len, hs):
            qp = jnp.pad(q, ((0, 0), (0, 0), (0, t_pad), (0, 0))) if t_pad else q
            y = flash_attention(
                qp, k, v, scale=1.0 / hs ** 0.5, pos0=input_pos, kv_len=input_pos + t
            )[:, :, :t]
    if y is None:
        y = attention(
            q,
            k,
            v,
            attn_alg=cfg.attn_alg,
            head_size=hs,
            mask=mask,
            is_decode=kv_cache is not None,
        )
    return _finish_attn(p, y, x, cfg, q, b, t, hs,
                        layer if stacked_weights else None), new_cache


def _finish_attn(p, y, x, cfg, q, b, t, hs, layer=None):
    """Adapter prefix + head merge + output projection (shared tail)."""
    if "adapter" in p and cfg.attn_alg == "quadratic":
        # LLaMA-Adapter prefix attention (models/adapter.py); the reference
        # likewise only applies it on the SDPA path (adapter.py:119-149)
        from ..ops.linear import slice_layer

        ap, aw = ((slice_layer(p["adapter"], layer), slice_layer(p["attn"], layer))
                  if layer is not None else (p["adapter"], p["attn"]))
        from .adapter import apply_adapter_attention

        y = y + apply_adapter_attention(ap, aw, q, cfg, hs ** -0.5)
    y = y.transpose(0, 2, 1, 3).reshape(b, t, hs * cfg.n_head)
    # attention math may run in a wider dtype (f32 cache/softmax); keep the
    # residual stream in the activation dtype
    y = y.astype(x.dtype)
    return linear(p["proj"], y, layer)


def apply_block(bp, x, cfg, cos, sin, mask, kv_cache, input_pos, attn_fn=None,
                mlp_fn=None, layer=None, stacked_weights=None):
    """One transformer block. ``attn_fn(attn_params, n1) -> (h, new_cache)``
    overrides the attention computation (used by the sequence-parallel mode
    to substitute ring attention while sharing the residual/MLP wiring);
    ``mlp_fn(mlp_params, n2) -> y`` likewise overrides the MLP (used by the
    composed TP mode to psum the rowwise projection's partial output).

    ``layer`` selects STACKED-cache mode (kv_cache holds the full stacked
    cache and this call updates/reads layer ``layer`` in place);
    ``stacked_weights`` (default: layer is not None) additionally means
    ``bp`` holds the FULL (n_layer,)-stacked weights. The cached forward
    separates the two: the cache always rides the scan carry, while
    weights stay stacked only for the Pallas-served formats (q4r1/q4b),
    whose kernels read the stack in place — XLA consumes its own sliced
    operands fine, and for dense bf16 models the slice-everything mode
    measured SLOWER (3B: 75.9 vs 90+ tok/s, decode_table r05)."""
    stacked = stacked_weights if stacked_weights is not None else (layer is not None)

    def norm_p(np_):
        if not stacked:
            return np_
        from ..ops.linear import slice_layer

        return slice_layer(np_, layer)

    n1 = apply_norm(x, norm_p(bp["norm_1"]), cfg.norm_class_name, cfg.norm_eps,
                    cfg.add_unit_offset)
    if attn_fn is not None:
        h, new_cache = attn_fn(bp["attn"], n1)
    else:
        h, new_cache = apply_attn(bp["attn"], n1, cfg, cos, sin, mask, kv_cache,
                                  input_pos, layer=layer, stacked_weights=stacked)
    mlp = mlp_fn if mlp_fn is not None else (
        lambda mp, n2: apply_mlp(mp, n2, cfg, layer if stacked else None))
    if cfg.parallel_residual:
        n2 = n1 if cfg.shared_attention_norm else apply_norm(
            x, norm_p(bp["norm_2"]), cfg.norm_class_name, cfg.norm_eps,
            cfg.add_unit_offset
        )
        x = mlp(bp["mlp"], n2) + h + x
    else:
        x = h + x
        n2 = apply_norm(x, norm_p(bp["norm_2"]), cfg.norm_class_name, cfg.norm_eps,
                        cfg.add_unit_offset)
        x = mlp(bp["mlp"], n2) + x
    return x, new_cache


# --------------------------------------------------------------------------
# Forward
# --------------------------------------------------------------------------


def _remat_wrap(body, remat):
    """Per-block rematerialization of the scan body (the
    activation_checkpointing_policy={Block} equivalent, ref
    finetune/lora.py:88-91).

    remat: False — save all block activations (fastest backward, most HBM);
    True/"full" — save only the residual stream, recompute the whole block
    in the backward (min HBM, fwd recompute = +1/3 step FLOPs);
    "attn" — like "full" but additionally save the blockwise-attention
    output and log-sum-exp (named residuals, ops/blockwise_attention._fwd):
    the rematted backward skips re-running the attention forward —
    ~70 MB/layer saved HBM at TinyLlama bs16 buys back the most expensive
    part of the recompute (only meaningful when the blockwise kernel is
    active, i.e. quadratic attention at T >= BLOCKWISE_MIN_T);
    "dots" — save weight-matmul outputs, recompute only batched/attention
    intermediates (jax.checkpoint_policies.dots_with_no_batch_dims_saveable):
    nearly the backward speed of remat=False at a fraction of its HBM —
    the right trade when params+optimizer leave a few GB of headroom.
    """
    if remat is True or remat == "full":
        return jax.checkpoint(body)
    if remat == "attn":
        return jax.checkpoint(
            body,
            policy=jax.checkpoint_policies.save_only_these_names(
                "attn_out", "attn_lse"
            ),
        )
    if remat == "dots":
        return jax.checkpoint(
            body, policy=jax.checkpoint_policies.dots_with_no_batch_dims_saveable
        )
    if remat == "dots_attn":
        # "dots" + the named attention residuals: the backward recomputes
        # neither the weight matmuls nor the attention forward — at the cost
        # of ~(b*t*n_embd + stats) extra HBM/layer over "dots". The point:
        # under "dots" alone the flash/blockwise custom-VJP residuals
        # (attn_out/attn_lse) are batched, hence NOT saveable, so the whole
        # attention forward re-runs inside the rematted backward.
        return jax.checkpoint(
            body,
            policy=jax.checkpoint_policies.save_from_both_policies(
                jax.checkpoint_policies.dots_with_no_batch_dims_saveable,
                jax.checkpoint_policies.save_only_these_names(
                    "attn_out", "attn_lse"
                ),
            ),
        )
    if remat:
        raise ValueError(f"unknown remat policy {remat!r}")
    return body


def forward(
    params: dict,
    cfg: Config,
    idx: jnp.ndarray,
    *,
    input_pos: Optional[jnp.ndarray] = None,
    kv_cache: Optional[dict] = None,
    rope_cache: Optional[Tuple[jnp.ndarray, jnp.ndarray]] = None,
    max_seq_length: Optional[int] = None,
    remat: bool = False,
    unroll: int = 1,
    logits_at: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, Optional[dict]]:
    """Run the model.

    idx: (B, T) int32 token ids.
    input_pos: scalar int — position of idx[:, 0] in the sequence. Requires
      ``kv_cache``. None means full-sequence training/eval forward (no cache).
    unroll: layer-scan unroll factor (per-op-overhead lever; numerics
      unchanged).
    logits_at: optional (B,) per-row index into T — project ONLY that
      hidden state through lm_head and return (B, 1, padded_vocab). A
      (P, Tb) batched prefill needs one next-token distribution per row;
      full logits there are (P, Tb, V) = 4.2 GB at P=32/Tb=128/V=32k f32,
      an OOM on the 16 GB chip.
    Returns (logits (B, T or 1, padded_vocab), updated kv_cache or None).
    """
    b, t = idx.shape
    if rope_cache is None:
        n = max_seq_length or cfg.block_size
        rope_cache = build_rope_cache(n, cfg.rope_n_elem, cfg.rope_base, cfg.rope_condense_ratio)
    rope_cos, rope_sin = rope_cache

    if input_pos is not None:
        if kv_cache is None:
            raise ValueError("input_pos requires a kv_cache (call init_kv_cache)")
        input_pos = jnp.asarray(input_pos, jnp.int32)
        s = kv_cache["k"].shape[3]
        if input_pos.ndim == 1:
            # per-slot positions (continuous batching): token i of row b sits
            # at absolute position input_pos[b] + i (T > 1 = batched
            # speculative verify / chunked per-slot prefill)
            qpos = input_pos[:, None] + jnp.arange(t)  # (B, T)
            cos = rope_cos[qpos][:, None]  # (B, 1, T, nre)
            sin = rope_sin[qpos][:, None]
            mask = jnp.arange(s)[None, None, None, :] <= qpos[:, None, :, None]
        else:
            zero = jnp.zeros_like(input_pos)
            cos = jax.lax.dynamic_slice(rope_cos, (input_pos, zero), (t, cfg.rope_n_elem))
            sin = jax.lax.dynamic_slice(rope_sin, (input_pos, zero), (t, cfg.rope_n_elem))
            # mask[i, j]: query at absolute position input_pos + i may attend
            # to cache slot j iff j <= input_pos + i
            qpos = input_pos + jnp.arange(t)[:, None]
            mask = (jnp.arange(s)[None, :] <= qpos)[None, None]  # (1,1,T,S)
    else:
        cos = rope_cos[:t]
        sin = rope_sin[:t]
        mask = None

    x = embedding(params["wte"], idx)
    if cfg.scale_embeddings:
        x = x * (cfg.n_embd ** 0.5)

    if kv_cache is not None:
        # the cache rides in the scan CARRY (full stack, per-layer in-place
        # dynamic-update-slice at index l). Scanning it as xs/ys instead
        # copies the whole cache to fresh output buffers every call —
        # measured 1.75 ms/token at 7B S=1024 vs 0.34 ms for the carry form
        # (the single largest decode overhead found in r05).

        blocks = params["blocks"]
        # stacked-weights mode only for the Pallas-served quantized
        # formats; everything else scans per-layer weight slices as xs
        # (see apply_block docstring)
        pallas_stacked = any(
            str(path[-1]).find("q4r1") >= 0 or str(path[-1]).find("q4b") >= 0
            or str(path[-1]).find("q8") >= 0
            for path, _ in jax.tree_util.tree_flatten_with_path(blocks)[0]
        )
        # dense models route by size (measured, decode_table r05 A/B):
        # phi-1.5 (2048-dim) serves 206 tok/s stacked vs 164 xs, while
        # StableLM-3B (4096-dim) serves 90.7 xs vs 75.9 stacked — the
        # crossover sits between those widths on this chip
        if not pallas_stacked and cfg.n_embd <= 2560:
            pallas_stacked = True

        if pallas_stacked:
            def body(carry, l):
                y, cache = carry
                y, cache = apply_block(blocks, y, cfg, cos, sin, mask, cache,
                                       input_pos, layer=l)
                return (y, cache), None

            (x, new_cache), _ = jax.lax.scan(
                body, (x, kv_cache),
                jnp.arange(cfg.n_layer, dtype=jnp.int32),
                unroll=unroll,
            )
        else:
            # pure-dense (and exact-4-bit) models: the original xs/ys scan
            # over (weights, cache) slices. Measured on the 3B bf16 row:
            # this shape prefers XLA's own xs handling end-to-end (90 tok/s)
            # over both stacked-weights slicing (75.9) and the hybrid
            # xs-weights + carry-cache (41.1) — XLA fuses its sliced dense
            # operands and pipelines the ys writes, while the hybrid
            # combination degraded scheduling (decode_table r05 A/B).
            def body(carry, scanned):
                bp, cache_l = scanned
                y, cache_l = apply_block(bp, carry, cfg, cos, sin, mask,
                                         cache_l, input_pos)
                return y, cache_l

            x, new_cache = jax.lax.scan(
                body, x, (blocks, kv_cache), unroll=unroll
            )
    else:

        def body(carry, bp):
            y, _ = apply_block(bp, carry, cfg, cos, sin, mask, None, None)
            return y, None

        body = _remat_wrap(body, remat)
        x, _ = jax.lax.scan(body, x, params["blocks"], unroll=unroll)
        new_cache = None

    x = apply_norm(x, params["ln_f"], cfg.norm_class_name, cfg.norm_eps, cfg.add_unit_offset)
    if logits_at is not None:
        x = jnp.take_along_axis(
            x, logits_at.astype(jnp.int32)[:, None, None], axis=1)
    logits = linear(params["lm_head"], x)
    return logits, new_cache


# --------------------------------------------------------------------------
# Linear-attention state cache: O(1)-per-token decode for the linear
# attention algorithms (fastmax/linearmax/performer). See ops/fastmax.py —
# the reference instead re-read the full padded KV buffer every step.
# --------------------------------------------------------------------------


def init_linear_cache(cfg: Config, batch_size: int) -> dict:
    """Stacked per-layer running state (leading n_layer axis), shaped for
    the full head count (linear algs run on expanded heads)."""
    from ..ops import fastmax as fm

    l, h, d = cfg.n_layer, cfg.n_head, cfg.head_size
    f32 = jnp.float32
    p = 2 if cfg.attn_alg in ("fastmax", "fastmax_cuda") else 1
    d2 = d * d if p == 2 else 1
    state = {
        "cnt": jnp.zeros((l, batch_size, h), f32),
        "s_v": jnp.zeros((l, batch_size, h, d), f32),
        "s_kv": jnp.zeros((l, batch_size, h, d, d), f32),
        "s_k": jnp.zeros((l, batch_size, h, d), f32),
        "s_kkv": jnp.zeros((l, batch_size, h, d2, d), f32),
        "s_kk": jnp.zeros((l, batch_size, h, d2), f32),
    }
    if cfg.attn_alg == "linearmax":
        state["q_div"] = jnp.ones((l, batch_size, h), f32)
        state["k_div"] = jnp.ones((l, batch_size, h), f32)
    return state


def _attn_linear_state(p, x, cfg, cos, sin, state, is_prefill, n_valid=None):
    """Attention through the running linear-attention state.

    state: per-layer slice (no leading L axis). Returns (out, new_state).
    ``n_valid`` (traced, prefill only): tokens at positions >= n_valid are
    padding — their q/k/v are zeroed so they contribute nothing to the
    running sums (enables bucketed prefill shapes; cnt is corrected by the
    caller).
    """
    from ..ops import fastmax as fm
    from ..ops.attention import repeat_kv_heads

    b, t, _ = x.shape
    hs, g = cfg.head_size, cfg.n_query_groups
    q_per_kv = cfg.n_head // g
    qkv = linear(p["attn"], x)
    qkv = qkv.reshape(b, t, g, q_per_kv + 2, hs)
    q = qkv[..., :q_per_kv, :].reshape(b, t, cfg.n_head, hs).transpose(0, 2, 1, 3)
    k = qkv[..., q_per_kv, :].transpose(0, 2, 1, 3)
    v = qkv[..., q_per_kv + 1, :].transpose(0, 2, 1, 3)
    nre = cfg.rope_n_elem
    q = q.at[..., :nre].set(apply_rope(q[..., :nre], cos, sin)) if nre < hs else apply_rope(q, cos, sin)
    k = k.at[..., :nre].set(apply_rope(k[..., :nre], cos, sin)) if nre < hs else apply_rope(k, cos, sin)
    k = repeat_kv_heads(k, cfg.n_head)
    v = repeat_kv_heads(v, cfg.n_head)
    if n_valid is not None:
        valid = (jnp.arange(t) < n_valid)[None, None, :, None]
        q = jnp.where(valid, q, 0.0)
        k = jnp.where(valid, k, 0.0)
        v = jnp.where(valid, v, 0.0)

    alg = cfg.attn_alg
    pdeg = 2 if alg in ("fastmax", "fastmax_cuda") else 1
    import math as _math

    if is_prefill:
        if alg in ("fastmax", "fastmax_cuda"):
            y, new_state = fm.fastmax_prefill_state(q, k, v, p=pdeg)
            new_state = {**state, **new_state}
        elif alg == "linearmax":
            y, new_state = fm.linearmax_prefill_state(q, k, v, p=1)
            new_state = {**state, **new_state}
        elif alg == "performer":
            y, ps = fm.performer_prefill_state(q, k, v)
            new_state = {**state, **ps}
        else:
            raise ValueError(alg)
    else:
        q1, k1, v1 = q[:, :, 0], k[:, :, 0], v[:, :, 0]
        if alg in ("fastmax", "fastmax_cuda"):
            z = 8.0 * _math.sqrt(hs)
            core = {key: state[key] for key in ("cnt", "s_v", "s_kv", "s_k", "s_kkv", "s_kk")}
            core, o = fm.linear_attn_decode_step(core, q1, k1, v1, z, pdeg)
            new_state = {**state, **core}
        elif alg == "linearmax":
            new_state, o = fm.linearmax_decode_step(state, q1, k1, v1, p=1)
        elif alg == "performer":
            sub = {"s_kv": state["s_kv"], "s_k": state["s_k"]}
            sub, o = fm.performer_decode_step(sub, q1, k1, v1)
            new_state = {**state, **sub}
        else:
            raise ValueError(alg)
        y = o[:, :, None, :]
    y = y.astype(x.dtype).transpose(0, 2, 1, 3).reshape(b, t, hs * cfg.n_head)
    return linear(p["proj"], y), new_state


def forward_linear_cache(
    params: dict,
    cfg: Config,
    idx: jnp.ndarray,
    *,
    state: dict,
    input_pos,
    rope_cache=None,
    max_seq_length: Optional[int] = None,
    is_prefill: Optional[bool] = None,
    n_valid=None,
):
    """Forward with the linear-attention running-state cache.

    is_prefill=True: process T tokens against a fresh state (the engine
    passes this explicitly so a 1-token prompt still prefils — T > 1 is
    only the default heuristic). is_prefill=False: one decode step (T == 1).
    Returns (logits, new_state).
    """
    b, t = idx.shape
    if rope_cache is None:
        n = max_seq_length or cfg.block_size
        rope_cache = build_rope_cache(n, cfg.rope_n_elem, cfg.rope_base, cfg.rope_condense_ratio)
    rope_cos, rope_sin = rope_cache
    input_pos = jnp.asarray(input_pos, jnp.int32)
    if input_pos.ndim == 1:
        # per-slot decode positions (continuous batching): T == 1
        if t != 1:
            raise ValueError("vector input_pos requires single-token decode")
        cos = rope_cos[input_pos][:, None, None, :]  # (B, 1, 1, nre)
        sin = rope_sin[input_pos][:, None, None, :]
        if is_prefill is None:
            is_prefill = False
    else:
        zero = jnp.zeros_like(input_pos)
        cos = jax.lax.dynamic_slice(rope_cos, (input_pos, zero), (t, cfg.rope_n_elem))
        sin = jax.lax.dynamic_slice(rope_sin, (input_pos, zero), (t, cfg.rope_n_elem))
    if is_prefill is None:
        is_prefill = t > 1

    x = embedding(params["wte"], idx)
    if cfg.scale_embeddings:
        x = x * (cfg.n_embd ** 0.5)

    def body(carry, scanned):
        bp, st = scanned
        n1 = apply_norm(carry, bp["norm_1"], cfg.norm_class_name, cfg.norm_eps, cfg.add_unit_offset)
        h, st = _attn_linear_state(bp["attn"], n1, cfg, cos, sin, st, is_prefill,
                                   n_valid if is_prefill else None)
        if cfg.parallel_residual:
            n2 = n1 if cfg.shared_attention_norm else apply_norm(
                carry, bp["norm_2"], cfg.norm_class_name, cfg.norm_eps, cfg.add_unit_offset
            )
            y = apply_mlp(bp["mlp"], n2, cfg) + h + carry
        else:
            y = h + carry
            n2 = apply_norm(y, bp["norm_2"], cfg.norm_class_name, cfg.norm_eps, cfg.add_unit_offset)
            y = apply_mlp(bp["mlp"], n2, cfg) + y
        return y, st

    x, new_state = jax.lax.scan(body, x, (params["blocks"], state))
    if is_prefill and n_valid is not None:
        # padded tokens contributed nothing to the sums, but the chunk
        # counter ran over the full bucket — set it to the true length
        new_state = {**new_state,
                     "cnt": jnp.full_like(new_state["cnt"], 1.0) * jnp.asarray(n_valid, jnp.float32)}
    x = apply_norm(x, params["ln_f"], cfg.norm_class_name, cfg.norm_eps, cfg.add_unit_offset)
    return linear(params["lm_head"], x), new_state


def forward_hidden(
    params: dict,
    cfg: Config,
    idx: jnp.ndarray,
    *,
    remat: bool = False,
    unroll: int = 1,
) -> jnp.ndarray:
    """Full-sequence forward returning final hidden states (post-ln_f),
    without the lm_head — pair with utils.loss.chunked_cross_entropy for the
    reference's lm_head_chunk_size training pattern (lora.py:525-550).

    ``unroll``: layer-scan unroll factor — gives XLA >1 block bodies per scan
    iteration to fuse/overlap across (a per-op-overhead lever; numerics are
    unchanged).

    Mixed-policy remat ``"<light>@<N>:<heavy>"`` (e.g. ``"dots@8:full"``):
    the FIRST N layers run under the lighter policy (saving their matmul
    outputs), the rest under the heavy one — the memory-graded middle
    ground when the light policy alone does not fit the chip. Each saved
    layer removes its forward recompute from the backward, so the step's
    recompute factor falls from (fwd+fwd+2fwd)/4fwd toward 3/4
    proportionally to N. Gradient-accumulation-free, unlike the accum
    route (measured r05: accum's grad-buffer traffic cost more than the
    recompute it saved)."""
    rope_cache = build_rope_cache(
        cfg.block_size, cfg.rope_n_elem, cfg.rope_base, cfg.rope_condense_ratio
    )
    t = idx.shape[1]
    cos, sin = rope_cache[0][:t], rope_cache[1][:t]
    x = embedding(params["wte"], idx)
    if cfg.scale_embeddings:
        x = x * (cfg.n_embd ** 0.5)

    def body(carry, bp):
        y, _ = apply_block(bp, carry, cfg, cos, sin, None, None, None)
        return y, None

    if isinstance(remat, str) and "@" in remat:
        light, rest = remat.split("@", 1)
        n_s, heavy = rest.split(":", 1)
        n_light = int(n_s)
        body_light = _remat_wrap(body, light)
        body_heavy = _remat_wrap(body, heavy)
        first = jax.tree.map(lambda a: a[:n_light], params["blocks"])
        second = jax.tree.map(lambda a: a[n_light:], params["blocks"])
        x, _ = jax.lax.scan(body_light, x, first, unroll=unroll)
        x, _ = jax.lax.scan(body_heavy, x, second, unroll=unroll)
    else:
        body = _remat_wrap(body, remat)
        x, _ = jax.lax.scan(body, x, params["blocks"], unroll=unroll)
    return apply_norm(x, params["ln_f"], cfg.norm_class_name, cfg.norm_eps, cfg.add_unit_offset)
