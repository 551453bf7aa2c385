"""KV-cached autoregressive inference engine.

TPU-native re-design of the reference decode loop (generate/base.py:50-93):
one prefill call over the prompt followed by per-token decode. Differences
from the reference, driven by XLA's compilation model:

* The whole decode loop runs **on device** inside a single jit as a
  ``lax.while_loop`` — no host<->device round trip per token (the reference
  syncs every token for the eos check, generate/base.py:87-92).
* The KV cache is a donated pytree argument, so XLA updates it in place.
* Sampling uses the Gumbel-max trick with an explicit PRNG key.
* For the linear-attention algorithms (fastmax/linearmax/performer) decode
  keeps an O(1) running state (sum of v, k (x) v, ...) instead of re-reading
  the dense KV cache every step — the natural TPU decode mode for linear
  attention (the reference instead ran the unmasked formula over the full
  padded cache, model.py:463-487).
"""

from __future__ import annotations

import time
from typing import Optional

import jax
import jax.numpy as jnp

from ..models.config import Config
from ..models import gpt
from ..ops.rope import build_rope_cache
from ..ops.sampling import sample


def _largest_q4(params: dict) -> Optional[dict]:
    """Find the largest 2D-sliced 4-bit linear for autotuning."""
    best = None
    best_size = -1

    def walk(node):
        nonlocal best, best_size
        if isinstance(node, dict):
            if "q4" in node:
                arr = node["q4"]
                if arr.size > best_size:
                    if arr.ndim > 2:
                        idx = (0,) * (arr.ndim - 2)
                        node = {
                            k: (v[idx] if hasattr(v, "ndim") and v.ndim > _AUTOTUNE_RANK.get(k, 0) else v)
                            for k, v in node.items() if k != "bias"
                        }
                    best, best_size = {k: v for k, v in node.items() if k != "bias"}, arr.size
            else:
                for v in node.values():
                    walk(v)

    walk(params)
    return best


_AUTOTUNE_RANK = {"q4": 2, "absmax": 2, "code": 1, "absmax_q": 2,
                  "absmax_scale": 1, "absmax_offset": 0}


_FUSABLE_AXES = ("kernel", "q8", "scale8", "q4", "absmax", "bias")


def _fuse_mlp_gates(params: dict) -> dict:
    """Concatenate the SwiGLU/GeGLU gate+up kernels ([fc_1 | fc_2] along the
    output axis) into one ``fc_12`` matmul — an inference-only layout that
    halves the MLP-up kernel count. Skipped when the arrays are sharded
    across devices (a colwise TP shard of the concat would land all of fc_1
    on shard 0), carry LoRA/adapter terms, or use double-quantized scales
    (whose flat-packed absmax doesn't concat along the output axis)."""
    blocks = params.get("blocks")
    if not isinstance(blocks, dict):
        return params
    mlp = blocks.get("mlp")
    if not isinstance(mlp, dict) or "fc_1" not in mlp or "fc_2" not in mlp:
        return params
    fc1, fc2 = mlp["fc_1"], mlp["fc_2"]
    if set(fc1) != set(fc2):
        return params
    if any(k != "code" and k not in _FUSABLE_AXES for k in fc1):
        return params
    for leaf in (next(iter(fc1.values())),):
        sharding = getattr(leaf, "sharding", None)
        if sharding is not None and len(getattr(sharding, "device_set", ())) > 1:
            return params
    fused = {
        k: jnp.concatenate([fc1[k], fc2[k]], axis=-1) for k in fc1 if k != "code"
    }
    if "code" in fc1:
        fused["code"] = fc1["code"]
    new_mlp = {k: v for k, v in mlp.items() if k not in ("fc_1", "fc_2")}
    new_mlp["fc_12"] = fused
    new_blocks = dict(blocks)
    new_blocks["mlp"] = new_mlp
    out = dict(params)
    out["blocks"] = new_blocks
    return out


def _dense_param_count(params: dict) -> int:
    import numpy as np

    total = 0
    for path, leaf in jax.tree_util.tree_flatten_with_path(params)[0]:
        name = str(path[-1])
        if "q4r1" in name or "q4b" in name:
            total += leaf.size * 8  # int32 words, 8 nibbles each
        elif "q4" in name:
            total += leaf.size * 2
        elif any(s in name for s in ("absmax", "code", "scale", "n4", "k4", "u4", "v4")):
            continue
        else:
            total += leaf.size
    return total


class InferenceEngine:
    """Holds config + jitted prefill/decode for a fixed (batch, max_seq)."""

    def __init__(
        self,
        cfg: Config,
        params: dict,
        *,
        max_seq_length: Optional[int] = None,
        batch_size: int = 1,
        cache_dtype=None,
        weights_mode: str = "auto",
        scan_unroll: int = 1,
        mesh=None,
    ):
        """weights_mode (for quantized params):
        "quantized"     keep packed weights, dequantize inside each matmul
                        (fused Pallas or XLA path, autotuned) — bit-exact
                        NF4 numerics, but the codebook lookup is VPU-bound
                        (~150 G params/s; quant_pallas.py SOL analysis);
        "preload"       dequantize once to the activation dtype at init —
                        dense-bandwidth decode at a 4x HBM footprint,
                        bit-exact 4-bit numerics;
        "preload_int8"  re-represent 4-bit linears as dense per-channel
                        int8 at init; decode streams int8 straight into the
                        MXU (fused convert) — ~1.5-1.9x faster than the
                        bf16 HBM ceiling at +~0.4% weight error;
        "preload_int4"  re-represent 4-bit linears as tiled linear-int4
                        with rank-1 (k-block x column) scale envelopes;
                        decode reads 0.5 byte/param through the Pallas
                        nibble kernel at ~800 G params/s — the fastest and
                        smallest serving mode (accuracy delta measured in
                        docs/accuracy.md);
        "preload_int4_block" same with exact per-64-block scales: ~620
                        G params/s, tighter accuracy than rank-1;
        "auto"          int8 and tiled-int4 models stay native (those ARE
                        the fast paths); packed NF4/FP4 models preload to
                        tiled int4 on TPU (fastest + smallest, r04 decode
                        table), to int8 elsewhere when that fits in HBM.
        """
        self.cfg = cfg
        # mesh: when serving TP/FSDP-sharded params, place fresh KV caches
        # with explicit specs (heads over model, incl. int8-cache scale
        # leaves) instead of leaving layout to GSPMD propagation
        self.mesh = mesh
        params = self.prepare_params(params, weights_mode)
        self.params = params
        self.scan_unroll = scan_unroll
        self.max_seq_length = min(max_seq_length or cfg.block_size, cfg.block_size)
        self.batch_size = batch_size
        # activations follow the embedding table's dtype (quantized models
        # keep f32 scale leaves, so "first leaf" would be wrong)
        param_dtype = params["wte"].dtype
        self.cache_dtype = cache_dtype or param_dtype
        self.rope_cache = build_rope_cache(
            self.max_seq_length, cfg.rope_n_elem, cfg.rope_base, cfg.rope_condense_ratio
        )
        self._prefill = jax.jit(self._prefill_impl, donate_argnums=(2,))
        # max_new is traced (the token buffer is statically sized to
        # max_seq_length), so changing the generation budget does NOT
        # recompile — only temperature-mode/top_k changes do.
        self._decode_loop = jax.jit(
            self._decode_loop_impl,
            static_argnames=("greedy", "top_k"),
            donate_argnums=(1,),
        )

    @staticmethod
    def prepare_params(params: dict, mode: str) -> dict:
        """Full inference weight preparation: apply serving-only layout
        optimizations (fused gate+up) first, then resolve the serving
        representation (see weights_mode) — fuse-first so the int4/int8
        re-representations cover the fused fc_12 kernel too."""
        return InferenceEngine._resolve_weights(_fuse_mlp_gates(params), mode)

    @staticmethod
    def _resolve_weights(params: dict, mode: str) -> dict:
        from ..ops import quant

        leaves = jax.tree_util.tree_flatten_with_path(params)[0]
        has_q4 = any(str(p[-1]).find("q4") >= 0 for p, _ in leaves)
        has_q8 = any(str(p[-1]).find("q8") >= 0 for p, _ in leaves)
        if not (has_q4 or has_q8) or mode == "quantized":
            if has_q4 and jax.default_backend() == "tpu":
                # pick the faster 4-bit matmul implementation for this chip
                sample = _largest_q4(params)
                if sample is not None:
                    k_in = sample["q4"].shape[0] * 2
                    x = jnp.zeros((1, k_in), params["wte"].dtype)
                    quant.autotune_quant_backend(sample, x)
            return params
        act_dtype = params["wte"].dtype
        if mode == "preload":
            return quant.dequantize_model(params, act_dtype)
        if mode == "preload_int8":
            return quant.requantize_int8_model(params)
        if mode == "preload_int4":
            return quant.requantize_int4_model(params, "rank1")
        if mode == "preload_int4_block":
            return quant.requantize_int4_model(params, "block")
        # auto: int8 weights already serve through the fused int8 matmul —
        # that IS the fast path, never widen them. Tiled-int4 weights
        # (q4r1/q4b) likewise stay native: they are already the fastest
        # measured decode representation on this chip (decode_table_r04:
        # 84.1 vs int8's 78.0 tok/s at 7B), and re-representing them as
        # int8 would add a second quantization error on top of the first
        # (r04: the 7B e2e initially lost 23% throughput to exactly this).
        # Packed NF4/FP4 checkpoints preload to dense int8 when that fits
        # in ~60% of device memory.
        if not has_q4:
            return params
        if any(str(p[-1]).find("q4r1") >= 0 or str(p[-1]).find("q4b") >= 0
               for p, _ in leaves):
            return params
        if jax.default_backend() == "tpu":
            # packed NF4/FP4 -> tiled int4 (rank-1): the fastest measured
            # decode representation on this chip at HALF the int8 re-rep's
            # footprint (decode_table_r04: 7B 84.1 vs 78.0 tok/s at
            # 3.56 vs 9.22 GB; 13B fits ONLY in int4 on 16 GB). Accuracy
            # cost vs the int8 re-rep is +0.002 bits/byte and -0.2 pp
            # (inside the 1.1 pp se) on the n=2000 cloze benchmark
            # (bench_results/accuracy_int4_r04.log, docs/accuracy.md);
            # callers wanting the exact packed codebook use
            # weights_mode="quantized", tighter scales "preload_int4_block".
            import logging

            logging.getLogger(__name__).info(
                "weights_mode='auto': re-representing the packed 4-bit "
                "codebook as tiled rank-1 int4 for serving (not bit-exact "
                "NF4/FP4; measured delta +0.002 bits/byte, docs/accuracy.md)."
                " Pass weights_mode='quantized' to serve the codebook "
                "bit-faithfully."
            )
            return quant.requantize_int4_model(params, "rank1")
        int8_bytes = _dense_param_count(params)  # 1 byte/param
        dev = jax.devices()[0]
        limit = 0
        try:
            stats = dev.memory_stats()
            if stats:
                limit = stats.get("bytes_limit", 0)
        except Exception:
            pass
        if not limit:
            # stats unavailable on some runtimes (e.g. tunneled chips):
            # fall back to nominal HBM per chip by device kind
            kind = dev.device_kind.lower()
            for key, gb in (("v5p", 95), ("v5 lite", 16), ("v5e", 16), ("v4", 32), ("v6", 32)):
                if key in kind:
                    limit = gb * 2**30
                    break
        if limit and int8_bytes < 0.6 * limit:
            return quant.requantize_int8_model(params)
        return InferenceEngine._resolve_weights(params, "quantized")

    @property
    def _linear_alg(self) -> bool:
        return self.cfg.attn_alg in ("fastmax", "fastmax_cuda", "linearmax", "performer")

    def new_cache(self) -> dict:
        if self._linear_alg:
            # O(1)-per-token running state instead of a dense KV buffer
            return gpt.init_linear_cache(self.cfg, self.batch_size)
        cache = gpt.init_kv_cache(
            self.cfg, self.batch_size, self.max_seq_length, self.cache_dtype
        )
        if self.mesh is not None:
            from ..parallel.sharding import MODEL_AXIS, shard_kv_cache

            tp = self.mesh.shape.get(MODEL_AXIS, 1) > 1
            cache = shard_kv_cache(cache, self.mesh, self.cfg, tp=tp)
        return cache

    # ------------------------------------------------------------------ steps

    def _model_step(self, params, tokens, cache, input_pos, is_prefill=False):
        if self._linear_alg:
            return gpt.forward_linear_cache(
                params, self.cfg, tokens,
                state=cache, input_pos=input_pos, rope_cache=self.rope_cache,
                is_prefill=is_prefill,
            )
        return gpt.forward(
            params, self.cfg, tokens,
            input_pos=input_pos, kv_cache=cache, rope_cache=self.rope_cache,
            unroll=self.scan_unroll,
        )

    def _prefill_impl(self, params, tokens, cache, input_pos):
        logits, cache = self._model_step(params, tokens, cache, input_pos, is_prefill=True)
        return logits[:, -1, :], cache

    # prompts longer than this prefill in PREFILL_CHUNK-token pieces: each
    # piece rides the fused stacked-int4 kernel (m <= 512), where a single
    # long call falls to the XLA dequantize path — measured r05 at 7B int4:
    # 2048-token prompt 541 ms single-call vs 338 ms chunked, 512-token
    # 235 -> 94 ms once the kernel covered m=512
    # (bench_results/decode_table_r05.jsonl). Chunks also share executables
    # across prompt lengths instead of compiling per length.
    PREFILL_CHUNK = 512

    def _chunked_prefill(self, prompt, cache):
        t = prompt.shape[1]
        c = self.PREFILL_CHUNK
        if t <= c or self._linear_alg:
            return self._prefill(self.params, prompt, cache, 0)
        pos = 0
        while pos < t:
            step = c if (t - pos) > c else t - pos
            logits, cache = self._prefill(
                self.params, jax.lax.slice_in_dim(prompt, pos, pos + step, axis=1),
                cache, pos,
            )
            pos += step
        return logits, cache

    def _decode_loop_impl(
        self, params, cache, first_token, prompt_len, key, max_new,
        temperature, *, greedy: bool, top_k, eos_id,
    ):
        """Decode until eos or the token budget, entirely on device.

        ``temperature`` is a TRACED scalar — only the greedy/sampled MODE
        (``greedy``) and ``top_k`` are static, so a server sweeping
        temperatures reuses one executable (asserted by
        tests/test_recompile_guard.py; the r03 version made temperature
        itself static, recompiling per distinct value)."""
        b = first_token.shape[0]
        tokens = jnp.zeros((b, self.max_seq_length), jnp.int32)
        tokens = tokens.at[:, 0].set(first_token)

        def cond(carry):
            i, _, _, _, done = carry
            # run until every row has emitted eos (or the budget is spent);
            # finished rows keep decoding but their output is truncated at
            # their own eos on the host side
            return (i < max_new - 1) & ~jnp.all(done)

        def body(carry):
            i, cache, tokens, key, done = carry
            pos = prompt_len + i
            cur = jax.lax.dynamic_slice(tokens, (0, i), (b, 1))
            logits, cache = self._model_step(params, cur, cache, pos)
            key, sub = jax.random.split(key)
            if greedy:
                nxt = jnp.argmax(
                    logits[:, -1, :].astype(jnp.float32), axis=-1
                ).astype(jnp.int32)
            else:
                l = logits[:, -1, :].astype(jnp.float32)
                if top_k is not None:
                    kth = jnp.sort(l, axis=-1)[..., -top_k][..., None]
                    l = jnp.where(l < kth, -jnp.inf, l)
                l = l / jnp.maximum(temperature, 1e-6)
                gumbel = -jnp.log(
                    -jnp.log(jax.random.uniform(sub, l.shape) + 1e-20) + 1e-20
                )
                nxt = jnp.argmax(l + gumbel, axis=-1).astype(jnp.int32)
            tokens = jax.lax.dynamic_update_slice(tokens, nxt[:, None], (0, i + 1))
            if eos_id is not None:
                done = done | (nxt == eos_id)
            return i + 1, cache, tokens, key, done

        done0 = (
            first_token == eos_id if eos_id is not None else jnp.zeros((b,), bool)
        )
        n, cache, tokens, _, _ = jax.lax.while_loop(
            cond, body, (jnp.asarray(0), cache, tokens, key, done0)
        )
        return tokens, n + 1, cache

    # --------------------------------------------------------------- generate

    def generate(
        self,
        prompt: jnp.ndarray,
        max_returned_tokens: int,
        *,
        temperature: float = 1.0,
        top_k: Optional[int] = None,
        eos_id: Optional[int] = None,
        key: Optional[jax.Array] = None,
    ) -> jnp.ndarray:
        """Generate tokens; mirrors generate/base.py:50-93.

        prompt: (T,) or (B, T) int tokens. Returns (B, n) generated sequence
        including the prompt, truncated at eos.
        """
        if prompt.ndim == 1:
            prompt = prompt[None]
        b, t = prompt.shape
        assert b == self.batch_size
        if max_returned_tokens > self.max_seq_length:
            raise ValueError(
                f"max_returned_tokens {max_returned_tokens} > max_seq_length {self.max_seq_length}"
            )
        key = key if key is not None else jax.random.PRNGKey(int(time.time_ns()) % (2**31))
        cache = self.new_cache()
        logits, cache = self._chunked_prefill(prompt.astype(jnp.int32), cache)
        key, sub = jax.random.split(key)
        first = sample(logits, sub, temperature, top_k)

        max_new = max_returned_tokens - t
        gen_tokens, n, _ = self._decode_loop(
            self.params, cache, first, t, key, max_new,
            jnp.float32(temperature), greedy=temperature <= 0.0,
            top_k=top_k, eos_id=eos_id,
        )
        n = int(n)
        out = jnp.concatenate([prompt, gen_tokens[:, :n]], axis=1)
        if eos_id is not None and b == 1:
            # truncate batch-1 output at the eos token (ref behavior); for
            # b > 1 rows finish at different lengths — the caller slices
            # each row at its own eos
            arr = jax.device_get(out[0])
            hits = (arr[t:] == eos_id).nonzero()[0]
            if hits.size:
                out = out[:, : t + int(hits[0]) + 1]
        return out
