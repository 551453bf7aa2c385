"""Decode-throughput table across model sizes and serving representations
(verdict r03 next #4 — mirror BASELINE.md's resource-tables rows).

Reference rows this mirrors (tutorials/resource-tables.md:132-158, 1xA100):
  phi-1.5 1.3B bf16 42.56 tok/s | StableLM-3B bf16 49.01 | Llama-2 7B bf16
  30.97 / nf4 19.98 | Llama-2 13B bf16 24.82 / nf4 16.73.

Each row runs in its own subprocess (device memory fully returned between
rows; the persistent compile cache keeps repeat runs warm). Weights are
random, built directly on-device in the row's serving representation —
per-token HBM traffic and compute match a real checkpoint of that format
(weights are content-independent for throughput).

  python tools/decode_table_r04.py                 # all rows
  python tools/decode_table_r04.py 13b_nf4 3b_bf16 # subset
"""

from __future__ import annotations

import json
import pathlib
import subprocess
import sys
import time

REPO = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

ROWS = {
    # row: (model registry name, representation)
    "phi15_bf16": ("phi-1_5", "bf16"),
    "3b_bf16": ("stablelm-base-alpha-3b", "bf16"),
    "7b_bf16": ("Llama-2-7b-hf", "bf16"),
    "7b_int8": ("Llama-2-7b-hf", "int8"),
    "7b_nf4": ("Llama-2-7b-hf", "nf4"),
    "7b_int4": ("Llama-2-7b-hf", "int4"),
    "13b_nf4": ("Llama-2-13b-hf", "nf4"),
    "13b_int8": ("Llama-2-13b-hf", "int8"),
    "13b_int4": ("Llama-2-13b-hf", "int4"),
}

BASELINE_A100 = {  # tok/s, GB (resource-tables.md / quantize.md)
    "phi15_bf16": (42.56, 2.86),
    "3b_bf16": (49.01, 7.30),
    "7b_bf16": (30.97, 13.52),
    "7b_nf4": (19.98, 4.57),
    "13b_nf4": (16.73, 8.32),
}


def build_fake_nf4(cfg, seed: int = 0):
    """Random weights directly in the packed-NF4 ("quantized" weights_mode)
    representation: {q4 packed uint8, absmax, code} per linear, the exact
    pytree quantize_model(params, "bnb.nf4") produces (wte/lm_head dense,
    bnb skip rules). Forces the exact-NF4 codebook matmul path end-to-end."""
    import jax
    import jax.numpy as jnp

    from fastmax_tpu.models import gpt
    from fastmax_tpu.ops.quant import CODEBOOKS, DEFAULT_BLOCK

    code = jnp.asarray(CODEBOOKS["nf4"])
    shapes = jax.eval_shape(
        lambda: gpt.init_params(cfg, jax.random.PRNGKey(seed), jnp.bfloat16)
    )
    counter = [0]

    def leaf_key():
        counter[0] += 1
        return jax.random.PRNGKey(seed * 100003 + counter[0])

    def q4(kshape):
        lead, k, n = kshape[:-2], kshape[-2], kshape[-1]
        return {
            "q4": jax.random.randint(leaf_key(), lead + (k // 2, n), 0, 256,
                                     jnp.uint8),
            "absmax": jnp.full(lead + (k // DEFAULT_BLOCK, n), 0.02,
                               jnp.float32),
            "code": jnp.broadcast_to(code, lead + (16,)),
        }

    def build(node, path):
        if isinstance(node, dict):
            if ("kernel" in node and path[0] not in ("lm_head", "wte")
                    and "experts" not in path):
                return q4(node["kernel"].shape)
            return {k: build(v, path + (k,)) for k, v in node.items()}
        import jax

        return (jax.random.normal(leaf_key(), node.shape, jnp.float32)
                * 0.02).astype(node.dtype)

    return {k: build(v, (k,)) for k, v in shapes.items()}


def run_row(row: str) -> None:
    import jax
    import jax.numpy as jnp
    import numpy as np

    import bench  # repo-root bench: fake builders + compile-cache seeding
    from fastmax_tpu.inference.engine import InferenceEngine
    from fastmax_tpu.models.config import Config
    from fastmax_tpu.utils.profiling import device_memory_stats

    model_name, rep = ROWS[row]
    cfg = Config.from_name(model_name)
    cfg.block_size = 1024
    out: dict = {"row": row, "model": model_name, "rep": rep}

    t0 = time.perf_counter()
    try:
        if rep == "bf16":
            from fastmax_tpu.models import gpt

            params = gpt.init_params(cfg, jax.random.PRNGKey(0), jnp.bfloat16)
            mode = "quantized"  # no quant leaves: passthrough
        elif rep == "int8":
            params = bench.build_fake_7b_int8(cfg)
            mode = "quantized"  # serve int8 natively (that IS the fast path)
        elif rep == "int4":
            params = bench.build_fake_7b_int4(cfg)
            mode = "quantized"
        elif rep == "nf4":
            params = build_fake_nf4(cfg)
            mode = "quantized"  # exact-NF4 codebook path, no re-representation
        jax.block_until_ready(params)
    except Exception as e:
        out["error"] = f"build: {type(e).__name__}: {e}"[:300]
        print(json.dumps(out), flush=True)
        return
    out["build_s"] = round(time.perf_counter() - t0, 1)

    out["weight_gb"] = round(
        sum(x.size * x.dtype.itemsize for x in jax.tree.leaves(params))
        / 2**30, 2)

    try:
        engine = InferenceEngine(cfg, params, max_seq_length=1024,
                                 batch_size=1, weights_mode=mode,
                                 cache_dtype=jnp.int8)
        prompt = jnp.asarray(
            np.random.default_rng(0).integers(1, cfg.vocab_size, (64,)),
            jnp.int32)
        t0 = time.perf_counter()
        res = engine.generate(prompt, 64 + 16, temperature=0.0,
                              key=jax.random.PRNGKey(1))
        np.asarray(res)
        out["compile_s"] = round(time.perf_counter() - t0, 1)

        cache = engine.new_cache()
        t0 = time.perf_counter()
        logits, cache = engine._prefill(
            engine.params, prompt[None].astype(jnp.int32), cache, 0)
        np.asarray(logits[0, :8])
        out["ttft_ms"] = round((time.perf_counter() - t0) * 1e3, 1)
        del cache, logits

        n_new = 256
        t0 = time.perf_counter()
        res = engine.generate(prompt, 64 + n_new, temperature=0.0,
                              key=jax.random.PRNGKey(2))
        np.asarray(res)
        dt = time.perf_counter() - t0
        out["tok_s"] = round(n_new / dt, 1)
        mem = device_memory_stats()
        out["peak_gb"] = round(mem["peak_bytes_in_use"] / 2**30, 2)
        out["mem_source"] = mem.get("source", "runtime")
        if row in BASELINE_A100:
            ref_tps, ref_gb = BASELINE_A100[row]
            out["ref_a100_tok_s"] = ref_tps
            out["ref_a100_gb"] = ref_gb
            out["vs_ref"] = round(out["tok_s"] / ref_tps, 2)
    except Exception as e:
        out["error"] = f"serve: {type(e).__name__}: {e}"[:300]
    print(json.dumps(out), flush=True)


def main() -> None:
    if len(sys.argv) > 2 and sys.argv[1] == "--_child":
        run_row(sys.argv[2])
        return
    rows = sys.argv[1:] or list(ROWS)
    for row in rows:
        if row not in ROWS:
            print(json.dumps({"row": row, "error": "unknown row"}), flush=True)
            continue
        rc = subprocess.call(
            [sys.executable, "-u", __file__, "--_child", row], cwd=REPO)
        if rc != 0:
            print(json.dumps({"row": row, "error": f"child rc={rc}"}),
                  flush=True)


if __name__ == "__main__":
    main()
