"""Honest (differential-timing) measurement of the exact-NF4 codebook
kernel, round 5.

The r04 decode-table showed bit-faithful NF4 serving at 10.0 tok/s (13B)
and the kernel at "~150 G params/s" — but every r04 kernel-scope number
carried the tunnel-RTT artifact (see tools/int4_opt_r05.py). This lab
re-measures ops/quant_pallas.nf4_matmul with the slope protocol, plus the
dense-bf16 and rank-1 comparisons at the same shapes, so the exact-path
ceiling analysis in quant_pallas.py rests on honest numbers.

  python tools/nf4_exact_r05.py [--out f]
"""

from __future__ import annotations

import argparse
import json
import pathlib
import sys

REPO = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import jax
import jax.numpy as jnp
import numpy as np

from fastmax_tpu.ops.quant import quantize_4bit
from fastmax_tpu.ops.quant_pallas import (
    nf4_matmul,
    pack_int4_tiled,
    int4_matmul_tiled,
)
from tools.int4_opt_r05 import SHAPES_7B, make_timer


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="")
    ap.add_argument("--iters-lo", type=int, default=50)
    ap.add_argument("--iters-hi", type=int, default=250)
    args = ap.parse_args()
    timer = make_timer(args.iters_lo, args.iters_hi)
    rng = np.random.default_rng(0)
    out_f = open(args.out, "a") if args.out else None

    for k, n in SHAPES_7B:
        w = rng.standard_normal((k, n)).astype(np.float32) * 0.02
        p = quantize_4bit(w, "nf4")
        packed = jnp.asarray(p["q4"])
        absmax = jnp.asarray(p["absmax"])
        code = jnp.asarray(p["code"])
        x = jnp.asarray(rng.standard_normal((1, k)), jnp.float32)

        codes_i = rng.integers(-8, 8, size=(k, n), dtype=np.int64)
        pw_t = jnp.asarray(pack_int4_tiled(codes_i))
        k_pad = pw_t.shape[0] * pw_t.shape[2]
        xr = jnp.asarray(rng.standard_normal((1, k_pad)), jnp.float32)
        wd = jnp.asarray(w, jnp.bfloat16)
        xb = xr[:, :k].astype(jnp.bfloat16)

        for variant, fn, x0 in (
            ("nf4_exact", lambda xx: nf4_matmul(xx, packed, absmax, code), x),
            ("int4_rank1_raw", lambda xx: int4_matmul_tiled(xx, pw_t), xr),
            ("bf16_dense", lambda xx: jnp.dot(xx, wd,
                                              preferred_element_type=jnp.float32), xb),
        ):
            try:
                dt = timer(fn, x0)
                bytes_per = {"nf4_exact": 0.5, "int4_rank1_raw": 0.5,
                             "bf16_dense": 2.0}[variant]
                rec = {"variant": variant, "k": k, "n": n,
                       "us": round(dt * 1e6, 2),
                       "g_params_s": round(k * n / dt / 1e9, 1),
                       "gbps_read": round(k * n * bytes_per / dt / 1e9, 1)}
            except Exception as e:  # noqa: BLE001
                rec = {"variant": variant, "k": k, "n": n,
                       "error": f"{type(e).__name__}: {e}"[:200]}
            line = json.dumps(rec)
            print(line, flush=True)
            if out_f:
                out_f.write(line + "\n")
                out_f.flush()


if __name__ == "__main__":
    main()
