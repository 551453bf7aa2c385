"""Analytic per-step communication model for the 3-axis mesh
(VERDICT r02 #8: multi-chip hardware is not reachable from this image, so
the scaling story must be modeled, not measured — per-axis bytes/step vs
published link bandwidths, with the efficiency prediction ready to
validate on real hardware).

Model (ring collectives, bytes PER DEVICE per training step):

  fsdp axis (size F): all-gather params twice (fwd + rematted bwd) and
      reduce-scatter grads once -> 3 * P_bytes * (F-1)/F
  data axis (size D): all-reduce grads -> 2 * P_bytes * (D-1)/D
      (hybrid shard: the reduce-scattered shard P/F is all-reduced over
      the data axis -> 2 * (P_bytes/F) * (D-1)/D)
  model axis (size M), megatron TP: 4 activation all-reduces per layer
      per micro-batch (attn-out + mlp-out, fwd + bwd)
      -> 4 * L * 2 * B*T*E*bytes_act * (M-1)/M

Step compute time = model_flops / (MFU_target * peak * n_chips); the
prediction reports efficiency = t_compute / (t_compute + t_exposed) under
two overlap assumptions (0% = worst case, 80% = what XLA latency-hiding
typically achieves with scan-carried all-gathers).

  python tools/comm_model.py --model_name Llama-2-7b-hf --chips 8 \
      --micro_batch 8 --seq_len 2048 --fsdp 8

Bandwidth assumptions (editable flags; public figures):
  v5e ICI: 1600 Gbit/s per chip bidirectional  -> 200 GB/s
  DCN:     200 Gbit/s per host (8 chips/host)  -> 3.125 GB/s per chip
"""

from __future__ import annotations

import argparse
import json
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def model_step(
    cfg, n_params: int, *, micro_batch: int, seq_len: int,
    data: int, fsdp: int, model: int,
    ici_gbs: float, dcn_gbs: float, dcn_axis: str,
    mfu: float, peak: float, grad_bytes: int = 2, act_bytes: int = 2,
) -> dict:
    """Per-device bytes/step per axis + predicted scaling efficiency."""
    p_bytes = n_params * grad_bytes
    bte = micro_batch * seq_len * cfg.n_embd * act_bytes
    vol = {
        "fsdp": 3 * p_bytes * (fsdp - 1) / fsdp if fsdp > 1 else 0.0,
        "data": 2 * (p_bytes / fsdp) * (data - 1) / data if data > 1 else 0.0,
        "model": 4 * cfg.n_layer * bte * (model - 1) / model if model > 1 else 0.0,
    }
    t_comm = {
        ax: v / ((dcn_gbs if ax == dcn_axis else ici_gbs) * 1e9)
        for ax, v in vol.items()
    }
    from fastmax_tpu.utils.flops import estimate_flops

    n_chips = data * fsdp * model
    flops = estimate_flops(cfg, n_params, seq_len, training=True) * micro_batch
    # total step work spread over the aggregate compute rate (the batch is
    # per-device here, i.e. weak scaling: global batch grows with chips)
    t_compute = flops / (mfu * peak)
    total_comm = sum(t_comm.values())
    out = {
        "mesh": {"data": data, "fsdp": fsdp, "model": model},
        "bytes_per_dev": {ax: round(v / 2**20, 1) for ax, v in vol.items()},
        "t_compute_ms": round(t_compute * 1e3, 2),
        "t_comm_ms": {ax: round(v * 1e3, 2) for ax, v in t_comm.items()},
        "eff_no_overlap": round(t_compute / (t_compute + total_comm), 3),
        "eff_80pct_overlap": round(
            t_compute / (t_compute + 0.2 * total_comm), 3
        ),
    }
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--model_name", default="Llama-2-7b-hf")
    ap.add_argument("--micro_batch", type=int, default=8)
    ap.add_argument("--seq_len", type=int, default=2048)
    ap.add_argument("--mfu", type=float, default=0.45,
                    help="assumed single-chip compute MFU")
    ap.add_argument("--peak_tflops", type=float, default=197.0)
    ap.add_argument("--ici_gbs", type=float, default=200.0)
    ap.add_argument("--dcn_gbs", type=float, default=3.125)
    args = ap.parse_args()

    from fastmax_tpu.models.config import Config
    from fastmax_tpu.models import gpt
    import jax

    cfg = Config.from_name(args.model_name)
    shapes = jax.eval_shape(
        lambda: gpt.init_params(cfg, jax.random.PRNGKey(0))
    )
    n_params = sum(
        int(__import__("numpy").prod(x.shape)) for x in jax.tree.leaves(shapes)
    )
    print(f"{cfg.name}: {n_params/1e9:.2f}B params")

    meshes = [
        (1, 1, 1), (1, 2, 1), (1, 4, 1), (1, 8, 1),   # FSDP over ICI
        (1, 1, 8),                                      # TP over ICI
        (2, 8, 1), (1, 16, 1),                          # 16 chips: hybrid vs flat
    ]
    rows = []
    for d, f, m in meshes:
        # beyond 8 chips (one v5e host/slice unit) the slowest axis crosses DCN
        dcn_axis = "data" if d > 1 else ("fsdp" if d * f * m > 8 and f > 8 else "")
        r = model_step(
            cfg, n_params, micro_batch=args.micro_batch, seq_len=args.seq_len,
            data=d, fsdp=f, model=m, ici_gbs=args.ici_gbs, dcn_gbs=args.dcn_gbs,
            dcn_axis=dcn_axis, mfu=args.mfu, peak=args.peak_tflops * 1e12,
        )
        r["dcn_axis"] = dcn_axis or None
        rows.append(r)
        print(json.dumps(r))


if __name__ == "__main__":
    main()
