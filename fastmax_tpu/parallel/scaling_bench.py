"""Scaling-efficiency harness (the BASELINE "≥85% scaling efficiency
1 chip -> 1 host -> 2+ hosts" measurement).

Measures decode throughput and train-step time across mesh sizes on
whatever devices are visible (real chips on a pod slice; the 8-device
virtual CPU mesh in CI exercises the mechanics). Efficiency(P) =
throughput(P) / (P * throughput(1)).

  python -m fastmax_tpu.parallel.scaling_bench --model_name pythia-160m
"""

from __future__ import annotations

import json
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding

from ..models.config import Config
from ..models import gpt
from . import sharding as sh


def _train_step_time(cfg: Config, mesh, fsdp: int, tp: int, batch_size: int,
                     seq_len: int, iters: int = 5) -> float:
    import optax

    from ..training.step import make_loss_fn

    params = gpt.init_params(cfg, jax.random.PRNGKey(0))
    specs = sh.param_specs(cfg, params, tp=tp > 1, fsdp_size=fsdp)
    params = sh.shard_params(params, mesh, specs)
    loss_fn = make_loss_fn(cfg, remat=True)
    optimizer = optax.adamw(1e-4)
    opt_state = optimizer.init(params)

    def step(params, opt_state, batch):
        loss, grads = jax.value_and_grad(loss_fn)(params, batch)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    batch = jnp.asarray(
        np.random.default_rng(0).integers(0, cfg.vocab_size, (batch_size, seq_len + 1)),
        jnp.int32,
    )
    def many(params, opt_state, batch, n):
        # one dispatch for the whole timing loop: per-call launch latency
        # (large on tunneled chips) must not pollute the step time, and the
        # chained carry defeats upstream call-memoization
        def body(_, c):
            p, o, _ = c
            return step(p, o, batch)

        return jax.lax.fori_loop(0, n, body, (params, opt_state, jnp.float32(0)))

    batch = jax.device_put(batch, NamedSharding(mesh, sh.batch_spec()))
    with mesh:
        jmany = jax.jit(many, donate_argnums=(0, 1))
        params, opt_state, loss = jmany(params, opt_state, batch, 1)  # compile
        float(loss)  # fetch, not block_until_ready: tunneled runtimes ack early
        t0 = time.perf_counter()
        params, opt_state, loss = jmany(params, opt_state, batch, iters)
        float(loss)
    return (time.perf_counter() - t0) / iters


def run(
    model_name: str = "pythia-160m",
    seq_len: int = 256,
    per_device_batch: int = 4,
    max_devices: Optional[int] = None,
) -> dict:
    cfg = Config.from_name(model_name)
    cfg.block_size = min(cfg.block_size, seq_len)
    n = min(max_devices or len(jax.devices()), len(jax.devices()))
    sizes = [p for p in (1, 2, 4, 8, 16, 32) if p <= n]
    results = {}
    base_tps = None
    for p in sizes:
        fsdp = p if p <= 8 else 8
        data = p // fsdp
        mesh = sh.make_mesh(data=data, fsdp=fsdp, model=1)
        bs = per_device_batch * p
        dt = _train_step_time(cfg, mesh, fsdp=fsdp, tp=1, batch_size=bs, seq_len=seq_len)
        tps = bs * seq_len / dt
        if base_tps is None:
            base_tps = tps
        eff = tps / (p * base_tps)
        results[p] = {"tokens_per_sec": tps, "step_time_s": dt, "efficiency": eff}
        print(f"devices={p}: {tps:,.0f} tok/s, step {dt*1e3:.1f} ms, efficiency {eff:.2%}")
    return results


def main() -> None:
    from ..utils.cli import CLI

    out = CLI(run)
    print(json.dumps({str(k): v for k, v in out.items()}, indent=2))


if __name__ == "__main__":
    main()
