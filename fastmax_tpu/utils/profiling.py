"""Profiling and throughput observability.

The reference's observability was ThroughputMonitor + measure_flops + CUDA
memory prints (SURVEY.md §5). TPU-native equivalents:

* ``trace(...)`` — context manager around ``jax.profiler`` producing an
  xplane trace viewable in TensorBoard/Perfetto (the replacement for
  torch.profiler);
* ``ThroughputMonitor`` — windowed tokens/sec + est. MFU + HBM-bandwidth
  utilization;
* ``device_memory_stats`` — per-device HBM usage (the
  torch.cuda.max_memory_allocated analogue, generate/base.py:184-187).
"""

from __future__ import annotations

import contextlib
import time
from collections import deque
from pathlib import Path
from typing import Optional

import jax

# peak HBM bandwidth per chip, bytes/sec
TPU_HBM_BW = {"v4": 1.2e12, "v5e": 819e9, "v5 lite": 819e9, "v5p": 2.77e12}


def enable_compile_cache(cache_dir: "str | Path | None" = None) -> None:
    """Enable the persistent XLA compilation cache (idempotent).

    Cold compiles through the tunnel cost minutes (docs/perf.md:15);
    every long-lived entry point (bench.py, bench_mfu, tools/*) opts in so
    reruns within and across rounds skip them. Default location: the repo's
    gitignored .jax_cache/.
    """
    if cache_dir is None:
        cache_dir = Path(__file__).resolve().parents[2] / ".jax_cache"
    jax.config.update("jax_compilation_cache_dir", str(cache_dir))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)


@contextlib.contextmanager
def trace(log_dir: "str | Path" = "/tmp/jax-trace", host_tracer_level: int = 2):
    """Capture a profiler trace: ``with trace("dir"): step()``."""
    jax.profiler.start_trace(str(log_dir))
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named region visible in the trace viewer."""
    return jax.profiler.TraceAnnotation(name)


def device_memory_stats(device=None) -> dict:
    """HBM usage. The axon-tunneled runtime returns no memory_stats at all;
    fall back to summing live device arrays — an honest *floor* (excludes
    in-step transients/fragmentation), flagged via source="live_arrays"."""
    device = device or jax.devices()[0]
    stats = device.memory_stats() or {}
    out = {
        "bytes_in_use": stats.get("bytes_in_use", 0),
        "peak_bytes_in_use": stats.get("peak_bytes_in_use", 0),
        "bytes_limit": stats.get("bytes_limit", 0),
        "source": "runtime",
    }
    if not out["peak_bytes_in_use"]:
        live = sum(
            x.nbytes for x in jax.live_arrays()
            if any(d is device for d in getattr(x, "devices", lambda: [])())
        )
        out["bytes_in_use"] = max(out["bytes_in_use"], live)
        out["peak_bytes_in_use"] = max(out["bytes_in_use"], live)
        out["source"] = "live_arrays"
    return out


def hbm_bw_peak(device=None) -> float:
    kind = (device or jax.devices()[0]).device_kind.lower()
    for key, bw in TPU_HBM_BW.items():
        if key in kind:
            return bw
    return 819e9


class ThroughputMonitor:
    """Windowed throughput metrics (ref ThroughputMonitor usage at
    finetune/lora.py:202,232-235)."""

    def __init__(self, window_size: int = 50, flops_per_token: Optional[float] = None,
                 bytes_per_token: Optional[float] = None):
        self._times = deque(maxlen=window_size)
        self._tokens = deque(maxlen=window_size)
        self.flops_per_token = flops_per_token
        self.bytes_per_token = bytes_per_token

    def update(self, tokens: int) -> None:
        self._times.append(time.perf_counter())
        self._tokens.append(tokens)

    def compute(self) -> dict:
        if len(self._times) < 2:
            return {}
        dt = self._times[-1] - self._times[0]
        toks = sum(list(self._tokens)[1:])
        tps = toks / max(dt, 1e-9)
        out = {"tokens_per_sec": tps}
        dev = jax.devices()[0]
        if self.flops_per_token:
            from .flops import device_peak_flops

            out["mfu"] = tps * self.flops_per_token / device_peak_flops(dev.device_kind)
        if self.bytes_per_token:
            out["hbm_bw_util"] = tps * self.bytes_per_token / hbm_bw_peak(dev)
        return out
