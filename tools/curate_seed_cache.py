"""Curate the committed bench seed cache (cold-start hardening, VERDICT
r02 #9). Copies from .jax_cache into bench_seed_cache/ exactly the
entries bench.py's path needs — the 7B decode loop, prefill, and the
on-device model-build kernels — so a fresh workspace's first driver run
compiles (almost) nothing. Run AFTER a successful `python bench.py` on
the current code so the keys match.

  python tools/curate_seed_cache.py
"""

from __future__ import annotations

import pathlib
import re
import shutil

REPO = pathlib.Path(__file__).resolve().parent.parent
WANT = re.compile(
    r"jit_(_decode_loop_impl|_prefill_impl|_normal|_randint|_uniform|full"
    r"|zeros|_threefry|threefry)"
)
MAX_BYTES = 40 * 2**20


def main() -> None:
    src = REPO / ".jax_cache"
    dst = REPO / "bench_seed_cache"
    dst.mkdir(exist_ok=True)
    total = 0
    kept = []
    for f in sorted(src.iterdir()):
        if WANT.match(f.name):
            total += f.stat().st_size
            kept.append(f.name)
            shutil.copy2(f, dst / f.name)
    assert total <= MAX_BYTES, f"seed cache too big: {total/2**20:.1f} MB"
    print(f"{len(kept)} entries, {total/2**20:.1f} MB -> {dst}")
    for k in kept:
        print("  ", k[:80])


if __name__ == "__main__":
    main()
