"""Build the native C++ components: ``python -m fastmax_tpu.native.build``.

Produces ``libfastmax_native.so`` next to this file (g++ -O3 -shared). The Python
wrappers fall back to pure-numpy implementations when the library is
absent, so the build is optional."""

from __future__ import annotations

import subprocess
import sys
from pathlib import Path

HERE = Path(__file__).parent
SO = HERE / "libfastmax_native.so"
SOURCES = [HERE / "packed_loader.cpp"]


def build(verbose: bool = True) -> Path:
    cmd = [
        "g++", "-O3", "-shared", "-fPIC", "-std=c++17", "-pthread",
        *[str(s) for s in SOURCES], "-o", str(SO),
    ]
    if verbose:
        print(" ".join(cmd))
    subprocess.run(cmd, check=True)
    return SO


if __name__ == "__main__":
    build()
    print(f"built {SO}")
    sys.exit(0)
