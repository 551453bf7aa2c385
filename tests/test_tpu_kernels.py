"""Real-chip Pallas kernel verification (skipped off-TPU).

The CI conftest forces JAX onto the virtual CPU mesh, so this test drives
the chip from a SUBPROCESS with a clean environment (plain `python` lands
on the attached TPU). Opt-in via RUN_TPU_TESTS=1 — compiles through the
tunnel can take minutes, which would blow the CI budget if always-on.
"""

import os
import pathlib
import subprocess
import sys

import pytest

REPO = pathlib.Path(__file__).resolve().parent.parent


@pytest.mark.skipif(
    os.environ.get("RUN_TPU_TESTS") != "1",
    reason="real-TPU kernel check is opt-in (RUN_TPU_TESTS=1); CI runs on CPU",
)
def test_pallas_kernels_compile_and_match_on_tpu():
    env = {k: v for k, v in os.environ.items()
           if k not in ("JAX_PLATFORMS", "XLA_FLAGS")}
    proc = subprocess.run(
        [sys.executable, str(REPO / "tools" / "tpu_kernel_check.py")],
        capture_output=True, text=True, timeout=3000, env=env, cwd=str(REPO),
    )
    sys.stdout.write(proc.stdout)
    sys.stderr.write(proc.stderr)
    assert proc.returncode == 0, "TPU kernel check failed"
