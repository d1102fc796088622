"""__graft_entry__ driver contract — the exact invocation the driver uses.

The driver validates the multi-chip path by running ``dryrun_multichip(N)``
with N virtual CPU devices. A regression here (an import error, a sharding
rule that stops compiling, a GAN step signature drift) would only surface in
the driver's MULTICHIP check after the round ends — pin it in the suite
instead. Runs in a subprocess because the entry module mirrors env platform
pins at import time (CLAUDE.md).
"""
import pytest
import os
import subprocess
import sys

# Heavy tier: excluded from `pytest -m "not slow"` (the sub-15-min fast signal)
pytestmark = pytest.mark.slow

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_dryrun_multichip_8_devices():
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
    env["JAX_COMPILATION_CACHE_DIR"] = os.path.join(REPO, ".cache", "jax")
    r = subprocess.run(
        [sys.executable, "-c",
         "import __graft_entry__ as g; g.dryrun_multichip(8)"],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=1500)
    assert r.returncode == 0, r.stderr[-3000:]
    assert "dryrun_multichip ok" in r.stdout
    assert "gan ok" in r.stdout
