"""Every CLI entry point parses --help cleanly.

The reference ships argparse/JSON CLIs as its only user surface (SURVEY.md
§2.2-2.5); this guards the whole surface against import-time and argparse
wiring regressions in one cheap sweep (each CLI runs in a subprocess with
the CPU platform pin, so a broken import or duplicate/invalid argument
definition fails the suite even when no functional test exercises that
flag).
"""
import os
import subprocess
import sys

import pytest

CLIS = [
    "frostnet_tpu.train.classification",
    "frostnet_tpu.train.evaluate",
    "frostnet_tpu.train.latency_check",
    "frostnet_tpu.detection.train",
    "frostnet_tpu.detection.qeval",
    "frostnet_tpu.segmentation.train",
    "frostnet_tpu.segmentation.evaluate",
    "frostnet_tpu.gan.train",
    "frostnet_tpu.gan.test",
    "frostnet_tpu.gan.eval_cityscapes",
    "frostnet_tpu.serve",
    "frostnet_tpu.quant.numeric_suite",
]


@pytest.mark.parametrize("module", CLIS)
def test_cli_help_parses(module):
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    r = subprocess.run(
        [sys.executable, "-m", module, "--help"],
        capture_output=True, text=True, timeout=120, env=env,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    assert r.returncode == 0, f"{module} --help failed:\n{r.stderr[-2000:]}"
    assert "usage:" in r.stdout
