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

# Heavy tier: excluded from `pytest -m "not slow"` (the sub-15-min fast signal)
pytestmark = pytest.mark.slow

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


SCRIPTS = [
    "scripts/bench_input_pipeline.py",
    "scripts/bench_int8_serving.py",
    "scripts/bench_workload_serving.py",
    "scripts/combine_a_and_b.py",
    "scripts/latency_table.py",
    "scripts/plot_metrics.py",
    "scripts/prepare_cityscapes_pix2pix.py",
    "scripts/process_cityscapes.py",
    "scripts/scaling_analysis.py",
]


@pytest.mark.parametrize("script", SCRIPTS)
def test_script_help_parses(script):
    """Repo-level tools (benches, dataset prep, scaling analysis) parse
    --help in a pinned-CPU subprocess — same guard as the package CLIs.
    The probe_* scripts are one-off measurement harnesses and are skipped."""
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    r = subprocess.run(
        [sys.executable, os.path.join(repo, script), "--help"],
        capture_output=True, text=True, timeout=180, env=env, cwd=repo)
    assert r.returncode == 0, f"{script} --help failed:\n{r.stderr[-2000:]}"
    assert "usage:" in r.stdout or "Usage" in r.stdout


def test_pyproject_console_scripts_resolve():
    """Every [project.scripts] target in pyproject.toml imports and is
    callable — the installed console scripts cannot drift from the code."""
    import importlib
    import tomllib

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(repo, "pyproject.toml"), "rb") as f:
        scripts = tomllib.load(f)["project"]["scripts"]
    assert len(scripts) >= 10
    for name, target in scripts.items():
        mod, fn = target.split(":")
        assert callable(getattr(importlib.import_module(mod), fn)), name
