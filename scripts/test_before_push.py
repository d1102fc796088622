#!/usr/bin/env python
"""Repo-wide smoke test (the Style_Transfer/scripts/test_before_push.py
pattern generalized to all four workloads): run a tiny train cycle for each
trainer on synthetic data and fail on nonzero exit. Use --fast to shrink to
one workload.

Runs hermetically on CPU by default (the axon tunnel degrades for tens of
minutes at a time and would turn a pre-push gate into a coin flip); pass
--device to smoke on the real TPU instead.

Run: python scripts/test_before_push.py [--fast] [--device]
"""
import os
import subprocess
import sys
import tempfile

FAST = "--fast" in sys.argv
ENV = dict(os.environ)
if "--device" not in sys.argv:
    ENV["JAX_PLATFORMS"] = "cpu"

JOBS = [
    ("classification",
     [sys.executable, "-m", "frostnet_tpu.train.classification",
      "--model", "frostnet_quant_small_0_35", "--dataset", "synthetic",
      "--num_classes", "10", "--image_size", "32", "--batch_size", "8",
      "--epochs", "1", "--fp_epochs", "1", "--steps_per_epoch", "2"]),
    ("segmentation",
     [sys.executable, "-m", "frostnet_tpu.segmentation.train",
      "--model", "mobilenetv3_RE_small", "--dataset", "synthetic",
      "--crop_size", "96", "--batch_size", "2", "--epochs", "1",
      "--fp_epochs", "1", "--steps_per_epoch", "2"]),
    ("detection",
     [sys.executable, "-m", "frostnet_tpu.detection.train",
      "--net_type", "qssd", "--dataset", "synthetic", "--batch_size", "4",
      "--max_iter", "3", "--warmup_iters", "1", "--save_every", "100000"]),
    ("pix2pix",
     [sys.executable, "-m", "frostnet_tpu.gan.train", "--model", "pix2pix",
      "--dataset", "synthetic", "--crop_size", "64", "--epochs", "1",
      "--fp_epochs", "1", "--steps_per_epoch", "1"]),
]

if FAST:
    JOBS = JOBS[:1]

failed = []
for name, cmd in JOBS:
    with tempfile.TemporaryDirectory() as tmp:
        print(f"=== {name} ===", flush=True)
        r = subprocess.run(cmd + ["--save_dir", tmp], env=ENV)
        if r.returncode != 0:
            failed.append(name)
            print(f"FAILED: {name}", flush=True)

if failed:
    print("smoke failures:", failed)
    sys.exit(1)
print("all smoke tests passed")
