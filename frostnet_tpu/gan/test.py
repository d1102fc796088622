"""Style-transfer inference: load generator, run QAT-sim and frozen-INT8
passes, write an HTML gallery (Style_Transfer/test.py:29-84 flow).

Run: python -m frostnet_tpu.gan.test --checkpoint runs/gan/latest_G \
       --dataset synthetic --num_test 4
"""
from __future__ import annotations

import argparse
import os

import jax
import jax.numpy as jnp
import numpy as np

from ..nn import QAT, QAT_FROZEN, INT8
from ..optim import qadam
from ..utils.checkpoint import restore_model_variables
from ..utils.logging import MetricLogger
from .data import AlignedDataset, SyntheticPairs, apply_direction
from .models import make_net_state
from .networks import define_g
from .visualizer import HTMLGallery


def main(args):
    logger = MetricLogger(None, name="gan-test")
    colorize = args.dataset == "colorization"
    in_nc, out_nc = (1, 2) if colorize else (3, 3)
    netG = define_g(output_nc=out_nc, netG=args.netG, quantized=True)
    sample = jnp.zeros((1, args.crop_size, args.crop_size, in_nc))
    g_state = make_net_state(netG, qadam(2e-4), jax.random.PRNGKey(0), sample,
                             init_kwargs={"mode": QAT, "train": True})
    if args.checkpoint:
        g_state = restore_model_variables(args.checkpoint, g_state)

    if args.dataset == "synthetic":
        ds = SyntheticPairs(args.crop_size, args.num_test, 1, seed=1)
    elif colorize:
        from .data import ColorizationDataset
        ds = ColorizationDataset(args.data_root, "test", 1,
                                 args.crop_size, args.crop_size, seed=1)
    elif args.dataset == "single":
        # the reference's TestModel + single_dataset flow (test_model.py,
        # data/single_dataset.py): apply a saved G to one directory of
        # images — no paired B domain, visuals are real/fake only
        from .data import SingleDataset
        ds = SingleDataset(args.data_root, 1,
                           load_size=args.crop_size,
                           crop_size=args.crop_size, seed=1)
    else:
        ds = AlignedDataset(args.data_root, "test", 1,
                            args.crop_size, args.crop_size, seed=1)

    if args.export_int8:
        from ..quant import export_int8
        nbytes = export_int8(g_state.variables, args.export_int8)
        print(f"INT8 netG artifact written: {args.export_int8} ({nbytes/1e6:.2f} MB)")

    qat_fn = jax.jit(lambda v, x: netG.apply(v, x, mode=QAT_FROZEN))
    int8_fn = jax.jit(lambda v, x: netG.apply(v, x, mode=INT8))
    gallery = HTMLGallery(os.path.join(args.results_dir, "web"), "gan test")
    for i, batch in enumerate(ds):
        if i >= args.num_test:
            break
        batch = apply_direction(batch, args.direction)
        a = jnp.asarray(batch["A"])
        fake_qat = np.asarray(qat_fn(g_state.variables, a))
        fake_int8 = np.asarray(int8_fn(g_state.variables, a))
        if colorize:
            # display like the reference (colorization_model.py:48-68):
            # join the input L with real/fake ab and convert Lab -> RGB
            from .data import colorization_to_rgb
            L = np.asarray(batch["A"])
            visuals = {
                "real_A": np.repeat(L, 3, axis=-1),
                "fake_B_qat": colorization_to_rgb(L, fake_qat) * 2 - 1,
                "fake_B_int8": colorization_to_rgb(L, fake_int8) * 2 - 1,
                "real_B": colorization_to_rgb(L, np.asarray(batch["B"])) * 2 - 1,
            }
        else:
            visuals = {"real_A": batch["A"], "fake_B_qat": fake_qat,
                       "fake_B_int8": fake_int8}
            if "B" in batch:  # single_dataset has no paired domain
                visuals["real_B"] = batch["B"]
        gallery.add_images(visuals, f"img{i:04d}")
        logger.info(f"[{i}] qat/int8 delta: "
                    f"{np.abs(fake_qat - fake_int8).max():.4f}")
    logger.info(f"gallery at {args.results_dir}/web/index.html")


def cli():
    from ..utils.platform import pin_platform_from_env
    pin_platform_from_env()
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--checkpoint", default=None)
    p.add_argument("--netG", default="resnet_6blocks")
    p.add_argument("--dataset", default="synthetic",
                   help="synthetic | colorization | single (one unpaired "
                        "dir, TestModel flow) | anything else = aligned A|B")
    p.add_argument("--data_root", default="./datasets/facades")
    p.add_argument("--crop_size", type=int, default=256)
    p.add_argument("--num_test", type=int, default=4)
    p.add_argument("--direction", default="AtoB", choices=["AtoB", "BtoA"],
                   help="BtoA swaps the domains (base_options.py:42)")
    p.add_argument("--results_dir", default="./results/gan")
    p.add_argument("--export_int8", default=None, metavar="PATH",
                   help="write the converted INT8 netG artifact (.npz)")
    main(p.parse_args())


if __name__ == "__main__":
    cli()
