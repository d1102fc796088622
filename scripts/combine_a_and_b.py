#!/usr/bin/env python
"""Build aligned A|B pair images for pix2pix-style training.

Equivalent of the reference's dataset-prep tooling
(Style_Transfer/datasets/combine_A_and_B.py:1-48 and
make_dataset_aligned.py): walks fold_A/<split>/ and fold_B/<split>/,
horizontally concatenates matching images, and writes fold_AB/<split>/.
The output layout is exactly what frostnet_tpu.gan.data.AlignedDataset
consumes (A is the left half, B the right).

PIL replaces cv2 (not in this environment); --resize_b rescales B to A's
size first (the reference assumes equal sizes and crashes otherwise).

Usage:
  python scripts/combine_a_and_b.py --fold_A edges/ --fold_B photos/ \
      --fold_AB dataset/ [--use_AB] [--num_imgs N] [--resize_b]
"""
import argparse
import os


def combine_split(fold_a, fold_b, fold_ab, use_ab=False, num_imgs=None,
                  resize_b=False):
    """Pair one directory level: returns the number of pairs written."""
    import numpy as np
    from PIL import Image

    names = sorted(os.listdir(fold_a))
    if use_ab:
        names = [n for n in names if "_A." in n]
    if num_imgs is not None:
        names = names[:num_imgs]
    os.makedirs(fold_ab, exist_ok=True)
    written = 0
    for name_a in names:
        name_b = name_a.replace("_A.", "_B.") if use_ab else name_a
        path_a = os.path.join(fold_a, name_a)
        path_b = os.path.join(fold_b, name_b)
        if not (os.path.isfile(path_a) and os.path.isfile(path_b)):
            continue
        im_a = Image.open(path_a).convert("RGB")
        im_b = Image.open(path_b).convert("RGB")
        if im_a.size != im_b.size:
            if not resize_b:
                raise ValueError(
                    f"size mismatch {name_a} {im_a.size} vs {name_b} "
                    f"{im_b.size}; pass --resize_b to rescale B")
            im_b = im_b.resize(im_a.size, Image.BICUBIC)
        ab = np.concatenate([np.asarray(im_a), np.asarray(im_b)], axis=1)
        out_name = name_a.replace("_A.", ".") if use_ab else name_a
        Image.fromarray(ab).save(os.path.join(fold_ab, out_name))
        written += 1
    return written


def main(fold_a, fold_b, fold_ab, use_ab=False, num_imgs=None, resize_b=False):
    total = 0
    splits = [d for d in sorted(os.listdir(fold_a))
              if os.path.isdir(os.path.join(fold_a, d))]
    if not splits:  # flat layout: treat fold_A itself as one split
        return combine_split(fold_a, fold_b, fold_ab, use_ab, num_imgs, resize_b)
    for sp in splits:
        n = combine_split(os.path.join(fold_a, sp), os.path.join(fold_b, sp),
                          os.path.join(fold_ab, sp), use_ab, num_imgs, resize_b)
        print(f"split = {sp}, wrote {n} pairs")
        total += n
    return total


if __name__ == "__main__":
    p = argparse.ArgumentParser(description="create aligned A|B image pairs")
    p.add_argument("--fold_A", required=True)
    p.add_argument("--fold_B", required=True)
    p.add_argument("--fold_AB", required=True)
    p.add_argument("--num_imgs", type=int, default=None)
    p.add_argument("--use_AB", action="store_true",
                   help="pair (x_A.ext, x_B.ext) into x.ext")
    p.add_argument("--resize_b", action="store_true")
    a = p.parse_args()
    n = main(a.fold_A, a.fold_B, a.fold_AB, a.use_AB, a.num_imgs, a.resize_b)
    print(f"total: {n} aligned pairs -> {a.fold_AB}")
