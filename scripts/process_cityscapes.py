#!/usr/bin/env python
"""Cityscapes preprocessing (reference cityscape_scripts/process_cityscapes.py
+ generate_mappings.py): convert gtFine labelIds -> 19-class trainIds PNGs and
emit the train.txt/val.txt file lists the CityscapesSegmentation loader reads.

Usage: python scripts/process_cityscapes.py --root /data/cityscapes
Expects <root>/leftImg8bit/{train,val}/... and <root>/gtFine/{train,val}/...
"""
import argparse
import os

import numpy as np

# official cityscapes labelId -> trainId (255 = ignore)
_ID_TO_TRAINID = {7: 0, 8: 1, 11: 2, 12: 3, 13: 4, 17: 5, 19: 6, 20: 7, 21: 8,
                  22: 9, 23: 10, 24: 11, 25: 12, 26: 13, 27: 14, 28: 15,
                  31: 16, 32: 17, 33: 18}


def build_lut():
    lut = np.full(256, 255, np.uint8)
    for k, v in _ID_TO_TRAINID.items():
        lut[k] = v
    return lut


def main(root: str):
    from PIL import Image

    lut = build_lut()
    for split in ("train", "val"):
        pairs = []
        img_root = os.path.join(root, "leftImg8bit", split)
        for city in sorted(os.listdir(img_root)):
            for f in sorted(os.listdir(os.path.join(img_root, city))):
                if not f.endswith("_leftImg8bit.png"):
                    continue
                base = f[: -len("_leftImg8bit.png")]
                gt = os.path.join(root, "gtFine", split, city,
                                  base + "_gtFine_labelIds.png")
                out = os.path.join(root, "gtFine", split, city,
                                   base + "_gtFine_trainIds.png")
                if not os.path.exists(out):
                    arr = np.asarray(Image.open(gt))
                    Image.fromarray(lut[arr]).save(out)
                pairs.append((os.path.relpath(os.path.join(img_root, city, f), root),
                              os.path.relpath(out, root)))
        with open(os.path.join(root, f"{split}.txt"), "w") as fh:
            fh.writelines(f"{a},{b}\n" for a, b in pairs)
        print(f"{split}: {len(pairs)} pairs")


if __name__ == "__main__":
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--root", required=True)
    main(p.parse_args().root)
