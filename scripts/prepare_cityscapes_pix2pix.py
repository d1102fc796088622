#!/usr/bin/env python
"""Pair Cityscapes photos with their color segmaps for pix2pix / cyclegan.

Equivalent of the reference's dataset-prep tool
(Style_Transfer/datasets/prepare_cityscapes_dataset.py:1-90): walks
gtFine/<phase>/*/*_gtFine_color.png and leftImg8bit/<phase>/*/*_leftImg8bit.png,
verifies the basenames pair up, resizes both to 256x256, and writes

  <output_dir>/<split>/<i>.jpg      photo|segmap side-by-side (pix2pix
                                    aligned layout: A = photo on the left,
                                    B = color segmap on the right — what
                                    frostnet_tpu.gan.data.AlignedDataset
                                    consumes)
  <output_dir>/<split>A/<i>_A.jpg   photo only   (cyclegan, UnalignedDataset)
  <output_dir>/<split>B/<i>_B.jpg   segmap only

where split is 'train' for phase train and 'test' for phase val, like the
reference. JPEG quality 100 / no chroma subsampling to keep label colors
crisp.

Usage:
  python scripts/prepare_cityscapes_pix2pix.py --gtFine_dir ./gtFine \
      --leftImg8bit_dir ./leftImg8bit --output_dir ./datasets/cityscapes
"""
import argparse
import glob
import os


def _load_resized(path, size=256):
    from PIL import Image

    return Image.open(path).convert("RGB").resize((size, size))


def _check_pair(segmap_path, photo_path):
    seg_id = os.path.basename(segmap_path).replace("_gtFine_color", "")
    photo_id = os.path.basename(photo_path).replace("_leftImg8bit", "")
    if seg_id != photo_id:
        raise ValueError(f"unmatched pair: {segmap_path} vs {photo_path}")


def process_phase(gtfine_dir, leftimg_dir, output_dir, phase, size=256):
    """Write one phase's aligned + unaligned trees; returns #pairs."""
    from PIL import Image

    split = "test" if phase == "val" else "train"
    savedir = os.path.join(output_dir, split)
    os.makedirs(savedir, exist_ok=True)
    os.makedirs(savedir + "A", exist_ok=True)
    os.makedirs(savedir + "B", exist_ok=True)

    segmaps = sorted(glob.glob(
        os.path.join(gtfine_dir, phase, "*", "*_gtFine_color.png")))
    photos = sorted(glob.glob(
        os.path.join(leftimg_dir, phase, "*", "*_leftImg8bit.png")))
    if len(segmaps) != len(photos):
        raise ValueError(
            f"{len(segmaps)} segmaps vs {len(photos)} photos for phase "
            f"'{phase}' — download/unzip both gtFine and leftImg8bit")

    for i, (seg_path, photo_path) in enumerate(zip(segmaps, photos)):
        _check_pair(seg_path, photo_path)
        segmap = _load_resized(seg_path, size)
        photo = _load_resized(photo_path, size)

        side = Image.new("RGB", (2 * size, size))
        side.paste(photo, (0, 0))
        side.paste(segmap, (size, 0))
        side.save(os.path.join(savedir, f"{i}.jpg"),
                  format="JPEG", subsampling=0, quality=100)

        photo.save(os.path.join(savedir + "A", f"{i}_A.jpg"),
                   format="JPEG", subsampling=0, quality=100)
        segmap.save(os.path.join(savedir + "B", f"{i}_B.jpg"),
                    format="JPEG", subsampling=0, quality=100)
    return len(segmaps)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--gtFine_dir", required=True)
    p.add_argument("--leftImg8bit_dir", required=True)
    p.add_argument("--output_dir", required=True)
    p.add_argument("--size", type=int, default=256)
    args = p.parse_args()
    for phase in ("train", "val"):
        n = process_phase(args.gtFine_dir, args.leftImg8bit_dir,
                          args.output_dir, phase, args.size)
        print(f"{phase}: {n} pairs")


if __name__ == "__main__":
    main()
