"""Native (C++) runtime components.

``NativeClassificationLoader`` wraps frostnet_tpu/native/dataloader.cpp — a
GIL-free threaded JPEG decode/augment pipeline (the torch DataLoader worker
pool equivalent, SURVEY.md §2.6). The shared object is built on demand with
g++ (libjpeg) and cached next to the source; if the toolchain or libjpeg is
missing we raise with a pointer to the pure-Python FolderClassification
fallback.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Iterator, Optional, Sequence

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "dataloader.cpp")
_SO = os.path.join(_DIR, "_dataloader.so")

_lib = None
_lib_lock = threading.Lock()


def _build() -> str:
    if os.path.exists(_SO) and os.path.getmtime(_SO) >= os.path.getmtime(_SRC):
        return _SO
    cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
           _SRC, "-o", _SO, "-ljpeg", "-lpng", "-lpthread"]
    try:
        subprocess.run(cmd, check=True, capture_output=True, text=True)
    except (subprocess.CalledProcessError, FileNotFoundError) as e:
        detail = getattr(e, "stderr", str(e))
        raise RuntimeError(
            f"native dataloader build failed ({detail}); use "
            "frostnet_tpu.data.FolderClassification instead") from e
    return _SO


def _load_lib():
    global _lib
    with _lib_lock:
        if _lib is None:
            lib = ctypes.CDLL(_build())
            lib.fndl_create.restype = ctypes.c_void_p
            lib.fndl_create.argtypes = [
                ctypes.POINTER(ctypes.c_char_p), ctypes.POINTER(ctypes.c_int),
                ctypes.c_long, ctypes.c_int, ctypes.c_int, ctypes.c_int,
                ctypes.c_int, ctypes.c_uint, ctypes.c_int,
                ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
                ctypes.c_int]
            lib.fndl_next.restype = ctypes.c_int
            lib.fndl_next.argtypes = [ctypes.c_void_p, ctypes.c_void_p,
                                      ctypes.POINTER(ctypes.c_int)]
            lib.fndl_destroy.argtypes = [ctypes.c_void_p]
            lib.fndl_batches_per_epoch.restype = ctypes.c_long
            lib.fndl_batches_per_epoch.argtypes = [ctypes.c_void_p]
            lib.fndt_create.restype = ctypes.c_void_p
            lib.fndt_create.argtypes = [
                ctypes.POINTER(ctypes.c_char_p), ctypes.POINTER(ctypes.c_float),
                ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
                ctypes.c_long, ctypes.c_int, ctypes.c_int, ctypes.c_int,
                ctypes.c_int, ctypes.c_int, ctypes.c_uint, ctypes.c_int]
            lib.fndt_next.restype = ctypes.c_int
            lib.fndt_next.argtypes = [ctypes.c_void_p, ctypes.c_void_p,
                                      ctypes.c_void_p, ctypes.c_void_p,
                                      ctypes.c_void_p]
            lib.fndt_destroy.argtypes = [ctypes.c_void_p]
            lib.fndt_batches_per_epoch.restype = ctypes.c_long
            lib.fndt_batches_per_epoch.argtypes = [ctypes.c_void_p]
            lib.fnsl_create.restype = ctypes.c_void_p
            lib.fnsl_create.argtypes = [
                ctypes.POINTER(ctypes.c_char_p), ctypes.POINTER(ctypes.c_char_p),
                ctypes.c_long, ctypes.c_int, ctypes.c_int, ctypes.c_int,
                ctypes.c_int, ctypes.c_int, ctypes.c_uint, ctypes.c_int,
                ctypes.c_float, ctypes.c_float, ctypes.c_int]
            lib.fnsl_next.restype = ctypes.c_int
            lib.fnsl_next.argtypes = [ctypes.c_void_p, ctypes.c_void_p,
                                      ctypes.c_void_p]
            lib.fnsl_destroy.argtypes = [ctypes.c_void_p]
            lib.fnsl_batches_per_epoch.restype = ctypes.c_long
            lib.fnsl_batches_per_epoch.argtypes = [ctypes.c_void_p]
            _lib = lib
    return _lib


class NativeClassificationLoader:
    """Iterates {'image': (B,S,S,3) f32, 'label': (B,) i32} batches decoded
    and augmented by C++ worker threads."""

    def __init__(self, paths: Sequence[str], labels: Sequence[int],
                 batch_size: int = 64, image_size: int = 224,
                 threads: Optional[int] = None,
                 train: bool = True, seed: int = 0, queue_depth: int = 4,
                 mean=(0.485, 0.456, 0.406), std=(0.229, 0.224, 0.225),
                 output: str = "float32"):
        # output="uint8" emits raw resized RGB (4x smaller host->device
        # transfers); normalize on device with (self.mean, self.std) — the
        # train step does this automatically for uint8 batches.
        if output not in ("float32", "uint8"):
            raise ValueError(f"output must be float32|uint8, got {output!r}")
        self.output = output
        if threads is None:
            # os.cpu_count() underreports inside gVisor sandboxes (returns 1
            # while 32-64 decode threads scale ~10x — measured); oversubscribe
            # by default, decode threads are syscall/IO heavy anyway.
            # Memory model: each worker holds one fully built batch while
            # waiting to enqueue, so peak host memory is
            # (threads + queue_depth) * batch_bytes. In float32 mode a 224px
            # bs256 batch is ~154 MB, so cap threads there to bound the pool
            # at ~1.8 GB; uint8 batches are 4x smaller and keep the wide pool.
            threads = max(32, os.cpu_count() or 1)
            if output == "float32":
                threads = min(threads, 8)
        self.lib = _load_lib()
        self.batch_size = batch_size
        self.image_size = image_size
        self._paths = [p.encode() for p in paths]
        self._labels = np.asarray(labels, np.int32)
        self.mean = np.asarray(mean, np.float32)
        self.std = np.asarray(std, np.float32)
        self._args = (threads, train, seed, queue_depth, self.mean, self.std)
        self._handle: Optional[int] = None

    @classmethod
    def from_folder(cls, root: str, **kw):
        classes = sorted(d for d in os.listdir(root)
                         if os.path.isdir(os.path.join(root, d)))
        c2i = {c: i for i, c in enumerate(classes)}
        paths, labels = [], []
        for c in classes:
            cdir = os.path.join(root, c)
            for f in sorted(os.listdir(cdir)):
                if f.lower().endswith((".jpg", ".jpeg")):
                    paths.append(os.path.join(cdir, f))
                    labels.append(c2i[c])
        return cls(paths, labels, **kw)

    def __len__(self):
        return len(self._paths) // self.batch_size

    def __iter__(self) -> Iterator[dict]:
        threads, train, seed, qd, mean, std = self._args
        arr = (ctypes.c_char_p * len(self._paths))(*self._paths)
        handle = self.lib.fndl_create(
            arr, self._labels.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
            len(self._paths), self.batch_size, self.image_size, threads,
            int(train), seed, qd,
            mean.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            std.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            int(self.output == "uint8"))
        dtype = np.uint8 if self.output == "uint8" else np.float32
        try:
            s = self.image_size
            while True:
                images = np.empty((self.batch_size, s, s, 3), dtype)
                labels = np.empty((self.batch_size,), np.int32)
                ok = self.lib.fndl_next(
                    handle, images.ctypes.data_as(ctypes.c_void_p),
                    labels.ctypes.data_as(ctypes.POINTER(ctypes.c_int)))
                if not ok:
                    return
                yield {"image": images, "label": labels}
        finally:
            self.lib.fndl_destroy(handle)


class NativeSegmentationLoader:
    """Paired (image, mask) loader backed by the C++ worker pool: PNG/JPEG
    decode, synchronized hflip + scale-jitter + pad + crop (image bilinear,
    mask nearest — the reference data_transforms.py:18-166 pipeline), raw
    uint8 RGB out (normalize on device like the classification uint8 mode).

    Yields {'image': (B,H,W,3) u8, 'label': (B,H,W) i32}; eval (train=False)
    whole-frame-resizes to crop_size (identity at the native resolution)."""

    def __init__(self, img_paths: Sequence[str], mask_paths: Sequence[str],
                 crop_size=(768, 768), batch_size: int = 16,
                 threads: Optional[int] = None, train: bool = True,
                 seed: int = 0, queue_depth: int = 4, scale=(0.5, 2.0),
                 ignore: int = 255):
        if len(img_paths) != len(mask_paths):
            raise ValueError("img_paths and mask_paths must pair up")
        if threads is None:
            # same oversubscription rationale as the classification loader,
            # but bound the pool by batch bytes: each worker holds one fully
            # built batch while blocked on the queue, so peak host memory is
            # (threads + queue_depth) * batch_bytes. 768^2 bs16 train crops
            # are ~38 MB (wide pool fine); the city native-val path builds
            # (1024,2048) bs16 batches of ~134 MB, which must not fan out to
            # 32 workers (~4 GB RSS).
            batch_bytes = batch_size * crop_size[0] * crop_size[1] * 4
            budget = 1.5e9
            threads = max(4, min(max(32, os.cpu_count() or 1),
                                 int(budget // max(batch_bytes, 1)) - queue_depth))
        self.lib = _load_lib()
        self.batch_size = batch_size
        self.crop_size = tuple(crop_size)
        self._imgs = [p.encode() for p in img_paths]
        self._masks = [p.encode() for p in mask_paths]
        self._args = (threads, train, seed, queue_depth, scale, ignore)

    @classmethod
    def from_file_list(cls, root: str, list_name: str, **kw):
        """``root/list_name`` lines of "img_path,mask_path" relative to root
        — the same layout CityscapesSegmentation consumes."""
        with open(os.path.join(root, list_name)) as f:
            pairs = [l.strip().split(",")[:2] for l in f if l.strip()]
        return cls([os.path.join(root, a) for a, _ in pairs],
                   [os.path.join(root, b) for _, b in pairs], **kw)

    def __len__(self):
        return len(self._imgs) // self.batch_size

    def __iter__(self) -> Iterator[dict]:
        threads, train, seed, qd, scale, ignore = self._args
        img_arr = (ctypes.c_char_p * len(self._imgs))(*self._imgs)
        mask_arr = (ctypes.c_char_p * len(self._masks))(*self._masks)
        ch, cw = self.crop_size
        handle = self.lib.fnsl_create(
            img_arr, mask_arr, len(self._imgs), self.batch_size, ch, cw,
            threads, int(train), seed, qd,
            ctypes.c_float(scale[0]), ctypes.c_float(scale[1]), ignore)
        try:
            while True:
                images = np.empty((self.batch_size, ch, cw, 3), np.uint8)
                masks = np.empty((self.batch_size, ch, cw), np.uint8)
                ok = self.lib.fnsl_next(
                    handle, images.ctypes.data_as(ctypes.c_void_p),
                    masks.ctypes.data_as(ctypes.c_void_p))
                if not ok:
                    return
                yield {"image": images, "label": masks.astype(np.int32)}
        finally:
            self.lib.fnsl_destroy(handle)


class NativeDetectionLoader:
    """SSD detection loader backed by the C++ worker pool: JPEG/PNG decode +
    the full train augmentation (photometric distort, mean-fill expand,
    center-rule random crop, mirror, squash-resize — detection/data.py
    ssd_augment semantics). Emits raw uint8 RGB; the BGR flip + mean
    subtraction runs on device (train/detection uint8 prep).

    Yields {'image': (B,S,S,3) u8, 'boxes': (B,M,4) f32 normalized xyxy,
    'labels': (B,M) i32, 'valid': (B,M) bool} — the same padded-target
    layout as VOCDetection."""

    def __init__(self, img_paths: Sequence[str], boxes, labels,
                 max_boxes: int = 50, batch_size: int = 32, size: int = 300,
                 threads: Optional[int] = None, train: bool = True,
                 seed: int = 0, queue_depth: int = 4):
        if not (len(img_paths) == len(boxes) == len(labels)):
            raise ValueError("img_paths/boxes/labels must pair up")
        if threads is None:
            threads = max(32, os.cpu_count() or 1)
        self.lib = _load_lib()
        self.batch_size = batch_size
        self.size = size
        self.max_boxes = max_boxes
        self._paths = [p.encode() for p in img_paths]
        counts = np.array([len(b) for b in boxes], np.int32)
        flat_boxes = (np.concatenate([np.asarray(b, np.float32).reshape(-1, 4)
                                      for b in boxes])
                      if counts.sum() else np.zeros((0, 4), np.float32))
        flat_labels = (np.concatenate([np.asarray(l, np.int32).reshape(-1)
                                       for l in labels])
                       if counts.sum() else np.zeros((0,), np.int32))
        self._counts = counts
        self._flat_boxes = np.ascontiguousarray(flat_boxes, np.float32)
        self._flat_labels = np.ascontiguousarray(flat_labels, np.int32)
        self._args = (threads, train, seed, queue_depth)

    def __len__(self):
        return len(self._paths) // self.batch_size

    def __iter__(self) -> Iterator[dict]:
        threads, train, seed, qd = self._args
        arr = (ctypes.c_char_p * len(self._paths))(*self._paths)
        handle = self.lib.fndt_create(
            arr, self._flat_boxes.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            self._counts.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
            self._flat_labels.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
            len(self._paths), self.max_boxes, self.batch_size, self.size,
            threads, int(train), seed, qd)
        s, m = self.size, self.max_boxes
        try:
            while True:
                images = np.empty((self.batch_size, s, s, 3), np.uint8)
                bxs = np.empty((self.batch_size, m, 4), np.float32)
                lbs = np.empty((self.batch_size, m), np.int32)
                cnt = np.empty((self.batch_size,), np.int32)
                ok = self.lib.fndt_next(
                    handle, images.ctypes.data_as(ctypes.c_void_p),
                    bxs.ctypes.data_as(ctypes.c_void_p),
                    lbs.ctypes.data_as(ctypes.c_void_p),
                    cnt.ctypes.data_as(ctypes.c_void_p))
                if not ok:
                    return
                valid = np.arange(m)[None, :] < cnt[:, None]
                yield {"image": images, "boxes": bxs, "labels": lbs,
                       "valid": valid}
        finally:
            self.lib.fndt_destroy(handle)
