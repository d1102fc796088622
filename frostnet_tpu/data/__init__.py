"""Host-side data layer: datasets + device prefetch pipeline."""
from .datasets import (
    SyntheticClassification,
    FolderClassification,
    download_data,
    IMAGENET_MEAN,
    IMAGENET_STD,
)
from .pipeline import prefetch_to_device

__all__ = [
    "SyntheticClassification",
    "FolderClassification",
    "download_data",
    "IMAGENET_MEAN",
    "IMAGENET_STD",
    "prefetch_to_device",
]
