"""Host-side data layer: datasets + device prefetch pipeline."""
from .datasets import (
    SyntheticClassification,
    FolderClassification,
    CIFARClassification,
    MNISTClassification,
    SVHNClassification,
    build_classification_dataset,
    download_data,
    IMAGENET_MEAN,
    IMAGENET_STD,
)
from .randaugment import RandAugment
from .pipeline import prefetch_to_device

__all__ = [
    "SyntheticClassification",
    "FolderClassification",
    "CIFARClassification",
    "MNISTClassification",
    "SVHNClassification",
    "build_classification_dataset",
    "RandAugment",
    "download_data",
    "IMAGENET_MEAN",
    "IMAGENET_STD",
    "prefetch_to_device",
]
