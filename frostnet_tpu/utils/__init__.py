"""Utilities: losses, metrics, checkpointing, logging, FLOPs counting."""
from .losses import cross_entropy, binary_cross_entropy_with_logits, smooth_l1, l1
from .metrics import topk_accuracy, confusion_matrix, miou_from_confusion, AverageMeter
from .checkpoint import save_checkpoint, restore_checkpoint
from .logging import MetricLogger
from .flops import count_params, compute_flops, model_flops_params
from .profiling import StepTimer, chain_time, device_memory_stats, trace

__all__ = [
    "cross_entropy",
    "binary_cross_entropy_with_logits",
    "smooth_l1",
    "l1",
    "topk_accuracy",
    "confusion_matrix",
    "miou_from_confusion",
    "AverageMeter",
    "save_checkpoint",
    "restore_checkpoint",
    "MetricLogger",
    "count_params",
    "compute_flops",
    "model_flops_params",
    "StepTimer",
    "chain_time",
    "device_memory_stats",
    "trace",
]
