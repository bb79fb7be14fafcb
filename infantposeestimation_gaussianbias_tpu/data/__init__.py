"""Data layer: COCO index, augmentation transforms, loaders, synthetic."""

from .coco import CocoIndex, build_records
from .pipeline import DataLoader, PoseDataset, build_dataloader, device_batch
from .synthetic import dummy_image, dummy_keypoints, synthetic_coco_dataset

__all__ = [
    "CocoIndex",
    "DataLoader",
    "PoseDataset",
    "build_dataloader",
    "build_records",
    "device_batch",
    "dummy_image",
    "dummy_keypoints",
    "synthetic_coco_dataset",
]
