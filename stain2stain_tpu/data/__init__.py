"""Data pipeline: host decode → device-resident normalize/augment.

TPU re-design of the reference's LightningDataModules (SURVEY.md §2.4).
"""

from .base import ConcatDataset, DataLoader, DataModule, Dataset, default_collate
from .paired_data_module import PairedDataModule, PairedDataset

__all__ = [
    "Dataset",
    "ConcatDataset",
    "DataLoader",
    "DataModule",
    "default_collate",
    "PairedDataset",
    "PairedDataModule",
]
