"""Data pipeline: host decode → device-resident normalize/augment.

TPU re-design of the reference's LightningDataModules (SURVEY.md §2.4).
"""

from .base import ConcatDataset, DataLoader, DataModule, Dataset, default_collate
from .class_conditional import ClassConditionalAnyToAnyDataModule, PairedAnyToAnyDataset
from .mnist_datamodule import MNISTDataModule
from .paired_data_mask import PairedHEIHCDataModule, PairedHEIHCDataset
from .paired_data_module import PairedDataModule, PairedDataset
from .paired_data_multiclassmask import PairedMulticlassDataModule, PairedMulticlassDataset
from .paired_pos_neg import NegativePairedDataset, PairedPosNegDataModule

__all__ = [
    "Dataset",
    "ConcatDataset",
    "DataLoader",
    "DataModule",
    "default_collate",
    "PairedDataset",
    "PairedDataModule",
    "PairedHEIHCDataset",
    "PairedHEIHCDataModule",
    "PairedMulticlassDataset",
    "PairedMulticlassDataModule",
    "PairedAnyToAnyDataset",
    "ClassConditionalAnyToAnyDataModule",
    "NegativePairedDataset",
    "PairedPosNegDataModule",
    "MNISTDataModule",
]
