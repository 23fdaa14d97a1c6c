"""Paired H&E↔IHC tiles + binary amyloid mask (CSV-metadata driven).

TPU re-design of /root/reference/src/data/paired_data_mask_he_amyloid.py:
returns ``(he, ihc, mask)`` where the mask is loaded grayscale, resized with
nearest interpolation and binarized ``>1 → 1`` (ref :91-94); the mask column
is ``amyloid_filepath`` (ref :38). Host decodes uint8 only; [-1,1] normalize
runs on device in the jitted step. Direction ``HE_to_IHC`` (default) keeps
(he, ihc); anything else swaps (ref :101-104).
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np

from .base import DataLoader, DataModule, Dataset
from .paired_data_module import load_rgb, resize_uint8


def load_mask_binary(path: str, size: int) -> np.ndarray:
    """Grayscale → nearest-resize → binarize (>1 → 1), uint8 (H, W)."""
    import cv2

    mask = cv2.imread(path, cv2.IMREAD_GRAYSCALE)
    if mask is None:
        from PIL import Image

        mask = np.asarray(Image.open(path).convert("L"), dtype=np.uint8)
    mask = cv2.resize(mask, (size, size), interpolation=cv2.INTER_NEAREST)
    return np.where(mask > 1, 1, 0).astype(np.uint8)


class PairedHEIHCDataset(Dataset):
    def __init__(
        self,
        data_dir: str,
        csv_file_name: str,
        source_column: str,
        target_column: str,
        folder: str,
        mask_column: str = "amyloid_filepath",
        image_size: int = 512,
        direction: str = "HE_to_IHC",
    ):
        import pandas as pd

        self.tile_dir = os.path.join(data_dir, folder)
        self.image_size = image_size
        self.swap = direction != "HE_to_IHC"
        csv_path = os.path.join(data_dir, csv_file_name)
        if not os.path.exists(csv_path):
            raise FileNotFoundError(f"Metadata CSV not found: {csv_path}")
        metadata = pd.read_csv(csv_path)
        metadata = metadata[metadata["split"] == folder].reset_index(drop=True)
        self.source_files = metadata[source_column].tolist()
        self.target_files = metadata[target_column].tolist()
        self.mask_files = metadata[mask_column].tolist()

    def __len__(self) -> int:
        return len(self.source_files)

    def __getitem__(self, idx: int) -> tuple:
        he = resize_uint8(load_rgb(os.path.join(self.tile_dir, self.source_files[idx])), self.image_size)
        ihc = resize_uint8(load_rgb(os.path.join(self.tile_dir, self.target_files[idx])), self.image_size)
        mask = load_mask_binary(os.path.join(self.tile_dir, self.mask_files[idx]), self.image_size)[..., None]
        if self.swap:
            he, ihc = ihc, he
        return he, ihc, mask

    def get_batch(self, indices) -> tuple | None:
        """Native batch fast path: both RGB columns in one decode call, masks
        in a second nearest-interp call, binarized >1→1 vectorized."""
        from . import native

        if not native.available():
            return None
        size = self.image_size
        src = [os.path.join(self.tile_dir, self.source_files[int(i)]) for i in indices]
        tgt = [os.path.join(self.tile_dir, self.target_files[int(i)]) for i in indices]
        both = native.decode_batch(src + tgt, size=size)
        n = len(indices)
        he, ihc = both[:n], both[n:]
        mask_paths = [os.path.join(self.tile_dir, self.mask_files[int(i)]) for i in indices]
        masks = native.decode_batch(mask_paths, size=size, channels=1, nearest=True)
        masks = np.where(masks > 1, 1, 0).astype(np.uint8)
        if self.swap:
            he, ihc = ihc, he
        return he, ihc, masks


class PairedHEIHCDataModule(DataModule):
    """Config surface mirrors /root/reference/configs/data/paired_data_mask_he_amyloid.yaml."""

    field_kinds = ("image", "image", "mask")

    def __init__(
        self,
        data_dir: str = "data/",
        csv_file_name: str = "metadata.csv",
        source_column: str = "he_filepath",
        target_column: str = "ihc_filepath",
        mask_column: str = "amyloid_filepath",
        batch_size: int = 8,
        num_workers: int = 4,
        image_size: int = 512,
        direction: str = "HE_to_IHC",
        pin_memory: bool = True,
        seed: int = 0,
        prefetch_factor: int = 2,
        cache: Optional[str] = None,
    ):
        import jax

        from .device_cache import resolve_loader_class

        self._loader_cls = resolve_loader_class(cache)

        self.data_dir = data_dir
        self.csv_file_name = csv_file_name
        self.source_column = source_column
        self.target_column = target_column
        self.mask_column = mask_column
        self.batch_size = batch_size
        self.num_workers = num_workers
        self.image_size = image_size
        self.direction = direction
        self.seed = seed
        self.prefetch_factor = prefetch_factor
        self.num_shards = jax.process_count()
        self.shard_index = jax.process_index()
        self.datasets: dict[str, PairedHEIHCDataset] = {}

    train_augment = None  # reference pipeline resizes only (no crop/flip)

    def setup(self, stage: Optional[str] = None) -> None:
        for folder in ("train", "val", "test"):
            if folder not in self.datasets:
                try:
                    self.datasets[folder] = PairedHEIHCDataset(
                        data_dir=self.data_dir,
                        csv_file_name=self.csv_file_name,
                        source_column=self.source_column,
                        target_column=self.target_column,
                        mask_column=self.mask_column,
                        folder=folder,
                        image_size=self.image_size,
                        direction=self.direction,
                    )
                except FileNotFoundError:
                    if folder == "train":
                        raise

    def _loader(self, folder: str, shuffle: bool) -> Optional[DataLoader]:
        ds = self.datasets.get(folder)
        if ds is None or len(ds) == 0:
            return None
        return self._loader_cls(
            ds,
            batch_size=self.batch_size,
            shuffle=shuffle,
            drop_last=shuffle,
            num_workers=self.num_workers,
            prefetch_factor=self.prefetch_factor,
            seed=self.seed,
            shard_index=self.shard_index,
            num_shards=self.num_shards,
        )

    def train_dataloader(self):
        return self._loader("train", shuffle=True)

    def val_dataloader(self):
        return self._loader("val", shuffle=False)

    def test_dataloader(self):
        return self._loader("test", shuffle=False)


__all__ = ["PairedHEIHCDataset", "PairedHEIHCDataModule", "load_mask_binary"]
