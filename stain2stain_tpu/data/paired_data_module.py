"""Paired source→target tile dataset + datamodule (CSV-metadata driven).

TPU re-design of /root/reference/src/data/paired_data_module.py:95-353:

- CSV metadata with a ``split`` column filters rows per folder; tiles live in
  ``data_dir/<split>/<filename>`` with filenames from ``source_column`` /
  ``target_column`` (ref :131-134).
- The host pipeline ONLY decodes (cv2 BGR→RGB, uint8) and statically resizes;
  normalization to [-1,1] and the *paired* random-crop/flip augmentation
  (ref :172-199) run on device inside the jitted step via
  :mod:`stain2stain_tpu.ops.image`, keyed by the step PRNG.
- ``batch_size`` is global and divided across host processes
  (ref :272-278 divides by trainer.world_size).

Direction semantics: the reference swaps source/target for any value other
than the literal ``"S2T"`` (paired_data_module.py:214-223) — which silently
reverses translation for the shipped ``direction: HE_to_IHC`` config
(configs/data/paired_data.yaml:11). ``direction_compat`` controls this:

- ``"reference"`` (default) — bit-for-bit reference behavior: swap for ANY
  value other than ``"S2T"``, so identical configs train identical
  directions across the two frameworks (a loud warning flags the surprising
  swap for values like ``HE_to_IHC``).
- ``"explicit"`` — swap only for explicit reverse values
  (``T2S``/``IHC_to_HE``/``reverse``); anything else is forward.
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np

from .base import DataLoader, DataModule, Dataset

_REVERSE_DIRECTIONS = ("T2S", "IHC_to_HE", "reverse")


def resolve_direction_swap(
    direction: str, compat: str = "reference", forward: str = "S2T"
) -> bool:
    """Whether (source, target) should be swapped for ``direction``.

    ``compat="reference"`` reproduces the reference exactly: swap for ANY
    value other than the forward literal
    (/root/reference/src/data/paired_data_module.py:214) — with a loud warning
    when the value isn't an explicit reverse keyword, because e.g.
    ``direction=HE_to_IHC`` then trains IHC→HE. ``compat="explicit"`` swaps
    only for {_REVERSE_DIRECTIONS}.
    """
    if compat not in ("reference", "explicit"):
        raise ValueError(f"direction_compat must be 'reference' or 'explicit', got {compat!r}")
    explicit_swap = direction in _REVERSE_DIRECTIONS
    if compat == "explicit":
        if direction != forward and not explicit_swap:
            import warnings

            warnings.warn(
                f"direction={direction!r} with direction_compat='explicit' is treated "
                f"as FORWARD (source→target). The reference swaps the pair for ANY "
                f"value other than {forward!r}; set direction_compat='reference' for "
                "that behavior.",
                stacklevel=3,
            )
        return explicit_swap
    swap = direction != forward
    if swap and not explicit_swap:
        import warnings

        warnings.warn(
            f"direction={direction!r}: reference-compat semantics swap source/target "
            f"for ANY value other than {forward!r} "
            "(/root/reference/src/data/paired_data_module.py:214), so this trains the "
            f"REVERSE translation (target→source). Use direction={forward!r} for "
            "forward, or direction_compat='explicit' to treat only "
            f"{_REVERSE_DIRECTIONS} as reverse.",
            stacklevel=3,
        )
    return swap


def load_rgb(path: str) -> np.ndarray:
    """Decode an image file to RGB uint8 (H, W, 3)."""
    import cv2

    img = cv2.imread(path, cv2.IMREAD_COLOR)
    if img is None:
        from PIL import Image

        return np.asarray(Image.open(path).convert("RGB"), dtype=np.uint8)
    return cv2.cvtColor(img, cv2.COLOR_BGR2RGB)


def resize_uint8(img: np.ndarray, size: int, nearest: bool = False) -> np.ndarray:
    import cv2

    if img.shape[0] == size and img.shape[1] == size:
        return img
    interp = cv2.INTER_NEAREST if nearest else cv2.INTER_LINEAR
    return cv2.resize(img, (size, size), interpolation=interp)


class PairedDataset(Dataset):
    """Returns (source_uint8, target_uint8[, src_name, tgt_name]) HWC tiles.

    With ``use_augmentation`` the tiles are loaded at ``load_size`` (the crop
    to ``image_size`` happens on device); otherwise they are resized straight
    to ``image_size``.
    """

    def __init__(
        self,
        data_dir: str,
        csv_file_name: str,
        source_column: str,
        target_column: str,
        folder: str,
        image_size: int = 512,
        direction: str = "S2T",
        use_augmentation: bool = False,
        return_filename: bool = False,
        load_size: Optional[int] = None,
        direction_compat: str = "reference",
    ):
        import pandas as pd

        self.tile_dir = os.path.join(data_dir, folder)
        self.image_size = image_size
        self.use_augmentation = use_augmentation
        self.return_filename = return_filename
        self.load_size = load_size if load_size is not None else image_size
        self.swap = resolve_direction_swap(direction, direction_compat)

        csv_path = os.path.join(data_dir, csv_file_name)
        if not os.path.exists(csv_path):
            raise FileNotFoundError(f"Metadata CSV not found: {csv_path}")
        metadata = pd.read_csv(csv_path)
        metadata = metadata[metadata["split"] == folder].reset_index(drop=True)
        self.source_files = metadata[source_column].tolist()
        self.target_files = metadata[target_column].tolist()

    def __len__(self) -> int:
        return len(self.source_files)

    def _load_pair(self, idx: int) -> tuple[np.ndarray, np.ndarray]:
        src = load_rgb(os.path.join(self.tile_dir, self.source_files[idx]))
        tgt = load_rgb(os.path.join(self.tile_dir, self.target_files[idx]))
        size = self.load_size if self.use_augmentation else self.image_size
        return resize_uint8(src, size), resize_uint8(tgt, size)

    def __getitem__(self, idx: int) -> tuple:
        src, tgt = self._load_pair(idx)
        if self.swap:
            src, tgt = tgt, src
            src_name, tgt_name = self.target_files[idx], self.source_files[idx]
        else:
            src_name, tgt_name = self.source_files[idx], self.target_files[idx]
        if self.return_filename:
            return src, tgt, src_name, tgt_name
        return src, tgt

    def get_batch(self, indices) -> tuple | None:
        """Native batch fast path: source+target tiles of the whole batch in
        ONE GIL-free C++ decode call (stain2stain_tpu/data/native.py)."""
        from . import native

        if not native.available():
            return None
        size = self.load_size if self.use_augmentation else self.image_size
        src_paths = [os.path.join(self.tile_dir, self.source_files[int(i)]) for i in indices]
        tgt_paths = [os.path.join(self.tile_dir, self.target_files[int(i)]) for i in indices]
        both = native.decode_batch(src_paths + tgt_paths, size=size)
        n = len(indices)
        src, tgt = both[:n], both[n:]
        if self.swap:
            src, tgt = tgt, src
            src_names = [self.target_files[int(i)] for i in indices]
            tgt_names = [self.source_files[int(i)] for i in indices]
        else:
            src_names = [self.source_files[int(i)] for i in indices]
            tgt_names = [self.target_files[int(i)] for i in indices]
        if self.return_filename:
            return src, tgt, src_names, tgt_names
        return src, tgt


class PairedDataModule(DataModule):
    """Config surface mirrors /root/reference/configs/data/paired_data.yaml."""

    field_kinds = ("image", "image")

    def __init__(
        self,
        data_dir: str = "data/",
        csv_file_name: str = "metadata.csv",
        source_column: str = "he_filepath",
        target_column: str = "ihc_filepath",
        batch_size: int = 2,
        num_workers: int = 4,
        image_size: int = 512,
        direction: str = "S2T",
        pin_memory: bool = True,  # accepted for config parity; host→HBM copies are managed by JAX
        use_augmentation: bool = False,
        load_size: Optional[int] = None,
        seed: int = 0,
        prefetch_factor: int = 2,
        direction_compat: str = "reference",
        cache: Optional[str] = None,
    ):
        # snapshot BEFORE any imports so hparams holds only ctor args
        self.hparams = {k: v for k, v in locals().items() if k != "self"}
        import jax
        self.data_dir = data_dir
        self.csv_file_name = csv_file_name
        self.source_column = source_column
        self.target_column = target_column
        self.batch_size = batch_size
        self.num_workers = num_workers
        self.image_size = image_size
        self.direction = direction
        self.direction_compat = direction_compat
        self.use_augmentation = use_augmentation
        self.load_size = load_size
        self.seed = seed
        self.prefetch_factor = prefetch_factor
        from .device_cache import resolve_loader_class

        self._loader_cls = resolve_loader_class(cache)
        self.num_shards = jax.process_count()
        self.shard_index = jax.process_index()
        self.datasets: dict[str, PairedDataset] = {}

    # Device-side augmentation recipe consumed by the task's prepare_batch.
    @property
    def train_augment(self) -> Optional[dict]:
        if not self.use_augmentation:
            return None
        return {"crop_size": self.image_size, "hflip": True, "vflip": True}

    def _make_dataset(self, folder: str, **kw) -> PairedDataset:
        return PairedDataset(
            data_dir=self.data_dir,
            csv_file_name=self.csv_file_name,
            source_column=self.source_column,
            target_column=self.target_column,
            folder=folder,
            image_size=self.image_size,
            direction=self.direction,
            direction_compat=self.direction_compat,
            use_augmentation=self.use_augmentation and folder == "train",
            load_size=self.load_size,
            **kw,
        )

    def setup(self, stage: Optional[str] = None) -> None:
        for folder in ("train", "val", "test"):
            if folder not in self.datasets:
                try:
                    self.datasets[folder] = self._make_dataset(folder)
                except FileNotFoundError:
                    if folder == "train":
                        raise

    def _loader(self, folder: str, shuffle: bool) -> Optional[DataLoader]:
        ds = self.datasets.get(folder)
        if ds is None or len(ds) == 0:
            return None
        # cache="device": decode-once HBM-resident dataset, batches are device
        # gathers (data/device_cache.py — falls back to streaming multi-process)
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

    def train_dataloader(self) -> Optional[DataLoader]:
        return self._loader("train", shuffle=True)

    def val_dataloader(self) -> Optional[DataLoader]:
        return self._loader("val", shuffle=False)

    def test_dataloader(self) -> Optional[DataLoader]:
        return self._loader("test", shuffle=False)


__all__ = [
    "PairedDataset",
    "PairedDataModule",
    "load_rgb",
    "resize_uint8",
    "resolve_direction_swap",
]
