"""MNIST datamodule (Lightning-Hydra template demo parity).

TPU re-design of /root/reference/src/data/mnist_datamodule.py: 55k/5k/10k
train/val/test split (ref random_split 55k/5k of the 60k train set), global
batch divided across processes. ``prepare_data`` uses a locally cached
torchvision MNIST when present; in hermetic environments (zero egress — this
box) it falls back to a deterministic synthetic digit set so the whole test
pyramid stays runnable, mirroring how our stain pipelines use synthetic tiles.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from .base import DataLoader, DataModule, Dataset


class ArrayDataset(Dataset):
    def __init__(self, images: np.ndarray, labels: np.ndarray):
        self.images = images
        self.labels = labels

    def __len__(self) -> int:
        return len(self.images)

    def __getitem__(self, idx: int) -> tuple:
        return self.images[idx], int(self.labels[idx])


def _synthetic_mnist(n: int, seed: int) -> tuple[np.ndarray, np.ndarray]:
    """Deterministic class-separable 28×28 uint8 digits: class-keyed blob
    patterns + noise — enough signal for the classifier smoke tests."""
    rng = np.random.default_rng(seed)
    labels = rng.integers(0, 10, n)
    yy, xx = np.mgrid[0:28, 0:28]
    images = np.empty((n, 28, 28), np.uint8)
    for c in range(10):
        cx, cy = 6 + (c % 5) * 4, 6 + (c // 5) * 12
        pattern = np.exp(-(((xx - cx) ** 2 + (yy - cy) ** 2) / 30.0))
        sel = labels == c
        noise = rng.random((int(sel.sum()), 28, 28)) * 0.3
        images[sel] = ((pattern[None] * 0.7 + noise) * 255).astype(np.uint8)
    return images, labels.astype(np.int64)


class MNISTDataModule(DataModule):
    field_kinds = ("raw", "label")

    def __init__(
        self,
        data_dir: str = "data/",
        batch_size: int = 64,
        train_val_test_split: tuple = (55_000, 5_000, 10_000),
        num_workers: int = 0,
        pin_memory: bool = False,
        seed: int = 0,
        synthetic_size: int = 4_000,
    ):
        import jax

        self.data_dir = data_dir
        self.batch_size = batch_size
        self.split = tuple(train_val_test_split)
        self.num_workers = num_workers
        self.seed = seed
        self.synthetic_size = synthetic_size
        self.num_shards = jax.process_count()
        self.shard_index = jax.process_index()
        self.data_train = self.data_val = self.data_test = None

    def prepare_data(self) -> None:
        pass  # no download in a zero-egress environment

    def _load_real(self) -> Optional[tuple]:
        try:
            from torchvision.datasets import MNIST

            train = MNIST(self.data_dir, train=True, download=False)
            test = MNIST(self.data_dir, train=False, download=False)
            return (
                np.concatenate([train.data.numpy(), test.data.numpy()]),
                np.concatenate([train.targets.numpy(), test.targets.numpy()]),
            )
        except Exception:
            return None

    def setup(self, stage: Optional[str] = None) -> None:
        if self.data_train is not None:
            return
        real = self._load_real()
        if real is not None:
            images, labels = real
            n_train, n_val, n_test = self.split
        else:
            images, labels = _synthetic_mnist(self.synthetic_size, self.seed)
            # scale the 55k/5k/10k proportions down to the synthetic size
            total = sum(self.split)
            n_train = int(len(images) * self.split[0] / total)
            n_val = int(len(images) * self.split[1] / total)
            n_test = len(images) - n_train - n_val
        perm = np.random.default_rng(self.seed).permutation(len(images))
        images, labels = images[perm], labels[perm]
        self.data_train = ArrayDataset(images[:n_train], labels[:n_train])
        self.data_val = ArrayDataset(images[n_train : n_train + n_val], labels[n_train : n_train + n_val])
        self.data_test = ArrayDataset(images[n_train + n_val :], labels[n_train + n_val :])

    def _loader(self, ds, shuffle: bool):
        if ds is None or len(ds) == 0:
            return None
        return DataLoader(
            ds,
            batch_size=self.batch_size,
            shuffle=shuffle,
            drop_last=shuffle,
            num_workers=max(1, self.num_workers),
            seed=self.seed,
            shard_index=self.shard_index,
            num_shards=self.num_shards,
        )

    def train_dataloader(self):
        return self._loader(self.data_train, shuffle=True)

    def val_dataloader(self):
        return self._loader(self.data_val, shuffle=False)

    def test_dataloader(self):
        return self._loader(self.data_test, shuffle=False)


__all__ = ["MNISTDataModule", "ArrayDataset"]
