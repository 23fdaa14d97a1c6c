"""Global seeding (L.seed_everything equivalent, ref src/train.py:55-56).

JAX has no global RNG — all framework randomness flows through explicit keys
derived from the seed registered here. numpy/python RNGs are seeded too for
host-side shuffling reproducibility.
"""

from __future__ import annotations

import random

import numpy as np

_SEED: int = 0


def seed_everything(seed: int | None, workers: bool = True) -> int:
    global _SEED
    if seed is None:
        seed = 0
    _SEED = int(seed)
    random.seed(_SEED)
    np.random.seed(_SEED % (2**32))
    return _SEED


def current_seed() -> int:
    return _SEED


__all__ = ["seed_everything", "current_seed"]
