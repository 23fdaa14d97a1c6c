#!/usr/bin/env python
"""Generate the committed real-image fixture tree (tests/fixtures/he_amyloid_tiles).

The reference ships no data (`/root/reference/data/` is empty), so no
reference *experiment config* can be driven against actual image files in
either repo. This script creates a tiny, deterministic, committed stand-in:
16 paired 64×64 tiles (8 train / 4 val / 4 test) with H&E-like source colors
and an IHC-like target that is an exact function of the source (learnable
translation), stored as REAL encoded files — half PNG, half JPEG — plus the
metadata CSV in the reference's schema (columns ``he_filepath``,
``ihc_filepath``, ``split``; layout ``data_dir/<split>/<filename>``, ref
/root/reference/src/data/paired_data_module.py:131-134).

tests/test_e2e_real_images.py drives the he2ihc_he_amyloid experiment
(/root/reference/configs/experiment/he2ihc_he_amyloid.yaml:24-33) end-to-end
against this tree through the C++ batch decoder (native/s2s_loader.cc).

Deterministic: re-running reproduces byte-identical PNGs (JPEG bytes depend
on the libjpeg build, so JPEGs may differ across machines — the committed
files are canonical).
"""

from __future__ import annotations

import sys
from pathlib import Path

import numpy as np

REPO_ROOT = Path(__file__).resolve().parent.parent
OUT = REPO_ROOT / "tests" / "fixtures" / "he_amyloid_tiles"
SIZE = 64
SPLITS = {"train": 8, "val": 4, "test": 4}


def _blobs(rng: np.random.Generator, n: int) -> np.ndarray:
    """Sum of n Gaussian blobs in [0,1] — tissue-ish structure."""
    yy, xx = np.mgrid[0:SIZE, 0:SIZE].astype(np.float32) / SIZE
    field = np.zeros((SIZE, SIZE), np.float32)
    for _ in range(n):
        cx, cy = rng.uniform(0.1, 0.9, 2)
        s = rng.uniform(0.05, 0.2)
        field += rng.uniform(0.4, 1.0) * np.exp(-((xx - cx) ** 2 + (yy - cy) ** 2) / (2 * s * s))
    return np.clip(field / field.max(), 0.0, 1.0)


def make_pair(rng: np.random.Generator) -> tuple[np.ndarray, np.ndarray]:
    """(he, ihc) uint8 HWC pair; ihc is a deterministic function of he."""
    tissue = _blobs(rng, 6)
    nuclei = _blobs(rng, 12) ** 2
    # H&E: white background, eosin-pink cytoplasm, hematoxylin-purple nuclei
    he = np.ones((SIZE, SIZE, 3), np.float32)
    he -= tissue[..., None] * np.array([0.10, 0.45, 0.25])  # pink
    he -= nuclei[..., None] * np.array([0.45, 0.55, 0.15])  # purple
    # IHC: DAB-brown where "amyloid" (high tissue AND nuclei), hematoxylin
    # counterstain elsewhere — an exact per-pixel function of the H&E fields
    amyloid = np.clip(tissue * nuclei * 2.0, 0.0, 1.0)
    ihc = np.ones((SIZE, SIZE, 3), np.float32)
    ihc -= amyloid[..., None] * np.array([0.35, 0.55, 0.75])  # brown
    ihc -= (tissue * (1 - amyloid))[..., None] * np.array([0.25, 0.15, 0.05])
    to8 = lambda a: (np.clip(a, 0.0, 1.0) * 255).round().astype(np.uint8)
    return to8(he), to8(ihc)


def main() -> None:
    import cv2

    rng = np.random.default_rng(2026)
    rows = []
    for split, count in SPLITS.items():
        split_dir = OUT / split
        split_dir.mkdir(parents=True, exist_ok=True)
        for i in range(count):
            he, ihc = make_pair(rng)
            ext = "png" if i % 2 == 0 else "jpg"  # exercise libpng AND libjpeg
            he_name, ihc_name = f"he_{split}_{i:02d}.{ext}", f"ihc_{split}_{i:02d}.{ext}"
            params = [cv2.IMWRITE_JPEG_QUALITY, 95] if ext == "jpg" else []
            cv2.imwrite(str(split_dir / he_name), cv2.cvtColor(he, cv2.COLOR_RGB2BGR), params)
            cv2.imwrite(str(split_dir / ihc_name), cv2.cvtColor(ihc, cv2.COLOR_RGB2BGR), params)
            rows.append((he_name, ihc_name, split))

    csv_path = OUT / "dataset_nirschl_et_al_2026_metadata.csv"
    with open(csv_path, "w") as f:
        f.write("he_filepath,ihc_filepath,split\n")
        for he_name, ihc_name, split in rows:
            f.write(f"{he_name},{ihc_name},{split}\n")
    total = sum(p.stat().st_size for p in OUT.rglob("*") if p.is_file())
    print(f"wrote {len(rows)} pairs under {OUT} ({total / 1024:.0f} KiB)")


if __name__ == "__main__":
    sys.exit(main())
