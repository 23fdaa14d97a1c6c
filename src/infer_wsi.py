"""Whole-slide (arbitrary-size image) inference CLI.

No reference equivalent — the reference consumes pre-cut tiles and leaves
whole-slide handling upstream (/root/reference/src/data/paired_data_module.py
:172-211; SURVEY.md §5). This CLI translates one arbitrarily sized image with
a single compiled fixed-shape generator (stain2stain_tpu/wsi.py):

    python src/infer_wsi.py ckpt_path=<dir> input=<img.png|.npy> \
        output=<out.png> num_steps=2 tile=256 overlap=32 wsi_batch=16

``input`` accepts an 8-bit RGB image file (PIL formats) or a ``.npy`` array
(H, W, 3) uint8; ``output`` ``.png`` (via matplotlib) or ``.npy``.
"""

from __future__ import annotations

import os
import sys
from pathlib import Path

REPO_ROOT = Path(__file__).resolve().parent.parent
if str(REPO_ROOT) not in sys.path:
    sys.path.insert(0, str(REPO_ROOT))
os.environ.setdefault("PROJECT_ROOT", str(REPO_ROOT))

import numpy as np

from stain2stain_tpu.config import Config, config_main, instantiate
from stain2stain_tpu.inference import load_state
from stain2stain_tpu.ops.image import denormalize_np, normalize_uint8_np
from stain2stain_tpu.utils.pylogger import RankedLogger
from stain2stain_tpu.wsi import make_tiled_generator, translate_large_image

log = RankedLogger(__name__, rank_zero_only=True)


def _read_image(path: str) -> np.ndarray:
    if path.endswith(".npy"):
        img = np.load(path)
    else:
        from PIL import Image

        img = np.asarray(Image.open(path).convert("RGB"))
    if img.ndim != 3 or img.shape[-1] != 3:
        raise ValueError(f"expected (H, W, 3) image, got {img.shape}")
    return img.astype(np.uint8)


def _write_image(path: str, img01: np.ndarray) -> None:
    if path.endswith(".npy"):
        np.save(path, img01)
        return
    from PIL import Image

    Image.fromarray((np.clip(img01, 0.0, 1.0) * 255).astype(np.uint8)).save(path)


@config_main(config_path="../configs", config_name="infer.yaml")
def main(cfg: Config):
    tile = int(cfg.get("tile", 256))
    overlap = int(cfg.get("overlap", 32))
    batch = int(cfg.get("wsi_batch", 16))
    num_steps = int(cfg.get("num_steps", 2))

    src = _read_image(cfg["input"])
    log.info(f"Input {cfg['input']}: {src.shape[0]}x{src.shape[1]}, tile={tile} overlap={overlap}")

    task = instantiate(cfg["model"])
    variables = load_state(cfg["ckpt_path"]).variables
    gen = make_tiled_generator(task, variables, num_steps=num_steps)

    normalized = normalize_uint8_np(src)
    out = translate_large_image(gen, normalized, tile=tile, overlap=overlap, batch_size=batch)
    out01 = denormalize_np(out)

    out_path = cfg.get("output") or str(Path(cfg["input"]).with_suffix(".translated.png"))
    _write_image(out_path, out01)
    log.info(f"Wrote {out_path}")
    return out_path


if __name__ == "__main__":
    main()
