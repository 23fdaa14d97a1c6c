"""The quality_real_256 recipe at smoke scale (VERDICT r4 ask #3).

The flagship quality row (BASELINE.md) is recorded via
`experiment=quality_real_256`: the PLAIN PairedDataModule — no generation
hook anywhere in the module — driven at an on-disk PNG tree written ahead of
time by `scripts/gen_quality_tiles.py`, through the production data path:
CSV metadata → C++ batch decode (native/s2s_loader.cc) → HBM-resident device
cache → train → eval_quality SSIM/PSNR.

This test runs the identical recipe shrunk to smoke scale (64px tiles,
tiny net, 2 epochs) and asserts every stage of that path is really the one
exercised: the generator script wrote the tree, the datamodule is the plain
PairedDataModule, the one-call native batch decode works on the tree, the
fit converges to finite metrics, and evaluate_quality returns sane SSIM/PSNR.

Ref recipe being scaled down: /root/reference/configs/experiment/
he2ihc_he_amyloid.yaml:24-33 (train a CFM UNet on a CSV paired-tile tree).
"""

import json
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

pytestmark = pytest.mark.slow

CONFIG_DIR = Path(__file__).resolve().parent.parent / "configs"
REPO_ROOT = CONFIG_DIR.parent

TINY_NET_OVERRIDES = [
    "model.net.dim=[3,32,32]",
    "model.net.num_channels=8",
    "model.net.num_res_blocks=1",
    "model.net.channel_mult=[1,2]",
    "model.net.attention_resolutions=''",
    "model.net.num_heads=1",
    "model.net.dropout=0.0",
    "model.solver.solver=euler",
]


@pytest.fixture(scope="module")
def tile_tree(tmp_path_factory):
    """The real generator script, shrunk: 8/4/4 pairs at 64px."""
    root = tmp_path_factory.mktemp("qr_tiles") / "tiles"
    proc = subprocess.run(
        [sys.executable, str(REPO_ROOT / "scripts" / "gen_quality_tiles.py"),
         str(root), "--n-train", "8", "--n-val", "4", "--n-test", "4",
         "--size", "64"],
        capture_output=True, text=True, timeout=300,
    )
    assert proc.returncode == 0, proc.stderr
    assert (root / "metadata.csv").exists()
    assert len(list(root.rglob("*.png"))) == 2 * (8 + 4 + 4)
    return root


@pytest.fixture(scope="module")
def quality_run(tile_tree, tmp_path_factory):
    from src.train import train
    from stain2stain_tpu.config import compose

    cfg = compose(
        CONFIG_DIR,
        "train.yaml",
        [
            "experiment=quality_real_256",
            "logger=csv",
            f"data.data_dir={tile_tree}",
            # smoke scale: 64px tiles, crop-augment to 32, tiny net
            "data.image_size=32",
            "data.load_size=64",
            "data.batch_size=4",
            "data.num_workers=2",
            "trainer.max_epochs=2",
            "trainer.check_val_every_n_epoch=1",
            "callbacks.model_checkpoint.save_on_train_epoch_end=true",
            *TINY_NET_OVERRIDES,
        ],
    )
    tmp = tmp_path_factory.mktemp("qr_run")
    out = tmp / "out"
    out.mkdir()
    cfg["runtime"] = {"output_dir": str(out), "cwd": str(tmp)}
    cfg["extras"]["print_config"] = False
    cfg["extras"]["enforce_tags"] = False
    metrics, objects = train(cfg)
    return metrics, objects


def test_tree_is_plain_files(tile_tree):
    """The config drives the plain PairedDataModule — confirm the tree is
    ordinary encoded PNGs the native decoder can batch-decode in one call."""
    from stain2stain_tpu.data import native
    from stain2stain_tpu.data.paired_data_module import PairedDataset

    ds = PairedDataset(
        data_dir=str(tile_tree),
        csv_file_name="metadata.csv",
        source_column="he_filepath",
        target_column="ihc_filepath",
        folder="train",
        image_size=64,
        direction="S2T",
    )
    assert len(ds) == 8
    if not native.available():
        pytest.skip("native decoder unavailable")
    out = ds.get_batch(list(range(len(ds))))
    assert out is not None, "native batch path not taken"
    src, tgt = out
    assert src.shape == (8, 64, 64, 3) and src.dtype == np.uint8
    # deterministic mode: target is a function of source but not identity
    assert np.mean(np.abs(src.astype(int) - tgt.astype(int))) > 1.0


def test_datamodule_is_the_production_module(quality_run):
    from stain2stain_tpu.data.paired_data_module import PairedDataModule

    _, objects = quality_run
    assert type(objects["datamodule"]) is PairedDataModule


def test_fit_and_eval_quality(quality_run):
    metrics, objects = quality_run
    assert {"train/loss", "val/loss", "test/loss"} <= set(metrics)
    assert np.isfinite(metrics["train/loss"])

    from stain2stain_tpu.ops.metrics import evaluate_quality

    trainer, task, dm = objects["trainer"], objects["model"], objects["datamodule"]
    q = evaluate_quality(task, trainer.state.variables, dm.test_dataloader(),
                         num_steps=2, max_batches=1)
    assert 0.0 <= q["ssim"] <= 1.0 and np.isfinite(q["psnr"])
