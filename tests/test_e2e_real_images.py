"""End-to-end on REAL encoded image files: the he2ihc_he_amyloid experiment
(the reference's smoke study, /root/reference/configs/experiment/
he2ihc_he_amyloid.yaml:24-33) driven against the committed PNG/JPEG fixture
tree through the C++ batch decoder.

Everything else in the suite runs on synthetic in-memory tiles; this is the
one test where a reference *experiment config* trains on actual image files:
compose → CSV metadata → native decode (native/s2s_loader.cc) → fit →
eval → infer panels.

Fixtures: tests/fixtures/he_amyloid_tiles (16 paired 64×64 tiles, half PNG
half JPEG, reference CSV schema) — regenerate with
``python scripts/gen_image_fixtures.py``.
"""

import pytest

# slow tier: real Trainer fits (run with `pytest -m slow`)
pytestmark = pytest.mark.slow

import subprocess
import sys
from pathlib import Path

import numpy as np

from src.train import train
from stain2stain_tpu.config import compose

CONFIG_DIR = Path(__file__).resolve().parent.parent / "configs"
REPO_ROOT = CONFIG_DIR.parent
FIXTURES = Path(__file__).parent / "fixtures" / "he_amyloid_tiles"

# Same tiny-net shape as test_infer.py / smoke_synthetic so the XLA programs
# come out of the shared compile cache.
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
def native_decoder():
    from stain2stain_tpu.data import native

    if not native.available():
        pytest.skip("native decoder unavailable (g++ build failed?)")
    return native


@pytest.fixture(scope="module")
def e2e_run(tmp_path_factory, native_decoder):
    """compose he2ihc_he_amyloid → fit 2 epochs on the fixture tree → test."""
    tmp = tmp_path_factory.mktemp("e2e_real")
    cfg = compose(
        CONFIG_DIR,
        "train.yaml",
        [
            "experiment=he2ihc_he_amyloid",
            "logger=csv",
            f"data.data_dir={FIXTURES}",
            # fixture tiles are 64px; load full-res and crop to 32 on device
            # (the experiment's own use_augmentation path)
            "data.image_size=32",
            "data.load_size=64",
            "data.use_augmentation=true",
            "data.num_workers=2",
            "trainer.max_epochs=2",
            "trainer.limit_train_batches=4",
            "trainer.limit_val_batches=2",
            "test=true",
            *TINY_NET_OVERRIDES,
        ],
    )
    out = tmp / "out"
    out.mkdir()
    cfg["runtime"] = {"output_dir": str(out), "cwd": str(tmp)}
    cfg["extras"]["print_config"] = False
    cfg["extras"]["enforce_tags"] = False
    metrics, objects = train(cfg)
    return metrics, objects, out


def test_native_decoder_reads_the_fixture_tree(native_decoder):
    """The C++ decoder must decode the committed PNG AND JPEG tiles to the
    same pixels as the cv2 host path (JPEG is lossy identically for both —
    they read the same bytes)."""
    from stain2stain_tpu.data.paired_data_module import load_rgb, resize_uint8

    paths = sorted(str(p) for p in (FIXTURES / "train").iterdir())
    assert any(p.endswith(".png") for p in paths) and any(p.endswith(".jpg") for p in paths)
    batch = native_decoder.decode_batch(paths, size=64)
    assert batch.shape == (len(paths), 64, 64, 3) and batch.dtype == np.uint8
    for i, p in enumerate(paths):
        ref = resize_uint8(load_rgb(p), 64)
        np.testing.assert_array_equal(batch[i], ref, err_msg=p)


def test_fit_on_real_images(e2e_run):
    metrics, objects, _ = e2e_run
    assert {"train/loss", "val/loss", "test/loss"} <= set(metrics)
    assert np.isfinite(metrics["train/loss"])
    trainer = objects["trainer"]
    # 8 train pairs, global batch 2, limit 4 -> 4 steps/epoch x 2 epochs
    assert trainer.global_step == 8
    ckpt_cb = trainer.checkpoint_callback
    assert ckpt_cb and Path(ckpt_cb.best_model_path).exists()


def test_dataset_used_the_native_batch_path(native_decoder):
    """PairedDataset.get_batch must take the one-call C++ path on this tree
    (None would mean it silently fell back to per-file cv2)."""
    from stain2stain_tpu.data.paired_data_module import PairedDataset

    ds = PairedDataset(
        data_dir=str(FIXTURES),
        csv_file_name="dataset_nirschl_et_al_2026_metadata.csv",
        source_column="he_filepath",
        target_column="ihc_filepath",
        folder="train",
        image_size=64,
        direction="S2T",
    )
    out = ds.get_batch(list(range(len(ds))))
    assert out is not None, "native batch path not taken"
    src, tgt = out
    assert src.shape == (8, 64, 64, 3) and tgt.shape == (8, 64, 64, 3)
    # pairs differ (real translation task, not identity)
    assert np.mean(np.abs(src.astype(int) - tgt.astype(int))) > 1.0


def test_infer_panels_from_real_images(e2e_run, tmp_path):
    """The deployment path (SURVEY.md §3.4): config-driven infer CLI renders
    source/generated/target panels from the trained ckpt over the REAL test
    tiles."""
    metrics, objects, out_dir = e2e_run
    ckpt = objects["trainer"].checkpoint_callback.best_model_path
    panels = tmp_path / "panels"
    proc = subprocess.run(
        [
            sys.executable,
            str(REPO_ROOT / "src" / "infer_simple_flowmatching.py"),
            f"ckpt_path={ckpt}",
            f"data.data_dir={FIXTURES}",
            "data.image_size=32",
            "num_steps=2",
            "n_images=2",
            f"paths.output_dir={panels}",
            *TINY_NET_OVERRIDES,
        ],
        capture_output=True,
        text=True,
        cwd=REPO_ROOT,
        timeout=600,
    )
    assert proc.returncode == 0, proc.stdout + proc.stderr
    pngs = list(panels.rglob("*.png"))
    assert pngs, f"no panels written: {proc.stdout}"
