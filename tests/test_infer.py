"""Inference-CLI round trip: train a smoke model, then drive the infer and
quality CLIs as subprocesses (the deployment path, SURVEY.md §3.3-3.4)."""

import pytest

# slow tier: e2e CLI train+infer subprocesses (run with `pytest -m slow`)
pytestmark = pytest.mark.slow

import json
import subprocess
import sys
from pathlib import Path


from src.train import train
from stain2stain_tpu.config import compose

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
def smoke_ckpt(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("infer_rt")
    cfg = compose(
        CONFIG_DIR,
        "train.yaml",
        [
            "experiment=smoke_synthetic",
            f"data.data_dir={tmp}/synthetic",
            "trainer.max_epochs=1",
            "test=false",
            "logger=csv",
        ],
    )
    out = tmp / "out"
    out.mkdir()
    cfg["runtime"] = {"output_dir": str(out), "cwd": str(tmp)}
    cfg["extras"]["print_config"] = False
    cfg["extras"]["enforce_tags"] = False
    _, objects = train(cfg)
    return tmp, objects["trainer"].checkpoint_callback.last_model_path


def run_cli(script, args, tmp, timeout=900, overrides=None):
    # 900 s: after a model-code change the persistent compile cache misses and
    # one-time XLA compiles through the dev tunnel alone take ~5-6 min.
    if overrides is None:
        overrides = [
            "data=synthetic",
            f"data.data_dir={tmp}/synthetic",
            *TINY_NET_OVERRIDES,
        ]
    cmd = [
        sys.executable,
        str(REPO_ROOT / "src" / script),
        f"paths.log_dir={tmp}/logs",
        "extras.print_config=false",
        "extras.enforce_tags=false",
        *overrides,
        *args,
    ]
    return subprocess.run(cmd, cwd=REPO_ROOT, capture_output=True, text=True, timeout=timeout)


def test_infer_simple_cli_writes_panels(smoke_ckpt):
    tmp, ckpt = smoke_ckpt
    res = run_cli(
        "infer_simple_flowmatching.py",
        [f"ckpt_path={ckpt}", "num_steps=2", "n_images=2"],
        tmp,
    )
    assert res.returncode == 0, res.stderr[-2000:]
    panels = list(Path(tmp, "logs").rglob("panels/*.png"))
    assert len(panels) == 2


def test_infer_wsi_cli_translates_arbitrary_size(smoke_ckpt):
    """Whole-slide CLI: a 48x72 input (neither dim a tile multiple) comes
    back at full size through the 32px tiled compiled generator."""
    import numpy as np

    tmp, ckpt = smoke_ckpt
    src = np.random.default_rng(0).integers(0, 256, (48, 72, 3), dtype=np.uint8)
    np.save(tmp / "slide.npy", src)
    res = run_cli(
        "infer_wsi.py",
        [
            f"ckpt_path={ckpt}", f"input={tmp}/slide.npy", f"output={tmp}/out.npy",
            "num_steps=2", "tile=32", "overlap=8", "wsi_batch=4",
        ],
        tmp,
    )
    assert res.returncode == 0, res.stderr[-2000:]
    out = np.load(tmp / "out.npy")
    assert out.shape == (48, 72, 3)
    assert np.isfinite(out).all()


MULTITASK_TINY = [
    "model=conditional_flow_matching_multitask",
    "model.time_emb_dim=16",
    "model.encoder.features=[8,16]",
    "model.flow_decoder.bottleneck_channels=16",
    "model.flow_decoder.features=[8]",
    "model.flow_decoder.time_emb_dim=16",
    "model.seg_decoder.bottleneck_channels=16",
    "model.seg_decoder.features=[8]",
    "model.seg_decoder.out_channels=1",
    "model.solver.solver=euler",
]


@pytest.fixture(scope="module")
def multitask_ckpt(tmp_path_factory):
    """Train the smoke multitask experiment (shared encoder + dual decoders)."""
    tmp = tmp_path_factory.mktemp("infer_mt")
    cfg = compose(
        CONFIG_DIR,
        "train.yaml",
        [
            "experiment=smoke_multitask",
            f"data.data_dir={tmp}/synthetic",
            "trainer.max_epochs=1",
            "test=false",
            "logger=csv",
        ],
    )
    out = tmp / "out"
    out.mkdir()
    cfg["runtime"] = {"output_dir": str(out), "cwd": str(tmp)}
    cfg["extras"]["print_config"] = False
    cfg["extras"]["enforce_tags"] = False
    _, objects = train(cfg)
    return tmp, objects["trainer"].checkpoint_callback.last_model_path


def test_infer_multitask_cli_writes_panels_with_masks(multitask_ckpt):
    """The multitask infer CLI (ref: src/infer_multitask_multiclassloss.py)
    drives generate() -> (image, mask) and writes panels including the
    predicted mask."""
    tmp, ckpt = multitask_ckpt
    res = run_cli(
        "infer_multitask_multiclassloss.py",
        [f"ckpt_path={ckpt}", "num_steps=2", "n_images=2"],
        tmp,
        overrides=[
            "data=synthetic",
            f"data.data_dir={tmp}/synthetic",
            "data.with_mask=true",
            "data.image_size=32",
            "data.tile_size=48",
            *MULTITASK_TINY,
        ],
    )
    assert res.returncode == 0, res.stderr[-2000:]
    panels = list(Path(tmp, "logs").rglob("panels/*.png"))
    assert len(panels) == 2


@pytest.fixture(scope="module")
def any2any_ckpt(tmp_path_factory):
    """Train the smoke any2any experiment on synthetic domain folders."""
    from stain2stain_tpu.data.synthetic import generate_domain_folders

    tmp = tmp_path_factory.mktemp("infer_a2a")
    generate_domain_folders(tmp / "domains", n_images=8, size=48)
    cfg = compose(
        CONFIG_DIR,
        "train.yaml",
        [
            "experiment=smoke_any2any",
            f"data.data_dir={tmp}/domains",
            "trainer.max_epochs=1",
            "test=false",
            "logger=csv",
        ],
    )
    out = tmp / "out"
    out.mkdir()
    cfg["runtime"] = {"output_dir": str(out), "cwd": str(tmp)}
    cfg["extras"]["print_config"] = False
    cfg["extras"]["enforce_tags"] = False
    _, objects = train(cfg)
    return tmp, objects["trainer"].checkpoint_callback.last_model_path


A2A_TINY = [
    "model=class_conditional_flow_matching",
    "model.net.dim=[3,32,32]",
    "model.net.num_channels=8",
    "model.net.num_res_blocks=1",
    "model.net.channel_mult=[1,2]",
    "model.net.attention_resolutions=''",
    "model.net.num_heads=1",
    "model.net.dropout=0.0",
    "model.solver.solver=euler",
]


def test_infer_any2any_cli_writes_all_class_panels(any2any_ckpt):
    """The any2any CLI (ref: notebooks/infer_any2any.ipynb cells 10-14)
    translates each source to EVERY target class in one compiled batched
    call and writes one panel per example containing all classes."""
    tmp, ckpt = any2any_ckpt
    res = run_cli(
        "infer_any2any.py",
        [f"ckpt_path={ckpt}", "num_steps=2", "n_images=2"],
        tmp,
        overrides=[
            "data=class_conditional_he_amyloid",
            f"data.data_dir={tmp}/domains",
            "data.class_folder_mapping={0: HE, 1: IHC, 2: Grayscale}",
            "data.crop_size=32",
            "data.batch_size=4",
            "data.num_workers=2",
            "data.val_split=0.25",
            *A2A_TINY,
        ],
    )
    assert res.returncode == 0, res.stderr[-2000:]
    panels = list(Path(tmp, "logs").rglob("panels/*.png"))
    assert len(panels) == 2


def test_eval_quality_cli_reports_metrics(smoke_ckpt):
    tmp, ckpt = smoke_ckpt
    res = run_cli(
        "eval_quality.py",
        [f"ckpt_path={ckpt}", "num_steps=2", "+n_batches=1"],
        tmp,
    )
    assert res.returncode == 0, res.stderr[-2000:]
    line = [l for l in res.stdout.splitlines() if l.startswith("{")][-1]
    metrics = json.loads(line)
    assert {"ssim", "psnr"} <= set(metrics)
    assert -1.0 <= metrics["ssim"] <= 1.0


def test_data_sanity_cli(tmp_path):
    """The EDA CLI (ref notebooks/eda.ipynb as a tool): green report on a
    consistent tree, nonzero exit + error entry when referenced files are
    missing."""
    from stain2stain_tpu.data.synthetic import generate_paired_dataset

    root = generate_paired_dataset(tmp_path / "ds", n_train=4, n_val=2, n_test=2, size=32)
    overrides = [
        "data=paired_data",
        f"data.data_dir={root}",
        "data.csv_file_name=metadata.csv",
        "ckpt_path=unused",
    ]
    res = run_cli("data_sanity.py", [], tmp_path, timeout=300, overrides=overrides)
    assert res.returncode == 0, res.stderr[-2000:]
    report = json.loads(res.stdout[res.stdout.index("{"):])
    assert report["rows"] == 8
    assert set(report["split_counts"]) == {"train", "val", "test"}
    assert not report["errors"] and not report["missing_files"]
    assert report["shape_histogram"] == {"32x32": len(report["file_columns"]) * 8} or report["shape_histogram"]

    # break one referenced file -> hard error, nonzero exit
    victim = next((root / "train").glob("*.png"))
    victim.unlink()
    res = run_cli("data_sanity.py", [], tmp_path, timeout=300, overrides=overrides)
    assert res.returncode != 0
    report = json.loads(res.stdout[res.stdout.index("{"):])
    assert report["errors"] and report["missing_files"]
