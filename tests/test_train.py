"""Entry-point smoke tests (mirror of reference tests/test_train.py:12-108).

Everything drives the real ``src/train.py`` pipeline in-process on the
hermetic synthetic experiment; the persistent compile cache keeps repeat runs
fast on TPU.
"""

import pytest

# slow tier: e2e Trainer fits on the TPU (run with `pytest -m slow`)
pytestmark = pytest.mark.slow

import os
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from src.train import train
from stain2stain_tpu.config import compose

CONFIG_DIR = Path(__file__).resolve().parent.parent / "configs"


def make_cfg(tmp_path, extra_overrides=()):
    overrides = [
        "experiment=smoke_synthetic",
        f"data.data_dir={tmp_path}/synthetic",
        "logger=csv",
        *extra_overrides,
    ]
    cfg = compose(CONFIG_DIR, "train.yaml", overrides)
    out = tmp_path / "out"
    out.mkdir(exist_ok=True)
    cfg["runtime"] = {"output_dir": str(out), "cwd": str(tmp_path)}
    cfg["extras"]["print_config"] = False
    cfg["extras"]["enforce_tags"] = False
    return cfg


def test_train_fast_dev_run(tmp_path):
    cfg = make_cfg(tmp_path, ["trainer.fast_dev_run=true", "test=false"])
    metrics, objects = train(cfg)
    assert "train/loss" in metrics
    assert objects["trainer"].global_step == 1


def test_train_val_test_and_checkpointing(tmp_path):
    cfg = make_cfg(tmp_path, ["trainer.max_epochs=2", "test=true"])
    metrics, objects = train(cfg)
    assert {"train/loss", "val/loss", "test/loss"} <= set(metrics)
    ckpt_cb = objects["trainer"].checkpoint_callback
    assert ckpt_cb.best_model_path and Path(ckpt_cb.best_model_path).exists()
    assert Path(ckpt_cb.last_model_path).exists()
    # quirk-3 fix: filename pattern carries epoch + metric
    assert "best-" in Path(ckpt_cb.best_model_path).name


def test_train_resume_from_checkpoint(tmp_path):
    cfg = make_cfg(tmp_path, ["trainer.max_epochs=1", "test=false"])
    _, objects = train(cfg)
    last = objects["trainer"].checkpoint_callback.last_model_path
    assert last

    cfg2 = make_cfg(tmp_path, ["trainer.max_epochs=2", "test=false"])
    cfg2["ckpt_path"] = last
    metrics2, objects2 = train(cfg2)
    trainer2 = objects2["trainer"]
    # resumed at epoch 1, so exactly one more epoch ran
    assert trainer2.current_epoch == 1
    assert trainer2.global_step > objects["trainer"].global_step


def test_train_metrics_improve_with_more_epochs(tmp_path):
    cfg = make_cfg(tmp_path, ["trainer.max_epochs=3", "test=false", "seed=3"])
    metrics, _ = train(cfg)
    assert metrics["val/loss"] < 1.0  # sanity: training moved the loss


def test_val_check_interval_mid_epoch(tmp_path):
    # validate every train batch: val/loss must appear before the epoch ends
    cfg = make_cfg(
        tmp_path,
        ["trainer.max_epochs=1", "test=false", "+trainer.val_check_interval=1",
         "trainer.limit_train_batches=2"],
    )
    metrics, objects = train(cfg)
    assert "val/loss" in metrics
    # 2 train batches with interval 1 → one mid-epoch val + the epoch-end val
    csvs = list((tmp_path / "out").rglob("metrics.csv"))
    assert csvs, "csv metrics not written"
    rows = [l for l in csvs[0].read_text().splitlines()[1:] if l]
    val_rows = [r for r in rows if r.split(",")[-1] or "val" in csvs[0].read_text().splitlines()[0]]
    assert len(rows) >= 2


def test_accumulate_grad_batches(tmp_path):
    # accum=2 microbatches the jitted step: same number of optimizer updates,
    # finite metrics, and the model still trains
    cfg = make_cfg(
        tmp_path,
        ["trainer.max_epochs=1", "test=false", "+trainer.accumulate_grad_batches=2",
         "data.batch_size=4"],
    )
    metrics, objects = train(cfg)
    trainer = objects["trainer"]
    assert trainer.global_step == 2  # 8 train tiles / batch 4 = 2 updates
    assert 0.0 < metrics["train/loss"] < 10.0


def test_steps_per_execution_matches_single_step(tmp_path):
    """Chained dispatch (lax.scan over stacked batches) is step-for-step
    equivalent to single-step dispatch: same update count, same per-step loss
    sequence (train_step folds the step counter into the RNG, so chunking
    changes only the dispatch granularity — remaining differences are float32
    accumulation noise between the scan and standalone compilations, ~1e-7).
    batch_size=2 -> 4 steps/epoch; spe=3 exercises one full chunk + a
    single-step leftover per epoch."""
    from stain2stain_tpu.config import instantiate
    from stain2stain_tpu.training import Trainer
    from stain2stain_tpu.training.callbacks import Callback
    from stain2stain_tpu.utils.seed import seed_everything

    class RecordLosses(Callback):
        def __init__(self):
            self.losses = []

        def on_train_batch_end(self, trainer, task, metrics):
            self.losses.append(float(metrics["loss"]))

    results = {}
    for spe in (1, 3):
        sub = tmp_path / f"spe{spe}"
        sub.mkdir()
        cfg = make_cfg(sub, ["test=false", "data.batch_size=2"])
        seed_everything(int(cfg["seed"]))
        dm = instantiate(cfg["data"])
        task = instantiate(cfg["model"])
        rec = RecordLosses()
        trainer = Trainer(
            default_root_dir=str(sub / "out"), max_epochs=2, devices=1,
            callbacks=[rec], logger=False, steps_per_execution=spe,
        )
        trainer.fit(task, dm)
        results[spe] = (trainer.global_step, rec.losses)
        # the chunked run must actually take the chained path (one full chunk
        # of 3 per epoch; the 4th step is a single-step leftover)
        assert trainer._chunks_dispatched == (2 if spe == 3 else 0)

    assert results[1][0] == results[3][0] == 8
    assert len(results[1][1]) == len(results[3][1]) == 8
    np.testing.assert_allclose(results[1][1], results[3][1], rtol=1e-4, atol=1e-6)


def test_steps_per_execution_composes_with_grad_accum(tmp_path):
    # chunk of 2 dispatches, each scanning 2 microbatches: 8 tiles / batch 4
    # = 2 optimizer updates, all inside one XLA program
    cfg = make_cfg(
        tmp_path,
        ["trainer.max_epochs=1", "test=false", "data.batch_size=4",
         "trainer.devices=1", "+trainer.accumulate_grad_batches=2",
         "+trainer.steps_per_execution=2"],
    )
    metrics, objects = train(cfg)
    assert objects["trainer"].global_step == 2
    assert objects["trainer"]._chunks_dispatched == 1
    assert 0.0 < metrics["train/loss"] < 10.0


def test_steps_per_execution_respects_max_steps(tmp_path):
    # max_steps=5 with spe=4: one full chunk, then the 5th step single-step,
    # then stop — never overshooting the step budget inside a chunk.
    cfg = make_cfg(
        tmp_path,
        ["trainer.max_epochs=9", "test=false", "data.batch_size=2",
         "trainer.devices=1",
         "+trainer.steps_per_execution=4", "+trainer.max_steps=5"],
    )
    _, objects = train(cfg)
    assert objects["trainer"].global_step == 5
    assert objects["trainer"]._chunks_dispatched >= 1


def test_save_last_refreshed_after_validation(tmp_path):
    """'last' is written at train-epoch end (crash safety) AND again after
    validation, so a resume never replays with the plateau/top-k state one
    validation behind (review r3)."""
    from stain2stain_tpu.config import instantiate
    from stain2stain_tpu.training import ModelCheckpoint, Trainer

    cfg = make_cfg(tmp_path, ["test=false"])
    dm = instantiate(cfg["data"])
    task = instantiate(cfg["model"])
    cb = ModelCheckpoint(save_last=True)
    saves = []
    trainer = Trainer(
        default_root_dir=str(tmp_path / "out"), max_epochs=1, devices=1,
        callbacks=[cb], logger=False,
    )
    orig = trainer.save_checkpoint
    trainer.save_checkpoint = lambda path: (saves.append(path), orig(path))[1]
    trainer.fit(task, dm)
    last_writes = [p for p in saves if str(p).endswith("last")]
    # one pre-val crash-safety write + one post-val refresh
    assert len(last_writes) == 2


def test_precision_bf16_mixed(tmp_path):
    cfg = make_cfg(
        tmp_path,
        ["trainer.max_epochs=1", "test=false", "+trainer.precision=bf16-mixed"],
    )
    metrics, objects = train(cfg)
    assert np.isfinite(metrics["train/loss"])
    # the task's net was switched to bf16 compute
    assert objects["model"].net.dtype == jnp.bfloat16


def test_profiler_simple_and_jax(tmp_path, capsys):
    cfg = make_cfg(
        tmp_path,
        ["trainer.max_epochs=1", "test=false", "+trainer.profiler=simple",
         "trainer.limit_train_batches=2"],
    )
    train(cfg)
    assert "[profiler] train_step mean" in capsys.readouterr().out

    cfg2 = make_cfg(
        tmp_path,
        ["trainer.max_epochs=1", "test=false", "+trainer.profiler=jax",
         "trainer.limit_train_batches=1"],
    )
    train(cfg2)
    traces = list((tmp_path / "out").rglob("profile/**/*"))
    assert traces, "jax profiler trace not written"


def test_trainer_prng_impl_resolution():
    """prng_impl: explicit wins; deterministic forces threefry; auto picks the
    TPU hardware RBG generator only on TPU (measured 24%-of-step threefry
    dropout cost, scripts/step_ablation.py)."""
    from stain2stain_tpu.training import Trainer

    t = Trainer(prng_impl="rbg")
    assert t.prng_impl == "rbg"
    assert "rbg" in str(jax.random.key_impl(t.next_rng()))

    t_det = Trainer(deterministic=True)
    assert t_det.prng_impl == "threefry2x32"

    t_auto = Trainer()
    expected = "rbg" if jax.default_backend() == "tpu" else "threefry2x32"
    assert t_auto.prng_impl == expected
